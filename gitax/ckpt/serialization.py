"""Native checkpoint save/restore (Orbax) + train-state resume.

The reference has no save path at all — checkpoints are produced
elsewhere and only loaded (torch_common.py:41-145).  gitax adds a full
save/resume story: params and optimizer state as Orbax checkpoints
(sharding-aware, async-capable), with step-numbered directories and a
latest-step resolver.
"""

from __future__ import annotations

import os
import os.path as op
import re
from typing import Any, Optional

import jax


def save_params(directory: str, params: Any, step: Optional[int] = None):
    """Save a params (or any) pytree under directory[/step_N]."""
    import orbax.checkpoint as ocp

    path = op.abspath(directory)
    if step is not None:
        path = op.join(path, "step_{:08d}".format(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def restore_params(directory: str, step: Optional[int] = None, template: Any = None):
    """Restore a pytree; `template` (matching structure of abstract arrays
    or concrete arrays) restores with target shardings/dtypes."""
    import orbax.checkpoint as ocp

    path = op.abspath(directory)
    if step is not None:
        path = op.join(path, "step_{:08d}".format(step))
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=getattr(x, "sharding", None)
            )
            if hasattr(x, "shape")
            else x,
            template,
        )
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def latest_step(directory: str) -> Optional[int]:
    if not op.isdir(directory):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(directory)
        if (m := re.match(r"step_(\d+)$", name))
    ]
    return max(steps) if steps else None


def save_train_state(directory: str, state, step: Optional[int] = None):
    step = int(state.step) if step is None else step
    return save_params(
        directory,
        {"step": state.step, "params": state.params, "opt_state": state.opt_state},
        step=step,
    )


def restore_train_state(directory: str, template_state, step: Optional[int] = None):
    from ..training.trainer import TrainState

    step = latest_step(directory) if step is None else step
    assert step is not None, "no checkpoints in {}".format(directory)
    tree = restore_params(
        directory,
        step=step,
        template={
            "step": template_state.step,
            "params": template_state.params,
            "opt_state": template_state.opt_state,
        },
    )
    return TrainState(tree["step"], tree["params"], tree["opt_state"])
