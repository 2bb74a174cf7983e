"""Device mesh + sharding layout for gitax.

The reference's only parallelism is embarrassingly-parallel row sharding
over mpirun ranks (SURVEY.md §2 parallelism table; inference.py:157-169)
— no collectives at all.  gitax instead scales as a single SPMD program
over a `jax.sharding.Mesh` with two axes:

  * `data`  — batch dimension (DP); gradient all-reduce rides ICI.
  * `model` — Megatron-style tensor parallel over attention heads / FFN
    columns: qkv & ffn-in kernels are column-sharded, out-proj & ffn-out
    kernels row-sharded, so each transformer block needs one psum per
    sublayer, inserted automatically by XLA's SPMD partitioner from the
    shardings below.

Embeddings and LayerNorms are replicated (GIT's decoder is 0.3B max —
vocab-sharded embeddings are not worth the gather).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = None, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def make_mesh_from_shape(mesh_shape) -> Mesh:
    """CLI-surface mesh constructor: int N -> (N, 1); [data, model] as
    given.  Under a live multi-host `jax.distributed` runtime the shape
    describes the PER-HOST mesh over this process's LOCAL chips — hosts
    stay row-sharded over TSV rows (runtime.pipeline), so each host
    drives an independent SPMD program on its own slice of the pod.
    Single-process this is identical to make_mesh over jax.devices()."""
    if isinstance(mesh_shape, int):
        mesh_shape = (mesh_shape, 1)
    from ..runtime import distributed

    devices = jax.local_devices() if distributed.is_active() else None
    return make_mesh(data=mesh_shape[0], model=mesh_shape[1], devices=devices)


def param_partition_specs(params):
    """PartitionSpec pytree matching a GitModel params tree.

    Column-parallel: qkv kernels [L, D, 3D] and ffn-in [L, D, F] on the
    last dim; row-parallel: attn-out [L, D, D] and ffn-out [L, F, D] on
    the middle (input) dim.  Everything else replicated.
    """

    def spec_for(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        joined = "/".join(k for k in keys if k)
        leaf_name = keys[-1] or ""
        nd = np.ndim(leaf)
        # match the module by path and the leaf by EXACT name: the int8
        # path adds kernel_q8/kernel_q8_dyn (same layout as kernel) and
        # kernel_scale (per-OUTPUT-channel, [L, out]); a substring match
        # on "out/kernel" would catch "out/kernel_scale" and shard the
        # layer axis over 'model' — wrong layout and a crash whenever TP
        # size does not divide num_layers
        col = any(t in joined for t in ("qkv/", "c_fc/", "intermediate/"))
        row = any(
            t in joined for t in ("attn/out/", "c_proj/", "mlp/output/")
        )
        if leaf_name in ("kernel", "kernel_q8", "kernel_q8_dyn"):
            if col:
                return P(*([None] * (nd - 1)), "model")
            if row:
                return P(*([None] * (nd - 2)), "model", None)
        elif leaf_name in ("bias", "kernel_scale"):
            # per-output-channel vectors: column-parallel outputs are
            # sharded, row-parallel outputs are full-width -> replicate
            if col:
                return P(*([None] * (nd - 1)), "model")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_partition_specs(batch):
    """Shard every batch leaf on its leading (batch) axis."""

    def spec_for(leaf):
        nd = np.ndim(leaf)
        return P("data", *([None] * (nd - 1)))

    return jax.tree_util.tree_map(spec_for, batch)


def shard_params(params, mesh: Mesh):
    """Place a host pytree onto the mesh with TP/replicated layout."""
    specs = param_partition_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def zero1_partition_specs(params, mesh: Mesh):
    """ZeRO-1 layout for param-shaped optimizer moments: shard the first
    axis that divides the 'data' axis size (and is not TP-sharded) over
    'data', so Adam's m/v live at 1/N per device and the moment update
    runs shard-local.  XLA's SPMD partitioner inserts the
    reduce-scatter/all-gather around the update from these shardings
    alone — no hand-written collectives (scaling-book recipe).

    The reference has no distributed training at all (SURVEY.md §2);
    this is the gitax-native equivalent of optimizer-state sharding.
    """
    n_data = mesh.shape["data"]
    base = param_partition_specs(params)

    def spec_for(leaf, tp_spec):
        dims = np.shape(leaf)
        taken = set(tp_spec)
        for axis, d in enumerate(dims):
            if tp_spec[axis] if axis < len(tp_spec) else None:
                continue
            if d % n_data == 0 and d >= n_data and "data" not in taken:
                parts = list(tp_spec) + [None] * (len(dims) - len(tp_spec))
                parts[axis] = "data"
                return P(*parts)
        return tp_spec

    return jax.tree_util.tree_map(spec_for, params, base)


def zero1_shard_opt_state(opt_state, params, mesh: Mesh):
    """Place an optax state on the mesh: param-STRUCTURED subtrees (Adam
    mu/nu — any subtree whose pytree structure equals the params') get
    the ZeRO-1 layout leaf-for-leaf; everything else (step counters,
    scalars) replicates.  Structural matching, not shape lookup: two
    same-shaped leaves with different partition specs must not alias."""
    zspecs = zero1_partition_specs(params, mesh)
    params_def = jax.tree_util.tree_structure(params)

    def is_param_tree(node):
        try:
            return jax.tree_util.tree_structure(node) == params_def
        except Exception:
            return False

    def place(node):
        if is_param_tree(node):
            return jax.tree_util.tree_map(
                lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
                node,
                zspecs,
            )
        return jax.device_put(node, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, opt_state, is_leaf=is_param_tree)
