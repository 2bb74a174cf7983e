"""One process of a multi-host gitax run (driven by
test_multihost_distributed.py).

Each process is a "host": it owns 2 local CPU devices
(xla_force_host_platform_device_count=2), joins the jax.distributed
runtime through gitax's own initialize() (the same call the CLI makes
when COORDINATOR_ADDRESS is exported, common.py::dispatch_main), builds
a per-host data-parallel mesh over its LOCAL devices, and runs the TSV
caption pipeline on its row shard.  finish_shards() then syncs ranks
with the collective barrier and rank 0 concats — the TPU-native
replacement for the reference's poll-the-filesystem barrier
(reference inference.py:214-225).

Run single-process (no COORDINATOR_ADDRESS) it produces the golden
output the 2-process run must match byte-for-byte.
"""

import json
import os
import os.path as op
import sys


def main():
    out_dir = sys.argv[1]

    import jax

    from gitax.runtime import distributed

    multi = distributed.initialize()
    import numpy as np

    from gitax.common import get_mpi_rank, get_mpi_size
    from gitax.decode import BeamSearchConfig
    from gitax.models import GitModel, GitConfig, ViTConfig
    from gitax.parallel import make_mesh
    from gitax.preprocess import TestTransform
    from gitax.runtime import CaptionEngine
    from gitax.tokenization import BertTokenizer, build_tiny_vocab

    rank, world = get_mpi_rank(), get_mpi_size()
    witness = {
        "initialized": bool(multi),
        "is_active": distributed.is_active(),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
        "rank": rank,
        "world": world,
    }

    if multi:
        # real cross-process SPMD sanity: a psum over a GLOBAL mesh that
        # spans both hosts' devices must see every host's contribution
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        from jax.sharding import NamedSharding, PartitionSpec as P

        gmesh = make_mesh(data=jax.device_count(), model=1)
        local_rows = jax.local_device_count()
        host_local = np.full(
            (local_rows, 1), float(jax.process_index() + 1), np.float32
        )
        garr = multihost_utils.host_local_array_to_global_array(
            host_local, gmesh, P("data")
        )
        total = jax.jit(
            lambda x: x.sum(), out_shardings=NamedSharding(gmesh, P())
        )(garr)
        # process 0 contributes 2*1, process 1 contributes 2*2
        witness["global_psum"] = float(total)

    cfg = GitConfig(
        encoder=ViTConfig(16, 64, 2, 2, 32),
        visual_feature_size=64,
        vocab_size=30522,
        hidden_size=48,
        num_layers=2,
        num_heads=4,
        feedforward_size=96,
        max_caption_length=32,
    )
    model = GitModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    import jax.numpy as jnp

    engine = CaptionEngine(
        model,
        params,
        BertTokenizer(build_tiny_vocab()),
        TestTransform(crop_size=32),
        batch_size=2,
        beam=BeamSearchConfig(num_beams=2, max_steps=8),
        dtype=jnp.float32,
        # per-HOST mesh over this process's local chips: DP inside the
        # host, row sharding across hosts — the deployment layout
        # DESIGN.md §5 describes
        mesh=make_mesh(data=jax.local_device_count(), model=1,
                       devices=jax.local_devices()),
    )
    engine.run_caption_tsv(
        op.join(out_dir, "imgs.tsv"), op.join(out_dir, "out.tsv"), rank, world
    )
    with open(op.join(out_dir, "witness.{}.json".format(rank)), "w") as fp:
        json.dump(witness, fp)


if __name__ == "__main__":
    main()
