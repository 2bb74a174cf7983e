"""Multi-host runtime setup.

The reference's "distributed" layer is mpirun env vars + a filesystem
barrier (common.py:106-119, inference.py:214-225).  gitax keeps that
rank/world contract for host-level row sharding (runtime.pipeline) and
adds the real thing for SPMD programs: `jax.distributed` initialization
over ICI/DCN, so a multi-host mesh behaves as one device grid.
"""

from __future__ import annotations

import logging
import os


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / WORLD_SIZE+RANK, or the TPU metadata that
    jax discovers automatically on Cloud TPU pods).  Safe to call when
    single-process: becomes a no-op."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    # honor the SAME env surface as common.get_mpi_rank/get_mpi_size
    # (RANK/WORLD_SIZE and the OMPI_COMM_WORLD_* variables mpirun sets —
    # the reference's documented launcher, README.md:121); reading only
    # WORLD_SIZE would silently skip setup under mpirun
    if num_processes is None:
        num_processes = _int_env("WORLD_SIZE") or _int_env(
            "OMPI_COMM_WORLD_SIZE"
        )
    if process_id is None:
        process_id = _int_env("RANK")
        if process_id is None:
            process_id = _int_env("OMPI_COMM_WORLD_RANK")
    if coordinator_address is None and num_processes in (None, 1):
        logging.info("single-process run; skipping jax.distributed")
        return False
    if num_processes is not None and process_id is None:
        raise ValueError(
            "world size {} given but no rank (set RANK or "
            "OMPI_COMM_WORLD_RANK)".format(num_processes)
        )
    _maybe_set_cpu_collectives(jax)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logging.info(
        "jax.distributed up: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def _maybe_set_cpu_collectives(jax):
    """Default the CPU collectives implementation to gloo, respecting a
    user choice.

    Multi-process CPU needs a cross-process collectives client (jax
    ships gloo); without it each process keeps a LOCAL-only cpu client
    and process_count() silently stays 1 — every rank then reports
    rank 0 and processes ALL rows.  TPU backends ignore the knob
    (collectives ride ICI/DCN via the TPU runtime), so setting it is
    always safe.  Applies whenever the user hasn't chosen an
    implementation (env var or jax.config) — NOT only when
    JAX_PLATFORMS names cpu explicitly: a CPU-only host resolves to cpu
    with the env unset.  Returns the implementation in effect (or None
    when the knob doesn't exist on this jax version)."""
    env = os.environ.get("JAX_CPU_COLLECTIVES_IMPLEMENTATION")
    if env:
        return env
    try:
        cur = jax.config.jax_cpu_collectives_implementation
    except AttributeError:  # knob absent on this jax version
        logging.info("jax_cpu_collectives_implementation unavailable")
        return None
    if cur in (None, "", "none"):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
            return "gloo"
        except Exception as e:  # noqa: BLE001 — TPU-only builds
            logging.info("cpu collectives config skipped: %r", e)
    return cur


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def local_batch_slice(global_batch: int):
    """This process's slice of a globally-sharded batch, matching the
    contiguous ceil-split the TSV pipeline uses (inference.py:165-169)."""
    import jax

    from .pipeline import shard_range

    return shard_range(global_batch, jax.process_index(), jax.process_count())


def is_active():
    """True iff jax.distributed is initialized with >1 process — i.e.
    the cross-process barrier below is a REAL collective, not a no-op."""
    import jax

    try:
        if not jax.distributed.is_initialized():
            return False
    except AttributeError:  # older jax: probe the client directly
        from jax._src.distributed import global_state

        if global_state.client is None:
            return False
    return jax.process_count() > 1


def barrier(name="gitax_barrier"):
    """Cross-process sync; replaces the reference's poll-the-filesystem
    barrier when jax.distributed is initialized."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
