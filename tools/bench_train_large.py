"""GIT_LARGE training throughput + ZeRO-1 optimizer-memory accounting.

DESIGN.md's training table was GIT_BASE-shaped only (reference
train.py:246-303 protocol); this measures the other published model
size (VERDICT r3 next #8):

  * `speed` (real chip): fwd+bwd images/s for GIT_LARGE at B=32 (and
    optionally B=64 with encoder remat), same protocol as
    gitax.train.speed_test_forward_backward — bf16 compute,
    compute-dtype score math, adamw, synthetic COCO-caption batch.
    GIT_BASE B=64 runs first as the round-over-round sanity row.
    Round 5: each row also reports TFLOP/step + MFU from the exact
    analytic 2·MACs counter (`_analytic_step_flops` — XLA's
    cost_analysis undercounts scanned layers, see its docstring), the
    hardware utilization counting remat recompute as work, and the
    recompute-tax percentage for remat rows.
  * `memory` (8-device CPU mesh, no TPU needed): per-device bytes of
    the Adam moments under (a) replicated moments and (b)
    gitax.parallel.zero1_shard_opt_state — read off the actual sharded
    arrays' addressable shards, not estimated — plus XLA's
    memory_analysis of the compiled train step where the backend
    exposes it.

Usage: python tools/bench_train_large.py [speed|memory|all]
Env: GITAX_TRAIN_BENCH_ITERS (default 30)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get("GITAX_TRAIN_BENCH_ITERS", "30"))
BF16_TFLOPS = 197.0  # v5e bf16 peak (same constant as bench_decode_roofline)


def _batch(bsz, tokens=16, crop=160):
    # crop 160 = the reference training protocol's iteration-0
    # multi-scale size (train.py:186-207 schedule starts at
    # min_size_range32[0]=160); the recorded GIT_BASE 814 img/s row
    # measures exactly that shape
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    toks = np.full((bsz, tokens), 1000, np.int32)
    toks[:, 0] = 101
    toks[:, -1] = 102
    need = np.ones((bsz, tokens), np.int32)
    need[:, 0] = 0
    return {
        "image": jnp.asarray(rng.randn(bsz, crop, crop, 3), jnp.bfloat16),
        "caption_tokens": jnp.asarray(toks),
        "need_predict": jnp.asarray(need),
    }


def _analytic_step_flops(cfg, bsz, crop, text_len=16, remat=False):
    """Exact model FLOPs (2·MACs) of one fwd+bwd train step.

    XLA's compiled cost_analysis UNDERCOUNTS here — both towers run
    their layers inside `lax.scan`, and the HLO cost model counts a loop
    body once (verified: GIT_BASE B=64 reports 0.80 TFLOP vs 5.5
    analytic) — so MFU uses this counter, the same 2·MACs convention as
    DESIGN §4's high-res roofline.  bwd = 2x fwd (standard dense-layer
    accounting); per-block encoder remat re-runs the encoder forward
    once more inside the backward.  Returns (executed_flops,
    useful_flops) — they differ only by the remat recompute.
    """
    e = cfg.encoder
    s = (crop // e.patch_size) ** 2 + 1
    d, ff = e.width, 4 * e.width
    enc = 2 * bsz * e.layers * s * (4 * d * d + 2 * s * d + 2 * d * ff)
    enc += 2 * bsz * (s - 1) * d * (e.patch_size ** 2 * 3)  # patchify
    s2 = s + text_len  # unified decoder runs memory+text jointly
    d2, ff2 = cfg.hidden_size, cfg.feedforward_size
    dec = 2 * bsz * cfg.num_layers * s2 * (
        4 * d2 * d2 + 2 * s2 * d2 + 2 * d2 * ff2
    )
    dec += 2 * bsz * s * cfg.visual_feature_size * d2  # visual projection
    head = 2 * bsz * text_len * d2 * cfg.vocab_size
    fwd = enc + dec + head
    useful = 3 * fwd
    executed = useful + (enc if remat else 0)
    return executed, useful


def _speed_row(model_name, bsz, remat=False, crop=160):
    import jax
    import jax.numpy as jnp
    import optax

    from gitax.models import GitModel
    from gitax.models.config import get_model_param
    from gitax.training import init_train_state, make_train_step

    model = GitModel.from_param(
        get_model_param(model_name) if model_name != "GIT_BASE" else {}
    )
    tx = optax.adamw(1e-5)
    state = init_train_state(model, jax.random.PRNGKey(0), tx)
    # donate the state like the real trainer (finetune.py) — without
    # donation XLA holds argument AND output copies of the f32
    # params+moments (~9.4 GB for GIT_LARGE), which alone OOMs the chip
    step = jax.jit(make_train_step(model, tx, dtype=jnp.bfloat16,
                                   fast_softmax=True, remat=remat),
                   donate_argnums=(0,))
    batch = _batch(bsz, crop=crop)
    for _ in range(2):
        state, metrics = step(state, batch)
    float(metrics["loss"])  # device sync (relay-safe)
    t0 = time.time()
    for _ in range(ITERS):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = time.time() - t0
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params)
    )
    executed, useful = _analytic_step_flops(model.cfg, bsz, crop,
                                            remat=remat)
    step_s = dt / ITERS
    peak = BF16_TFLOPS * 1e12
    row = {
        "model": model_name,
        "batch": bsz,
        "crop": crop,
        "remat": remat,
        "img_per_s": round(bsz * ITERS / dt, 1),
        "step_ms": round(dt / ITERS * 1e3, 1),
        "params_M": round(n_params / 1e6, 1),
        "tflop_per_step": round(useful / 1e12, 2),
        # useful model flops / time (the standard MFU definition) and
        # the hardware view counting the remat recompute as work
        "mfu_pct": round(useful / step_s / peak * 100, 1),
        "hw_flop_util_pct": round(executed / step_s / peak * 100, 1),
    }
    if remat:
        row["recompute_tax_pct"] = round(
            (executed - useful) / executed * 100, 1
        )
    return row


def speed():
    configs = [
        ("GIT_BASE", 64, False, 160),  # sanity vs the recorded ~814 img/s
        # GIT_LARGE's ViT-L/14 wants /14 crops: 168 is the schedule
        # analog of the /16 models' iteration-0 size 160
        ("GIT_LARGE", 16, False, 168),  # remat-cost comparison point
        ("GIT_LARGE", 32, False, 168),
        ("GIT_LARGE", 32, True, 168),
        ("GIT_LARGE", 64, True, 168),
        # peak-shape row: a fixed 224 crop (the schedule's max size);
        # GIT_BASE B=64 at 224 OOMs WITHOUT remat on 16 GB (measured:
        # 14.76 GB of HLO temp), so remat is on
        ("GIT_LARGE", 32, True, 224),
    ]
    rows = []
    for name, bsz, remat, crop in configs:
        try:
            rows.append(_speed_row(name, bsz, remat=remat, crop=crop))
        except Exception as e:  # noqa: BLE001 — a row OOMing is a datum
            rows.append({"model": name, "batch": bsz, "remat": remat,
                         "crop": crop, "error": str(e)[:200]})
        print(json.dumps({"row": rows[-1]}), file=sys.stderr, flush=True)
    return {"section": "train_speed_fwd_bwd", "iters": ITERS, "rows": rows}


def _per_device_bytes(tree):
    import jax

    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            total += leaf.addressable_shards[0].data.nbytes
        else:
            total += leaf.nbytes
    return total


def memory():
    import jax

    # the axon sitecustomize pins the platform at interpreter startup;
    # JAX_PLATFORMS=cpu alone does not win (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    import optax

    from gitax.models import GitModel
    from gitax.models.config import get_model_param
    from gitax.parallel import make_mesh, shard_params, zero1_shard_opt_state
    from gitax.training.trainer import TrainState, init_train_state, \
        make_train_step

    assert jax.default_backend() == "cpu" or len(jax.devices()) >= 8, (
        "memory section wants the 8-device CPU mesh; run with "
        "JAX_PLATFORMS=cpu")
    model = GitModel.from_param(get_model_param("GIT_LARGE"))
    tx = optax.adamw(1e-5)
    state = init_train_state(model, jax.random.PRNGKey(0), tx)
    mesh = make_mesh(data=8, model=1)
    params = shard_params(state.params, mesh)
    repl_bytes = _per_device_bytes(state.opt_state)
    z_opt = zero1_shard_opt_state(tx.init(params), params, mesh)
    z_bytes = _per_device_bytes(z_opt)
    out = {
        "section": "zero1_optimizer_memory",
        "mesh": "8x1 (data x model)",
        "adam_moments_per_device_MB": {
            "replicated": round(repl_bytes / 1e6, 1),
            "zero1": round(z_bytes / 1e6, 1),
            "ratio": round(repl_bytes / max(z_bytes, 1), 2),
        },
    }
    # XLA's own peak estimate for the compiled step, where exposed
    try:
        import jax.numpy as jnp
        from jax.sharding import NamedSharding

        from gitax.parallel import batch_partition_specs

        batch = _batch(8, crop=224)
        specs = batch_partition_specs(batch)
        sbatch = {
            k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in batch.items()
        }
        s_z = TrainState(step=state.step, params=params, opt_state=z_opt)
        step = jax.jit(make_train_step(model, tx, dtype=jnp.bfloat16,
                                       fast_softmax=True))
        with jax.sharding.set_mesh(mesh):
            ma = step.lower(s_z, sbatch).compile().memory_analysis()
        if ma is not None:
            out["xla_memory_analysis_MB"] = {
                "temp": round(ma.temp_size_in_bytes / 1e6, 1),
                "arguments": round(ma.argument_size_in_bytes / 1e6, 1),
                "output": round(ma.output_size_in_bytes / 1e6, 1),
            }
    except Exception as e:  # noqa: BLE001 — backend-optional
        out["xla_memory_analysis_MB"] = "unavailable: {!r}".format(e)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "all":
        # speed wants the TPU, memory wants an 8-device CPU mesh — one
        # process can't host both backends, so fan out
        import subprocess

        here = os.path.abspath(__file__)
        subprocess.run([sys.executable, here, "speed"], check=True)
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        subprocess.run([sys.executable, here, "memory"], env=env, check=True)
        return
    print(json.dumps(
        {"speed": speed, "memory": memory}[which]()
    ), flush=True)


if __name__ == "__main__":
    main()
