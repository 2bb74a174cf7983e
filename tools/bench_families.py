"""Long-memory family benchmark: high-res VQA (M=1201) and video (M=1542).

Measures full `generate` throughput in the production mode (bf16 +
weight-only int8 + fast prefill) with the decode loop on:
  * the XLA path (decode_kernel=False — ALSO what decode_kernel=True
    resolves to at these M: bf16 memories past the kernel's measured
    auto-enable crossover stay on XLA, see
    ops/decode_attention.kernel_pays)
  * the fused kernel with int8 memory (decode_kernel='int8' — halves
    the loop's dominant HBM stream, the per-step memory re-read;
    measured neutral on v5e, pays on bandwidth-poorer parts)

and asserts token equality across modes (same weights, bf16).

Round-3 measurements (v5e): high-res XLA 94.3 vs kernel-int8 94.3
img/s/chip; video XLA 83.5 vs kernel-int8 83.5 videos/s/chip — and the
bf16 streamed kernel measured 93.5 / 81.4 there, which is WHY the bf16
auto-enable stops at the crossover.

Usage: python tools/bench_families.py [highres|video|both]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gitax_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import eos_gate_params  # noqa: E402
from gitax.decode import BeamSearchConfig  # noqa: E402
from gitax.models import GitModel  # noqa: E402
from gitax.models.config import get_model_param  # noqa: E402

ITERS = int(os.environ.get("GITAX_BENCH_ITERS", "10"))
MAX_STEPS = int(os.environ.get("GITAX_BENCH_STEPS", "24"))


def build(name):
    import dataclasses

    from gitax.ops.quant import quantize_git_params

    model = GitModel.from_param(get_model_param(name))
    model.cfg = dataclasses.replace(
        model.cfg,
        encoder=dataclasses.replace(model.cfg.encoder, fast_softmax=True),
    )
    params = eos_gate_params(
        model.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )
    return model, quantize_git_params(params)


def run(model, params, images, decode_kernel, iters=ITERS):
    beam = BeamSearchConfig(num_beams=4, max_steps=MAX_STEPS)

    @jax.jit
    def fn(params, images):
        return model.generate(
            params, images, beam=beam, dtype=jnp.bfloat16, fast_prefill=True,
            decode_kernel=decode_kernel,
        )

    seqs, _ = fn(params, images)
    toks = np.asarray(seqs)
    t0 = time.time()
    for _ in range(iters):
        seqs, _ = fn(params, images)
    np.asarray(seqs)
    return images.shape[0] * iters / (time.time() - t0), toks


def family(name, images, label):
    model, params = build(name)
    out = {"family": label}
    ref_toks = None
    for mode, key in [(False, "xla"), ("int8", "kernel_int8")]:
        ips, toks = run(model, params, images, mode)
        out[key] = round(ips, 2)
        if ref_toks is None:
            ref_toks = toks
        else:
            equal = bool((toks == ref_toks).all())
            out[key + "_tokens_equal"] = equal
            # a token-parity regression must fail the run, not hide in
            # a JSON field
            assert equal, (label, key, "tokens diverged from XLA path")
    print(json.dumps(out), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    rng = np.random.RandomState(0)
    if which in ("highres", "both"):
        imgs = jnp.asarray(rng.randn(4, 420, 560, 3), jnp.bfloat16)
        family("GIT_LARGE_VQAv2", imgs, "high-res B=4 @ 560x420 (M=1201)")
    if which in ("video", "both"):
        vids = jnp.asarray(rng.randn(8, 6, 224, 224, 3), jnp.bfloat16)
        family("GIT_LARGE_VATEX", vids, "video B=8 x 6 frames (M=1542)")


if __name__ == "__main__":
    main()
