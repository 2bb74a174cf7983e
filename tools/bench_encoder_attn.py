"""Microbench: encoder attention core at GIT shapes (B=32, H=16, S=257,
Dh=64, bf16) — XLA (activation-dtype softmax, the production default)
vs the Pallas fused kernel.  Prints per-layer-equivalent times.

Usage: python tools/bench_encoder_attn.py [S ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gitax_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gitax.ops.flash_attention import fused_attention  # noqa: E402

B, H, DH = 32, 16, 64
ITERS = 50


def xla_attn(q, k, v):
    scale = 1.0 / (DH ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    p = jax.nn.softmax(s, axis=-1)  # activation dtype (fast mode)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(out[0, 0, 0])
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out[0, 0, 0])
    return (time.time() - t0) / ITERS * 1e3  # ms


def main():
    seqs = [int(a) for a in sys.argv[1:]] or [257]
    rng = np.random.RandomState(0)
    for S in seqs:
        q = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16) * 0.3
        k = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16) * 0.3
        v = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16) * 0.3
        t_xla = timeit(jax.jit(xla_attn), q, k, v)
        t_ker = timeit(jax.jit(fused_attention), q, k, v)
        print(
            "S={}: xla {:.3f} ms  kernel {:.3f} ms (per call = per layer)".format(
                S, t_xla, t_ker
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
