"""Headline benchmark: GIT_LARGE COCO-caption inference throughput.

Runs the production path on one chip: batched images -> ViT-L/14 encode
-> beam-4 device-side search (BeamSearchConfig defaults modulo a
realistic 20-step decode cap; COCO captions are ~10-12 tokens) in bf16
with f32 softmax/logits.  Prints ONE JSON line.

Baseline: the driver's north star is >1000 images/s on a v5e-8 with the
reference at B=1-per-forward over 8 GPUs (BASELINE.md); per-chip target
is 125 images/s -> vs_baseline = value / 125.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gitax_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gitax.decode import BeamSearchConfig
from gitax.models import GitModel
from gitax.models.config import get_model_param

BATCH = int(os.environ.get("GITAX_BENCH_BATCH", "32"))
MAX_STEPS = int(os.environ.get("GITAX_BENCH_STEPS", "20"))
ITERS = int(os.environ.get("GITAX_BENCH_ITERS", "3"))


def main():
    import dataclasses

    model = GitModel.from_param(get_model_param("GIT_LARGE_COCO"))
    # production speed mode: activation-dtype softmax in the encoder
    # (~15% faster ViT-L encode; decoder score math stays f32)
    model.cfg = dataclasses.replace(
        model.cfg, encoder=dataclasses.replace(model.cfg.encoder, fast_softmax=True)
    )
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    beam = BeamSearchConfig(num_beams=4, max_steps=MAX_STEPS)

    @jax.jit
    def caption(params, images):
        return model.generate(params, images, beam=beam, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(BATCH, 224, 224, 3), jnp.bfloat16)

    # warmup / compile (np.asarray forces a real device sync; the axon
    # relay does not reliably block in block_until_ready)
    seqs, _ = caption(params, images)
    np.asarray(seqs)

    t0 = time.time()
    for _ in range(ITERS):
        seqs, _ = caption(params, images)
    np.asarray(seqs)
    dt = time.time() - t0
    ips = BATCH * ITERS / dt

    print(
        json.dumps(
            {
                "metric": "GIT_LARGE COCO caption inference (beam-4, bf16, B={})".format(
                    BATCH
                ),
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / 125.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
