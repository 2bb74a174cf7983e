"""Serving-endpoint benchmark: the DynamicBatcher under concurrent load.

Drives `runtime.serving.DynamicBatcher` (the engine behind
`python -m gitax.serve`) with C concurrent closed-loop clients on the
real chip — GIT_LARGE beam-4 production mode (bf16 + int8 + decode
kernel), EOS-gated random init so decode lengths match trained COCO
checkpoints (~13 tokens).  Reports per-concurrency throughput, latency
percentiles, and the batch-size histogram the batcher actually formed
(the whole point: concurrency should convert into device batching).

Clients submit preprocessed arrays (`submit_array`), isolating the
batcher + device path — jpeg decode costs are the e2e bench's job
(this 1-vCPU container would swamp them over the measurement).

Usage: python tools/bench_serving.py [concurrency ...]   (default 1 4 16 32 64)

Measured numbers live in DESIGN.md §6 (serving row).
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gitax_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_model  # noqa: E402
from gitax.decode import BeamSearchConfig  # noqa: E402
from gitax.preprocess.transforms import TestTransform  # noqa: E402
from gitax.runtime import CaptionEngine  # noqa: E402
from gitax.runtime.serving import DynamicBatcher  # noqa: E402
from gitax.tokenization import BertTokenizer, build_tiny_vocab  # noqa: E402

SECONDS = float(os.environ.get("GITAX_SERVE_BENCH_SECONDS", "8"))
MAX_STEPS = int(os.environ.get("GITAX_BENCH_STEPS", "24"))


def run_level(batcher, images, concurrency, seconds):
    """Closed-loop clients: each waits for its caption, then submits the
    next request immediately."""
    stop = time.time() + seconds
    lats = [[] for _ in range(concurrency)]

    def client(i):
        rng = np.random.RandomState(i)
        while time.time() < stop:
            img = images[rng.randint(len(images))]
            t0 = time.time()
            batcher.submit_array(img, [101]).result(timeout=120)
            lats[i].append(time.time() - t0)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(concurrency)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    flat = np.array(sorted(x for l in lats for x in l))
    return {
        "concurrency": concurrency,
        "req_per_s": round(len(flat) / dt, 1),
        "p50_ms": round(1000 * float(np.percentile(flat, 50)), 1),
        "p99_ms": round(1000 * float(np.percentile(flat, 99)), 1),
        "n": len(flat),
    }


MAX_BATCH = int(os.environ.get("GITAX_SERVE_BENCH_MAX_BATCH", "32"))


def main():
    # C > MAX_BATCH levels exercise the dispatch/resolve overlap: two
    # batches in flight, upload of batch N+1 hidden under batch N
    levels = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 32, 64]
    model, params = build_model()
    tok = BertTokenizer(build_tiny_vocab())
    engine = CaptionEngine(
        model, params, tok, TestTransform(crop_size=224),
        batch_size=MAX_BATCH,
        beam=BeamSearchConfig(num_beams=4, max_steps=MAX_STEPS),
        dtype=jnp.bfloat16, fast_prefill=True,  # params arrive pre-quantized
    )
    rng = np.random.RandomState(0)
    # uint8 HWC — what the jpeg decode path actually hands the batcher;
    # normalization fuses on device and the host->device transfer is 4x
    # smaller than float (it rides this environment's relay tunnel)
    images = [rng.randint(0, 255, (224, 224, 3), np.uint8) for _ in range(8)]

    # compile every bucket shape once, outside all timing (jit caches by
    # batch shape; the batcher alone can't deterministically form each)
    probe = DynamicBatcher(engine, max_batch=MAX_BATCH, max_wait_ms=1.0)
    buckets = probe.buckets
    probe.close()
    fn = engine._caption_fn(1, (224, 224))
    for b in buckets:
        batch = jnp.asarray(np.stack(images[:1] * b))
        seqs, _ = fn(engine.params, batch, jnp.full((b, 1), 101, jnp.int32))
        np.asarray(seqs)

    for c in levels:
        batcher = DynamicBatcher(engine, max_batch=MAX_BATCH, max_wait_ms=4.0)
        r = run_level(batcher, images, c, SECONDS)
        r["batch_size_hist"] = batcher.stats.snapshot()["batch_size_hist"]
        batcher.close()
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
