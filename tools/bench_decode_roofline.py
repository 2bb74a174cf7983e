"""Decode-loop roofline: close the op/DMA budget for the headline beam loop.

The encoder has a real MFU argument (DESIGN.md section 4: ~68% MFU,
near roofline).  This tool gives the beam loop the same rigor
(VERDICT r3 next #3):

  1. per-step cost by the max_steps-delta method (an OLS fit of
     whole-generate time over several fixed decode lengths — slope =
     ms/step, intercept = encoder + prefill + relay dispatch; the delta
     cancels the ~14 ms per-call relay overhead),
  2. the step's static op budget: number of dispatched instructions in
     the compiled while-loop BODY computation, read from the optimized
     HLO (each non-fused instruction is one device thunk launch),
  3. the measured per-op launch floor on THIS backend (a 512-iteration
     scalar while loop: nothing to compute, pure loop + launch
     machinery),
  4. the analytic DMA floor: bytes every step must stream from HBM
     (int8 decoder weights + vocab matrix, int8 memory K/V re-read,
     bf16 text-cache re-read, logits write) against the v5e
     ~819 GB/s HBM peak,
  5. whole-generate MFU from XLA's own cost model
     (compiled.cost_analysis()['flops']) — NOTE round 5: the cost model
     counts scan/while bodies once, so this undercounts ~7x (analytic
     correction in DESIGN section 4); the loop remains
     launch+bandwidth bound either way,
  6. a batch sweep (B = 32/64/128, headline EOS-gated early-exit
     protocol) — per-step launch overhead is batch-invariant, so
     throughput amortizes it linearly until the DMA term dominates.

  7. `vk`: A/B of the fused vocab-projection kernel (ops/vocab_topk.py)
     — the "beam bookkeeping into the kernel epilogue" lever; measured
     NEGATIVE round 5 (0.699->0.771 ms/step, body 350->373 instrs,
     tokens equal), see DESIGN section 4's retirement note.

Prints one JSON line per section.  Usage:
    python tools/bench_decode_roofline.py [fit|ops|floor|dma|mfu|sweep|vk|all]
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gitax_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_model  # noqa: E402
from gitax.decode import BeamSearchConfig  # noqa: E402
from gitax.models import GitModel  # noqa: E402
from gitax.models.config import get_model_param  # noqa: E402
from gitax.ops.flash_attention import use_pallas  # noqa: E402

BATCH = int(os.environ.get("GITAX_BENCH_BATCH", "32"))
ITERS = int(os.environ.get("GITAX_BENCH_ITERS", "10"))
HBM_GBPS = 819.0  # v5e HBM peak
BF16_TFLOPS = 197.0  # v5e bf16 peak


def _ungated_model():
    """Headline model/params WITHOUT the EOS gate: beams never finish,
    so max_steps is the exact decode length — the fit needs that."""
    import dataclasses

    from gitax.ops.quant import quantize_git_params

    model = GitModel.from_param(get_model_param("GIT_LARGE_COCO"))
    model.cfg = dataclasses.replace(
        model.cfg,
        encoder=dataclasses.replace(model.cfg.encoder, fast_softmax=True),
    )
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    return model, quantize_git_params(params)


def _caption_fn(model, max_steps, decode_kernel, vocab_kernel=False):
    beam = BeamSearchConfig(num_beams=4, max_steps=max_steps)

    @jax.jit
    def fn(params, images):
        return model.generate(
            params, images, beam=beam, dtype=jnp.bfloat16, fast_prefill=True,
            decode_kernel=decode_kernel, vocab_kernel=vocab_kernel,
        )

    return fn


def _time(fn, params, images, iters=ITERS):
    seqs, _ = fn(params, images)
    np.asarray(seqs)
    t0 = time.time()
    for _ in range(iters):
        seqs, _ = fn(params, images)
    np.asarray(seqs)
    return (time.time() - t0) / iters


def fit_per_step(batch=BATCH):
    """OLS fit: generate time vs decode length (ungated, loop runs to
    max_steps).  slope = per-step cost; intercept = enc+prefill+dispatch."""
    model, params = _ungated_model()
    kern = use_pallas()
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, 224, 224, 3), jnp.bfloat16)
    lens = [8, 16, 24, 32]
    ts = []
    for s in lens:
        ts.append(_time(_caption_fn(model, s, kern), params, images))
    x = np.asarray(lens, np.float64)
    y = np.asarray(ts, np.float64) * 1e3  # ms
    slope, intercept = np.polyfit(x, y, 1)
    resid = y - (slope * x + intercept)
    return {
        "section": "per_step_fit",
        "batch": batch,
        "decode_lens": lens,
        "total_ms": [round(v, 2) for v in y],
        "ms_per_step": round(float(slope), 4),
        "intercept_ms_enc_prefill_dispatch": round(float(intercept), 2),
        "max_fit_residual_ms": round(float(np.abs(resid).max()), 3),
    }


def count_body_ops(batch=BATCH, vocab_kernel=False):
    """Static op budget: instructions in the compiled while-loop body.

    Every instruction in the body computation of the optimized HLO is
    one device thunk per step (fusions count as one).  Excludes
    zero-cost bookkeeping (parameter/constant/tuple plumbing)."""
    model, params = _ungated_model()
    kern = use_pallas()
    beam = BeamSearchConfig(num_beams=4, max_steps=24)

    def gen(params, images):
        return model.generate(
            params, images, beam=beam, dtype=jnp.bfloat16, fast_prefill=True,
            decode_kernel=kern, vocab_kernel=vocab_kernel,
        )

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, 224, 224, 3), jnp.bfloat16)
    txt = jax.jit(gen).lower(params, images).compile().as_text()
    # the module holds several while loops (ViT layer scan, prefill
    # scan, beam loop); the beam body is the one whose instructions
    # carry decode/beam source metadata
    lines = None
    for m in re.finditer(r"body=%?([\w.\-]+)", txt):
        block = re.search(
            r"^%?" + re.escape(m.group(1)) + r" [^\n]*\{\n(.*?)^\}",
            txt, re.S | re.M,
        )
        if block and ("decode/beam.py" in block.group(1)
                      or "beam_search" in block.group(1)):
            lines = block.group(1).splitlines()
            break
    if lines is None:
        return {"section": "op_budget", "error": "no beam while body found"}
    free = ("parameter(", "constant(", "tuple(", "get-tuple-element(",
            "bitcast(", "after-all(")
    ops = {}
    n_dispatch = 0
    for ln in lines:
        if " = " not in ln:
            continue
        if any(f in ln for f in free):
            continue
        opname = ln.split(" = ", 1)[1]
        # "bf16[...]{layout:T(8,128)} fusion(...)" -> fusion; the type's
        # tile annotation contains parens, so require whitespace between
        # the type chunk and the opcode
        om = re.search(r"[\]\})]\s+([a-z][\w\-\.]*)\(", opname)
        kind = om.group(1) if om else "other"
        ops[kind] = ops.get(kind, 0) + 1
        n_dispatch += 1
    return {
        "section": "op_budget",
        "batch": batch,
        "body_instructions": n_dispatch,
        "by_kind": dict(sorted(ops.items(), key=lambda kv: -kv[1])),
    }


def launch_floor():
    """Per-iteration cost of a compute-free device while loop: the
    backend's loop + thunk-launch machinery with ONE trivial fusion."""
    n = 512

    @jax.jit
    def spin(x):
        return jax.lax.fori_loop(0, n, lambda i, v: v + 1.0, x)

    x = jnp.float32(0.0)
    float(spin(x))
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        r = spin(x)
    float(r)
    per_iter_us = (time.time() - t0) / reps / n * 1e6
    return {
        "section": "launch_floor",
        "iters": n,
        "us_per_trivial_iteration": round(per_iter_us, 2),
    }


def dma_budget(batch=BATCH):
    """Analytic bytes/step the loop must stream from HBM (GIT_LARGE:
    L=6 d=768 H=12 Dh=64 V=30522, M8=264, beam K=4, T_max=24)."""
    L, d, H, Dh, V = 6, 768, 12, 64, 30522
    M8, K, Tmax = 264, 4, 24
    B, BK = batch, batch * 4
    ffn = 4 * d
    w_layer = d * 3 * d + d * d + 2 * d * ffn  # qkv + out + ffn in/out, int8
    weights = L * w_layer  # int8 bytes
    vocab = V * d  # int8 bytes (tied output head, q8 transpose)
    mem_kv = L * B * H * M8 * 2 * Dh  # int8 bytes, re-read per step
    txt_kv = L * Tmax * BK * H * 2 * Dh * 2  # bf16 bytes, re-read per step
    logits_w = BK * V * 2  # bf16 write (+ the topk/logsumexp re-reads)
    logits_rw = 2 * BK * V * 2  # blocked-topk ~1 read + logsumexp 1 read
    total = weights + vocab + mem_kv + txt_kv + logits_w + logits_rw
    return {
        "section": "dma_budget",
        "batch": batch,
        "bytes_per_step": {
            "decoder_weights_int8": weights,
            "vocab_matrix_int8": vocab,
            "memory_kv_int8_reread": mem_kv,
            "text_cache_bf16_reread": txt_kv,
            "logits_write_bf16": logits_w,
            "logits_rereads_bf16": logits_rw,
            "total_MB": round(total / 1e6, 1),
        },
        "hbm_floor_us_per_step": round(total / (HBM_GBPS * 1e3), 1),
    }


def whole_generate_mfu(batch=BATCH):
    """XLA cost-model FLOPs of the full headline program / measured time
    / bf16 peak.

    CAVEAT (round 5): the HLO cost model counts a `lax.scan`/while BODY
    once — verified against a bare matmul (exact) vs the scanned train
    step (7x undercount) — so this number misses ~23/24 of the encoder
    layers and all but one decode iteration.  Analytic 2-MACs counting
    puts whole-generate at ~50% MFU (encoder-dominated) and the decode
    loop at ~12%; see DESIGN section 4/5.  The section is kept for
    round-over-round comparability of the raw cost-model number."""
    model, params = build_model()
    kern = use_pallas()
    fn = _caption_fn(model, 24, kern)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, 224, 224, 3), jnp.bfloat16)
    t = _time(fn, params, images)
    flops = None
    try:
        beam = BeamSearchConfig(num_beams=4, max_steps=24)

        def gen(p, im):
            return model.generate(
                p, im, beam=beam, dtype=jnp.bfloat16, fast_prefill=True,
                decode_kernel=kern,
            )

        ca = jax.jit(gen).lower(params, images).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:  # noqa: BLE001 — cost model optional per backend
        flops = None
        print("cost_analysis unavailable: {!r}".format(e), file=sys.stderr)
    out = {
        "section": "whole_generate_mfu",
        "batch": batch,
        "time_ms": round(t * 1e3, 2),
        "img_per_s": round(batch / t, 1),
    }
    if flops:
        out["xla_cost_model_gflops"] = round(flops / 1e9, 1)
        out["mfu_pct"] = round(flops / t / (BF16_TFLOPS * 1e12) * 100, 2)
    return out


def batch_sweep():
    """Headline protocol (EOS-gated early exit) across batch sizes: the
    per-step launch overhead is batch-invariant, so img/s amortizes it
    with B until the DMA term (linear in B) dominates."""
    model, params = build_model()
    kern = use_pallas()
    fn = _caption_fn(model, 24, kern)
    rng = np.random.RandomState(0)
    rows = []
    for b in (16, 32, 64, 128):
        images = jnp.asarray(rng.randn(b, 224, 224, 3), jnp.bfloat16)
        t = _time(fn, params, images)
        rows.append({"batch": b, "time_ms": round(t * 1e3, 2),
                     "img_per_s": round(b / t, 1)})
    return {"section": "batch_sweep_eos_gated", "rows": rows}


def vocab_kernel_ab(batch=BATCH):
    """A/B of the fused vocab-projection kernel (ops/vocab_topk.py — the
    "beam bookkeeping into the kernel epilogue" lever from DESIGN §4):

      * per-step OLS fit with the kernel OFF vs ON (ungated, decode
        lengths 8..32) + token equality asserted at every length,
      * headline EOS-gated throughput, interleaved OFF/ON/OFF/ON passes
        on the same params/images (cancels chip-state drift),
      * while-body instruction count OFF vs ON.
    """
    model, params = _ungated_model()
    kern = use_pallas()
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, 224, 224, 3), jnp.bfloat16)
    lens = [8, 16, 24, 32]
    fits = {}
    tokens_equal = True
    off_outs = {}  # reference tokens per length, from the OFF pass
    for vk in (False, True):
        ts = []
        for s in lens:
            fn = _caption_fn(model, s, kern, vocab_kernel=vk)
            ts.append(_time(fn, params, images))
            if vk:
                b, _ = fn(params, images)
                tokens_equal &= bool(np.array_equal(off_outs[s],
                                                    np.asarray(b)))
            else:
                a, _ = fn(params, images)
                off_outs[s] = np.asarray(a)
        x = np.asarray(lens, np.float64)
        y = np.asarray(ts, np.float64) * 1e3
        slope, intercept = np.polyfit(x, y, 1)
        fits["on" if vk else "off"] = {
            "total_ms": [round(v, 2) for v in y],
            "ms_per_step": round(float(slope), 4),
            "intercept_ms": round(float(intercept), 2),
        }

    # headline protocol, interleaved
    hmodel, hparams = build_model()
    # the kernel silently gates off without the int8 head
    # (GITAX_BENCH_INT8=0 would make this an off-vs-off non-A/B)
    assert "output_words_q8_t" in hparams["textual"], (
        "headline A/B needs the int8 head; unset GITAX_BENCH_INT8=0"
    )
    fn_off = _caption_fn(hmodel, 24, kern, vocab_kernel=False)
    fn_on = _caption_fn(hmodel, 24, kern, vocab_kernel=True)
    head = {"img_per_s_off": [], "img_per_s_on": []}
    a, _ = fn_off(hparams, images)
    b, _ = fn_on(hparams, images)  # warm both
    head_tokens_equal = bool(np.array_equal(np.asarray(a), np.asarray(b)))
    for _ in range(2):
        for key, fn in (("off", fn_off), ("on", fn_on)):
            t = _time(fn, hparams, images)
            head["img_per_s_" + key].append(round(batch / t, 1))

    ops_off = count_body_ops(batch, vocab_kernel=False)
    ops_on = count_body_ops(batch, vocab_kernel=True)
    return {
        "section": "vocab_kernel_ab",
        "batch": batch,
        "per_step_fit": fits,
        "ungated_tokens_equal": tokens_equal,
        "headline_eos_gated": head,
        "headline_tokens_equal": head_tokens_equal,
        "body_instructions": {
            "off": ops_off.get("body_instructions"),
            "on": ops_on.get("body_instructions"),
        },
    }


SECTIONS = {
    "fit": fit_per_step,
    "ops": count_body_ops,
    "floor": launch_floor,
    "dma": dma_budget,
    "mfu": whole_generate_mfu,
    "sweep": batch_sweep,
    "vk": vocab_kernel_ab,
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(SECTIONS) if which == "all" else [which]
    for name in names:
        print(json.dumps(SECTIONS[name]()), flush=True)


if __name__ == "__main__":
    main()
