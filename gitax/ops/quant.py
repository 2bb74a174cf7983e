"""Weight-only int8 quantization for the decode loop.

The GIT decode step is HBM-bandwidth-bound: every step re-reads the
decoder block weights (~85 MB for GIT_LARGE) and the tied vocab matrix
(~47 MB bf16) while doing comparatively few FLOPs (single-token step).
Storing those weights as int8 with per-output-channel scales halves the
bytes the MXU has to pull per step; the dequantize (convert + column
scale) fuses into the matmul.  Symmetric per-channel quantization:

    q = round(w / s) in [-127, 127],   s = max|w over in-axis| / 127
    y = (x @ q) * s + b

Activations stay bf16 and the embedding LOOKUP table stays full
precision (input-side embedding error would compound through the
layers); only matmul weights are quantized.  Opt-in: transform params
with `quantize_textual_for_decode` (the fp params are replaced, not
duplicated, except the tied word embedding which keeps its fp copy for
lookups).  No reference counterpart — the reference decodes in fp16
(train.py:270) with full-precision weights.
"""

from __future__ import annotations

import numpy as np


def quantize_linear(p: dict) -> dict:
    """{'kernel' [in,out], 'bias'?} -> {'kernel_q8', 'kernel_scale',
    'bias'?}.  Stacked kernels ([L, in, out]) quantize per (layer, out).

    Outputs are device arrays: feeding host numpy into a jitted step
    would re-upload the weights on EVERY call (catastrophic over the
    TPU relay — measured 8.5 s/step vs 13 ms)."""
    import jax.numpy as jnp

    w = np.asarray(p["kernel"], np.float32)
    s = np.max(np.abs(w), axis=-2, keepdims=True) / 127.0
    s = np.maximum(s, 1e-12)
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    out = {
        "kernel_q8": jnp.asarray(q),
        "kernel_scale": jnp.asarray(np.squeeze(s, axis=-2)),
    }
    if "bias" in p:
        out["bias"] = jnp.asarray(p["bias"])
    return out


def quantize_textual_for_decode(textual: dict) -> dict:
    """Quantize the decoder block matmuls and the tied output head of a
    gitax textual params tree (see models/textual.py layout)."""
    blocks = textual["blocks"]
    new_blocks = {
        "attn": {
            "qkv": quantize_linear(blocks["attn"]["qkv"]),
            "out": quantize_linear(blocks["attn"]["out"]),
        },
        "attn_ln": blocks["attn_ln"],
        "mlp": {
            "intermediate": quantize_linear(blocks["mlp"]["intermediate"]),
            "output": quantize_linear(blocks["mlp"]["output"]),
        },
        "mlp_ln": blocks["mlp_ln"],
    }
    words = np.asarray(textual["embedding"]["words"], np.float32)  # [V, D]
    s = np.max(np.abs(words), axis=1, keepdims=True) / 127.0
    s = np.maximum(s, 1e-12)
    q = np.clip(np.round(words / s), -127, 127).astype(np.int8)
    import jax.numpy as jnp

    new = dict(textual)
    new["blocks"] = new_blocks
    # output head reads int8 (stored pre-transposed [D, V] so no runtime
    # int8 transpose); embedding lookups keep the fp table
    new["output_words_q8_t"] = jnp.asarray(q.T)
    new["output_words_scale"] = jnp.asarray(s[:, 0])
    return new


def quantize_linear_dyn(p: dict) -> dict:
    """Like quantize_linear but tagged for the w8a8 path: at run time the
    activations are ALSO quantized (per-token dynamic scales) so the
    matmul runs int8 x int8 on the MXU at ~1.7x the bf16 rate (v5e,
    measured).  Use for compute-bound GEMMs (the image encoder); the
    weight-only tag is for bandwidth-bound ones (the decode loop)."""
    q = quantize_linear(p)
    q["kernel_q8_dyn"] = q.pop("kernel_q8")
    return q


def quantize_vit_for_inference(vit: dict) -> dict:
    """Quantize the ViT encoder's transformer GEMMs (qkv/out/c_fc/c_proj,
    stacked [L, in, out]) for w8a8 inference.  Patchify, embeddings, LN,
    and the attention einsums stay in the activation dtype: they are a
    tiny fraction of encoder time and (for LN/softmax) parity-critical.
    No reference counterpart — the reference serves fp16 (train.py:270)."""
    blocks = vit["blocks"]
    new = dict(vit)
    new["blocks"] = {
        "ln_1": blocks["ln_1"],
        "attn": {
            "qkv": quantize_linear_dyn(blocks["attn"]["qkv"]),
            "out": quantize_linear_dyn(blocks["attn"]["out"]),
        },
        "ln_2": blocks["ln_2"],
        "mlp": {
            "c_fc": quantize_linear_dyn(blocks["mlp"]["c_fc"]),
            "c_proj": quantize_linear_dyn(blocks["mlp"]["c_proj"]),
        },
    }
    return new


def quantize_git_params(params: dict, encoder: bool = False) -> dict:
    """Whole-model convenience: quantize the textual tower for decoding
    (weight-only — the decode loop is bandwidth-bound).  encoder=True
    additionally puts the image encoder's GEMMs on the w8a8 path (the
    encoder is compute-bound, so it needs the int8 MXU rate, which
    requires both operands int8)."""
    new = dict(params)
    new["textual"] = quantize_textual_for_decode(params["textual"])
    if encoder and "image_encoder" in new:
        new["image_encoder"] = quantize_vit_for_inference(new["image_encoder"])
    return new
