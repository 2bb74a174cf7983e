"""Shared functional NN primitives (pure jnp; params are nested dicts).

Kernel layout convention: linear kernels are stored ``[in, out]`` (the
XLA-friendly orientation; torch weights are transposed on import by
gitax.ckpt).  LayerNorm/softmax always accumulate in float32 so bf16
activation mode keeps parity-critical numerics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x, params, eps):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(dtype)


def linear(x, params):
    if "kernel_q8_dyn" in params:
        # w8a8 (gitax.ops.quant): per-token dynamic activation
        # quantization + int8 x int8 MXU matmul.  The v5e MXU runs int8
        # at ~1.7x its bf16 rate (measured 246 vs 144 TOPS at N=8192),
        # so compute-bound encoder GEMMs get faster, not just smaller.
        # Quant math in f32 (fuses into the elementwise loop; no HBM
        # cost), accumulate int32, rescale by row_scale * col_scale.
        y = _int8_dynamic_matmul(
            x, params["kernel_q8_dyn"], params["kernel_scale"]
        )
    elif "kernel_q8" in params:
        # weight-only int8 (gitax.ops.quant): int8 weights stream from
        # HBM; the convert fuses into the dot, the per-out-channel scale
        # applies post-matmul
        y = jnp.dot(
            x, params["kernel_q8"].astype(x.dtype), preferred_element_type=x.dtype
        )
        y = y * params["kernel_scale"].astype(x.dtype)
    else:
        y = jnp.dot(
            x, params["kernel"].astype(x.dtype), preferred_element_type=x.dtype
        )
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def _int8_dynamic_matmul(x, kernel_q8, kernel_scale):
    """x [..., K] (float) @ int8 kernel [K, N] with per-row dynamic
    activation scales: q_x = round(127 x / max|x|_row), y = (q_x @ q_w)
    * (row_scale * col_scale).  int32 accumulation on the MXU."""
    dtype = x.dtype
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    amax = jnp.max(jnp.abs(x2).astype(jnp.float32), axis=-1, keepdims=True)
    a_scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(
        jnp.round(x2.astype(jnp.float32) / a_scale), -127.0, 127.0
    ).astype(jnp.int8)
    y32 = jax.lax.dot_general(
        xq, kernel_q8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = y32.astype(jnp.float32) * a_scale * kernel_scale.astype(jnp.float32)
    return y.astype(dtype).reshape(*lead, kernel_q8.shape[-1])


def quick_gelu(x):
    """CLIP's QuickGELU: x * sigmoid(1.702 x) (CLIP/model.py:171-173)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_erf(x):
    """Exact-erf gelu — the decoder's activation
    (bert/activations.py:16-23; parity-relevant vs tanh approximations)."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


def split_heads(x, num_heads):
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def attention_weights(q, k, mask=None, fast=False):
    """softmax(q k^T / sqrt(d) + mask); f32 score math by default,
    activation-dtype when fast=True (encoder speed mode).

    q: [B,H,Tq,Dh], k: [B,H,Tk,Dh], mask: additive, broadcastable to
    [B,H,Tq,Tk] (0 = attend, -inf = blocked).
    """
    dh = q.shape[-1]
    acc = q.dtype if fast else jnp.float32
    scale = jnp.asarray(1.0 / (dh ** 0.5), acc)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=acc) * scale
    if mask is not None:
        scores = scores + mask.astype(acc)
    return jax.nn.softmax(scores, axis=-1)


def qkv_project(x, params, num_heads):
    """Fused qkv projection -> per-head q, k, v ([B,H,T,Dh] each)."""
    d = x.shape[-1]
    qkv = linear(x, params["qkv"])
    q, k, v = qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :]
    return tuple(split_heads(t, num_heads) for t in (q, k, v))


def self_attention(x, params, num_heads, mask=None, flash=False, fast=False):
    """Multi-head self-attention with fused-qkv parameters.

    params: {'qkv': {'kernel' [D,3D], 'bias' [3D]}, 'out': {'kernel'
    [D,D], 'bias' [D]}}.  Both GIT towers are self-attention over one
    (possibly combined [memory;text]) sequence.  flash=True routes the
    unmasked case through the Pallas fused kernel (TPU inference path);
    fast=True keeps score math in the activation dtype.
    """
    if flash and mask is None:
        # transpose-free entry: heads live on the lane axis straight off
        # the fused qkv linear output; no [B,H,T,Dh] layouts materialize
        from ..ops.flash_attention import flash_qkv_attention

        ctx_merged = flash_qkv_attention(linear(x, params["qkv"]), num_heads)
        return linear(ctx_merged, params["out"])
    q, k, v = qkv_project(x, params, num_heads)
    probs = attention_weights(q, k, mask, fast=fast).astype(v.dtype)
    ctx = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=v.dtype
    )
    return linear(merge_heads(ctx), params["out"])
