"""Fused attention Pallas kernel for TPU.

XLA's stock attention materializes the [T, T] f32 score tensor in HBM
(for ViT-L at 224px that is 16 heads x 257^2 x 4B ≈ 4.2 MB per image
per layer of write+read traffic — the encoder's dominant cost).  This
kernel keeps scores entirely in VMEM: for each (batch*head, q-tile) grid
cell it loads a q tile and the full K/V (GIT sequence lengths — 257 at
224px, ≤1157 at 480px — fit VMEM comfortably), computes f32 scores,
softmaxes on-chip, and writes only the [Tq, Dh] output tile.

Supports the two attention patterns GIT needs:
  * full attention (ViT encoder),
  * the unified-decoder block mask (prefill): memory tokens attend only
    to memory, text attends to memory + causally to text
    (decoder.py:114-137), generated in-kernel from index arithmetic —
    no mask tensor ever touches HBM.

Inference-path kernel (no custom VJP yet); training uses the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len, num_memory,
                 q_tile, masked):
    qi = pl.program_id(1)
    # keep q/k in their storage dtype (bf16): the MXU's native mode is
    # low-precision inputs with f32 accumulation — explicit f32 casts
    # before the dot force the slow fp32 matmul path
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)  # [TQ, D]
    k = k_ref[0]  # [Tpad, D]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, Tpad] f32
    t_pad = scores.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (q_tile, t_pad), 1)
    valid = col < seq_len
    if masked:
        # GIT block mask (decoder.py:114-137): rows/cols < num_memory are
        # image tokens; image->text blocked; text->text causal
        row = qi * q_tile + jax.lax.broadcasted_iota(
            jnp.int32, (q_tile, t_pad), 0
        )
        col_is_text = col >= num_memory
        row_is_text = row >= num_memory
        blocked = (col_is_text & ~row_is_text) | (
            col_is_text & row_is_text & (col > row)
        )
        valid = valid & ~blocked
    scores = jnp.where(valid, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        probs.astype(v.dtype),
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("scale", "num_memory", "masked", "q_tile", "interpret"),
)
def fused_attention(q, k, v, scale=None, num_memory=0, masked=False, q_tile=128,
                    interpret=False):
    """q, k, v: [B, H, T, Dh] -> [B, H, T, Dh].

    masked=False: full attention (ViT encoder).
    masked=True: GIT unified mask with `num_memory` leading memory tokens.
    """
    b, h, t, d = q.shape
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    t_pad = _round_up(t, q_tile)
    bh = b * h

    def flat_pad(x):
        x = x.reshape(bh, t, d)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    qf, kf, vf = flat_pad(q), flat_pad(k), flat_pad(v)
    grid = (bh, t_pad // q_tile)
    kernel = functools.partial(
        _attn_kernel,
        scale=scale,
        seq_len=t,
        num_memory=num_memory,
        q_tile=q_tile,
        masked=masked,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_tile, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :t].reshape(b, h, t, d)


def attention_xla(q, k, v, mask=None, scale=None):
    """Reference XLA path (f32 softmax), used on CPU and for training."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=v.dtype)


def use_pallas() -> bool:
    """Pallas kernels only on real TPU backends."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
