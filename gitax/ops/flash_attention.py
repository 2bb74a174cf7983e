"""Fused attention Pallas kernel for TPU.

XLA's stock attention materializes the [B, H, T, T] score tensor in HBM
(for ViT-L at 224px that is 16 heads x 257^2 of write+read traffic per
image per layer — measured ~0.5 ms/layer in-context on v5e, ~12 ms of a
B=32 encode) and pays it again for the softmax re-read.  This kernel
keeps scores entirely in VMEM.  GIT sequence lengths (257 at 224px,
~290 for decoder prefill, ~1550 for 6-frame video) always fit the full
K/V for a head group in VMEM, so no online-softmax streaming is needed
— each grid cell loads a q row-tile plus the whole K/V and runs scores
-> softmax -> context on-chip.

Layout (the same trick as ops/decode_attention.py, which measured a win
on the decode loop): per-head keys and values are INTERLEAVED on a flat
lane axis — head h's K at lanes [h*2Dh, h*2Dh+Dh), V at
[h*2Dh+Dh, h*2Dh+2Dh) — and queries arrive pre-scaled and zero-extended
to the full 2Dh pair.  With Dh=64 (every GIT tower) each head owns
exactly one 128-lane tile, so

  * every in-kernel slice is 128-lane aligned (no vector reshapes or
    sub-lane shifts Mosaic cannot lower),
  * the score dot contracts over the full 128 lanes (v lanes hit q's
    zeros), running the MXU at full K-width instead of half,
  * the context dot consumes the SAME kv block ([rows, 128] x
    [rows, 2Dh]) — its v half is the answer, sliced off outside.

`flash_qkv_attention` consumes the fused qkv linear output [B, T, 3D]
directly: the packed layouts fall out of reshapes + one tiny transpose
and the context comes back head-major, so the [B,H,T,D] transposes of
the classic path (qkv_project/merge_heads) never materialize.

Measured status (v5e, ViT-L B=32 in-context): this design runs
0.87 ms/layer (0.73 via flash_qkv_attention) vs 0.32-0.49 ms/layer for
XLA's activation-dtype-softmax attention — 2.5x faster than the
previous per-(batch,head)-cell kernel it replaces, but XLA's fused
batched-matmul emitter still wins at GIT's small head count x short
sequence, so the kernel stays OPT-IN (`flash=True`); the default
encoder path is XLA.  The packed-layout machinery is shared with
ops/decode_attention.py, where the same trick measurably wins (the
decode loop's bar is a full cache copy, not a fused softmax).

Supports the two attention patterns GIT needs:
  * full attention (ViT encoder),
  * the unified-decoder block mask (prefill): memory tokens attend only
    to memory, text attends to memory + causally to text
    (reference decoder.py:114-137), generated in-kernel from index
    arithmetic — no mask tensor ever touches HBM.

Inference-path kernel (no custom VJP); training uses the XLA path.

Measured-and-rejected (v5e, B=4 H=16 Dh=64 S=1201, interleaved
one-process sweep, round 3): the in-kernel f32 softmax is NOT the
bottleneck at long S — stubbing it out entirely changes per-invocation
time by <10% (1.86 vs 1.76 ms standalone), and a deferred-normalization
variant (unnormalized exp into the context dot, divide by the row-sum
on the [q_tile, 2Dh] output instead of the [q_tile, T] probs) is
noise-level.  Only dropping the max-subtraction gains ~5%, which is not
numerically safe in general.  The core is dot/HBM-bound; the 2x lane
padding (zero-extended q, v lanes in the score dot) is the price of
128-lane alignment and already accounted for in the crossover table.

Also measured-and-rejected (round 3, S=257 B=32 H=16, 24-variant sweep
over hpb in {4,8,16} x q_tile in {128,272} x {f32,bf16} softmax x
{fused,3-phase} score staging): every variant lands 1.03-1.6 ms
standalone vs XLA's 1.04 ms — the best (hpb=16, q_tile=272, bf16
softmax, 3-phase) merely TIES XLA.  At this shape XLA's emitter keeps
score tiles fused between the two batched matmuls while the packed
layout pays 2x q/out HBM traffic, so the S<640 default stays XLA;
beating it would take a qkv-projection+attention+proj mega-kernel, not
a schedule tweak (tools/bench_encoder_attn.py reproduces the A/B).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30

# per-cell VMEM budget for the q/kv/out blocks (double-buffered by the
# pipeline, so the real footprint is ~2x this plus score intermediates)
_BLOCK_BYTES_LIMIT = 5 * 1024 * 1024


def _attn_kernel(qz_ref, kv_ref, o_ref, *, hpb, head_dim, q_tile, t_pad,
                 seq_len, num_memory, masked):
    """qz_ref [1, q_tile, hpb*2Dh], kv_ref [1, t_pad, hpb*2Dh]."""
    r = pl.program_id(2)
    col = jax.lax.broadcasted_iota(jnp.int32, (q_tile, t_pad), 1)
    valid = col < seq_len
    if masked:
        # GIT block mask (decoder.py:114-137): rows/cols < num_memory are
        # image tokens; image->text blocked; text->text causal
        row = r * q_tile + jax.lax.broadcasted_iota(
            jnp.int32, (q_tile, t_pad), 0
        )
        col_is_text = col >= num_memory
        row_is_text = row >= num_memory
        blocked = (col_is_text & ~row_is_text) | (
            col_is_text & row_is_text & (col > row)
        )
        valid = valid & ~blocked
    parts = []
    for hi in range(hpb):
        lo = hi * 2 * head_dim
        qz = qz_ref[0][:, lo : lo + 2 * head_dim]   # [q_tile, 2Dh]
        kvh = kv_ref[0][:, lo : lo + 2 * head_dim]  # [t_pad, 2Dh]
        scores = jax.lax.dot_general(
            qz, kvh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [q_tile, t_pad]; v lanes contribute zero
        scores = jnp.where(valid, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(kvh.dtype)
        ctx = jax.lax.dot_general(
            probs, kvh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [q_tile, 2Dh] — v half is the context
        parts.append(ctx.astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(parts, axis=1)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pick_tiles(h, t_pad, head_dim, itemsize):
    """(heads per block, q row tile) under the VMEM block budget."""
    q_tile = t_pad if t_pad <= 512 else 256
    hpb = h

    def block_bytes(hpb, q_tile):
        lanes = hpb * 2 * head_dim
        return (2 * q_tile + t_pad) * lanes * itemsize

    while hpb % 2 == 0 and block_bytes(hpb, q_tile) > _BLOCK_BYTES_LIMIT:
        hpb //= 2
    if block_bytes(hpb, q_tile) > _BLOCK_BYTES_LIMIT:
        hpb = 1
    return hpb, q_tile


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "seq_len", "num_memory", "masked",
                     "interpret"),
)
def _packed_attention(qz, kv, num_heads, seq_len, num_memory=0,
                      masked=False, interpret=False):
    """qz, kv: [B, T_pad, H*2Dh] (qz pre-scaled, zero-extended) ->
    ctx [B, T_pad, H*2Dh] with the context in each head's v lanes."""
    b, t_pad, lanes = qz.shape
    h = num_heads
    dh = lanes // (2 * h)
    hpb, q_tile = _pick_tiles(h, t_pad, dh, qz.dtype.itemsize)
    q_pad = _round_up(t_pad, q_tile)
    if q_pad != t_pad:
        qz = jnp.pad(qz, ((0, 0), (0, q_pad - t_pad), (0, 0)))
    grid = (b, h // hpb, q_pad // q_tile)
    kernel = functools.partial(
        _attn_kernel,
        hpb=hpb,
        head_dim=dh,
        q_tile=q_tile,
        t_pad=t_pad,
        seq_len=seq_len,
        num_memory=num_memory,
        masked=masked,
    )
    span = hpb * 2 * dh
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, q_pad, lanes), qz.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, span), lambda i, g, r: (i, r, g)),
            pl.BlockSpec((1, t_pad, span), lambda i, g, r: (i, 0, g)),
        ],
        out_specs=pl.BlockSpec((1, q_tile, span), lambda i, g, r: (i, r, g)),
        interpret=interpret,
    )(qz, kv)
    return out[:, :t_pad]


def flash_qkv_attention(qkv, num_heads, scale=None, num_memory=0,
                        masked=False, interpret=False):
    """Fused attention straight off the qkv linear output.

    qkv: [B, T, 3D] (the fused projection, bias added) -> context
    [B, T, D] in merge_heads order.  No [B,H,T,Dh] transposes ever
    materialize: q/k/v stay token-major, heads live on the lane axis.
    """
    b, t, d3 = qkv.shape
    d = d3 // 3
    h = num_heads
    dh = d // h
    if scale is None:
        scale = 1.0 / (dh ** 0.5)
    y = qkv.reshape(b, t, 3, h, dh)
    q = y[:, :, 0] * jnp.asarray(scale, qkv.dtype)        # [B,T,H,Dh]
    qz = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)  # [B,T,H,2Dh]
    kv = y[:, :, 1:3].transpose(0, 1, 3, 2, 4)             # [B,T,H,2,Dh]
    t_pad = _round_up(t, 16)
    qz = qz.reshape(b, t, h * 2 * dh)
    kv = kv.reshape(b, t, h * 2 * dh)
    if t_pad != t:
        qz = jnp.pad(qz, ((0, 0), (0, t_pad - t), (0, 0)))
        kv = jnp.pad(kv, ((0, 0), (0, t_pad - t), (0, 0)))
    ctx = _packed_attention(
        qz, kv, num_heads=h, seq_len=t, num_memory=num_memory,
        masked=masked, interpret=interpret,
    )
    # v halves, already token-major/head-ordered == merge_heads layout
    return ctx[:, :t].reshape(b, t, h, 2, dh)[:, :, :, 1].reshape(b, t, d)


def fused_attention(q, k, v, scale=None, num_memory=0, masked=False,
                    interpret=False, q_tile=None):
    """q, k, v: [B, H, T, Dh] -> [B, H, T, Dh].

    masked=False: full attention (ViT encoder).
    masked=True: GIT unified mask with `num_memory` leading memory tokens.
    (q_tile is accepted for backward compatibility and ignored — tiling
    is chosen by the VMEM heuristic.)
    """
    b, h, t, d = q.shape
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    t_pad = _round_up(t, 16)

    def pack(x):  # [B,H,T,2Dh] -> [B,T_pad,H*2Dh]
        x = x.transpose(0, 2, 1, 3).reshape(b, t, h * 2 * d)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    qs = q * jnp.asarray(scale, q.dtype)
    qz = pack(jnp.concatenate([qs, jnp.zeros_like(qs)], axis=-1))
    kv = pack(jnp.concatenate([k, v], axis=-1))
    ctx = _packed_attention(
        qz, kv, num_heads=h, seq_len=t, num_memory=num_memory,
        masked=masked, interpret=interpret,
    )
    ctx = ctx[:, :t].reshape(b, t, h, 2, d)[:, :, :, 1]  # v halves
    return ctx.transpose(0, 2, 1, 3)  # [B,H,T,Dh]


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


# Measured crossover on v5e (GIT_LARGE ViT-L/14 encoder forward, bf16,
# interleaved one-process sweep, round 3): XLA wins below, the kernel
# wins above — img/s XLA vs kernel:
#   S=257:  628 / 528     S=577:  275 / 220     S=626: 252 / 213
#   S=677:  173 / 211     S=785:  142 / 163     S=901: 117 / 155
#   S=1226:  73 / 104     S=1601:  52 /  75
# XLA's fused attention falls off a cliff once S exceeds 5x128=640
# lanes; the kernel's VMEM-resident scores degrade smoothly.  High-res
# MinMax models (S ~900-1600) gain 32-44% encoder throughput.
FLASH_AUTO_MIN_SEQ = 640


def auto_flash(seq_len: int, dtype) -> bool:
    """Shape-based default for the encoder's flash=None: the Pallas
    kernel turns on for long sequences (high-res grids) in production
    dtypes, never in f32 parity mode (whose numerics are pinned to the
    reference's XLA path), never off-TPU."""
    return (
        seq_len >= FLASH_AUTO_MIN_SEQ
        and jnp.dtype(dtype) != jnp.float32
        and use_pallas()
    )
