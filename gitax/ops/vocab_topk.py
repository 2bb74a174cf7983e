"""Fused vocab projection + top-k prefilter statistics (Pallas, TPU).

The beam step's epilogue today runs three full passes over the
[B*K, V~30k] f32 logits the tied output head produces
(models/textual.py::output_logits):

  1. the matmul writes them to HBM,
  2. `_top_k_blocked`'s block-max prefilter re-reads all of them for one
     max-reduce (decode/beam.py),
  3. `logsumexp` re-reads all of them again to normalize the K*C
     surviving candidates.

This kernel computes the projection tile-by-tile in VMEM and emits the
per-512-block maxima and per-block sum-of-exp as epilogue outputs of the
SAME pass, so passes 2 and 3 never touch HBM: per step that removes two
[BK, V] f32 reads (~31 MB at the headline B=32 config) plus their
dispatch slots from the while-body.  This is the "beam bookkeeping fused
into the kernel epilogue" lever named in DESIGN §4's decode roofline.

Semantics (all downstream consumers stay in decode/beam.py):

  * logits: `(hidden @ q8.astype(bf16)) * scale + bias` accumulated f32
    — the same math as output_logits' int8 branch, tiled over 512-vocab
    columns; padding columns (V -> NB*512) are written as -inf, exactly
    the padding `_top_k_blocked` would add.
  * bmax[:, j] = max over block j — feeding the prefilter's block
    top-k unchanged (same values => same tie behavior: block gathering
    preserves index order).
  * bsum[:, j] = sum(exp(logits_j - bmax_j)) over block j — combined
    downstream as lse = M + log(sum_j bsum_j * exp(bmax_j - M)),
    M = rowmax(bmax).  This is the standard two-level logsumexp; it is
    exact up to f32 summation order (jax.scipy's one-level reduction
    sums in a different order — token-equality vs the XLA path is
    asserted on-chip, like the decode-attention kernel's bf16 note).

The reference has no counterpart (its decode epilogue is
torch.log_softmax + topk on GPU, layers/decoder.py:1128-1175); this is
TPU-only plumbing for the dispatch-bound while-loop.

Inference-path kernel (no VJP).  Opt-in via
GitModel.generate(vocab_kernel=True); requires the int8-quantized output
head (ops/quant.py) and the plain greedy-beam path (no repetition
penalty / sampling, whose consumers want unpadded full logits).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = float("-inf")

# prefilter block size; decode/beam.py's vocab_stats path passes this as
# _top_k_blocked's block so kernel stats and prefilter always agree.
# Env override is for the roofline tool's tile sweep only.
TILE = int(os.environ.get("GITAX_VOCAB_TILE", "512"))


def _kernel(h_ref, w_ref, sc_ref, bz_ref, out_ref, bmax_ref, bsum_ref, *,
            vocab, tile):
    j = pl.program_id(0)
    h = h_ref[...]  # [R, W] activation dtype, resident across cells
    w = w_ref[...].astype(h.dtype)  # [W, T] int8 -> activation dtype
    acc = jax.lax.dot_general(
        h, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [R, T] f32
    sc = sc_ref[...].astype(jnp.float32)  # [1, T]
    bz = bz_ref[...].astype(jnp.float32)  # [1, T]
    logits = acc * sc + bz
    col = j * tile + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col < vocab
    logits = jnp.where(valid, logits, NEG_INF)
    out_ref[...] = logits
    m = jnp.max(logits, axis=1, keepdims=True)  # [R, 1]; >=1 valid col/block
    s = jnp.sum(
        jnp.where(valid, jnp.exp(logits - m), 0.0), axis=1, keepdims=True
    )
    # the stats blocks are the FULL [R, NBP] arrays (TPU lane rule: a
    # block's last dim must be 128-divisible or the whole axis — a
    # [R, 1] column block is neither), resident in VMEM across the
    # sequential grid via the constant index_map; each cell masks in its
    # own lane j (read-modify-write of the resident block, the same
    # revisit-accumulation pattern as a matmul k-loop).  Lanes >= NB are
    # never written; the caller slices them off.
    lane = jax.lax.broadcasted_iota(jnp.int32, bmax_ref.shape, 1)
    bmax_ref[...] = jnp.where(lane == j, m, bmax_ref[...])
    bsum_ref[...] = jnp.where(lane == j, s, bsum_ref[...])


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def vocab_logits_topk(hidden, wq8t, scale, bias, *, tile=TILE,
                      interpret=False):
    """Fused `output_logits` (int8 head) + block-max/block-sumexp epilogue.

    hidden [R, W] (bf16/f32), wq8t [W, V] int8, scale [V], bias [V].
    Returns (logits [R, NB*tile] f32 — -inf in the V..NB*tile padding,
    bmax [R, NB] f32, bsum [R, NB] f32), NB = ceil(V / tile).

    R pads to the 8-sublane multiple internally; padded rows compute
    garbage that the caller never reads (outputs are sliced back to R).
    """
    r, w_dim = hidden.shape
    v = wq8t.shape[1]
    assert wq8t.shape[0] == w_dim, (wq8t.shape, hidden.shape)
    # TPU lane rule: the logits out-block's last dim is `tile`
    assert tile >= 128 and tile % 128 == 0, tile
    nb = (v + tile - 1) // tile
    nbp = (nb + 127) // 128 * 128  # stats lane-padded (see _kernel note)
    rp = (r + 7) // 8 * 8
    if rp != r:
        hidden = jnp.pad(hidden, ((0, rp - r), (0, 0)))
    out_shape = [
        jax.ShapeDtypeStruct((rp, nb * tile), jnp.float32),
        jax.ShapeDtypeStruct((rp, nbp), jnp.float32),
        jax.ShapeDtypeStruct((rp, nbp), jnp.float32),
    ]
    grid = (nb,)
    logits, bmax, bsum = pl.pallas_call(
        functools.partial(_kernel, vocab=v, tile=tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rp, w_dim), lambda j: (0, 0)),
            pl.BlockSpec((w_dim, tile), lambda j: (0, j)),
            pl.BlockSpec((1, tile), lambda j: (0, j)),
            pl.BlockSpec((1, tile), lambda j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((rp, tile), lambda j: (0, j)),
            pl.BlockSpec((rp, nbp), lambda j: (0, 0)),
            pl.BlockSpec((rp, nbp), lambda j: (0, 0)),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(hidden, wq8t, scale.reshape(1, v), bias.reshape(1, v))
    return logits[:r], bmax[:r, :nb], bsum[:r, :nb]


def combine_lse(bmax, bsum):
    """[R, NB] block stats -> [R] logsumexp (two-level, exact in f32 up
    to summation order)."""
    m = jnp.max(bmax, axis=1, keepdims=True)
    return (m + jnp.log(jnp.sum(bsum * jnp.exp(bmax - m), axis=1,
                                keepdims=True)))[:, 0]


def block_stats_xla(logits, tile=TILE):
    """XLA reference of the kernel's epilogue for padded-or-not logits
    [R, V]: returns (logits_padded [R, NB*tile] -inf-padded, bmax, bsum).
    Used for the prefill step-0 stats outside the while loop and by the
    parity tests."""
    r, v = logits.shape
    nb = (v + tile - 1) // tile
    pad = nb * tile - v
    if pad:
        logits = jnp.pad(logits, ((0, 0), (0, pad)), constant_values=NEG_INF)
    xb = logits.reshape(r, nb, tile)
    bmax = xb.max(axis=-1)
    bsum = jnp.where(
        jnp.isfinite(xb), jnp.exp(xb - bmax[:, :, None]), 0.0
    ).sum(axis=-1)
    return logits, bmax, bsum
