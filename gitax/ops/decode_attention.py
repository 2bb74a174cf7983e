"""Fused decode-step attention Pallas kernel.

One kernel per decoder layer per beam-search step, fusing what XLA runs
as ~8 separate ops with two pathological costs (measured on v5e from a
device trace of the GIT_LARGE beam-4 loop):

  * the per-layer KV-cache dynamic_update_slice copies the FULL 9.4 MB
    text cache every step (~25 us/layer) — XLA's layout assignment puts
    the time axis into the (sublane, lane) tile to please the attention
    einsums, and a one-row update of such a buffer cannot alias;
  * a further ~13 us/layer layout-conversion copy of the same buffer
    feeds those einsums.

Here the cache lives in HBM untouched (`memory_space=ANY`, aliased
in/out): each grid cell DMAs its rows to VMEM scratch, writes ONLY the
new row back (12 KB instead of 9.4 MB of copies), and computes memory
scores + ancestry-selected text scores + softmax + both context
contractions on-chip.  Semantics replicate decode_step's XLA path
(f32 score math, ancestry gather-on-read; see models/textual.py) —
bit-exact in f32; in bf16 the two context contractions accumulate in
f32 here vs per-contraction bf16 rounding in XLA (token-identical in
on-chip runs, not guaranteed bit-wise).  Parity is asserted by tests in
interpret mode and by token-equality runs on chip.

Memory streaming: the memory k|v stays in HBM (`memory_space=ANY`) and
streams through a double-buffered per-head [G, M, 2Dh] VMEM scratch —
one strided DMA descriptor per head covers all G beam groups, and head
hi+1's blocks fly while head hi computes.  This keeps the per-cell VMEM
footprint O(M) instead of O(H*M), so video (M=1542) and high-res VQA
(M~900-1200) memories fit, and it frees VMEM for WIDER cells (up to 64
rows vs 32 for the retired resident-memory layout) — bigger MXU dots,
fewer cells.  Measured on v5e (GIT_LARGE beam-4 B=32, M=264):
519.2/519.9 img/s resident vs 522.4/523.5 streamed across interleaved
A/B passes, so the streamed layout replaced the resident one outright
in round 3.

Bandwidth notes (v5e trace, GIT_LARGE beam-4 B=32): the decode loop's
dominant HBM stream is the MEMORY K/V — 25 MB/layer re-read every step
(6 layers = 152 MB/step), dwarfing the 9.4 MB text cache.  `mem_kv`
may arrive INT8 with per-(batch, head, k|v) scales (quantized once at
prefill; see textual.prefill(kernel_memory='int8')) — halves the
dominant stream.  Measured NEUTRAL on v5e at every shape tried (512.1
vs 512.7 img/s at M=257 round 2; 94.3 vs 94.3 and 83.5 vs 83.5 on the
high-res/video families round 3): the in-kernel int8->bf16
convert+scale costs back roughly the DMA it saves at this chip's
bandwidth/VPU ratio, so the mode stays opt-in — it pays on
bandwidth-poorer parts.  (Token output matched the bf16-memory path
exactly in all on-chip runs.)

When the kernel engages (see `kernel_pays`): always for int8 memory
(the in-kernel dequant is the only consumer); for bf16 memory only at
M <= KERNEL_AUTO_MAX_MEM — measured on v5e end-to-end (interleaved A/B,
tokens equal at every point): M=264 +0.7% (the in-place cache update is
the round-2 491->512 win), M=485 +2.2% (254/256 -> 260/261 img/s),
M=577 +1.5% (202 -> 205), but M=1208 -1% and M=1542 -2.5%, where the
memory stream dwarfs the cache copy and XLA's bulk batched-matmul
streams win; long-memory bf16 decode therefore stays on the XLA path.

Mosaic-friendly layout tricks:

  * keys and values are INTERLEAVED per head in the lane axis
    ([..., h*2Dh + (k: 0..Dh | v: Dh..2Dh)]) for both the text cache
    and the memory (mem_kv, built once at prefill), and the query
    arrives zero-extended to the full 2Dh lane pair.  Every score is
    one [R, 2Dh] x [rows, 2Dh]^T dot per head (v lanes hit zeros),
    every context is one [R, rows] x [rows, 2Dh] dot whose v half is
    the answer, and every in-kernel slice is 128-lane aligned — no
    vector reshapes Mosaic cannot lower.
  * TPU DMA slices on the sublane axis must be 8-aligned, so each grid
    cell owns R = lcm(beams, 8) cache rows = `groups` beam groups,
    widened up to 64 rows when the VMEM budget allows (fewer, larger
    cells amortize DMA latency and feed the MXU bigger row tiles), and
    the memory's M axis is 8-padded at prefill (textual._pad_m8; the
    padded columns are bias-masked to -inf).  Cross-group (row, key)
    slots are simply masked to -inf before the softmax: the flat
    liveness mask (computed once per step in XLA) already encodes
    ancestry selection, and an in-kernel iota mask does the same for
    the concatenated per-group memories — the probability rows come
    out exactly as if each group were processed alone.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# VMEM budget for the per-cell working set (blocks are double-buffered
# by the pipeline; total VMEM is ~16 MB/core)
_VMEM_BUDGET = 10 * 1024 * 1024

# TPU DMA slices on the sublane axis must be this-aligned; the kernel's
# per-head memory copy slices M into the sublane tiling, so the
# kernel-layout memory's M axis is padded to this at prefill (the ONE
# home of the alignment invariant — pad_memory_m8 below)
_DMA_SUBLANE = 8


def pad_memory_m8(kv_mem):
    """Pad the kernel-layout memory's M axis ([B, H, M, 2Dh]) to the DMA
    sublane alignment; physically free — the tiled HBM buffer carries
    the same sublane padding either way."""
    pad8 = -kv_mem.shape[2] % _DMA_SUBLANE
    if pad8:
        kv_mem = jnp.pad(kv_mem, ((0, 0), (0, 0), (0, pad8), (0, 0)))
    return kv_mem


def pad_memory_bias(bias, m_padded):
    """Pad a [B, M] f32 memory bias to the kernel memory's padded M with
    -inf, so the padded columns never win the softmax."""
    pad8 = m_padded - bias.shape[1]
    if pad8:
        bias = jnp.pad(bias, ((0, 0), (0, pad8)), constant_values=NEG_INF)
    return bias


def pad_m8_len(m: int) -> int:
    """The M the kernel will actually see after prefill padding."""
    return m + (-m % _DMA_SUBLANE)

# bf16-memory auto-enable ceiling for the kernel (see module docstring:
# measured win at M=264, measured loss at M=1208/1542; int8 memory
# always uses the kernel — it is the only consumer of the quantized
# layout)
KERNEL_AUTO_MAX_MEM = 640


def _cell_vmem_bytes(g, beams, h, dh, m, t_max, mem_itemsize, act_itemsize):
    r = g * beams
    lanes = h * 2 * dh
    qkl_blocks = r * lanes * act_itemsize * 3  # qz, kvn, ctx
    live_block = r * t_max * r  # int8
    kv_scr = t_max * r * lanes * act_itemsize
    # memory stays in HBM; only the double-buffered per-head block
    # ([2, G, M, 2Dh] scratch) is resident — O(M), not O(H*M)
    mem_scr = 2 * g * m * 2 * dh * mem_itemsize
    # input/output blocks are double-buffered across grid cells
    return 2 * (qkl_blocks + live_block) + kv_scr + mem_scr


def _kernel(
    pos_ref,  # scalar prefetch: [1] int32 — text position being written
    mem_scale_ref,  # scalar prefetch: [B*H*2] f32 (ones when mem is bf16)
    qz_ref,  # [1, R, H*2Dh] zero-extended pre-scaled queries
    kvn_ref,  # [1, R, H*2Dh] new k|v row (pre-interleaved)
    live_ref,  # [1, R, T*R] int8: 1 iff text slot (t, j) is selected
    mem_kv_hbm,  # [B, H, M, 2Dh] interleaved memory k|v in ANY space
    mem_bias_ref,  # [1, 1, G*M] f32 additive memory bias (group-concat)
    kv_hbm,  # [T, BK, H*2Dh] in HBM (aliased in/out) — full array
    ctx_ref,  # out: [1, R, H*2Dh] (v lanes carry the context)
    kv_out,  # out: alias of kv_hbm
    kv_scr,  # VMEM [T, R, H*2Dh] — this cell's text-cache rows
    row_scr,  # VMEM [1, R, H*2Dh] — staging for the single-row writeback
    mem_scr,  # VMEM [2, G, M, 2Dh] — double-buffered per-head memory
    sems,  # DMA (2,) — cache read / row write
    msems,  # DMA (2,) — per-buffer memory streams
    *,
    beams: int,
    groups: int,
    num_heads: int,
    head_dim: int,
    t_max: int,
    mem_int8: bool,
):
    cell = pl.program_id(0)
    pos = pos_ref[0]
    h, dh = num_heads, head_dim
    r = beams * groups  # rows per cell (8-aligned for DMA)
    m = mem_kv_hbm.shape[2]

    # ---- fetch this cell's cache rows (strided DMA, T chunks) ----
    read = pltpu.make_async_copy(
        kv_hbm.at[:, pl.ds(cell * r, r), :], kv_scr, sems.at[0]
    )
    read.start()

    # memory k|v streams one head at a time into the double-buffered
    # scratch: one strided descriptor covers all G groups (batch-dim
    # stride); head hi+1's blocks fly while head hi computes
    def _mem_copy(hi, buf):
        return pltpu.make_async_copy(
            mem_kv_hbm.at[pl.ds(cell * groups, groups), hi],
            mem_scr.at[buf],
            msems.at[buf],
        )

    _mem_copy(0, 0).start()

    live = live_ref[0] != 0  # [R, T*R]
    mem_bias = mem_bias_ref[0, 0]  # [G*M] f32
    # memory group mask: row r' (group r'//beams) may only see its own
    # group's memory columns [gi*M, (gi+1)*M)
    row_g = jax.lax.broadcasted_iota(jnp.int32, (r, groups * m), 0) // beams
    col_g = jax.lax.broadcasted_iota(jnp.int32, (r, groups * m), 1) // m
    mem_ok = row_g == col_g

    dt = qz_ref.dtype
    kv_lane = jax.lax.broadcasted_iota(jnp.int32, (m, 2 * dh), 1) < dh

    def mem_head(hi, buf):
        """[G*M, 2Dh] dequantized memory k|v for head hi."""
        parts = []
        for gi in range(groups):
            x = mem_scr[buf, gi]
            if mem_int8:
                # per-(batch, head) k|v scales from SMEM; k lanes get
                # s_k, v lanes s_v via a lane-split select
                base = (cell * groups + gi) * h * 2 + hi * 2
                sk = mem_scale_ref[base]
                sv = mem_scale_ref[base + 1]
                scl = jnp.where(kv_lane, sk, sv).astype(dt)
                x = x.astype(dt) * scl
            parts.append(x)
        return jnp.concatenate(parts, axis=0)

    new_row = kvn_ref[...]  # [1, R, H*2Dh]
    read.wait()
    kv_scr[pl.ds(pos, 1), :, :] = new_row
    row_scr[...] = new_row
    # write back ONLY the new row (the rest of the buffer is untouched
    # in HBM — this is the in-place cache update XLA refuses to do)
    write = pltpu.make_async_copy(
        row_scr, kv_out.at[pl.ds(pos, 1), pl.ds(cell * r, r), :],
        sems.at[1],
    )
    write.start()

    # per head: memory scores (block built once, feeds both dots), text
    # scores, joint softmax, both context contractions
    ctx_parts = []
    for hi in range(h):
        lo = hi * 2 * dh
        qz_h = qz_ref[0][:, lo : lo + 2 * dh]  # [R, 2Dh]
        _mem_copy(hi, hi % 2).wait()
        if hi + 1 < h:
            _mem_copy(hi + 1, (hi + 1) % 2).start()
        mem_h = mem_head(hi, hi % 2)
        mem_s = jax.lax.dot_general(
            qz_h, mem_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, G*M] (v lanes contribute zero)
        mem_s = jnp.where(mem_ok, mem_s + mem_bias[None, :], NEG_INF)
        kv_h = kv_scr[:, :, lo : lo + 2 * dh].reshape(
            t_max * r, 2 * dh
        )  # collapse leading dims — supported reshape
        txt_s = jax.lax.dot_general(
            qz_h, kv_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, T*R]
        txt_s = jnp.where(live, txt_s, NEG_INF)

        # softmax over [memory ; live text] in f32 (parity with XLA path)
        row_max = jnp.maximum(
            jnp.max(mem_s, axis=1, keepdims=True),
            jnp.max(txt_s, axis=1, keepdims=True),
        )
        mem_e = jnp.exp(mem_s - row_max)
        txt_e = jnp.exp(txt_s - row_max)  # exact zeros at masked slots
        inv = 1.0 / (
            jnp.sum(mem_e, axis=1, keepdims=True)
            + jnp.sum(txt_e, axis=1, keepdims=True)
        )
        mem_p = (mem_e * inv).astype(dt)  # [R, G*M]
        txt_p = (txt_e * inv).astype(dt)  # [R, T*R]

        ctx_mem = jax.lax.dot_general(
            mem_p, mem_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, 2Dh] — v half is the memory context
        ctx_txt = jax.lax.dot_general(
            txt_p, kv_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, 2Dh] — v half is the text context
        ctx_parts.append((ctx_mem + ctx_txt).astype(dt))

    ctx_ref[0] = jnp.concatenate(ctx_parts, axis=1)
    write.wait()


def kernel_supported(batch: int, beams: int) -> bool:
    """The cache-row DMA needs 8-aligned row blocks: each cell takes
    lcm(beams, 8)/beams beam groups, so batch must divide evenly."""
    import math

    g = 8 // math.gcd(beams, 8)
    return batch % g == 0


def kernel_fits(
    batch: int,
    beams: int,
    num_heads: int,
    head_dim: int,
    num_memory: int,
    t_max: int,
    mem_itemsize: int = 2,
    act_itemsize: int = 2,
) -> bool:
    """Whether the kernel's per-cell working set fits VMEM at the BASE
    group size.  The streamed memory keeps the footprint O(M), so this
    holds for every GIT shape including video (M=1542); it can only
    fail for extreme t_max * beams products."""
    import math

    if not kernel_supported(batch, beams):
        return False
    g = 8 // math.gcd(beams, 8)
    return (
        _cell_vmem_bytes(
            g, beams, num_heads, head_dim, num_memory, t_max,
            mem_itemsize, act_itemsize,
        )
        <= 14 * 1024 * 1024
    )


def kernel_pays(num_memory: int, mem_int8: bool) -> bool:
    """Measured auto-enable policy (see module docstring): int8 memory
    always (the kernel is its only consumer); bf16 memory only below
    the M crossover where the in-place cache update outweighs the
    per-head DMA chain."""
    return mem_int8 or num_memory <= KERNEL_AUTO_MAX_MEM


def plan_cells(batch, beams, num_heads, head_dim, num_memory, t_max,
               mem_itemsize=2, act_itemsize=2):
    """(groups, rows, cells) the kernel will use: the base 8-aligned
    beam-group count, widened (up to 64 rows) where divisibility and the
    VMEM budget allow — fewer, larger cells amortize per-cell DMA
    latency and feed the MXU bigger row tiles."""
    import math

    g = 8 // math.gcd(beams, 8)  # beam groups per cell (DMA alignment)
    assert batch % g == 0, (batch, beams, g)
    while (
        g * beams < 64
        and batch % (2 * g) == 0
        and _cell_vmem_bytes(
            2 * g, beams, num_heads, head_dim, num_memory, t_max,
            mem_itemsize, act_itemsize,
        )
        <= _VMEM_BUDGET
    ):
        g *= 2
    return g, g * beams, batch // g


def build_live_mask(anc, pos, rows, t_max, beams):
    """Flat (t, j) liveness over each CELL's rows: slot t*R + j is live
    for row k iff t <= pos and the ancestry selects row j (cell-local
    index = group offset + local ancestry); cross-group slots are never
    live.  ONE tiny XLA fusion per STEP — decode_step computes this once
    and passes it to every layer's kernel call (recomputing per layer
    would rely on XLA CSE across inlined calls)."""
    bk = anc.shape[0]
    gi = (jnp.arange(bk, dtype=anc.dtype) % rows) // beams  # group in cell
    anc_cell = anc + (gi * beams)[:, None]
    return (
        (anc_cell[:, :, None] == jnp.arange(rows, dtype=anc.dtype)[None, None, :])
        & (jnp.arange(t_max)[None, :, None] <= pos)
    ).reshape(bk, t_max * rows).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("beams", "num_heads", "head_dim", "interpret"),
)
def decode_attention(
    qz,  # [BK, H*2Dh] zero-extended pre-scaled queries
    kv_new,  # [BK, H*2Dh] pre-interleaved new k|v row
    txt_kv,  # [T, BK, H*2Dh]
    anc,  # [BK, T] int32
    pos,  # [] int32
    mem_kv,  # [B, H, M, 2Dh] interleaved memory k|v (bf16/f32 or int8)
    mem_bias,  # [B, M] f32 (zeros when no memory padding)
    mem_scale=None,  # [B, H, 2] f32 per-(batch, head) k|v scales (int8)
    live=None,  # [BK, T*R] int8 from build_live_mask (computed if None)
    *,
    beams: int,
    num_heads: int,
    head_dim: int,
    interpret: bool = False,
):
    """Fused decode attention; returns (ctx128 [BK, H*2Dh] — context in
    the v lanes of each head pair — and txt_kv updated in place)."""
    t_max, bk, _ = txt_kv.shape
    b = bk // beams
    h, dh = num_heads, head_dim
    if mem_kv.shape[2] % _DMA_SUBLANE:
        # prefill() pads the kernel-layout memory once so this is a
        # no-op in the decode loop; direct callers get correctness
        # (padded columns are bias-masked to -inf) at the cost of a
        # per-call pad copy.
        mem_kv = pad_memory_m8(mem_kv)
        mem_bias = pad_memory_bias(mem_bias, mem_kv.shape[2])
    m = mem_kv.shape[2]
    mem_int8 = mem_kv.dtype == jnp.int8
    assert not mem_int8 or mem_scale is not None
    mem_isz = 1 if mem_int8 else mem_kv.dtype.itemsize
    g, r, cells = plan_cells(
        b, beams, h, dh, m, t_max, mem_isz, qz.dtype.itemsize
    )

    if live is None:
        live = build_live_mask(anc, pos, r, t_max, beams)
    assert live.shape == (bk, t_max * r), (live.shape, bk, t_max, r)

    if mem_scale is None:
        scale_flat = jnp.ones((b * h * 2,), jnp.float32)
    else:
        scale_flat = mem_scale.astype(jnp.float32).reshape(b * h * 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((1, r, h * 2 * dh), lambda i, pos, scl: (i, 0, 0)),
            pl.BlockSpec((1, r, h * 2 * dh), lambda i, pos, scl: (i, 0, 0)),
            pl.BlockSpec((1, r, t_max * r), lambda i, pos, scl: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, g * m), lambda i, pos, scl: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, r, h * 2 * dh), lambda i, pos, scl: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_max, r, h * 2 * dh), txt_kv.dtype),
            pltpu.VMEM((1, r, h * 2 * dh), txt_kv.dtype),
            pltpu.VMEM((2, g, m, 2 * dh), mem_kv.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel,
        beams=beams,
        groups=g,
        num_heads=num_heads,
        head_dim=head_dim,
        t_max=t_max,
        mem_int8=mem_int8,
    )
    ctx, kv_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((cells, r, h * 2 * dh), qz.dtype),
            jax.ShapeDtypeStruct(txt_kv.shape, txt_kv.dtype),
        ],
        input_output_aliases={7: 1},
        interpret=interpret,
    )(
        jnp.asarray(pos, jnp.int32)[None],
        scale_flat,
        qz.reshape(cells, r, h * 2 * dh),
        kv_new.reshape(cells, r, h * 2 * dh),
        live.reshape(cells, r, t_max * r),
        mem_kv,
        mem_bias.reshape(cells, 1, g * m),
        txt_kv,
    )
    return ctx.reshape(bk, h * 2 * dh), kv_out


def quantize_memory(mem_kv):
    """[B, H, M, 2Dh] float memory k|v -> (int8 values, [B, H, 2] f32
    per-(batch, head) scales for the k and v halves)."""
    dh = mem_kv.shape[-1] // 2
    x = mem_kv.astype(jnp.float32)
    k, v = x[..., :dh], x[..., dh:]
    sk = jnp.maximum(jnp.max(jnp.abs(k), axis=(2, 3)), 1e-12) / 127.0
    sv = jnp.maximum(jnp.max(jnp.abs(v), axis=(2, 3)), 1e-12) / 127.0
    qk = jnp.clip(jnp.round(k / sk[:, :, None, None]), -127, 127)
    qv = jnp.clip(jnp.round(v / sv[:, :, None, None]), -127, 127)
    q = jnp.concatenate([qk, qv], axis=-1).astype(jnp.int8)
    return q, jnp.stack([sk, sv], axis=-1)
