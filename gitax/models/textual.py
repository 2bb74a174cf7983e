"""GIT's unified [image; text] transformer decoder, TPU-first.

Re-implements the behavior of the reference's
TransformerDecoderTextualHead + BertEncoderAsDecoder + BertEncoder stack
(decoder.py:443-610, decoder.py:92-174, bert/modeling_bert.py:299-334):

  * 'linearLn' visual projection (decoder.py:22-39),
  * word+positional embedding with LayerNorm(eps 1e-8) (decoder.py:41-90),
  * 6 post-norm BERT layers, exact-erf gelu, LayerNorm(eps 1e-12),
  * the GIT block attention mask over the combined [memory; text]
    sequence (decoder.py:114-137): image<->image full, text->image full,
    image->text blocked, text->text causal; optional -inf columns for
    padded memory and `bi_valid_mask` columns forced open,
  * output head weight-tied to the word embedding (decoder.py:500-505).

Unlike the reference — whose incremental path re-feeds the growing
sequence and concatenates per-layer history tensors on the host
(decoder.py:1045-1053) — decoding here uses a static-shape KV cache:
memory K/V are computed once at prefill (legal because image tokens
never attend to text), and text K/V live in fixed per-layer TIME-MAJOR
[T_max, B, H*2*Dh] buffers (K/V interleaved per head on the lane axis;
see the KVCache docstring) updated with one dynamic_update_slice per
layer inside the jit'd decode loop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import GitConfig
from .nn import (
    attention_weights,
    gelu_erf,
    layer_norm,
    linear,
    merge_heads,
    qkv_project,
)

NEG_INF = -1e18  # additive-mask "blocked"; avoids inf-inf NaN edge cases


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_textual_params(key, cfg: GitConfig, dtype=jnp.float32):
    d, v = cfg.hidden_size, cfg.vocab_size
    n = cfg.num_layers
    keys = iter(jax.random.split(key, 16))

    def normal(k, shape, std=0.02):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    def ln(shape_last, stacked=None):
        shape = ((stacked, shape_last) if stacked else (shape_last,))
        return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    blocks = {
        "attn": {
            "qkv": {
                "kernel": normal(next(keys), (n, d, 3 * d)),
                "bias": jnp.zeros((n, 3 * d), dtype),
            },
            "out": {
                "kernel": normal(next(keys), (n, d, d)),
                "bias": jnp.zeros((n, d), dtype),
            },
        },
        "attn_ln": ln(d, n),  # post-norm after attention residual
        "mlp": {
            "intermediate": {
                "kernel": normal(next(keys), (n, d, cfg.feedforward_size)),
                "bias": jnp.zeros((n, cfg.feedforward_size), dtype),
            },
            "output": {
                "kernel": normal(next(keys), (n, cfg.feedforward_size, d)),
                "bias": jnp.zeros((n, d), dtype),
            },
        },
        "mlp_ln": ln(d, n),  # post-norm after mlp residual
    }
    return {
        "visual_projection": {
            "linear": {
                "kernel": normal(next(keys), (cfg.visual_feature_size, d)),
                "bias": jnp.zeros((d,), dtype),
            },
            "ln": ln(d),
        },
        "embedding": {
            "words": normal(next(keys), (v, d)),
            "positions": normal(next(keys), (cfg.max_caption_length, d)),
            "ln": ln(d),
        },
        "blocks": blocks,
        # tied output head: logits = h @ words.T + output_bias
        "output_bias": jnp.zeros((v,), dtype),
    }


# ---------------------------------------------------------------------------
# sub-modules
# ---------------------------------------------------------------------------


def project_visual(params, feats, cfg: GitConfig):
    """'linearLn' projection of encoder tokens into decoder space
    (decoder.py:30-36)."""
    p = params["visual_projection"]
    return layer_norm(linear(feats, p["linear"]), p["ln"], cfg.projection_ln_eps)


def embed_captions(params, tokens, cfg: GitConfig, position_offset=0):
    """Word + positional embedding with LN(eps 1e-8) (decoder.py:65-78).

    tokens: [B, T] int32; positions are absolute text positions
    (position_offset + arange(T)).
    """
    e = params["embedding"]
    t = tokens.shape[-1]
    word = jnp.take(e["words"], tokens, axis=0)
    pos_idx = position_offset + jnp.arange(t)
    pos = jnp.take(e["positions"], pos_idx, axis=0)
    return layer_norm(word + pos, e["ln"], cfg.embedding_ln_eps)


def output_logits(params, hidden, acc_dtype=None):
    """Weight-tied output projection (decoder.py:500-505).  With
    int8-quantized params (gitax.ops.quant) the vocab matrix streams as
    int8 and the per-row scale applies to the logits.

    acc_dtype: accumulation/output dtype.  The DECODE path passes
    float32 — the MXU accumulates bf16 matmuls in f32 at full rate, so
    this is free (measured 96.0 vs 97.5 ms/batch, within noise) and
    lifts fast-mode token identity vs the f32 parity program from 93.4%
    to 95.3% by removing bf16 rounding exactly where near-tie beam
    choices flip.  The full-sequence TRAINING path keeps hidden.dtype:
    the [B, S, V] logit activation is the documented memory limiter at
    B=64, and f32 would double it."""
    out_dtype = acc_dtype or hidden.dtype
    if "output_words_q8_t" in params:
        logits = jnp.dot(
            hidden,
            params["output_words_q8_t"].astype(hidden.dtype),
            preferred_element_type=out_dtype,
        )
        logits = logits * params["output_words_scale"].astype(out_dtype)
        return logits + params["output_bias"].astype(out_dtype)
    w = params["embedding"]["words"].astype(hidden.dtype)
    return (
        jnp.dot(hidden, w.T, preferred_element_type=out_dtype)
        + params["output_bias"].astype(out_dtype)
    )


def build_unified_mask(
    num_memory: int,
    num_text: int,
    memory_valid=None,  # [B, M] bool, True = valid
    bi_valid_mask=None,  # [B, Tv] bool, True = open full attention to col
    batch: int = 1,
):
    """Additive attention mask [B, 1, M+T, M+T] (decoder.py:114-146).

    Layout (rows attend to cols): mem->mem 0, mem->text NEG_INF,
    text->mem 0, text->text causal.  Padded memory columns get NEG_INF
    everywhere; `bi_valid_mask` columns are forced to 0 for all rows.
    """
    m, t = num_memory, num_text
    s = m + t
    row = jnp.arange(s)[:, None]
    col = jnp.arange(s)[None, :]
    is_text_col = col >= m
    is_text_row = row >= m
    causal_block = (col > row) & is_text_col & is_text_row
    mem_to_text = (~is_text_row) & is_text_col
    mask = jnp.where(causal_block | mem_to_text, NEG_INF, 0.0).astype(jnp.float32)
    mask = jnp.broadcast_to(mask, (batch, s, s))
    if memory_valid is not None:
        col_block = jnp.concatenate(
            [~memory_valid, jnp.zeros((batch, t), bool)], axis=1
        )
        mask = mask + jnp.where(col_block[:, None, :], NEG_INF, 0.0)
    if bi_valid_mask is not None:
        tv = bi_valid_mask.shape[1]
        open_cols = jnp.concatenate(
            [
                jnp.zeros((batch, m), bool),
                bi_valid_mask,
                jnp.zeros((batch, t - tv), bool),
            ],
            axis=1,
        )
        mask = jnp.where(open_cols[:, None, :], 0.0, mask)
    return mask[:, None, :, :]


def _attn_tail(xcur, ctx_merged, bp, cfg: GitConfig):
    """Shared post-attention block: out-projection + residual post-norm
    + MLP + residual post-norm (modeling_bert.py:269-297).  ONE home for
    this sequence — the full forward, prefill, and both decode-step
    paths (XLA and Pallas kernel) all route through it, so the paths
    cannot drift apart structurally."""
    attn_out = linear(ctx_merged, bp["attn"]["out"])
    x = layer_norm(attn_out + xcur, bp["attn_ln"], cfg.bert_ln_eps)
    inter = gelu_erf(linear(x, bp["mlp"]["intermediate"]))
    return layer_norm(
        linear(inter, bp["mlp"]["output"]) + x, bp["mlp_ln"], cfg.bert_ln_eps
    )


def _bert_layer(x, bp, cfg: GitConfig, mask, fast=False):
    """Post-norm BERT layer (modeling_bert.py:269-297)."""
    q, k, v = qkv_project(x, bp["attn"], cfg.num_heads)
    probs = attention_weights(q, k, mask, fast=fast).astype(v.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=v.dtype)
    return _attn_tail(x, merge_heads(ctx), bp, cfg)


# ---------------------------------------------------------------------------
# full (training / parity) forward
# ---------------------------------------------------------------------------


def textual_forward(
    params,
    visual_features,  # [B, M, Dv] encoder tokens (None for text-only)
    caption_tokens,  # [B, T] int32
    cfg: GitConfig,
    memory_valid=None,
    bi_valid_mask=None,
    dtype=jnp.float32,
    fast=False,
):
    """Full unified forward -> logits [B, T, vocab]
    (reference decoder.py:521-600 + 97-163).  fast=True keeps score
    math in the activation dtype (training speed mode; f32 is parity)."""
    b, t = caption_tokens.shape
    text = embed_captions(params, caption_tokens, cfg).astype(dtype)
    if visual_features is not None:
        mem = project_visual(params, visual_features.astype(dtype), cfg)
        m = mem.shape[1]
        x = jnp.concatenate([mem, text], axis=1)
    else:
        m = 0
        x = text
    mask = build_unified_mask(m, t, memory_valid, bi_valid_mask, batch=b)

    def scan_fn(carry, bp):
        return _bert_layer(carry, bp, cfg, mask, fast=fast), None

    x, _ = jax.lax.scan(scan_fn, x, params["blocks"])
    return output_logits(params, x[:, m:])


# ---------------------------------------------------------------------------
# incremental decode: prefill + step with a static KV cache
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Static-shape decode state.

    mem_k/mem_v: L-tuples of [B, H, M, Dh] — memory keys/values per
      layer, computed once (image tokens never attend to text, so the
      memory stream is closed under prefill).
    txt_kv: L-tuple of [T_max, B, H*2*Dh] — text keys and values
      per head INTERLEAVED on the (flat) lane axis
      (head h's keys at [..., h*2Dh : h*2Dh+Dh], values at
      [..., h*2Dh+Dh : (h+1)*2Dh]),
      filled progressively by one dynamic_update_slice per layer per
      step.  Per-layer TUPLES, not one stacked [L, ...] array: scanning
      layers over a stacked buffer makes XLA slice + restack the full
      per-layer cache every layer of every step (~150 MB/step measured
      for GIT_LARGE beam-4, ~35% of the decode loop).  K/V fused into
      one buffer because the decode loop is per-op-overhead-bound on
      this backend (~25 us/op): one update + one tile op per layer
      instead of two.  The TIME axis is MAJOR: XLA-TPU only performs the
      per-step dynamic_update_slice in place when the updated dim is the
      leading one (measured: 0.1 us vs a full 9.4 MB buffer copy at
      27.8 us/layer/step with [B, H, T, 2Dh]).
    anc: optional int32 [B*beams, T_max] beam-ancestry table: the cache
      ROW (within the batch element's beam group) whose position-t entry
      belongs to this beam's history.  When present, beam search never
      physically reorders txt_k/txt_v (which would copy the full
      [L, BK, H, T, Dh] buffers every step — ~30% of the step time);
      decode_step instead computes text-attention scores against ALL
      beam rows and selects per position via the ancestry one-hot
      (gather-on-read).  None for greedy/trie decode (no reordering).
    length: [] int32 — number of valid text positions already cached.
    """

    mem_k: tuple
    mem_v: tuple
    txt_kv: tuple
    memory_valid: Optional[jax.Array]
    length: jax.Array
    anc: Optional[jax.Array] = None
    # L-tuple of [B, H, M, 2Dh] — memory k|v interleaved per head, the
    # layout the fused decode kernel consumes (ops/decode_attention.py).
    # Built at prefill when kernel_memory is truthy; None otherwise.
    # kernel_memory='int8' stores int8 values with per-(batch, head)
    # k|v scales in mem_scale (halves the decode loop's dominant HBM
    # stream — the memory is re-read every step).
    mem_kv: Optional[tuple] = None
    mem_scale: Optional[tuple] = None
    # [B, M8] f32 — the kernel's additive memory bias (memory_valid as
    # 0/-inf, -inf over the 8-padding), built ONCE at prefill so the
    # decode loop never rebuilds a loop-invariant tensor per step
    mem_bias_k: Optional[jax.Array] = None

    @property
    def max_text_len(self):
        return self.txt_kv[0].shape[0]

    @property
    def num_layers(self):
        return len(self.txt_kv)

    @property
    def batch(self):
        return self.mem_k[0].shape[0]


def prefill(
    params,
    visual_features,  # [B, M, Dv]
    prefix_tokens,  # [B, Tp] int32 ([CLS] + optional question prefix)
    cfg: GitConfig,
    max_text_len: int,
    memory_valid=None,
    dtype=jnp.float32,
    fast=False,
    kernel_memory=False,
    flash=None,
):
    """Run [memory; prefix] once, returning last-position logits and a
    cache ready for single-token steps.  kernel_memory=True additionally
    emits the interleaved memory k|v the fused decode kernel reads.

    fast=True keeps attention score math in the activation dtype — the
    prefill materializes [B, H, M+Tp, M+Tp] score tensors, ~300 MB/layer
    in f32 for GIT_LARGE B=32, so this halves the prefill's dominant
    traffic.  Off by default (parity mode: f32 scores everywhere in the
    decoder).

    flash routes the prefill attention through the fused Pallas kernel
    (ops/flash_attention.py, unified block mask generated in-kernel);
    None auto-enables it at the same measured S>=640 crossover as the
    encoder, long-memory (video M=1542, high-res M~900-1200) prefills
    only, never in f32 parity mode and only for fully-valid memories
    (the kernel's in-kernel mask has no per-row validity input).

    Matches reference semantics where the first beam-search step feeds
    the full prefix (decoder.py:1013-1044).
    """
    b, tp = prefix_tokens.shape
    mem = project_visual(params, visual_features.astype(dtype), cfg)
    m = mem.shape[1]
    text = embed_captions(params, prefix_tokens, cfg).astype(dtype)
    x = jnp.concatenate([mem, text], axis=1)
    mask = build_unified_mask(m, tp, memory_valid, batch=b)

    if flash is None:
        from ..ops.flash_attention import auto_flash

        flash = memory_valid is None and auto_flash(m + tp, dtype)
    else:
        flash = flash and memory_valid is None

    h, dh = cfg.num_heads, cfg.head_dim
    pad = max_text_len - tp
    assert pad >= 0, (tp, max_text_len)

    def scan_fn(carry, bp):
        xcur = carry
        q, k, v = qkv_project(xcur, bp["attn"], cfg.num_heads)
        if flash:
            from ..ops.flash_attention import fused_attention

            ctx = fused_attention(q, k, v, num_memory=m, masked=True)
        else:
            probs = attention_weights(q, k, mask, fast=fast).astype(v.dtype)
            ctx = jnp.einsum(
                "bhqk,bhkd->bhqd", probs, v, preferred_element_type=v.dtype
            )
        xnew = _attn_tail(xcur, merge_heads(ctx), bp, cfg)
        # time-major text cache (see KVCache docstring): [T_max, B, H*2Dh]
        tkv = jnp.concatenate([k[:, :, m:], v[:, :, m:]], axis=-1).transpose(
            2, 0, 1, 3
        )
        txt_kv = jnp.pad(
            tkv.reshape(tkv.shape[0], b, h * 2 * dh),
            ((0, pad), (0, 0), (0, 0)),
        )
        outs = (k[:, :, :m], v[:, :, :m], txt_kv)
        if kernel_memory:
            # M 8-padded for the kernel's DMA sublane alignment (see
            # ops/decode_attention.pad_memory_m8)
            from ..ops.decode_attention import pad_memory_m8

            kv_mem = jnp.concatenate([k[:, :, :m], v[:, :, :m]], axis=-1)
            if kernel_memory == "int8":
                # quantize the decode loop's dominant HBM stream once at
                # prefill (per-(batch, head) k|v scales; see
                # ops/decode_attention.py)
                from ..ops.decode_attention import quantize_memory

                kv_q, kv_scale = quantize_memory(kv_mem)
                outs = outs + (pad_memory_m8(kv_q), kv_scale)
            else:
                outs = outs + (pad_memory_m8(kv_mem),)
        return xnew, outs

    x, scanned = jax.lax.scan(scan_fn, x, params["blocks"])
    mem_k, mem_v, txt_kv = scanned[:3]
    logits = output_logits(params, x[:, m + tp - 1 : m + tp],
                           acc_dtype=jnp.float32)[:, 0]
    n_layers = mem_k.shape[0]
    # per-layer tuples (see KVCache docstring); the unstack copies once
    # at prefill, never inside the decode loop
    mem_bias_k = None
    if kernel_memory:
        from ..ops.decode_attention import pad_memory_bias

        if memory_valid is not None:
            bias = jnp.where(memory_valid, 0.0, NEG_INF).astype(jnp.float32)
        else:
            bias = jnp.zeros((b, m), jnp.float32)
        mem_bias_k = pad_memory_bias(bias, scanned[3].shape[3])
    cache = KVCache(
        mem_k=tuple(mem_k[i] for i in range(n_layers)),
        mem_v=tuple(mem_v[i] for i in range(n_layers)),
        txt_kv=tuple(txt_kv[i] for i in range(n_layers)),
        memory_valid=memory_valid,
        length=jnp.asarray(tp, jnp.int32),
        mem_kv=tuple(scanned[3][i] for i in range(n_layers))
        if kernel_memory
        else None,
        mem_scale=tuple(scanned[4][i] for i in range(n_layers))
        if kernel_memory == "int8"
        else None,
        mem_bias_k=mem_bias_k,
    )
    return logits, cache


def decode_step(params, tokens, cache: KVCache, cfg: GitConfig, dtype=jnp.float32,
                kernel=False, vocab_kernel=False):
    """One incremental step: tokens [B*beams] at text position cache.length.

    vocab_kernel: route the tied output projection through the fused
    Pallas matmul (ops/vocab_topk.py) that emits the beam prefilter's
    block maxima + block sum-exp as matmul-epilogue outputs; requires
    the int8-quantized head (params['output_words_q8_t']).  Changes the
    RETURN ARITY to (logits [BK, NB*512] -inf-padded, cache,
    (bmax, bsum)) — only decode/beam.py's vocab_stats path consumes it.
    'interpret' runs the kernel in Pallas interpret mode (CPU tests).

    kernel=True routes the per-layer attention (cache write + memory and
    ancestry-selected text scores + softmax + context) through the fused
    Pallas kernel (ops/decode_attention.py) — TPU only, requires an
    ancestry table (beam search sets one).  Score math is f32 in both
    paths; in f32 activations the kernel is bit-exact with the XLA path,
    in bf16 the context accumulates in f32 in-kernel vs per-contraction
    bf16 rounding in XLA — low-bit context differences that measured
    token-identical on chip but are not guaranteed bit-wise.  With
    prefill(kernel_memory='int8') the memory stream is additionally
    int8-quantized (quantization-noise-level differences).

    Memory K/V are stored ONCE per batch element ([B, H, M, Dh] per
    layer) while text K/V carry the full beam axis (time-major
    [T_max, B*beams, H*2Dh] per layer); attention scores against memory
    broadcast over beams
    instead of materializing beam-tiled (or concatenated) K/V — on TPU
    this cuts the dominant HBM traffic of the decode loop ~4x for beam-4
    (memory K/V for ViT-L is ~300 MB/step if tiled).

    The layer loop is an unrolled Python loop over the cache's per-layer
    buffers — NOT a lax.scan over a stacked [L, ...] cache, which would
    slice + restack the whole text cache every layer (measured ~35% of
    the step); each buffer takes one in-place single-position
    dynamic_update_slice per step.

    Returns (logits [B*beams, vocab], updated cache).
    """
    bk = tokens.shape[0]
    b = cache.batch
    beams = bk // b
    assert beams * b == bk, (bk, b)
    pos = cache.length
    x = embed_captions(params, tokens[:, None], cfg, position_offset=pos)
    x = x.astype(dtype)

    h, dh = cfg.num_heads, cfg.head_dim
    m = cache.mem_k[0].shape[2]
    t_max = cache.max_text_len
    # text-position bias: attend to cached text positions <= pos
    txt_bias = jnp.where(jnp.arange(t_max) <= pos, 0.0, NEG_INF).astype(jnp.float32)
    if cache.memory_valid is not None:
        mem_bias = jnp.where(cache.memory_valid, 0.0, NEG_INF).astype(jnp.float32)
    else:
        mem_bias = None  # [B, M] when present
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32)).astype(dtype)
    use_kernel = kernel and cache.anc is not None and cache.mem_kv is not None
    if use_kernel:
        from ..ops.decode_attention import kernel_fits, kernel_pays

        # kernel_pays: int8 memory always (the kernel is its only
        # consumer); bf16 memory only below the measured M crossover —
        # long-memory bf16 loops (video M=1542, high-res ~900-1200) stay
        # on the XLA path, whose bulk batched-matmul streams win there
        use_kernel = kernel_pays(
            cache.mem_kv[0].shape[2], cache.mem_kv[0].dtype == jnp.int8
        ) and kernel_fits(
            b, beams, h, dh, cache.mem_kv[0].shape[2], t_max,
            mem_itemsize=cache.mem_kv[0].dtype.itemsize,
            act_itemsize=jnp.dtype(dtype).itemsize,
        )
    if cache.anc is not None and not use_kernel:
        # ancestry one-hot [B, K, T, J]: position t of beam k lives in
        # cache row j of the same beam group (gather-on-read; see
        # KVCache docstring)
        anc_onehot = jax.nn.one_hot(
            cache.anc.reshape(b, beams, t_max), beams, dtype=jnp.float32
        )
    else:
        anc_onehot = None

    def run_layers(layer, *streams):
        """Shared unrolled-layer scaffold + epilogue for both decode
        paths (one home, like _attn_tail — the two paths must not
        drift)."""
        x_cur = x
        new_txt_kv = []
        for li in range(cache.num_layers):
            bp = jax.tree_util.tree_map(lambda a: a[li], params["blocks"])
            x_cur, tkv = layer(x_cur, bp, *[s[li] for s in streams])
            new_txt_kv.append(tkv)
        cache_new = cache._replace(txt_kv=tuple(new_txt_kv), length=pos + 1)
        if vocab_kernel:
            from ..ops.vocab_topk import vocab_logits_topk

            assert "output_words_q8_t" in params, (
                "vocab_kernel requires the int8-quantized output head "
                "(ops/quant.quantize_textual_for_decode)"
            )
            logits, bmax, bsum = vocab_logits_topk(
                x_cur[:, 0],
                params["output_words_q8_t"],
                params["output_words_scale"],
                params["output_bias"],
                interpret=(vocab_kernel == "interpret"),
            )
            return logits, cache_new, (bmax, bsum)
        logits = output_logits(params, x_cur[:, 0], acc_dtype=jnp.float32)
        return logits, cache_new

    if use_kernel:
        from ..ops.decode_attention import (
            build_live_mask,
            decode_attention,
            plan_cells,
        )

        # [B, M8] kernel memory bias built once at prefill (covers the
        # memory_valid mask AND the 8-padding with -inf)
        m_kv = cache.mem_kv[0].shape[2]
        kernel_bias = cache.mem_bias_k
        assert kernel_bias is not None and kernel_bias.shape == (b, m_kv)
        # liveness mask computed ONCE per step, shared by every layer's
        # kernel call (structural sharing, not optimizer-dependent CSE)
        _, r, _ = plan_cells(
            b, beams, h, dh, m_kv, t_max,
            mem_itemsize=cache.mem_kv[0].dtype.itemsize,
            act_itemsize=jnp.dtype(dtype).itemsize,
        )
        live = build_live_mask(cache.anc, pos, r, t_max, beams)

        def layer(xcur, bp, mem_kv, mem_scale, txt_kv):
            q, k_new, v_new = qkv_project(xcur, bp["attn"], cfg.num_heads)
            qs = q[:, :, 0] * scale  # [BK, H, Dh]
            qz = jnp.concatenate([qs, jnp.zeros_like(qs)], axis=-1)
            kvn = jnp.concatenate([k_new[:, :, 0], v_new[:, :, 0]], axis=-1)
            ctx128, txt_kv = decode_attention(
                qz.reshape(bk, h * 2 * dh),
                kvn.reshape(bk, h * 2 * dh),
                txt_kv,
                cache.anc,
                pos,
                mem_kv,
                kernel_bias,
                mem_scale,
                live,
                beams=beams,
                num_heads=h,
                head_dim=dh,
            )
            ctx = ctx128.reshape(bk, h, 2 * dh)[..., dh:].reshape(
                bk, 1, h * dh
            )
            return _attn_tail(xcur, ctx, bp, cfg), txt_kv

        return run_layers(
            layer,
            cache.mem_kv,
            cache.mem_scale
            if cache.mem_scale is not None
            else (None,) * cache.num_layers,
            cache.txt_kv,
        )

    def layer(xcur, bp, mem_k, mem_v, txt_kv):
        q, k_new, v_new = qkv_project(xcur, bp["attn"], cfg.num_heads)
        # time-major in-place cache write: [1, BK, H*2Dh] at row `pos`
        new_row = jnp.concatenate([k_new, v_new], axis=-1).transpose(
            2, 0, 1, 3
        ).reshape(1, bk, h * 2 * dh)
        txt_kv = jax.lax.dynamic_update_slice(txt_kv, new_row, (pos, 0, 0))
        qb = (q[:, :, 0] * scale).reshape(b, beams, h, dh)
        mem_scores = jnp.einsum(
            "bkhd,bhmd->bkhm", qb, mem_k, preferred_element_type=jnp.float32
        )
        if mem_bias is not None:
            mem_scores = mem_scores + mem_bias[:, None, None, :]
        kvb = txt_kv.reshape(t_max, b, beams, h, 2 * dh)
        txt_kb = kvb[..., :dh]
        txt_vb = kvb[..., dh:]
        if anc_onehot is None:
            txt_scores = jnp.einsum(
                "bkhd,tbkhd->bkht", qb, txt_kb,
                preferred_element_type=jnp.float32,
            )
        else:
            # scores vs ALL beam rows, then per-position ancestry select —
            # K x more score FLOPs (tiny) for zero cache-permutation HBM
            # traffic
            scores_all = jnp.einsum(
                "bkhd,tbjhd->bkjht", qb, txt_kb,
                preferred_element_type=jnp.float32,
            )
            txt_scores = jnp.einsum(
                "bkjht,bktj->bkht", scores_all, anc_onehot
            )
        txt_scores = txt_scores + txt_bias
        scores = jnp.concatenate([mem_scores, txt_scores], axis=-1)
        probs = jax.nn.softmax(scores, axis=-1).astype(xcur.dtype)
        ctx_mem = jnp.einsum(
            "bkhm,bhmd->bkhd", probs[..., :m], mem_v,
            preferred_element_type=xcur.dtype,
        )
        if anc_onehot is None:
            ctx_txt = jnp.einsum(
                "bkht,tbkhd->bkhd", probs[..., m:], txt_vb,
                preferred_element_type=xcur.dtype,
            )
        else:
            pe = jnp.einsum(
                "bkht,bktj->bkjht",
                probs[..., m:],
                anc_onehot.astype(xcur.dtype),
            )
            ctx_txt = jnp.einsum(
                "bkjht,tbjhd->bkhd", pe, txt_vb,
                preferred_element_type=xcur.dtype,
            )
        ctx = (ctx_mem + ctx_txt).reshape(bk, 1, h * dh)
        return _attn_tail(xcur, ctx, bp, cfg), txt_kv

    return run_layers(layer, cache.mem_k, cache.mem_v, cache.txt_kv)
