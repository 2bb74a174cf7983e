"""Device-side beam search: the whole search is one XLA graph.

Replicates the semantics of the reference's GeneratorWithBeamSearch
(decoder.py:1056-1290) — per-node topk over [beams x vocab], sequential
candidate triage (EOS -> n-best hypothesis heap, non-EOS -> next beam
until full, decoder.py:1184-1222), OpenNMT length norm
((5+len)/6)^alpha (decoder.py:1310-1313), `is_done` early stopping
(decoder.py:1330-1341), the forced add-all at cur_len+1 == max_length
(decoder.py:1202-1216), and done-batch padding — but as a
`lax.while_loop` over static-shape state with a KV cache, instead of a
host Python loop that syncs logits every step.

The host-side sequential candidate loop becomes vectorized rank
arithmetic: with candidates sorted by score, a candidate is a beam
filler iff it is non-EOS and fewer than `num_beams` non-EOS candidates
precede it; an EOS candidate reaches the hypothesis buffer iff fewer
than `num_beams` non-EOS candidates precede it (the reference breaks out
of the loop once the beam is full).  Hypothesis insertion becomes a
top-N merge that prefers existing entries on ties (the reference's
strict `score > worst_score`).
"""

from __future__ import annotations

import dataclasses

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.textual import KVCache

# numpy (not jnp) scalars: module import must not initialise the XLA
# backend — jax.distributed.initialize() has to run first on multi-host
NEG_INF = np.float32(-1e9)
EMPTY_HYP_LOGPROB = np.float32(-1e5)  # reference decoder.py:1265-1266


@dataclasses.dataclass(frozen=True)
class BeamSearchConfig:
    """Static search hyper-parameters (reference model.py:34-40 defaults)."""

    num_beams: int = 4
    per_node_beam_size: int = 2
    length_penalty: float = 0.6
    max_steps: int = 1024  # loop bound / sequence buffer length
    num_keep_best: int = 1
    eos_id: int = 102
    repetition_penalty: float = 1.0
    # length-norm max_length for is_done; the reference couples it to
    # max_steps (decoder.py:1111-1114) — keep None for parity, set 1024
    # when using a shorter decode buffer in production
    norm_max_length: Optional[int] = None
    # sampling (decoder.py:1146-1166): per-node multinomial draws without
    # replacement (Gumbel top-k) after temperature + top-k/top-p filtering
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0
    top_p: Optional[float] = None


def _length_norm(length, alpha):
    """((5+len)/6)^alpha — OpenNMT norm (decoder.py:1310-1313)."""
    return ((5.0 + length) ** alpha) / (6.0 ** alpha)


def top_k_top_p_filter(logits, top_k=0, top_p=None, min_tokens_to_keep=1,
                       filter_value=-jnp.inf):
    """Top-k / nucleus filtering (reference decoder.py:1343-1375)."""
    v = logits.shape[-1]
    if top_k and top_k > 0:
        k = min(max(top_k, min_tokens_to_keep), v)
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, filter_value, logits)
    if top_p is not None and top_p < 1.0:
        # stable descending order; removal is POSITIONAL (scatter back by
        # sorted position, reference decoder.py:1360-1374) — a value
        # threshold would also keep tokens TIED with the smallest kept
        # logit, silently widening the sampling support
        order = jnp.argsort(-logits, axis=-1, stable=True)
        sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # keep tokens until cumulative prob exceeds top_p (shifted right so
        # the first token above the threshold is kept), always keeping
        # min_tokens_to_keep
        remove_sorted = cum > top_p
        remove_sorted = jnp.concatenate(
            [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]],
            axis=-1,
        )
        if min_tokens_to_keep > 1:
            remove_sorted = remove_sorted.at[..., :min_tokens_to_keep].set(False)
        # rank[j] = position of column j in the sorted order
        rank = jnp.argsort(order, axis=-1, stable=True)
        removed = jnp.take_along_axis(remove_sorted, rank, axis=-1)
        logits = jnp.where(removed, filter_value, logits)
    return logits


def _top_k_iterative(x, k, small_axis=4096):
    """Exact top-k, ties -> lowest index (a stable descending sort's
    order — the rule the reference's torch.topk/sort path follows).

    Two regimes, one semantics (lax.top_k documents the SAME tie rule:
    "If two elements are equal, the lower-index element appears first"):

    * n <= small_axis: one fused lax.top_k.  The k-argmax-pass loop
      below costs ~3 dispatched ops + one full buffer COPY per pass
      (the .at[].set scatter can't alias a loop-live buffer), and the
      beam-loop is dispatched-op bound (see
      tools/bench_decode_roofline.py) — measured on v5e, switching the
      [BK,4096]/[BK,NB]/[B,KC] call sites to lax.top_k cut the while
      body 499 -> 350 instructions (copies 73 -> 58), per-step 0.87 ->
      0.731 ms, headline 524.7 -> 541.7 img/s/chip.
    * large n (the unblocked fallback over num_beams*vocab ~ 122k):
      k sequential argmax passes — k cheap VPU reductions instead of
      lax.top_k's sort-based kernel, the single biggest cost in the
      beam step on TPU at this width.
    """
    b, n = x.shape
    # lax.top_k raises an opaque error when k > n, and the iterative path
    # below would silently repeat -inf entries; neither is a valid ask
    # for any current call site — fail loudly at trace time instead
    assert k <= n, "top-k asked for k=%d of an axis of size %d" % (k, n)
    if n <= small_axis:
        return jax.lax.top_k(x, k)
    rows = jnp.arange(b)
    vals, idxs = [], []
    cur = x
    for _ in range(k):
        i = jnp.argmax(cur, axis=-1)
        v = jnp.take_along_axis(cur, i[:, None], axis=-1)[:, 0]
        vals.append(v)
        idxs.append(i)
        cur = cur.at[rows, i].set(-jnp.inf)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def _top_k_blocked(x, k, block=512, bmax=None):
    """Exact top-k via block-max prefilter: one max-reduce pass picks the
    k best blocks (the true top-k occupy at most k blocks, and each such
    block's max is >= the k-th value, so the k max-ranked blocks always
    cover them), then the iterative argmax runs over only k*block
    gathered candidates.  Ties resolve to the lowest flat index, exactly
    like _top_k_iterative: block gathering preserves index order.

    Cuts the top-k's HBM traffic over a [BK, V~30k] logit tensor from
    2k full passes to ~1, worth ~0.1 ms/step in the GIT_LARGE beam loop.

    bmax: optional precomputed [B, ceil(n/block)] block maxima (the
    fused vocab-projection kernel, ops/vocab_topk.py, emits them as a
    matmul epilogue so the full pass here never re-reads HBM).  Must be
    the maxima of THIS x under the same -inf padding rule.
    """
    b, n = x.shape
    nb = (n + block - 1) // block
    if bmax is None and nb < max(k, 4):
        return _top_k_iterative(x, k)
    pad = nb * block - n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    xb = x.reshape(b, nb, block)
    if bmax is None:
        bmax = xb.max(axis=-1)  # [B, NB] — the single full pass
    assert bmax.shape == (b, nb), (bmax.shape, b, nb)
    _, bidx = _top_k_iterative(bmax, k)  # [B, K] best blocks, ascending-max tie rule
    # gather candidate blocks IN INDEX ORDER so flat tie-order survives
    bidx = jnp.sort(bidx, axis=-1)
    cand = jnp.take_along_axis(xb, bidx[:, :, None], axis=1)  # [B, K, block]
    vals, within = _top_k_iterative(cand.reshape(b, k * block), k)
    blk = within // block
    off = within % block
    idx = jnp.take_along_axis(bidx, blk, axis=1) * block + off
    return vals, idx


def _tile_beams(cache: KVCache, num_beams: int) -> KVCache:
    """Expand the TEXT cache to B*num_beams.  Memory K/V (and its
    validity mask) stay at batch B — beams of one element share them, and
    decode_step broadcasts attention over the beam axis instead of
    paying beam-tiled memory-K/V HBM traffic every step."""
    return cache._replace(
        txt_kv=tuple(jnp.repeat(kv, num_beams, axis=1) for kv in cache.txt_kv),
    )


def beam_search(
    decode_step_fn,
    prefill_logits,  # [B, V] logits at the last prefix position
    cache: KVCache,  # batch-B cache from prefill
    prefix_tokens,  # [B, Tp]
    cfg: BeamSearchConfig,
    rng=None,  # PRNG key, required when cfg.do_sample
    vocab_stats=False,
):
    """Run the search. Returns (decoded [B, N, max_steps] int32,
    logprobs [B, N] f32).  Sequences include the prefix (the caller
    strips it, reference decoder.py:1004-1006) and are EOS-padded.

    decode_step_fn(tokens [BK], cache) -> (logits [BK, V], cache).

    vocab_stats=True: decode_step_fn instead returns
    (logits [BK, NB*512] -inf-padded, cache, (bmax [BK, NB],
    bsum [BK, NB])) — the fused vocab-projection kernel's epilogue
    outputs (ops/vocab_topk.py) — and the loop consumes the block
    maxima / block sum-exp directly instead of re-reading the full
    logits for the prefilter max pass and the logsumexp.  Greedy beam
    only (the sampling / repetition-penalty consumers want unpadded
    full logits); callers gate (models/git.py::generate).
    """
    b, tp = prefix_tokens.shape
    k = cfg.num_beams
    n = cfg.num_keep_best
    c = cfg.per_node_beam_size * k  # candidates per batch element
    if cfg.do_sample:
        assert rng is not None, "do_sample requires a PRNG key"
    else:
        rng = jax.random.PRNGKey(0)  # unused; keeps state structure static
    v = prefill_logits.shape[-1]
    max_len = cfg.max_steps
    alpha = cfg.length_penalty
    assert tp < max_len, (tp, max_len)

    cache = _tile_beams(cache, k)
    # beam-ancestry table (gather-on-read, see KVCache.anc): prefix
    # positions are replicated across rows, so identity is correct
    t_buf = cache.max_text_len
    own_row = jnp.tile(jnp.arange(k, dtype=jnp.int32), b)  # [BK]
    cache = cache._replace(
        anc=jnp.broadcast_to(own_row[:, None], (b * k, t_buf))
    )

    # beam state
    seqs = jnp.full((b, k, max_len), cfg.eos_id, jnp.int32)
    seqs = seqs.at[:, :, :tp].set(prefix_tokens[:, None, :])
    beam_scores = jnp.full((b, k), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    # hypothesis buffers (n-best per batch)
    hyp_seqs = jnp.full((b, n, max_len), cfg.eos_id, jnp.int32)
    hyp_scores = jnp.full((b, n), -jnp.inf, jnp.float32)
    hyp_count = jnp.zeros((b,), jnp.int32)
    done = jnp.zeros((b,), bool)
    # logits stay in the model's compute dtype; score math upcasts to f32
    # only where it matters (logsumexp, candidate scores)
    logits0 = jnp.repeat(prefill_logits, k, axis=0)
    if vocab_stats:
        assert not cfg.do_sample and cfg.repetition_penalty == 1.0, (
            "vocab_stats supports the plain greedy-beam path only"
        )
        # the prefill step's logits come from the XLA head; pad + derive
        # the same block stats the kernel will emit every loop step
        from ..ops.vocab_topk import block_stats_xla

        logits0, bmax0, bsum0 = block_stats_xla(logits0)
    if cfg.repetition_penalty != 1.0:
        seen0 = jax.nn.one_hot(prefix_tokens, v, dtype=bool).any(axis=1)
        seen0 = jnp.repeat(seen0, k, axis=0)  # [BK, V]
    else:
        seen0 = jnp.zeros((0,), bool)

    state = dict(
        cur_len=jnp.asarray(tp, jnp.int32),
        seqs=seqs,
        beam_scores=beam_scores,
        hyp_seqs=hyp_seqs,
        hyp_scores=hyp_scores,
        hyp_count=hyp_count,
        done=done,
        logits=logits0,
        cache=cache,
        seen=seen0,
        rng=rng,
    )
    if vocab_stats:
        state["vstats"] = (bmax0, bsum0)

    done_norm = _length_norm(
        jnp.float32((cfg.norm_max_length or max_len) - 1), alpha
    )

    def cond(st):
        return (st["cur_len"] < max_len) & ~jnp.all(st["done"])

    def body(st):
        cur_len = st["cur_len"]
        logits = st["logits"]  # [BK, V] f32
        if cfg.repetition_penalty != 1.0:
            # CTRL-style (decoder.py:1137-1144): seen tokens' positive
            # logits divided, negative multiplied by the penalty
            seen = st["seen"]
            pen = jnp.where(
                seen,
                jnp.where(
                    logits < 0,
                    logits * cfg.repetition_penalty,
                    logits / cfg.repetition_penalty,
                ),
                logits,
            )
            logits = pen
        rng_cur = st["rng"]
        if cfg.do_sample:
            # sampling path (decoder.py:1146-1166): temperature ->
            # top-k/top-p filter -> per-beam multinomial WITHOUT
            # replacement (Gumbel top-k is equivalent); candidate scores
            # are log-softmax of the filtered logits plus the beam score.
            # NOTE: the reference mislabels parent beams here (its
            # `beam_indices` tiling is [0..K-1]*P while the sampled words
            # are beam-major); we label parents correctly.
            lt = logits.astype(jnp.float32)
            if cfg.temperature != 1.0:
                lt = lt / cfg.temperature
            # the reference hard-codes min_tokens_to_keep=2
            # (decoder.py:1152); keeping at least per_node_beam_size
            # additionally guards the degenerate config where the filter
            # leaves fewer finite logits than samples drawn (the Gumbel
            # top-k would then seat a -inf [PAD] candidate and kill its
            # beam; the reference's torch.multinomial errors there)
            lt = top_k_top_p_filter(
                lt, cfg.top_k, cfg.top_p,
                min_tokens_to_keep=max(2, cfg.per_node_beam_size),
            )
            rng_cur, sub = jax.random.split(rng_cur)
            gumbel = jax.random.gumbel(sub, lt.shape, jnp.float32)
            _, words = jax.lax.top_k(
                jnp.where(jnp.isfinite(lt), lt + gumbel, -jnp.inf),
                cfg.per_node_beam_size,
            )  # [BK, P]
            lp = jax.nn.log_softmax(lt, axis=-1)
            samp_lp = jnp.take_along_axis(lp, words, axis=1)  # [BK, P]
            next_scores = (
                samp_lp.reshape(b, k, cfg.per_node_beam_size)
                + st["beam_scores"][:, :, None]
            ).reshape(b, c)
            beam_of = jnp.repeat(jnp.arange(k), cfg.per_node_beam_size)
            next_idx = words.reshape(b, c) + (beam_of * v)[None, :]
        else:
            # Exact equivalent of topk(log_softmax + beam_score) over the
            # flattened [K*V] axis (decoder.py:1169-1175), restructured:
            # per-beam top-C over RAW logits (log_softmax is a monotone
            # per-row shift), then normalize only the K*C candidates with
            # logsumexp and merge.  Avoids materializing the full-vocab
            # log-softmax every step; tie order (lower flat index first)
            # is preserved.
            if vocab_stats:
                # the projection kernel already took the max + sum-exp
                # passes in its epilogue; no full-logits re-read here
                from ..ops.vocab_topk import TILE, combine_lse

                bmax, bsum = st["vstats"]
                pb_vals, pb_idx = _top_k_blocked(
                    logits, c, block=TILE, bmax=bmax
                )
                lse = combine_lse(bmax, bsum)  # [BK]
            else:
                pb_vals, pb_idx = _top_k_blocked(logits, c)  # [BK, C]
                lse = jax.scipy.special.logsumexp(
                    logits.astype(jnp.float32), axis=-1
                )  # [BK]
            cand = (
                pb_vals.astype(jnp.float32)
                - lse[:, None]
                + st["beam_scores"].reshape(-1)[:, None]
            )  # [BK, C]
            merged_scores = cand.reshape(b, k * c)
            beam_of = jnp.repeat(jnp.arange(k), c)  # [K*C]
            merged_idx = pb_idx.reshape(b, k * c) + (beam_of * v)[None, :]
            next_scores, sel = _top_k_iterative(merged_scores, c)
            next_idx = jnp.take_along_axis(merged_idx, sel, axis=1)
        beam_id = next_idx // v
        word_id = next_idx % v

        # done check uses hypothesis state from BEFORE this step's adds
        # (decoder.py:1187) against the BEST candidate (the reference's
        # next_scores.max(); [:, 0] is only the max in the sorted greedy
        # path — sampled candidates are beam-major, unsorted)
        best_cand = (
            jnp.max(next_scores, axis=1) if cfg.do_sample else next_scores[:, 0]
        )
        newly_done = (st["hyp_count"] >= n) & (
            jnp.min(st["hyp_scores"], axis=1) >= best_cand / done_norm
        )
        done_now = st["done"] | newly_done

        force_add = (cur_len + 1) == max_len  # decoder.py:1202
        is_add = (word_id == cfg.eos_id) | force_add
        non_eos_before = jnp.cumsum((~is_add).astype(jnp.int32), axis=1) - (
            ~is_add
        ).astype(jnp.int32)
        # beam fillers: first k non-EOS candidates
        fill = (~is_add) & (non_eos_before < k)
        slot_onehot = (non_eos_before[:, :, None] == jnp.arange(k)[None, None, :]) & (
            fill[:, :, None]
        )  # [B, C, K]
        sof = slot_onehot.astype(jnp.float32)
        new_scores = jnp.einsum("bck,bc->bk", sof, next_scores)
        new_words = jnp.einsum("bck,bc->bk", sof, word_id.astype(jnp.float32)).astype(
            jnp.int32
        )
        new_parents = jnp.einsum(
            "bck,bc->bk", sof, beam_id.astype(jnp.float32)
        ).astype(jnp.int32)

        # hypothesis adds: EOS (or forced) candidates seen before the beam
        # filled (the reference breaks at len(next_sent_beam)==num_beams,
        # decoder.py:1209-1211)
        eligible = is_add & (non_eos_before < k) & ~done_now[:, None]
        cand_norm = next_scores / _length_norm(cur_len.astype(jnp.float32), alpha)
        cand_norm = jnp.where(eligible, cand_norm, -jnp.inf)
        # candidate sequences: parent beam content, EOS-padded from cur_len on
        parent_seqs = jnp.take_along_axis(
            st["seqs"], beam_id[:, :, None], axis=1
        )  # [B, C, L]
        keep_pos = jnp.arange(max_len)[None, None, :] < cur_len
        cand_seqs = jnp.where(keep_pos, parent_seqs, cfg.eos_id)
        # top-N merge, stable (existing entries win ties — the reference
        # only replaces on strictly better scores)
        all_scores = jnp.concatenate([st["hyp_scores"], cand_norm], axis=1)
        all_seqs = jnp.concatenate([st["hyp_seqs"], cand_seqs], axis=1)
        top_vals, top_idx = jax.lax.top_k(all_scores, n)
        hyp_seqs_new = jnp.take_along_axis(all_seqs, top_idx[:, :, None], axis=1)
        hyp_count_new = st["hyp_count"] + jnp.sum(eligible, axis=1)

        # beam update; frozen for done batches and at the forced final step
        upd = (~done_now) & ~force_add
        own = jnp.broadcast_to(jnp.arange(k)[None, :], (b, k))
        parents = jnp.where(upd[:, None], new_parents, own)
        bscores = jnp.where(
            upd[:, None],
            new_scores,
            jnp.where(done_now[:, None], jnp.zeros_like(new_scores), st["beam_scores"]),
        )
        words = jnp.where(upd[:, None], new_words, cfg.eos_id)
        seqs_re = jnp.take_along_axis(st["seqs"], parents[:, :, None], axis=1)
        col = jax.nn.one_hot(cur_len, max_len, dtype=bool)[None, None, :]
        seqs_new = jnp.where(col, words[:, :, None], seqs_re)

        # no physical cache reorder: inherit the parent's ancestry row
        # and claim position cur_len for this row (decode_step reads
        # history through the ancestry table)
        flat_parents = (
            parents + jnp.arange(b)[:, None] * k
        ).reshape(-1)  # [BK]
        cache_in = st["cache"]
        anc_par = jnp.take(cache_in.anc, flat_parents, axis=0)
        anc_new = jnp.where(
            jnp.arange(cache_in.max_text_len)[None, :] == cur_len,
            own_row[:, None],
            anc_par,
        )
        cache_re = cache_in._replace(anc=anc_new)
        # NOTE: the final iteration's decode_step produces logits nobody
        # reads (~1/max_steps of the search).  Skipping it behind a
        # lax.cond was MEASURED SLOWER on v5e (511 -> 485 img/s): the
        # cond boundary forces the loop-carried cache buffers to
        # materialize, costing more than the dead step saves.
        if vocab_stats:
            step_logits, cache_new, vstats_new = decode_step_fn(
                words.reshape(-1), cache_re
            )
        else:
            step_logits, cache_new = decode_step_fn(words.reshape(-1), cache_re)

        st_new = dict(
            cur_len=cur_len + 1,
            seqs=seqs_new,
            beam_scores=bscores,
            hyp_seqs=hyp_seqs_new,
            hyp_scores=top_vals,
            hyp_count=hyp_count_new,
            done=done_now,
            logits=step_logits,
            cache=cache_new,
            seen=st["seen"],
            rng=rng_cur,
        )
        if vocab_stats:
            st_new["vstats"] = vstats_new
        if cfg.repetition_penalty != 1.0:
            seen_re = jnp.take(st["seen"], flat_parents, axis=0)
            st_new["seen"] = seen_re | jax.nn.one_hot(
                words.reshape(-1), v, dtype=bool
            )
        return st_new

    st = jax.lax.while_loop(cond, body, state)

    # finalize: buffers are already the top-N (sorted desc by top_k); empty
    # slots -> all-EOS sequence with logprob -1e5 (decoder.py:1264-1290)
    filled = jnp.isfinite(st["hyp_scores"])
    logprobs = jnp.where(filled, st["hyp_scores"], EMPTY_HYP_LOGPROB)
    decoded = jnp.where(filled[:, :, None], st["hyp_seqs"], cfg.eos_id)
    return decoded, logprobs
