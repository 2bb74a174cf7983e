"""Fast greedy decode: argmax steps in a lax.while_loop with KV cache.

This is gitax's throughput path (the reference has no dedicated greedy
path; its beam_size=1 searches still run the host-side hypothesis
machinery).  Finished sequences keep emitting EOS, matching the
reference's EOS-forcing semantics (decoder.py:347-351).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.textual import KVCache


def greedy_search(
    decode_step_fn,
    prefill_logits,  # [B, V]
    cache: KVCache,
    prefix_tokens,  # [B, Tp]
    max_steps: int,
    eos_id: int = 102,
):
    """Returns (sequences [B, max_steps] int32 incl. prefix, EOS-padded;
    sum_logprobs [B] f32 over generated tokens up to and incl. EOS)."""
    b, tp = prefix_tokens.shape
    assert tp < max_steps

    seqs = jnp.full((b, max_steps), eos_id, jnp.int32)
    seqs = seqs.at[:, :tp].set(prefix_tokens)

    state = dict(
        cur_len=jnp.asarray(tp, jnp.int32),
        seqs=seqs,
        logits=prefill_logits.astype(jnp.float32),
        cache=cache,
        finished=jnp.zeros((b,), bool),
        sum_logprobs=jnp.zeros((b,), jnp.float32),
    )

    def cond(st):
        return (st["cur_len"] < max_steps) & ~jnp.all(st["finished"])

    def body(st):
        logprobs = jax.nn.log_softmax(st["logits"], axis=-1)
        words = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
        words = jnp.where(st["finished"], eos_id, words)
        tok_lp = jnp.take_along_axis(logprobs, words[:, None], axis=1)[:, 0]
        sum_lp = st["sum_logprobs"] + jnp.where(st["finished"], 0.0, tok_lp)
        col = jax.nn.one_hot(st["cur_len"], max_steps, dtype=bool)[None, :]
        seqs = jnp.where(col, words[:, None], st["seqs"])
        finished = st["finished"] | (words == eos_id)
        # (a lax.cond skip of the final dead decode step measured slower
        # on v5e — the cond boundary materializes the carried cache)
        logits, cache = decode_step_fn(words, st["cache"])
        return dict(
            cur_len=st["cur_len"] + 1,
            seqs=seqs,
            logits=logits.astype(jnp.float32),
            cache=cache,
            finished=finished,
            sum_logprobs=sum_lp,
        )

    st = jax.lax.while_loop(cond, body, state)
    return st["seqs"], st["sum_logprobs"]
