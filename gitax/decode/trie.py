"""Trie-constrained greedy decoding (classification-as-generation).

Re-implements the reference's TrieAutoRegressiveBeamSearch + TokenTrie
(trie_decoder.py:27-257): generation restricted to a vocabulary of class
names (e.g. ImageNet readable names + [SEP]) by boosting the logprobs of
the current trie node's children by (logits.max() - logits.min() + 1)
then taking argmax (trie_decoder.py:62-63,148-149), with the legacy
search's last-token repetition block (scatter -10000,
trie_decoder.py:141) and EOS forcing.

TPU-native design: the pointer-chasing trie becomes two dense device
arrays — children_tokens [M, C] and children_index [M, C] (C = max
branching, pad -1) — so each step is a gather + one-hot mask + argmax
inside the same lax.while_loop as the other decoders, batched over B
(the reference supports only batch 1).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..models.textual import KVCache

REP_BLOCK = -10000.0  # reference trie_decoder.py:141


class TokenTrie(object):
    """Host-side trie over token sequences, exported as dense arrays."""

    def __init__(self):
        self._children: List[dict] = [{}]

    @classmethod
    def construct(cls, all_tokens: Sequence[Sequence[int]]):
        trie = cls()
        for toks in all_tokens:
            trie.insert(toks)
        return trie

    def insert(self, tokens):
        node = 0
        for t in tokens:
            nxt = self._children[node].get(t)
            if nxt is None:
                nxt = len(self._children)
                self._children.append({})
                self._children[node][t] = nxt
            node = nxt

    @property
    def num_nodes(self):
        return len(self._children)

    def get_valid(self, tokens):
        node = 0
        for t in tokens:
            node = self._children[node].get(t)
            if node is None:
                return []
        return sorted(self._children[node].keys())

    def as_arrays(self):
        """(children_tokens [M, C], children_index [M, C]) int32, pad -1."""
        max_branch = max((len(c) for c in self._children), default=1) or 1
        m = self.num_nodes
        toks = np.full((m, max_branch), -1, np.int32)
        idxs = np.full((m, max_branch), -1, np.int32)
        for i, children in enumerate(self._children):
            for j, (t, n) in enumerate(sorted(children.items())):
                toks[i, j] = t
                idxs[i, j] = n
        return toks, idxs


def build_vocab_trie(tokenizer, class_names: Sequence[str]) -> TokenTrie:
    """Tokenize each class name and terminate with [SEP]
    (reference trie_decoder.py:17-25)."""
    seqs = []
    for name in class_names:
        ids = tokenizer(name, padding="do_not_pad", add_special_tokens=False)[
            "input_ids"
        ]
        seqs.append(ids + [tokenizer.sep_token_id])
    return TokenTrie.construct(seqs)


def trie_greedy_search(
    decode_step_fn,
    prefill_logits,  # [B, V]
    cache: KVCache,
    prefix_tokens,  # [B, Tp]
    trie: TokenTrie,
    max_steps: int,
    eos_id: int = 102,
):
    """Returns (sequences [B, max_steps] incl. prefix, EOS-padded;
    logprobs [B] normalized by generated length like the legacy search
    (trie_decoder.py:330-340))."""
    children_tokens, children_index = (jnp.asarray(a) for a in trie.as_arrays())
    b, tp = prefix_tokens.shape
    v = prefill_logits.shape[-1]

    seqs = jnp.full((b, max_steps), eos_id, jnp.int32)
    seqs = seqs.at[:, :tp].set(prefix_tokens)

    def constrained_pick(logits, node):
        """Boost current node's children in logprob space, argmax."""
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        finite = jnp.isfinite(logits)
        big = jnp.where(finite, logits, -jnp.inf).max(axis=-1)
        small = jnp.where(finite, logits, jnp.inf).min(axis=-1)
        boost = big - small + 1.0
        ctoks = children_tokens[node]  # [B, C]
        # scatter children into a [B, V] mask (pad slot V absorbs -1 entries);
        # avoids materializing a [B, C, V] one-hot
        safe = jnp.where(ctoks >= 0, ctoks, v)
        cmask = (
            jnp.zeros((b, v + 1), bool)
            .at[jnp.arange(b)[:, None], safe]
            .set(True)[:, :v]
        )
        boosted = logprobs + jnp.where(cmask, boost[:, None], 0.0)
        tok = jnp.argmax(boosted, axis=-1).astype(jnp.int32)
        # advance the trie: position of tok among children (or stay w/ -1)
        hit = ctoks == tok[:, None]
        pos = jnp.argmax(hit, axis=1)
        found = hit.any(axis=1)
        new_node = jnp.where(
            found, children_index[node, pos], node
        )
        # the reference accumulates the BOOSTED logprob (its topk reads the
        # boosted distribution, trie_decoder.py:62-67,148-153) — match it
        return tok, new_node, jnp.take_along_axis(boosted, tok[:, None], 1)[:, 0]

    # first pick: raw logits (trie_decoder.py:60-63)
    tok0, node0, lp0 = constrained_pick(
        prefill_logits.astype(jnp.float32), jnp.zeros((b,), jnp.int32)
    )
    seqs = seqs.at[:, tp].set(tok0)
    logits1, cache = decode_step_fn(tok0, cache)

    state = dict(
        cur_len=jnp.asarray(tp + 1, jnp.int32),
        seqs=seqs,
        node=node0,
        last=tok0,
        logits=logits1,
        cache=cache,
        sum_logprobs=lp0,
        finished=tok0 == eos_id,
    )

    def cond(st):
        return (st["cur_len"] < max_steps) & ~jnp.all(st["finished"])

    def body(st):
        logits = st["logits"].astype(jnp.float32)
        # repetition block on the immediately previous token
        logits = logits.at[jnp.arange(b), st["last"]].set(REP_BLOCK)
        # EOS forcing for finished rows (trie_decoder.py:255-268 semantics)
        eos_row = jnp.full((v,), -jnp.inf).at[eos_id].set(0.0)
        logits = jnp.where(st["finished"][:, None], eos_row[None, :], logits)
        tok, node, lp = constrained_pick(logits, st["node"])
        tok = jnp.where(st["finished"], eos_id, tok)
        col = jax.nn.one_hot(st["cur_len"], max_steps, dtype=bool)[None, :]
        seqs = jnp.where(col, tok[:, None], st["seqs"])
        sum_lp = st["sum_logprobs"] + jnp.where(st["finished"], 0.0, lp)
        finished = st["finished"] | (tok == eos_id)
        # (a lax.cond skip of the final dead decode step measured slower
        # on v5e — the cond boundary materializes the carried cache)
        logits_next, cache = decode_step_fn(tok, st["cache"])
        return dict(
            cur_len=st["cur_len"] + 1,
            seqs=seqs,
            node=node,
            last=tok,
            logits=logits_next,
            cache=cache,
            sum_logprobs=sum_lp,
            finished=finished,
        )

    st = jax.lax.while_loop(cond, body, state)
    seqs = st["seqs"]
    # length normalization (trie_decoder.py:330-340): tokens ≠ eos plus one
    # if any eos, minus prefix, clipped to 1
    num_valid = jnp.sum(seqs != eos_id, axis=1) + jnp.any(
        seqs == eos_id, axis=1
    ).astype(jnp.int32)
    num_valid = jnp.clip(num_valid - tp, 1, None)
    return seqs, st["sum_logprobs"] / num_valid.astype(jnp.float32)
