"""Trie-constrained decoding: structure tests + parity vs the reference
TrieAutoRegressiveBeamSearch (batch-1 torch oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gitax.decode.trie import TokenTrie, trie_greedy_search
from gitax.models.config import GitConfig, ViTConfig
from gitax.models.textual import decode_step, prefill

CFG = GitConfig(
    encoder=ViTConfig(16, 64, 2, 2, 32),
    visual_feature_size=64,
    vocab_size=128,
    hidden_size=48,
    num_layers=2,
    num_heads=4,
    feedforward_size=96,
    max_caption_length=32,
)
EOS, SOS = 102, 101
VOCAB_SEQS = [
    [5, 7, EOS],
    [5, 9, EOS],
    [11, EOS],
    [12, 13, 14, EOS],
]


def test_trie_structure():
    trie = TokenTrie.construct(VOCAB_SEQS)
    assert trie.get_valid([]) == [5, 11, 12]
    assert trie.get_valid([5]) == [7, 9]
    assert trie.get_valid([5, 7]) == [EOS]
    assert trie.get_valid([99]) == []
    toks, idxs = trie.as_arrays()
    assert toks.shape == idxs.shape
    assert toks.shape[1] == 3  # max branching at root
    assert set(toks[0]) >= {5, 11, 12}


def test_trie_decode_emits_valid_sequence():
    trie = TokenTrie.construct(VOCAB_SEQS)
    rng = np.random.RandomState(0)
    params = None  # built below

    from gitax.models.git import GitModel

    model = GitModel(CFG)
    params = model.init_params(jax.random.PRNGKey(2))["textual"]
    visual = jnp.asarray(rng.randn(3, 5, 64), jnp.float32)
    start = jnp.full((3, 1), SOS, jnp.int32)
    logits, cache = prefill(params, visual, start, CFG, 8)

    def step(tokens, cache):
        return decode_step(params, tokens, cache, CFG)

    seqs, logprobs = trie_greedy_search(step, logits, cache, start, trie, 8, EOS)
    seqs = np.asarray(seqs)
    for row in seqs:
        gen = [t for t in row[1:].tolist()]
        # strip trailing eos padding
        while gen and gen[-1] == EOS:
            gen.pop()
        gen = gen + [EOS]
        assert gen in VOCAB_SEQS, gen
    assert np.isfinite(np.asarray(logprobs)).all()


def test_trie_parity_vs_reference():
    torch = pytest.importorskip("torch")
    import sys, types

    from reference_compat import import_reference_modules, REFERENCE_ROOT

    import_reference_modules()
    from generativeimage2text import trie_decoder as ref_trie
    from generativeimage2text.layers import decoder as ref_decoder

    torch.manual_seed(3)
    head = ref_decoder.TransformerDecoderTextualHead(
        visual_feature_size=64,
        vocab_size=128,
        hidden_size=48,
        num_layers=2,
        attention_heads=4,
        feedforward_size=96,
        max_caption_length=32,
        mask_future_positions=True,
        padding_idx=0,
        decoder_type="bert_en",
        visual_projection_type="linearLn",
    ).eval()

    from gitax.ckpt.torch_convert import convert_textual_state_dict

    params = convert_textual_state_dict(head.state_dict(), CFG, prefix="")
    rng = np.random.RandomState(5)
    visual = rng.randn(1, 5, 64).astype(np.float32)

    # reference oracle
    ref_t = ref_trie.TokenTrie.construct(VOCAB_SEQS)
    searcher = ref_trie.TrieAutoRegressiveBeamSearch(
        eos_index=EOS, max_steps=8, beam_size=1, trie=ref_t
    )
    tvis = torch.from_numpy(visual)

    def ref_step(input_ids):
        with torch.no_grad():
            return head(tvis, input_ids)[:, -1, :].float()

    start = torch.full((1, 1), SOS, dtype=torch.long)
    ref_pred, ref_lp = searcher.search(start, ref_step)

    # gitax
    trie = TokenTrie.construct(VOCAB_SEQS)
    logits, cache = prefill(
        params, jnp.asarray(visual), jnp.full((1, 1), SOS, jnp.int32), CFG, 8
    )

    def step(tokens, cache):
        return decode_step(params, tokens, cache, CFG)

    seqs, lp = trie_greedy_search(
        step, logits, cache, jnp.full((1, 1), SOS, jnp.int32), trie, 8, EOS
    )
    ref_tokens = ref_pred[0].tolist()
    got_tokens = np.asarray(seqs)[0].tolist()
    # reference output stops at first eos; ours pads with eos
    assert got_tokens[: len(ref_tokens)] == ref_tokens
    assert all(t == EOS for t in got_tokens[len(ref_tokens):])
    np.testing.assert_allclose(float(lp[0]), float(ref_lp[0]), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [3, 7, 9])
def test_trie_parity_randomized(seed):
    """Randomized vocab tries (3-10 sequences, lengths 1-4) vs the
    reference oracle — token-exact and score-close; complements the
    fixed-vocab parity test.  (A wider 10-config fuzz also ran clean.)"""
    torch = pytest.importorskip("torch")

    from reference_compat import import_reference_modules

    import_reference_modules()
    from generativeimage2text import trie_decoder as ref_trie
    from generativeimage2text.layers import decoder as ref_decoder

    from gitax.ckpt.torch_convert import convert_textual_state_dict

    torch.manual_seed(100 + seed)
    head = ref_decoder.TransformerDecoderTextualHead(
        visual_feature_size=64, vocab_size=128, hidden_size=48,
        num_layers=2, attention_heads=4, feedforward_size=96,
        max_caption_length=32, mask_future_positions=True, padding_idx=0,
        decoder_type="bert_en", visual_projection_type="linearLn",
    ).eval()
    params = convert_textual_state_dict(head.state_dict(), CFG, prefix="")
    rng = np.random.RandomState(seed)
    visual = rng.randn(1, rng.randint(3, 8), 64).astype(np.float32)
    seqs = [
        [int(t) for t in rng.randint(5, 100, rng.randint(1, 5))] + [EOS]
        for _ in range(rng.randint(3, 11))
    ]
    steps = int(rng.choice([6, 8, 12]))

    ref_t = ref_trie.TokenTrie.construct(seqs)
    searcher = ref_trie.TrieAutoRegressiveBeamSearch(
        eos_index=EOS, max_steps=steps, beam_size=1, trie=ref_t
    )
    tvis = torch.from_numpy(visual)

    def ref_step(input_ids):
        with torch.no_grad():
            return head(tvis, input_ids)[:, -1, :].float()

    ref_pred, ref_lp = searcher.search(
        torch.full((1, 1), SOS, dtype=torch.long), ref_step
    )

    trie = TokenTrie.construct(seqs)
    logits, cache = prefill(
        params, jnp.asarray(visual), jnp.full((1, 1), SOS, jnp.int32), CFG, steps
    )
    out, lp = trie_greedy_search(
        lambda t, c: decode_step(params, t, c, CFG),
        logits, cache, jnp.full((1, 1), SOS, jnp.int32), trie, steps, EOS,
    )
    ref_tokens = ref_pred[0].tolist()
    got = np.asarray(out)[0].tolist()
    assert got[: len(ref_tokens)] == ref_tokens
    assert all(t == EOS for t in got[len(ref_tokens):])
    np.testing.assert_allclose(
        float(lp[0]), float(ref_lp[0]), rtol=1e-4, atol=1e-4
    )
