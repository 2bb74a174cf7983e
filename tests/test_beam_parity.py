"""Beam-search parity: gitax's lax.while_loop search vs the reference's
host-side GeneratorWithBeamSearch, driven by the SAME tiny model (torch
oracle weights converted with gitax.ckpt).  Decoded token sequences must
match exactly; scores to float tolerance."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_compat import import_reference_modules

import jax
import jax.numpy as jnp

from gitax.ckpt.torch_convert import convert_textual_state_dict
from gitax.decode import BeamSearchConfig, beam_search
from gitax.decode.greedy import greedy_search
from gitax.models.config import GitConfig, ViTConfig
from gitax.models.textual import prefill, decode_step, textual_forward

_, ref_decoder = import_reference_modules()

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
EOS = 102
SOS = 101


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(7)
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
    params = convert_textual_state_dict(head.state_dict(), CFG, prefix="")
    rng = np.random.RandomState(11)
    visual = rng.randn(2, 5, 64).astype(np.float32)
    return head, params, visual


def reference_search(head, visual, start, beam_size, max_steps, num_keep_best=1):
    """Run the reference GeneratorWithBeamSearch with a step closure that
    mirrors CaptioningModel.decoding_step (decoder.py:1013-1054) minus the
    KV history (disabled in the reference's default config, since
    output_hidden_states=False)."""
    tvisual = torch.from_numpy(visual)

    def step(input_ids):
        bk = input_ids.shape[0]
        reps = bk // tvisual.shape[0]
        vis = tvisual.repeat_interleave(reps, dim=0) if reps > 1 else tvisual
        with torch.no_grad():
            logits = head(vis, input_ids)
        return logits[:, -1, :].float()

    gen = ref_decoder.GeneratorWithBeamSearch(
        eos_index=EOS,
        max_steps=max_steps,
        beam_size=beam_size,
        length_penalty=0.6,
    )
    return gen.search(
        torch.from_numpy(start), step, num_keep_best=num_keep_best
    )


def gitax_search(params, visual, start, beam_size, max_steps, num_keep_best=1):
    cfg = BeamSearchConfig(
        num_beams=beam_size,
        max_steps=max_steps,
        num_keep_best=num_keep_best,
        eos_id=EOS,
    )
    logits, cache = prefill(
        params, jnp.asarray(visual), jnp.asarray(start), CFG, max_steps
    )

    def step(tokens, cache):
        return decode_step(params, tokens, cache, CFG)

    return beam_search(step, logits, cache, jnp.asarray(start), cfg)


@pytest.mark.parametrize("beam_size", [4, 2])
def test_beam_parity_caption(setup, beam_size):
    head, params, visual = setup
    start = np.full((2, 1), SOS, np.int64)
    ref_dec, ref_lp = reference_search(head, visual, start, beam_size, 16)
    dec, lp = gitax_search(params, visual, start.astype(np.int32), beam_size, 16)
    np.testing.assert_array_equal(np.asarray(dec)[:, 0], ref_dec.numpy())
    np.testing.assert_allclose(np.asarray(lp)[:, 0], ref_lp[:, 0].numpy(), rtol=1e-4, atol=1e-4)


def test_beam_parity_with_prefix(setup):
    """VQA-style: multi-token prefix (reference decoder.py:984-1006 keeps
    the prefix in the searched ids; stripping happens in infer)."""
    head, params, visual = setup
    start = np.asarray([[SOS, 5, 9]], np.int64)
    ref_dec, ref_lp = reference_search(head, visual[:1], start, 4, 14)
    dec, lp = gitax_search(params, visual[:1], start.astype(np.int32), 4, 14)
    np.testing.assert_array_equal(np.asarray(dec)[:, 0], ref_dec.numpy())
    np.testing.assert_allclose(np.asarray(lp)[:, 0], ref_lp[:, 0].numpy(), rtol=1e-4, atol=1e-4)


def test_beam_parity_beam1(setup):
    """beam_size=1 ('greedy' through the beam machinery, as BASELINE
    config 1 uses)."""
    head, params, visual = setup
    start = np.full((2, 1), SOS, np.int64)
    ref_dec, ref_lp = reference_search(head, visual, start, 1, 16)
    dec, lp = gitax_search(params, visual, start.astype(np.int32), 1, 16)
    np.testing.assert_array_equal(np.asarray(dec)[:, 0], ref_dec.numpy())
    np.testing.assert_allclose(np.asarray(lp)[:, 0], ref_lp[:, 0].numpy(), rtol=1e-4, atol=1e-4)


def test_beam_forced_final_add(setup):
    """max_steps small enough that sequences hit the forced-add path
    (cur_len+1 == max_length, decoder.py:1202-1216)."""
    head, params, visual = setup
    start = np.full((2, 1), SOS, np.int64)
    ref_dec, ref_lp = reference_search(head, visual, start, 4, 5)
    dec, lp = gitax_search(params, visual, start.astype(np.int32), 4, 5)
    np.testing.assert_array_equal(np.asarray(dec)[:, 0], ref_dec.numpy())
    np.testing.assert_allclose(np.asarray(lp)[:, 0], ref_lp[:, 0].numpy(), rtol=1e-4, atol=1e-4)


def test_greedy_matches_stepwise_argmax(setup):
    """Fast greedy path: equals naive per-step argmax over full forwards."""
    _, params, visual = setup
    start = np.full((2, 1), SOS, np.int32)
    max_steps = 10
    logits, cache = prefill(
        params, jnp.asarray(visual), jnp.asarray(start), CFG, max_steps
    )

    def step(tokens, cache):
        return decode_step(params, tokens, cache, CFG)

    seqs, _ = greedy_search(step, logits, cache, jnp.asarray(start), max_steps, EOS)
    seqs = np.asarray(seqs)

    # oracle: recompute with full forwards each step
    toks = start.copy()
    fin = np.zeros(2, bool)
    for _ in range(max_steps - 1):
        lg = np.asarray(
            textual_forward(params, jnp.asarray(visual), jnp.asarray(toks), CFG)
        )[:, -1]
        nxt = lg.argmax(-1)
        nxt = np.where(fin, EOS, nxt)
        toks = np.concatenate([toks, nxt[:, None].astype(np.int32)], axis=1)
        fin |= nxt == EOS
        if fin.all():
            break
    oracle = np.full((2, max_steps), EOS, np.int32)
    oracle[:, : toks.shape[1]] = toks
    np.testing.assert_array_equal(seqs, oracle)


def test_beam_parity_num_keep_best(setup):
    """n-best hypothesis buffers (num_keep_best=3) match the reference's
    BeamHypotheses heap contents and ordering."""
    head, params, visual = setup
    start = np.full((2, 1), SOS, np.int64)
    ref_dec, ref_lp = reference_search(head, visual, start, 4, 12, num_keep_best=3)
    dec, lp = gitax_search(params, visual, start.astype(np.int32), 4, 12,
                           num_keep_best=3)
    np.testing.assert_array_equal(np.asarray(dec), ref_dec.numpy())
    np.testing.assert_allclose(np.asarray(lp), ref_lp.numpy(), rtol=1e-4, atol=1e-4)


def test_blocked_topk_matches_iterative():
    """_top_k_blocked must equal _top_k_iterative (values AND indices,
    incl. lowest-index tie-breaking) on random and tie-heavy inputs."""
    import numpy as np
    import jax.numpy as jnp

    from gitax.decode.beam import _top_k_blocked, _top_k_iterative

    rng = np.random.RandomState(0)
    for trial in range(6):
        if trial < 3:
            x = rng.randn(7, 30522).astype(np.float32)
        else:
            # heavy ties: few distinct values scattered everywhere
            x = rng.randint(0, 5, (7, 30522)).astype(np.float32)
        xv = jnp.asarray(x)
        for k in (1, 2, 8):
            v1, i1 = _top_k_iterative(xv, k)
            v2, i2 = _top_k_blocked(xv, k)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # small-vocab fallback path
    x = jnp.asarray(rng.randn(3, 100), jnp.float32)
    v1, i1 = _top_k_iterative(x, 4)
    v2, i2 = _top_k_blocked(x, 4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@pytest.mark.parametrize("seed,beams,steps,keep,plen,batch", [
    (2, 5, 6, 1, 2, 2),    # odd beam count
    (3, 5, 11, 2, 2, 1),   # odd beams + n-best
    (4, 3, 17, 2, 1, 2),   # beams=3, n-best, longer search
    (9, 1, 17, 1, 4, 2),   # greedy-as-beam with a long prefix
])
def test_beam_parity_randomized(seed, beams, steps, keep, plen, batch):
    """Randomized-config parity sweep vs the reference oracle (fresh
    torch weights per seed; configs chosen to cover odd beam counts,
    n-best heaps, and prefix lengths the fixed tests don't)."""
    torch.manual_seed(seed)
    head = ref_decoder.TransformerDecoderTextualHead(
        visual_feature_size=64, vocab_size=128, hidden_size=48,
        num_layers=2, attention_heads=4, feedforward_size=96,
        max_caption_length=48, mask_future_positions=True, padding_idx=0,
        decoder_type="bert_en", visual_projection_type="linearLn",
    ).eval()
    cfg = GitConfig(
        encoder=ViTConfig(16, 64, 2, 2, 32), visual_feature_size=64,
        vocab_size=128, hidden_size=48, num_layers=2, num_heads=4,
        feedforward_size=96, max_caption_length=48,
    )
    params = convert_textual_state_dict(head.state_dict(), cfg, prefix="")
    rng = np.random.RandomState(seed)
    visual = rng.randn(batch, rng.randint(3, 9), 64).astype(np.float32) * 1.5
    start = np.concatenate(
        [np.full((batch, 1), SOS), rng.randint(3, 100, (batch, plen - 1))],
        axis=1,
    ).astype(np.int64)

    ref_dec, ref_lp = reference_search(
        head, visual, start, beams, steps, num_keep_best=keep
    )
    bcfg = BeamSearchConfig(
        num_beams=beams, max_steps=steps, num_keep_best=keep, eos_id=EOS
    )
    logits, cache = prefill(
        params, jnp.asarray(visual), jnp.asarray(start.astype(np.int32)),
        cfg, steps,
    )
    dec, lp = beam_search(
        lambda t, c: decode_step(params, t, c, cfg),
        logits, cache, jnp.asarray(start.astype(np.int32)), bcfg,
    )
    dec, lp = np.asarray(dec), np.asarray(lp)
    rd = ref_dec.numpy() if hasattr(ref_dec, "numpy") else np.asarray(ref_dec)
    lpr = ref_lp.numpy() if hasattr(ref_lp, "numpy") else np.asarray(ref_lp)
    if rd.ndim == 2:  # the reference squeezes num_keep_best == 1
        rd, lpr = rd[:, None], lpr[:, :1]
    # compare the reference's FULL output (no silent tail skip) and
    # require gitax's extra buffer columns, if any, to be EOS padding
    n = rd.shape[2]
    assert dec.shape[2] >= n, (dec.shape, rd.shape)
    np.testing.assert_array_equal(dec[:, : rd.shape[1], :n], rd)
    assert (dec[:, : rd.shape[1], n:] == EOS).all()
    np.testing.assert_allclose(
        lp[:, : lpr.shape[1]], lpr, rtol=1e-3, atol=1e-3
    )
