"""Fused vocab-projection kernel (ops/vocab_topk.py) parity vs the XLA
decode path — interpret mode (CPU).  On-chip token-equality and the
measured win/loss are recorded in DESIGN §4 (decode roofline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gitax.decode import BeamSearchConfig
from gitax.decode.beam import _top_k_blocked
from gitax.models import GitConfig, GitModel, ViTConfig
from gitax.ops.quant import quantize_textual_for_decode
from gitax.ops.vocab_topk import (
    block_stats_xla,
    combine_lse,
    vocab_logits_topk,
)


@pytest.mark.parametrize("r,v", [(12, 1100), (8, 1024), (3, 700)])
def test_kernel_matches_xla_stats(r, v):
    """Kernel logits match the XLA formulation to matmul-tiling rounding
    (different N-tilings of an f32 dot are not bit-identical, on CPU or
    MXU); bmax/bsum must be bit-CONSISTENT with the kernel's OWN logits
    — that internal consistency is what the prefilter's exactness proof
    needs.  Covers non-tile-multiple V and non-8 R."""
    rng = np.random.RandomState(0)
    w_dim, tile = 64, 128
    h = jnp.asarray(rng.randn(r, w_dim).astype(np.float32))
    wq = jnp.asarray(rng.randint(-127, 128, (w_dim, v)).astype(np.int8))
    sc = jnp.asarray(rng.rand(v).astype(np.float32) * 0.01)
    bz = jnp.asarray(rng.randn(v).astype(np.float32) * 0.1)
    lk, bmax_k, bsum_k = vocab_logits_topk(h, wq, sc, bz, tile=tile,
                                           interpret=True)
    ref = (h @ wq.astype(h.dtype)) * sc + bz
    ref_pad, _, _ = block_stats_xla(ref, tile=tile)
    assert lk.shape == ref_pad.shape
    np.testing.assert_array_equal(
        np.asarray(lk[:, v:]), np.full_like(np.asarray(lk[:, v:]), -np.inf)
    )
    np.testing.assert_allclose(np.asarray(lk[:, :v]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # internal consistency: stats of the kernel's own logits, bit-exact
    _, bmax_self, bsum_self = block_stats_xla(lk[:, :v], tile=tile)
    np.testing.assert_allclose(np.asarray(bmax_k), np.asarray(bmax_self),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(bsum_k), np.asarray(bsum_self),
                               rtol=1e-6, atol=1e-6)
    lse_ref = jax.scipy.special.logsumexp(
        lk[:, :v].astype(jnp.float32), axis=-1
    )
    np.testing.assert_allclose(np.asarray(combine_lse(bmax_k, bsum_k)),
                               np.asarray(lse_ref), rtol=1e-6, atol=1e-6)


def test_top_k_blocked_accepts_precomputed_bmax():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(6, 3000).astype(np.float32))
    xp, bmax, _ = block_stats_xla(x, tile=512)
    v0, i0 = _top_k_blocked(x, 5)
    v1, i1 = _top_k_blocked(xp, 5, bmax=bmax)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


def _small_model(vocab=4608):
    cfg = GitConfig(
        encoder=ViTConfig(16, 32, 1, 2, 32),
        visual_feature_size=32,
        vocab_size=vocab,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        feedforward_size=64,
        max_caption_length=32,
    )
    model = GitModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params["textual"]["embedding"]["words"] = (
        params["textual"]["embedding"]["words"] * 20.0
    )
    return model, params


def test_generate_with_vocab_kernel_interpret_token_equal():
    """Whole beam search with the fused projection kernel emits the
    exact tokens of the quantized XLA path (same int8 head, so the only
    difference is the lse summation order)."""
    model, params = _small_model()
    params["textual"] = quantize_textual_for_decode(params["textual"])
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    beam = BeamSearchConfig(num_beams=4, max_steps=10, eos_id=2)
    seqs_xla, lp_xla = model.generate(params, img, beam=beam, sos_id=1)
    seqs_ker, lp_ker = model.generate(
        params, img, beam=beam, sos_id=1, vocab_kernel="interpret"
    )
    np.testing.assert_array_equal(np.asarray(seqs_xla), np.asarray(seqs_ker))
    np.testing.assert_allclose(
        np.asarray(lp_xla), np.asarray(lp_ker), atol=1e-5, rtol=1e-5
    )


def test_vocab_kernel_falls_back_without_quantized_head():
    """vocab_kernel=True on fp params silently uses the XLA path (no
    pallas_call: this test runs WITHOUT interpret mode on CPU)."""
    model, params = _small_model()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    beam = BeamSearchConfig(num_beams=4, max_steps=8, eos_id=2)
    seqs_xla, _ = model.generate(params, img, beam=beam, sos_id=1)
    seqs_ker, _ = model.generate(
        params, img, beam=beam, sos_id=1, vocab_kernel=True
    )
    np.testing.assert_array_equal(np.asarray(seqs_xla), np.asarray(seqs_ker))


def test_vocab_kernel_falls_back_on_small_vocab():
    """Fewer blocks than candidates -> the prefilter can't cover the
    top-C; generate must gate the kernel off rather than assert."""
    model, params = _small_model(vocab=640)
    params["textual"] = quantize_textual_for_decode(params["textual"])
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    beam = BeamSearchConfig(num_beams=4, max_steps=8, eos_id=2)
    seqs_xla, _ = model.generate(params, img, beam=beam, sos_id=1)
    seqs_ker, _ = model.generate(
        params, img, beam=beam, sos_id=1, vocab_kernel=True
    )
    np.testing.assert_array_equal(np.asarray(seqs_xla), np.asarray(seqs_ker))
