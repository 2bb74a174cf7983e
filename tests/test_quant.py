"""Weight-only int8 decode quantization (gitax.ops.quant): error bounds,
logit fidelity, and end-to-end generation on a converted oracle model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gitax.decode import BeamSearchConfig
from gitax.models import GitModel, GitConfig, ViTConfig
from gitax.models.nn import linear
from gitax.ops.quant import quantize_git_params, quantize_linear

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


def test_quantize_linear_error_bound():
    rng = np.random.RandomState(0)
    p = {"kernel": rng.randn(64, 32).astype(np.float32) * 0.3,
         "bias": rng.randn(32).astype(np.float32)}
    q = quantize_linear(p)
    assert q["kernel_q8"].dtype == np.int8
    deq = q["kernel_q8"].astype(np.float32) * q["kernel_scale"]
    # symmetric per-channel: |error| <= scale/2 per element
    assert np.all(np.abs(deq - p["kernel"]) <= q["kernel_scale"] / 2 + 1e-7)


def test_quantized_linear_forward_close():
    rng = np.random.RandomState(1)
    p = {"kernel": rng.randn(48, 96).astype(np.float32) * 0.1,
         "bias": rng.randn(96).astype(np.float32) * 0.1}
    x = jnp.asarray(rng.randn(4, 7, 48), jnp.float32)
    y_fp = linear(x, {k: jnp.asarray(v) for k, v in p.items()})
    q = quantize_linear(p)
    y_q8 = linear(x, {k: jnp.asarray(v) for k, v in q.items()})
    err = float(jnp.abs(y_fp - y_q8).max())
    ref = float(jnp.abs(y_fp).max())
    assert err < 0.01 * max(ref, 1.0), (err, ref)


def test_stacked_kernels_quantize_per_layer_channel():
    rng = np.random.RandomState(2)
    k = rng.randn(3, 16, 8).astype(np.float32)
    k[1] *= 100.0  # a layer with much larger weights gets its own scale
    q = quantize_linear({"kernel": k})
    assert q["kernel_q8"].shape == (3, 16, 8)
    assert q["kernel_scale"].shape == (3, 8)
    deq = q["kernel_q8"].astype(np.float32) * q["kernel_scale"][:, None, :]
    assert np.all(np.abs(deq - k) <= q["kernel_scale"][:, None, :] / 2 + 1e-7)


def test_generate_int8_end_to_end():
    """int8 params run the full beam search; logits stay close to fp and
    with well-separated logits the decoded tokens match exactly."""
    model = GitModel(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    # spread the logits so quantization noise cannot flip the argmax
    params["textual"]["embedding"]["words"] = (
        params["textual"]["embedding"]["words"] * 30.0
    )
    qparams = quantize_git_params(params)
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    beam = BeamSearchConfig(num_beams=4, max_steps=10, eos_id=2)
    seqs_fp, _ = model.generate(params, img, beam=beam, sos_id=1)
    seqs_q8, _ = model.generate(qparams, img, beam=beam, sos_id=1)
    np.testing.assert_array_equal(np.asarray(seqs_fp), np.asarray(seqs_q8))


def test_int8_logit_fidelity():
    model = GitModel(CFG)
    params = model.init_params(jax.random.PRNGKey(4))
    qparams = quantize_git_params(params)
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    toks = jnp.asarray([[1, 5, 9]], jnp.int32)
    lg_fp = model.forward_logits(params, img, toks)
    lg_q8 = model.forward_logits(qparams, img, toks)
    denom = float(jnp.abs(lg_fp).max())
    assert float(jnp.abs(lg_fp - lg_q8).max()) < 0.02 * max(denom, 1.0)


def test_w8a8_linear_close():
    """Dynamic-activation int8 matmul: error bounded by the combined
    weight + activation quantization noise."""
    from gitax.ops.quant import quantize_linear_dyn

    rng = np.random.RandomState(7)
    p = {"kernel": rng.randn(64, 96).astype(np.float32) * 0.1,
         "bias": rng.randn(96).astype(np.float32) * 0.1}
    x = jnp.asarray(rng.randn(3, 5, 64), jnp.float32)
    y_fp = linear(x, {k: jnp.asarray(v) for k, v in p.items()})
    q = quantize_linear_dyn(p)
    assert q["kernel_q8_dyn"].dtype == np.int8
    y_q = linear(x, {k: jnp.asarray(v) for k, v in q.items()})
    err = float(jnp.abs(y_fp - y_q).max())
    ref = float(jnp.abs(y_fp).max())
    assert err < 0.02 * max(ref, 1.0), (err, ref)


def test_w8a8_encoder_forward_close():
    """w8a8-quantized ViT tracks the fp encoder within ~2% relative."""
    from gitax.models.vit import vit_forward
    from gitax.ops.quant import quantize_vit_for_inference

    model = GitModel(CFG)
    params = model.init_params(jax.random.PRNGKey(8))
    vit = params["image_encoder"]
    rng = np.random.RandomState(9)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    y_fp = vit_forward(vit, img, CFG.encoder)
    y_q = vit_forward(quantize_vit_for_inference(vit), img, CFG.encoder)
    err = float(jnp.abs(y_fp - y_q).max())
    ref = float(jnp.abs(y_fp).std())
    assert err < 0.1 * max(ref, 1e-3), (err, ref)


def test_w8a8_generate_end_to_end():
    """encoder=True quantization runs the full search; with separated
    logits the decoded tokens match the fp run exactly."""
    model = GitModel(CFG)
    params = model.init_params(jax.random.PRNGKey(10))
    params["textual"]["embedding"]["words"] = (
        params["textual"]["embedding"]["words"] * 30.0
    )
    qparams = quantize_git_params(params, encoder=True)
    assert "kernel_q8_dyn" in qparams["image_encoder"]["blocks"]["mlp"]["c_fc"]
    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    beam = BeamSearchConfig(num_beams=4, max_steps=10, eos_id=2)
    seqs_fp, _ = model.generate(params, img, beam=beam, sos_id=1)
    seqs_q8, _ = model.generate(qparams, img, beam=beam, sos_id=1)
    np.testing.assert_array_equal(np.asarray(seqs_fp), np.asarray(seqs_q8))


def test_engine_int8_smoke():
    from gitax.preprocess.transforms import TestTransform
    from gitax.runtime.pipeline import CaptionEngine
    from gitax.tokenization import BertTokenizer, build_tiny_vocab

    tok = BertTokenizer(build_tiny_vocab(words=["a", "dog"]))
    cfg = GitConfig(
        encoder=ViTConfig(16, 64, 2, 2, 32),
        visual_feature_size=64,
        vocab_size=tok.vocab_size,
        hidden_size=48,
        num_layers=2,
        num_heads=4,
        feedforward_size=96,
        max_caption_length=64,
    )
    model = GitModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    eng = CaptionEngine(
        model, params, tok, TestTransform(crop_size=32), batch_size=2,
        beam=BeamSearchConfig(num_beams=2, max_steps=8), use_native=False,
        int8=True, dtype=jnp.float32,
    )
    rng = np.random.RandomState(6)
    caps = eng.generate_batch(
        [rng.randint(0, 255, (32, 32, 3), np.uint8).astype(np.float32)] * 2,
        [[tok.cls_token_id]] * 2,
    )
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)
