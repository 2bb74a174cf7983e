"""Whole-model oracle parity: the reference CaptioningModel (image
encoder + textual head + GeneratorWithBeamSearch + loss) vs
GitModel.generate / caption_loss, from the same pixels to the same
caption tokens / loss value."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_compat import import_reference_modules

import jax
import jax.numpy as jnp

from gitax.ckpt.torch_convert import convert_git_state_dict
from gitax.decode import BeamSearchConfig
from gitax.models import GitModel, GitConfig, ViTConfig
from gitax.training import caption_loss

clip_model, ref_decoder = import_reference_modules()

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


def build_reference_model(num_frames=0, beam_size=4, max_steps=12):
    torch.manual_seed(21)
    vit = clip_model.VisualTransformer(
        input_resolution=32, patch_size=16, width=64, layers=2, heads=2,
        output_dim=64, output_grid=True, grid_after_ln=True)
    txt = ref_decoder.TransformerDecoderTextualHead(
        visual_feature_size=64, vocab_size=128, hidden_size=48, num_layers=2,
        attention_heads=4, feedforward_size=96, max_caption_length=32,
        mask_future_positions=True, padding_idx=0, decoder_type="bert_en",
        visual_projection_type="linearLn")
    gen = ref_decoder.GeneratorWithBeamSearch(
        eos_index=EOS, max_steps=max_steps, beam_size=beam_size,
        length_penalty=0.6)
    model = ref_decoder.CaptioningModel(
        vit, txt, decoder=gen, sos_index=SOS, eos_index=EOS,
        use_history_for_infer=True, loss_type="smooth",
        num_image_with_embedding=num_frames)
    if num_frames:
        with torch.no_grad():
            for p in model.img_temperal_embedding:
                p.normal_(0, 0.5)
    return model.eval()


def to_gitax(model, num_frames=0):
    import dataclasses

    sd = model.state_dict()
    cfg = dataclasses.replace(CFG, num_image_with_embedding=num_frames)
    return GitModel(cfg), convert_git_state_dict(sd, cfg)


def test_image_caption_end_to_end():
    ref = build_reference_model()
    model, params = to_gitax(ref)
    rng = np.random.RandomState(0)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        out = ref({"image": torch.from_numpy(img.transpose(0, 3, 1, 2))})
    seqs, lps = model.generate(
        params,
        jnp.asarray(img),
        beam=BeamSearchConfig(num_beams=4, max_steps=12, eos_id=EOS),
        sos_id=SOS,
    )
    np.testing.assert_array_equal(np.asarray(seqs), out["predictions"].numpy())
    # reference returns logprobs [B, num_keep_best] even when the decoded
    # axis is squeezed (decoder.py:1288-1290); gitax squeezes both
    np.testing.assert_allclose(
        np.asarray(lps), out["logprobs"].numpy()[:, 0], rtol=1e-4, atol=1e-4
    )


def test_vqa_prefix_end_to_end():
    ref = build_reference_model()
    model, params = to_gitax(ref)
    rng = np.random.RandomState(1)
    img = rng.randn(1, 32, 32, 3).astype(np.float32)
    prefix = np.asarray([[SOS, 7, 11]], np.int64)
    with torch.no_grad():
        out = ref(
            {
                "image": torch.from_numpy(img.transpose(0, 3, 1, 2)),
                "prefix": torch.from_numpy(prefix),
            }
        )
    seqs, _ = model.generate(
        params,
        jnp.asarray(img),
        prefix_tokens=jnp.asarray(prefix, jnp.int32),
        beam=BeamSearchConfig(num_beams=4, max_steps=12, eos_id=EOS),
    )
    # reference strips the prefix from predictions (decoder.py:1004-1006)
    np.testing.assert_array_equal(np.asarray(seqs), out["predictions"].numpy())


def test_video_frames_end_to_end():
    """Multi-frame path with temporal embeddings (decoder.py:846-853)."""
    ref = build_reference_model(num_frames=3)
    model, params = to_gitax(ref, num_frames=3)
    rng = np.random.RandomState(2)
    frames = rng.randn(3, 1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        out = ref(
            {
                "image": [
                    torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in frames
                ]
            }
        )
    video = jnp.asarray(frames.transpose(1, 0, 2, 3, 4))  # [B, F, H, W, 3]
    seqs, _ = model.generate(
        params, video, beam=BeamSearchConfig(num_beams=4, max_steps=12, eos_id=EOS)
    )
    np.testing.assert_array_equal(np.asarray(seqs), out["predictions"].numpy())


def test_video_qa_frames_plus_prefix_end_to_end():
    """Video QA: multi-frame memory (decoder.py:846-853) COMBINED with a
    question prefix (decoder.py:986-1006) — the one input-convention
    composition the reference advertises (README.md:43-48) but no other
    test exercises.  Token-exact, prefix stripped from predictions."""
    ref = build_reference_model(num_frames=3)
    model, params = to_gitax(ref, num_frames=3)
    rng = np.random.RandomState(4)
    # B=1: the reference asserts len(prefix)==1 for B>1 (decoder.py:988)
    frames = rng.randn(3, 1, 32, 32, 3).astype(np.float32)
    prefix = np.asarray([[SOS, 7, 11]], np.int64)
    with torch.no_grad():
        out = ref(
            {
                "image": [
                    torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in frames
                ],
                "prefix": torch.from_numpy(prefix),
            }
        )
    video = jnp.asarray(frames.transpose(1, 0, 2, 3, 4))  # [B, F, H, W, 3]
    seqs, _ = model.generate(
        params,
        video,
        prefix_tokens=jnp.asarray(prefix, jnp.int32),
        beam=BeamSearchConfig(num_beams=4, max_steps=12, eos_id=EOS),
    )
    np.testing.assert_array_equal(np.asarray(seqs), out["predictions"].numpy())


def test_training_loss_end_to_end():
    """Reference forward_one_ce (decoder.py:916-975) vs gitax
    forward_logits + caption_loss on the same batch."""
    ref = build_reference_model()
    ref.train()
    model, params = to_gitax(ref)
    rng = np.random.RandomState(3)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    tokens = np.asarray([[SOS, 5, 9, 14, EOS], [SOS, 7, 3, EOS, 0]], np.int64)
    need = np.asarray([[0, 1, 1, 1, 1], [0, 1, 1, 1, 0]], np.int64)
    # disable dropout for determinism
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    with torch.no_grad():
        out = ref(
            {
                "image": torch.from_numpy(img.transpose(0, 3, 1, 2)),
                "caption_tokens": torch.from_numpy(tokens),
                "need_predict": torch.from_numpy(need),
            }
        )
    ref_loss = float(out["vl_l_loss"])
    logits = model.forward_logits(
        params, jnp.asarray(img), jnp.asarray(tokens, jnp.int32)
    )
    ours = float(
        caption_loss(logits, jnp.asarray(tokens, jnp.int32), jnp.asarray(need))
    )
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss)


# -- text-context path (reference batch['context'], decoder.py:859-877) ----

CTX_CFG = GitConfig(
    encoder=ViTConfig(16, 48, 2, 2, 32),
    visual_feature_size=48,  # context requires Dv == hidden (decoder.py:863-870)
    vocab_size=128,
    hidden_size=48,
    num_layers=2,
    num_heads=4,
    feedforward_size=96,
    max_caption_length=32,
)


def build_ctx_reference(beam_size=4, max_steps=12):
    torch.manual_seed(33)
    vit = clip_model.VisualTransformer(
        input_resolution=32, patch_size=16, width=48, layers=2, heads=2,
        output_dim=48, output_grid=True, grid_after_ln=True)
    txt = ref_decoder.TransformerDecoderTextualHead(
        visual_feature_size=48, vocab_size=128, hidden_size=48, num_layers=2,
        attention_heads=4, feedforward_size=96, max_caption_length=32,
        mask_future_positions=True, padding_idx=0, decoder_type="bert_en",
        visual_projection_type="linearLn")
    gen = ref_decoder.GeneratorWithBeamSearch(
        eos_index=EOS, max_steps=max_steps, beam_size=beam_size,
        length_penalty=0.6)
    model = ref_decoder.CaptioningModel(
        vit, txt, decoder=gen, sos_index=SOS, eos_index=EOS,
        use_history_for_infer=True, loss_type="smooth")
    return model.eval()


def _cpu_convert2valid(monkeypatch):
    # the reference helper hardcodes device='cuda' (decoder.py:612)
    orig = ref_decoder.convert2valid

    def cpu(shape, length=None, device="cpu"):
        return orig(shape, length=length, device="cpu")

    monkeypatch.setattr(ref_decoder, "convert2valid", cpu)


def _ctx_batch(rng, b=2):
    img = rng.randn(b, 32, 32, 3).astype(np.float32)
    ctx1 = rng.randint(1, 128, (b, 5)).astype(np.int64)
    len1 = np.asarray([5, 3][:b], np.int64)
    ctx2 = rng.randint(1, 128, (b, 4)).astype(np.int64)
    len2 = np.asarray([2, 4][:b], np.int64)
    return img, [(ctx1, len1), (ctx2, len2)]


def test_context_training_loss_end_to_end(monkeypatch):
    """CE path with two text contexts appended to the memory
    (decoder.py:859-871 + 916-975)."""
    _cpu_convert2valid(monkeypatch)
    ref = build_ctx_reference()
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    import dataclasses

    model = GitModel(CTX_CFG)
    params = convert_git_state_dict(ref.state_dict(), CTX_CFG)
    rng = np.random.RandomState(7)
    img, ctxs = _ctx_batch(rng)
    tokens = np.asarray([[SOS, 5, 9, 14, EOS], [SOS, 7, 3, EOS, 0]], np.int64)
    need = np.asarray([[0, 1, 1, 1, 1], [0, 1, 1, 1, 0]], np.int64)
    with torch.no_grad():
        out = ref(
            {
                "image": torch.from_numpy(img.transpose(0, 3, 1, 2)),
                "caption_tokens": torch.from_numpy(tokens),
                "need_predict": torch.from_numpy(need),
                "context": [
                    {"tokens": torch.from_numpy(t), "length": torch.from_numpy(l)}
                    for t, l in ctxs
                ],
            }
        )
    ref_loss = float(out["vl_l_loss"])
    logits = model.forward_logits(
        params,
        jnp.asarray(img),
        jnp.asarray(tokens, jnp.int32),
        context_tokens=[jnp.asarray(t, jnp.int32) for t, _ in ctxs],
        context_lengths=[jnp.asarray(l, jnp.int32) for _, l in ctxs],
    )
    ours = float(
        caption_loss(logits, jnp.asarray(tokens, jnp.int32), jnp.asarray(need))
    )
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss)


def test_context_generate_beam1_end_to_end(monkeypatch):
    """Decode over [visual; context] memory with a RAGGED validity mask
    (decoder.py:859-871 + infer).  beam_size=1 because the reference's
    own decoding_step tiles visual_features across beams but not
    visual_features_valid (decoder.py:1017-1042), so context + beam>1
    crashes in the reference — beam 1 is its only executable config
    here."""
    _cpu_convert2valid(monkeypatch)
    ref = build_ctx_reference(beam_size=1)
    model = GitModel(CTX_CFG)
    params = convert_git_state_dict(ref.state_dict(), CTX_CFG)
    rng = np.random.RandomState(8)
    img, ctxs = _ctx_batch(rng)
    with torch.no_grad():
        out = ref(
            {
                "image": torch.from_numpy(img.transpose(0, 3, 1, 2)),
                "context": [
                    {"tokens": torch.from_numpy(t), "length": torch.from_numpy(l)}
                    for t, l in ctxs
                ],
            }
        )
    seqs, lps = model.generate(
        params,
        jnp.asarray(img),
        beam=BeamSearchConfig(num_beams=1, per_node_beam_size=1, max_steps=12,
                              eos_id=EOS),
        sos_id=SOS,
        context_tokens=[jnp.asarray(t, jnp.int32) for t, _ in ctxs],
        context_lengths=[jnp.asarray(l, jnp.int32) for _, l in ctxs],
    )
    np.testing.assert_array_equal(np.asarray(seqs), out["predictions"].numpy())
    np.testing.assert_allclose(
        np.asarray(lps), out["logprobs"].numpy()[:, 0], rtol=1e-4, atol=1e-4
    )


def test_context_generate_beam4_full_valid(monkeypatch):
    """Beam-4 with context: the reference can't run its own beam>1
    context path (see above), but with FULLY-valid contexts the validity
    mask is a no-op, so the oracle is ref.infer over a manually
    constructed [visual ; embedded-context] memory with no mask — the
    same construction forward_one performs (decoder.py:859-871)."""
    _cpu_convert2valid(monkeypatch)
    ref = build_ctx_reference(beam_size=4)
    model = GitModel(CTX_CFG)
    params = convert_git_state_dict(ref.state_dict(), CTX_CFG)
    rng = np.random.RandomState(11)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    ctx = rng.randint(1, 128, (2, 5)).astype(np.int64)
    full_len = np.asarray([5, 5], np.int64)
    with torch.no_grad():
        vis = ref.image_encoder(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        emb = ref.textual.embedding(torch.from_numpy(ctx))
        memory = torch.cat([vis, emb], dim=1)
        out = ref.infer({}, memory, None)
    seqs, lps = model.generate(
        params,
        jnp.asarray(img),
        beam=BeamSearchConfig(num_beams=4, max_steps=12, eos_id=EOS),
        sos_id=SOS,
        context_tokens=jnp.asarray(ctx, jnp.int32),
        context_lengths=jnp.asarray(full_len, jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(seqs), out["predictions"].numpy())
    np.testing.assert_allclose(
        np.asarray(lps), out["logprobs"].numpy()[:, 0], rtol=1e-4, atol=1e-4
    )


def test_context_train_step_grads_flow():
    """make_train_step with context keys: loss finite, grads nonzero."""
    import jax as _jax
    from gitax.training.trainer import init_train_state, make_train_step

    model = GitModel(CTX_CFG)
    state = init_train_state(model, _jax.random.PRNGKey(0))
    step = _jax.jit(make_train_step(model))
    rng = np.random.RandomState(9)
    img, ctxs = _ctx_batch(rng)
    batch = {
        "image": jnp.asarray(img),
        "caption_tokens": jnp.asarray(
            [[SOS, 5, 9, EOS], [SOS, 7, 3, EOS]], jnp.int32
        ),
        "need_predict": jnp.asarray([[0, 1, 1, 1], [0, 1, 1, 1]], jnp.int32),
        "context_tokens": jnp.asarray(ctxs[0][0], jnp.int32),
        "context_lengths": jnp.asarray(ctxs[0][1], jnp.int32),
    }
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
