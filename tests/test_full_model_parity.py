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
