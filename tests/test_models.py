import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gitax.models import GitModel, GitConfig, ViTConfig, config_from_param
from gitax.models.textual import (
    build_unified_mask,
    decode_step,
    prefill,
    textual_forward,
)
from gitax.models.vit import init_vit_params, vit_forward

TINY_VIT = ViTConfig(patch_size=16, width=64, layers=2, heads=2, input_resolution=32)
TINY = GitConfig(
    encoder=TINY_VIT,
    visual_feature_size=64,
    vocab_size=128,
    hidden_size=48,
    num_layers=2,
    num_heads=4,
    feedforward_size=96,
    max_caption_length=32,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = GitModel(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_config_from_param():
    cfg = config_from_param({})
    assert cfg.encoder.patch_size == 16 and cfg.visual_feature_size == 768
    cfg = config_from_param(
        {"image_encoder_type": "CLIPViT_L_14", "visual_feature_size": 1024}
    )
    assert cfg.encoder.patch_size == 14 and cfg.encoder.width == 1024


def test_vit_output_shape(model_and_params):
    model, params = model_and_params
    imgs = jnp.zeros((2, 32, 32, 3))
    out = vit_forward(params["image_encoder"], imgs, TINY_VIT)
    assert out.shape == (2, (32 // 16) ** 2 + 1, 64)


def test_vit_dynamic_resolution(model_and_params):
    """Non-default input resolution triggers pos-emb interpolation
    (reference CLIP/model.py:245-251)."""
    model, params = model_and_params
    out = vit_forward(params["image_encoder"], jnp.zeros((1, 48, 64, 3)), TINY_VIT)
    assert out.shape == (1, 3 * 4 + 1, 64)


def test_unified_mask_block_structure():
    m, t = 3, 4
    mask = np.asarray(build_unified_mask(m, t, batch=1))[0, 0]
    # mem->mem full
    assert (mask[:m, :m] == 0).all()
    # mem->text blocked
    assert (mask[:m, m:] < -1e17).all()
    # text->mem full
    assert (mask[m:, :m] == 0).all()
    # text->text causal
    txt = mask[m:, m:]
    for i in range(t):
        for j in range(t):
            assert (txt[i, j] == 0) == (j <= i)


def test_unified_mask_memory_padding():
    mv = jnp.asarray([[True, False]])
    mask = np.asarray(build_unified_mask(2, 2, memory_valid=mv, batch=1))[0, 0]
    assert (mask[:, 1] < -1e17).all()  # padded memory col blocked everywhere
    assert mask[0, 0] == 0


def test_unified_mask_bi_valid():
    bi = jnp.asarray([[True, False]])
    mask = np.asarray(build_unified_mask(2, 3, bi_valid_mask=bi, batch=1))[0, 0]
    # first text col open for every row, incl. memory rows
    assert (mask[:, 2] == 0).all()


def test_textual_forward_shape(model_and_params):
    model, params = model_and_params
    visual = jnp.ones((2, 5, 64))
    tokens = jnp.ones((2, 7), jnp.int32)
    logits = textual_forward(params["textual"], visual, tokens, TINY)
    assert logits.shape == (2, 7, 128)


def test_forward_logits_end_to_end(model_and_params):
    model, params = model_and_params
    imgs = jnp.zeros((2, 32, 32, 3))
    tokens = jnp.ones((2, 6), jnp.int32)
    logits = model.forward_logits(params, imgs, tokens)
    assert logits.shape == (2, 6, 128)
    assert bool(jnp.isfinite(logits).all())


def test_kv_cache_matches_full_forward(model_and_params):
    """Incremental prefill+step logits must equal the full recompute the
    reference does every step (decoder.py:1013-1054)."""
    model, params = model_and_params
    rng = np.random.RandomState(1)
    visual = jnp.asarray(rng.randn(2, 5, 64), jnp.float32)
    tokens = jnp.asarray(rng.randint(1, 128, (2, 6)), jnp.int32)

    # full forward logits at each position
    full = textual_forward(params["textual"], visual, tokens, TINY)

    # prefill on first 2 tokens, then step the rest (f32 matmul precision is
    # pinned in conftest; without it the env's bf16 default drowns parity)
    logits_p, cache = prefill(params["textual"], visual, tokens[:, :2], TINY, 6)
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full[:, 1]), rtol=1e-5, atol=1e-5
    )
    for t in range(2, 6):
        logits_s, cache = decode_step(params["textual"], tokens[:, t], cache, TINY)
        np.testing.assert_allclose(
            np.asarray(logits_s), np.asarray(full[:, t]), rtol=1e-4, atol=1e-4
        )


def test_video_frames_with_temporal_embedding():
    cfg = GitConfig(
        encoder=TINY_VIT,
        visual_feature_size=64,
        vocab_size=128,
        hidden_size=48,
        num_layers=2,
        num_heads=4,
        feedforward_size=96,
        max_caption_length=32,
        num_image_with_embedding=3,
    )
    model = GitModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    assert params["img_temporal_embedding"].shape == (3, 64)
    frames = jnp.zeros((2, 3, 32, 32, 3))
    feats = model.encode_images(params, frames)
    assert feats.shape == (2, 3 * 5, 64)
    # temporal embeddings change the features
    params2 = dict(params)
    params2["img_temporal_embedding"] = (
        params["img_temporal_embedding"] + 1.0
    )
    feats2 = model.encode_images(params2, frames)
    assert not np.allclose(np.asarray(feats), np.asarray(feats2))


def test_video_extra_frames_truncated_like_reference():
    """Frames beyond num_image_with_embedding are dropped (the reference
    rebinds `features` to the zip() result, decoder.py:849, so an
    8-frame batch into a 6-embedding model uses the first 6 frames —
    previously this raised a broadcast error here)."""
    from gitax.models.config import GitConfig, ViTConfig

    cfg = GitConfig(
        encoder=ViTConfig(16, 32, 1, 2, 32),
        visual_feature_size=32,
        vocab_size=64,
        hidden_size=32,
        num_layers=1,
        num_heads=2,
        feedforward_size=64,
        max_caption_length=16,
        num_image_with_embedding=2,
    )
    model = GitModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    vids4 = jnp.asarray(rng.randn(1, 4, 32, 32, 3), jnp.float32)
    feats4 = model.encode_images(params, vids4)
    feats2 = model.encode_images(params, vids4[:, :2])
    # 2 frames x (4 patches + cls) tokens; frames 3-4 ignored
    assert feats4.shape == feats2.shape
    np.testing.assert_allclose(np.asarray(feats4), np.asarray(feats2), rtol=1e-6)
