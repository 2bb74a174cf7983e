"""Numerical parity of gitax modules vs the PyTorch reference, weight-
for-weight: torch modules are randomly initialized, their state dicts
converted with gitax.ckpt, and outputs compared on identical inputs.

Tolerances: f32 with differing accumulation orders; LayerNorm with tiny
epsilons amplifies reassociation noise on random-init weights, so 1e-4
relative is the realistic bound (trained checkpoints behave the same)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_compat import import_reference_modules

import jax
import jax.numpy as jnp

from gitax.ckpt.torch_convert import (
    align_by_suffix,
    convert_textual_state_dict,
    convert_vit_state_dict,
)
from gitax.models.config import GitConfig, ViTConfig
from gitax.models.textual import textual_forward
from gitax.models.vit import vit_forward

clip_model, ref_decoder = import_reference_modules()

VIT_CFG = ViTConfig(patch_size=16, width=64, layers=2, heads=2, input_resolution=32)
GIT_CFG = GitConfig(
    encoder=VIT_CFG,
    visual_feature_size=64,
    vocab_size=128,
    hidden_size=48,
    num_layers=2,
    num_heads=4,
    feedforward_size=96,
    max_caption_length=32,
)


@pytest.fixture(scope="module")
def torch_vit():
    torch.manual_seed(0)
    m = clip_model.VisualTransformer(
        input_resolution=32,
        patch_size=16,
        width=64,
        layers=2,
        heads=2,
        output_dim=64,
        output_grid=True,
        grid_after_ln=True,
    )
    return m.eval()


@pytest.fixture(scope="module")
def torch_textual():
    torch.manual_seed(1)
    m = ref_decoder.TransformerDecoderTextualHead(
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
    )
    return m.eval()


def test_vit_forward_parity(torch_vit):
    params = convert_vit_state_dict(torch_vit.state_dict(), VIT_CFG, prefix="")
    rng = np.random.RandomState(0)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = torch_vit(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(vit_forward(params, jnp.asarray(img), VIT_CFG))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_vit_dynamic_resolution_parity(torch_vit):
    """Non-square input triggers runtime pos-emb interpolation in both
    implementations (reference CLIP/model.py:245-251)."""
    params = convert_vit_state_dict(torch_vit.state_dict(), VIT_CFG, prefix="")
    rng = np.random.RandomState(1)
    img = rng.randn(1, 48, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = torch_vit(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(vit_forward(params, jnp.asarray(img), VIT_CFG))
    assert ours.shape == ref.shape == (1, 3 * 4 + 1, 64)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_textual_forward_parity(torch_textual):
    params = convert_textual_state_dict(
        torch_textual.state_dict(), GIT_CFG, prefix=""
    )
    rng = np.random.RandomState(2)
    visual = rng.randn(2, 5, 64).astype(np.float32)
    tokens = rng.randint(1, 128, (2, 7))
    with torch.no_grad():
        ref = torch_textual(
            torch.from_numpy(visual), torch.from_numpy(tokens)
        ).numpy()
    ours = np.asarray(
        textual_forward(params, jnp.asarray(visual), jnp.asarray(tokens), GIT_CFG)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_textual_parity_with_memory_padding(torch_textual):
    """hidden_valid_mask -> -inf memory columns (decoder.py:127-137)."""
    params = convert_textual_state_dict(
        torch_textual.state_dict(), GIT_CFG, prefix=""
    )
    rng = np.random.RandomState(3)
    visual = rng.randn(2, 5, 64).astype(np.float32)
    tokens = rng.randint(1, 128, (2, 4))
    valid = np.asarray([[True] * 5, [True, True, True, False, False]])
    with torch.no_grad():
        ref = torch_textual(
            torch.from_numpy(visual),
            torch.from_numpy(tokens),
            hidden_valid_mask=torch.from_numpy(valid),
        ).numpy()
    ours = np.asarray(
        textual_forward(
            params,
            jnp.asarray(visual),
            jnp.asarray(tokens),
            GIT_CFG,
            memory_valid=jnp.asarray(valid),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_textual_parity_with_bi_valid_mask(torch_textual):
    params = convert_textual_state_dict(
        torch_textual.state_dict(), GIT_CFG, prefix=""
    )
    rng = np.random.RandomState(4)
    visual = rng.randn(1, 5, 64).astype(np.float32)
    tokens = rng.randint(1, 128, (1, 6))
    bi = np.asarray([[True, True, False, False, False, False]])
    with torch.no_grad():
        ref = torch_textual(
            torch.from_numpy(visual),
            torch.from_numpy(tokens),
            bi_valid_mask_caption=torch.from_numpy(bi),
        ).numpy()
    ours = np.asarray(
        textual_forward(
            params,
            jnp.asarray(visual),
            jnp.asarray(tokens),
            GIT_CFG,
            bi_valid_mask=jnp.asarray(bi),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_align_by_suffix():
    loaded = {"module.encoder.conv1.weight": 1, "module.encoder.ln.bias": 2}
    out = align_by_suffix(["conv1.weight", "ln.bias"], loaded)
    assert out == {"conv1.weight": 1, "ln.bias": 2}


def test_export_round_trip():
    """params -> reference state-dict names -> params must be identical,
    and the exported dict must load into the reference torch modules."""
    import jax

    from gitax.ckpt.torch_convert import (
        convert_git_state_dict,
        export_git_state_dict,
    )
    from gitax.models import GitModel
    import dataclasses

    cfg = dataclasses.replace(GIT_CFG, num_image_with_embedding=2)
    model = GitModel(cfg)
    params = jax.device_get(model.init_params(jax.random.PRNGKey(3)))
    sd = export_git_state_dict(params, cfg)
    back = convert_git_state_dict(sd, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(back)
    )
    for k, v in flat_a:
        np.testing.assert_allclose(
            np.asarray(v), flat_b[jax.tree_util.keystr(k)], rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(k),
        )

    # exported names load into the torch reference modules without misses
    tvit = clip_model.VisualTransformer(
        input_resolution=32, patch_size=16, width=64, layers=2, heads=2,
        output_dim=64, output_grid=True, grid_after_ln=True)
    vit_sd = {
        k[len("image_encoder."):]: torch.from_numpy(v)
        for k, v in sd.items()
        if k.startswith("image_encoder.")
    }
    missing, unexpected = tvit.load_state_dict(vit_sd, strict=False)
    assert not unexpected, unexpected
    assert missing == ["proj"] or not missing, missing  # grid mode: no proj in export
