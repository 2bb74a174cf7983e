"""CLIP text tower + similarity head parity vs the torch reference."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_compat import import_reference_modules

import jax.numpy as jnp

from gitax.ckpt.torch_convert import convert_vit_state_dict
from gitax.models.clip import (
    CLIPTextConfig,
    clip_similarity,
    convert_clip_text_state_dict,
    text_forward,
)
from gitax.models.config import ViTConfig
from gitax.models.vit import vit_forward

clip_model, _ = import_reference_modules()

TXT = CLIPTextConfig(context_length=16, vocab_size=100, width=32, heads=2, layers=2)


@pytest.fixture(scope="module")
def torch_clip():
    torch.manual_seed(0)
    m = clip_model.CLIP(
        embed_dim=24,
        image_resolution=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=16,
        context_length=16,
        vocab_size=100,
        transformer_width=32,
        transformer_heads=2,
        transformer_layers=2,
    )
    m = m.float()
    with torch.no_grad():
        torch.nn.init.normal_(m.positional_embedding, std=0.02)
        torch.nn.init.normal_(m.text_projection, std=0.02)
    return m.eval()


def test_text_tower_parity(torch_clip):
    params = convert_clip_text_state_dict(torch_clip.state_dict(), TXT)
    rng = np.random.RandomState(0)
    toks = rng.randint(1, 100, (3, 16))
    toks[:, -1] = 99  # EOT = highest id
    with torch.no_grad():
        ref = torch_clip.encode_text(torch.from_numpy(toks)).numpy()
    ours = np.asarray(text_forward(params, jnp.asarray(toks), TXT))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_full_clip_similarity_parity(torch_clip):
    vit_cfg = ViTConfig(16, 64, 2, 1, 32)  # CLIP: vision_heads = width // 64
    vparams = convert_vit_state_dict(torch_clip.state_dict(), vit_cfg, prefix="visual.")
    vparams["proj"] = torch_clip.visual.proj.detach().numpy()
    tparams = convert_clip_text_state_dict(torch_clip.state_dict(), TXT)
    rng = np.random.RandomState(1)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    toks = rng.randint(1, 100, (3, 16))
    toks[:, -1] = 99
    with torch.no_grad():
        ref_i, ref_t = torch_clip(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)), torch.from_numpy(toks)
        )
    imf = vit_forward(vparams, jnp.asarray(imgs), vit_cfg, output_grid=False)
    txf = text_forward(tparams, jnp.asarray(toks), TXT)
    li, lt = clip_similarity(imf, txf, jnp.asarray(tparams["logit_scale"]))
    np.testing.assert_allclose(np.asarray(li), ref_i.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lt), ref_t.numpy(), rtol=2e-4, atol=2e-4)
