"""Offline clip.load equivalent: torchscript CLIP archive -> gitax
params with sha256 pin verification (reference CLIP/clip.py:16-57,64-86,
CLIP/model.py:402-439), oracle-tested against the reference's own
build_model over a synthetic archive."""

import os.path as op
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, op.dirname(op.abspath(__file__)))

from e2e_common import make_clip_jit_archive
from reference_compat import import_reference_modules

import jax.numpy as jnp

from gitax.ckpt import (
    CLIP_ARCHIVE_SHA256,
    load_clip_archive,
    load_image_encoder_from_archive,
    resolve_archive,
)
from gitax.models.clip import text_forward
from gitax.models.vit import vit_forward

clip_model, _ = import_reference_modules()


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    # named like the real download so the pin lookup engages
    path = str(tmp_path_factory.mktemp("clip") / "ViT-B-16.pt")
    make_clip_jit_archive(path, image_resolution=96)
    return path


def test_resolve_named_model_searches_roots(archive, tmp_path):
    root = op.dirname(archive)
    path, pin = resolve_archive("ViT-B/16", roots=(str(tmp_path), root))
    assert path == archive
    assert pin == CLIP_ARCHIVE_SHA256["ViT-B/16"]
    with pytest.raises(FileNotFoundError):
        resolve_archive("ViT-L/14", roots=(str(tmp_path),))
    with pytest.raises(FileNotFoundError):
        resolve_archive("NOT-A-MODEL", roots=(str(tmp_path),))


def test_strict_verify_rejects_unpinned_bytes(archive):
    # a synthetic archive can never hash to the published pin
    with pytest.raises(ValueError, match="sha256 mismatch"):
        load_clip_archive(archive, verify="strict")


def test_load_matches_reference_build_model(archive):
    loaded = load_clip_archive(archive, verify="warn")
    assert loaded["sha256_verified"] is False
    assert loaded["visual_kind"] == "vit"
    assert loaded["input_resolution"] == 96

    jit_mod = torch.jit.load(archive, map_location="cpu")
    sd = dict(jit_mod.state_dict())
    # build_model roundtrips weights through fp16 (convert_weights,
    # CLIP/model.py:378-399) — build the skeleton, upcast, then load the
    # archive fp32 so the oracle isn't fp16-quantized
    ref = clip_model.build_model(dict(sd), skip_load=True).float().eval()
    for k in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(k, None)
    ref.load_state_dict(sd)

    rng = np.random.RandomState(0)
    img = rng.randn(2, 96, 96, 3).astype(np.float32)
    ref.visual.output_grid = True
    ref.visual.grid_after_ln = True
    with torch.no_grad():
        ref_grid = ref.visual(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    ours = vit_forward(
        loaded["visual"], jnp.asarray(img), loaded["visual_config"]
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref_grid.numpy(), rtol=2e-4, atol=2e-4
    )

    toks = np.zeros((2, 16), np.int64)
    toks[:, 0] = 1
    toks[0, 1:4] = [5, 9, 60]
    toks[1, 1] = 63
    with torch.no_grad():
        ref_txt = ref.encode_text(torch.from_numpy(toks))
    ours_txt = text_forward(
        loaded["text"], jnp.asarray(toks, jnp.int32), loaded["text_config"]
    )
    np.testing.assert_allclose(
        np.asarray(ours_txt), ref_txt.numpy(), rtol=2e-4, atol=2e-4
    )


def test_image_encoder_resize_matches_reference(archive):
    """Static pos-emb resize to a different input resolution — the
    reference get_image_encoder flow (model.py:76-88 via
    torch_common.resize_2d_pos_embed)."""
    sys.path.insert(0, "/root/repo/tests/ref_stubs")
    import azfuse  # noqa: F401  (torch_common imports azfuse.File)

    from generativeimage2text.torch_common import resize_2d_pos_embed

    cfg, params = load_image_encoder_from_archive(
        archive, input_resolution=64, verify=False
    )
    assert cfg.input_resolution == 64
    assert params["positional_embedding"].shape[0] == (64 // 16) ** 2 + 1

    jit_mod = torch.jit.load(archive, map_location="cpu")
    pos = jit_mod.state_dict()["visual.positional_embedding"].float()
    ref_resized = resize_2d_pos_embed(pos, 96, 16, 64)
    np.testing.assert_allclose(
        np.asarray(params["positional_embedding"]),
        ref_resized.numpy(),
        rtol=1e-5,
        atol=1e-5,
    )


def test_strict_refuses_unpinned_path(tmp_path):
    """verify='strict' must refuse to deserialize an archive whose
    basename matches no published pin (torchscript archives are pickle
    containers; silent unverified loads are the failure mode the strict
    mode exists to prevent)."""
    from gitax.ckpt.clip_archive import load_clip_archive

    path = tmp_path / "mystery_model.pt"
    path.write_bytes(b"not an archive")
    with pytest.raises(ValueError, match="no published sha256 pin"):
        load_clip_archive(str(path), verify="strict")
