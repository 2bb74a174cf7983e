import numpy as np
import pytest

from gitax.ops.interp import bicubic_resize_2d, resize_pos_embed_grid

torch = pytest.importorskip("torch")


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((14, 14), (30, 30)), ((14, 14), (7, 7)), ((10, 12), (17, 9)), ((4, 4), (3, 4))],
)
def test_bicubic_matches_torch_interpolate(in_hw, out_hw):
    """gitax bicubic must match torch F.interpolate(mode='bicubic',
    align_corners=False), the op the reference uses for pos-embedding
    resizing (torch_common.py:19-39, CLIP/model.py:245-251)."""
    rng = np.random.RandomState(0)
    grid = rng.randn(*in_hw, 5).astype(np.float32)
    ours = bicubic_resize_2d(grid, *out_hw)
    t = torch.nn.functional.interpolate(
        torch.from_numpy(grid).permute(2, 0, 1).unsqueeze(0).double(),
        size=out_hw,
        mode="bicubic",
        align_corners=False,
    )
    theirs = t.squeeze(0).permute(1, 2, 0).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-6, atol=1e-6)


def test_resize_pos_embed_keeps_cls():
    rng = np.random.RandomState(1)
    pos = rng.randn(1 + 4 * 4, 8).astype(np.float32)
    out = resize_pos_embed_grid(pos, 4, (6, 6))
    assert out.shape == (1 + 36, 8)
    np.testing.assert_array_equal(out[0], pos[0])


def test_resize_pos_embed_identity():
    rng = np.random.RandomState(2)
    pos = rng.randn(1 + 3 * 3, 4).astype(np.float32)
    out = resize_pos_embed_grid(pos, 3, (3, 3))
    np.testing.assert_allclose(out, pos, rtol=1e-6, atol=1e-7)
