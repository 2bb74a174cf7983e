"""Bicubic interpolation matching torch.nn.functional.interpolate.

The reference resizes ViT positional-embedding grids with torch's
bicubic (a=-0.75, align_corners=False, edge clamp) both statically at
model build (torch_common.py:19-39) and dynamically for non-square
inputs (CLIP/model.py:245-251).  ``jax.image.resize``'s cubic kernel
uses a=-0.5, so we implement the torch kernel explicitly; it is used at
parameter-load time (numpy) and is jit-safe (pure jnp ops, static
shapes) for in-graph use.
"""

from __future__ import annotations

import numpy as np


def _cubic_kernel(x, a=-0.75):
    x = np.abs(x)
    x2, x3 = x * x, x * x * x
    w1 = (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0
    w2 = a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a
    return np.where(x <= 1.0, w1, np.where(x < 2.0, w2, 0.0))


def _axis_weights(in_size, out_size):
    """Per-output-pixel 4-tap indices and weights for one axis."""
    scale = in_size / out_size
    out = np.arange(out_size, dtype=np.float64)
    src = (out + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    taps = base[:, None] + np.arange(-1, 3)[None, :]  # [out, 4]
    weights = _cubic_kernel(taps - src[:, None])
    taps = np.clip(taps, 0, in_size - 1)
    return taps, weights.astype(np.float64)


def bicubic_resize_2d(grid, out_h, out_w):
    """Resize [H, W, C] -> [out_h, out_w, C] with torch-parity bicubic.

    Works on numpy arrays (host, float64 accumulate) and on traced jnp
    arrays (in-graph, e.g. runtime pos-emb interpolation for
    variable-resolution inputs; shapes are static under jit).
    """
    is_jax = hasattr(grid, "aval") or type(grid).__module__.startswith("jax")
    h, w, _ = grid.shape
    ti, wi = _axis_weights(h, out_h)
    tj, wj = _axis_weights(w, out_w)
    if is_jax:
        import jax.numpy as jnp

        dt = grid.dtype
        # rows[o,w,c] = sum_k wi[o,k] * grid[ti[o,k], w, c]
        rows = jnp.einsum("ok,okwc->owc", wi.astype(dt), grid[ti].astype(dt))
        # out[h,o,c] = sum_k wj[o,k] * rows[h, tj[o,k], c]
        return jnp.einsum("ok,hokc->hoc", wj.astype(dt), rows[:, tj])
    grid = np.asarray(grid, dtype=np.float64)
    rows = np.einsum("ok,okwc->owc", wi, grid[ti])
    return np.einsum("ok,hokc->hoc", wj, rows[:, tj])


def resize_pos_embed_grid(pos_embed, grid_before, grid_after_hw):
    """Resize a ViT positional-embedding table [1+g*g, C] to a new grid.

    The class-token row is kept; the spatial rows are reshaped to
    [g, g, C], bicubic-resized to grid_after_hw=(gh, gw), and
    re-flattened (reference torch_common.py:19-39 and
    CLIP/model.py:245-251).
    """
    pos_embed = np.asarray(pos_embed)
    cls_row, spatial = pos_embed[:1], pos_embed[1:]
    c = pos_embed.shape[-1]
    assert spatial.shape[0] == grid_before * grid_before, (
        spatial.shape,
        grid_before,
    )
    grid = spatial.reshape(grid_before, grid_before, c)
    gh, gw = grid_after_hw
    resized = bicubic_resize_2d(grid, gh, gw).reshape(gh * gw, c)
    return np.concatenate([cls_row, resized], axis=0).astype(pos_embed.dtype)
