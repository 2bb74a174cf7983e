"""CLIP-style ViT image encoder, TPU-first.

Re-implements the behavior of the reference's VisualTransformer
(CLIP/model.py:215-274) in functional JAX:

  * patchify as space-to-depth + one big matmul (a single MXU-friendly
    GEMM instead of a conv),
  * pre-norm residual blocks with QuickGELU,
  * `ln_post` applied to ALL tokens, no projection — GIT's
    ``output_grid=True, grid_after_ln=True`` mode (CLIP/model.py:263-268),
  * runtime torch-parity bicubic pos-embedding interpolation for
    non-square / non-default resolutions (CLIP/model.py:245-251); shapes
    are static per jit specialization so this stays compile-time work.

Blocks are stacked on a leading layer axis and driven by lax.scan:
compile time stays O(1) in depth and XLA pipelines the weight streaming.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import bicubic_resize_2d
from .config import ViTConfig
from .nn import layer_norm, linear, quick_gelu, self_attention


def init_vit_params(key, cfg: ViTConfig, dtype=jnp.float32):
    """Random init mirroring CLIP's scheme (scale = width**-0.5 for
    embeddings; attn/mlp use torch-default-like normal init)."""
    w = cfg.width
    scale = w ** -0.5
    keys = iter(jax.random.split(key, 16))

    def normal(k, shape, std):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    n_layers = cfg.layers
    blocks = {
        "ln_1": {
            "scale": jnp.ones((n_layers, w), dtype),
            "bias": jnp.zeros((n_layers, w), dtype),
        },
        "attn": {
            "qkv": {
                "kernel": normal(next(keys), (n_layers, w, 3 * w), 0.02),
                "bias": jnp.zeros((n_layers, 3 * w), dtype),
            },
            "out": {
                "kernel": normal(next(keys), (n_layers, w, w), 0.02),
                "bias": jnp.zeros((n_layers, w), dtype),
            },
        },
        "ln_2": {
            "scale": jnp.ones((n_layers, w), dtype),
            "bias": jnp.zeros((n_layers, w), dtype),
        },
        "mlp": {
            "c_fc": {
                "kernel": normal(next(keys), (n_layers, w, 4 * w), 0.02),
                "bias": jnp.zeros((n_layers, 4 * w), dtype),
            },
            "c_proj": {
                "kernel": normal(next(keys), (n_layers, 4 * w, w), 0.02),
                "bias": jnp.zeros((n_layers, w), dtype),
            },
        },
    }
    return {
        "patch_kernel": normal(
            next(keys), (cfg.patch_size * cfg.patch_size * 3, w), 0.02
        ),
        "class_embedding": normal(next(keys), (w,), scale),
        "positional_embedding": normal(next(keys), (cfg.num_tokens, w), scale),
        "ln_pre": {"scale": jnp.ones((w,), dtype), "bias": jnp.zeros((w,), dtype)},
        "blocks": blocks,
        "ln_post": {"scale": jnp.ones((w,), dtype), "bias": jnp.zeros((w,), dtype)},
    }


def _block(x, bp, num_heads, ln_eps, flash=False, fast=False):
    h1 = layer_norm(x, bp["ln_1"], ln_eps)
    x = x + self_attention(h1, bp["attn"], num_heads, flash=flash, fast=fast)
    h = layer_norm(x, bp["ln_2"], ln_eps)
    h = linear(quick_gelu(linear(h, bp["mlp"]["c_fc"])), bp["mlp"]["c_proj"])
    return x + h


def _pos_embed_for(params, cfg: ViTConfig, gh, gw, dtype):
    """Positional table for a (gh, gw) patch grid, interpolating the
    stored table when the runtime grid differs (CLIP/model.py:245-251)."""
    pos = params["positional_embedding"].astype(dtype)
    g = cfg.grid
    if (gh, gw) == (g, g):
        return pos
    spatial = pos[1:].reshape(g, g, cfg.width)
    resized = bicubic_resize_2d(spatial, gh, gw).reshape(gh * gw, cfg.width)
    return jnp.concatenate([pos[:1], resized.astype(dtype)], axis=0)


def vit_forward(params, images, cfg: ViTConfig, dtype=jnp.float32, flash=None,
                output_grid=True, fast=None, remat=False):
    """images [B, H, W, 3] (NHWC, normalized) -> tokens [B, 1+gh*gw, width].

    Cites decoder.py:846-857 for how GIT consumes the full token grid.
    flash=True opts into the Pallas fused-attention kernel
    (ops/flash_attention.py, inference only); flash=None AUTO-ENABLES it
    by sequence length: measured on v5e (round 3, see
    ops/flash_attention.py FLASH_AUTO_MIN_SEQ table), XLA wins at
    S<=626 (628 vs 528 img/s at the 224px S=257 shape) but collapses
    past S=640 lanes, where the kernel is 22-44% faster (S=901: 155 vs
    117 img/s; S=1601: 75 vs 52).  Auto never fires in f32 parity mode
    or off-TPU, so the byte-parity paths keep the reference's XLA
    numerics; training passes flash=False explicitly (differentiable
    path).
    """
    if flash is None:
        from ..ops.flash_attention import auto_flash

        p_ = cfg.patch_size
        flash = auto_flash(
            (images.shape[1] // p_) * (images.shape[2] // p_) + 1, dtype
        )
    if fast is None:
        fast = cfg.fast_softmax
    b, h, w, c = images.shape
    p = cfg.patch_size
    assert h % p == 0 and w % p == 0, (h, w, p)
    gh, gw = h // p, w // p
    x = images.astype(dtype)
    # space-to-depth patchify: [B, gh, gw, P*P*3] then one GEMM
    x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, gh * gw, p * p * c)
    x = jnp.dot(x, params["patch_kernel"].astype(dtype), preferred_element_type=dtype)

    cls = jnp.broadcast_to(
        params["class_embedding"].astype(dtype), (b, 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _pos_embed_for(params, cfg, gh, gw, dtype)
    x = layer_norm(x, params["ln_pre"], cfg.ln_eps)

    def scan_fn(carry, bp):
        return (
            _block(
                carry, bp, cfg.heads, cfg.ln_eps, flash=flash, fast=fast,
            ),
            None,
        )

    if remat:
        # per-BLOCK rematerialization: the backward recomputes one block
        # at a time, so the only depth-stacked residual is the scan carry
        # ([L,B,S,W] — 228 MB for ViT-L B=32 S=145 bf16).  Checkpointing
        # the whole encoder instead (the obvious jax.checkpoint(forward))
        # makes XLA keep EVERY layer's recomputed intermediates live at
        # once — measured 12.7 GB of HLO temps for that same shape, an
        # OOM on 16 GB v5e
        scan_fn = jax.checkpoint(scan_fn)
    x, _ = jax.lax.scan(scan_fn, x, params["blocks"])
    if not output_grid:
        # CLIP image-embedding mode (CLIP/model.py:270-274): ln_post on the
        # class token only, then the learned projection
        x = layer_norm(x[:, 0], params["ln_post"], cfg.ln_eps)
        if "proj" in params:
            x = jnp.dot(x, params["proj"].astype(x.dtype))
        return x
    return layer_norm(x, params["ln_post"], cfg.ln_eps)
