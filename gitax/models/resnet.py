"""CLIP's ModifiedResNet image encoder (reference CLIP/model.py:94-159).

Present in the reference for completeness (no shipped GIT config uses
it, SURVEY.md C14); provided here so CLIP ResNet checkpoints can serve
as GIT encoders.  Differences from torchvision ResNet mirrored from the
reference: 3-conv stem with avgpool, anti-aliased strided convolutions
(avgpool before the strided conv), attention-pool head.  In GIT's
``output_grid`` mode the final spatial grid is returned as tokens
(CLIP/model.py:156-157) and the attention pool is unused.

Inference-mode BatchNorm (running statistics folded in).  NHWC layout.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224

    @property
    def embed_dim(self):
        return self.width * 32


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (
        p["bias"].astype(jnp.float32)
        - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv
    ).astype(x.dtype)
    return x * scale + bias


def _conv(x, kernel, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _avg_pool(x, size):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, size, size, 1), (1, size, size, 1), "VALID"
    ) / (size * size)


def _bottleneck(x, p, stride):
    """(reference CLIP/model.py:9-52): all convs stride 1; avgpool after
    conv2 when stride > 1; downsample = avgpool + 1x1 conv."""
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], padding=1), p["bn2"]))
    if stride > 1:
        out = _avg_pool(out, stride)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        identity = x
        if stride > 1:
            identity = _avg_pool(identity, stride)
        identity = _bn(_conv(identity, p["downsample"]["conv"]), p["downsample"]["bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def attention_pool(x_grid, p, num_heads):
    """x_grid [B, H, W, C] -> pooled [B, out_dim]
    (reference AttentionPool2d, CLIP/model.py:55-92)."""
    b, hh, ww, c = x_grid.shape
    x = x_grid.reshape(b, hh * ww, c)
    x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
    x = x + p["positional_embedding"].astype(x.dtype)
    t = x.shape[1]

    def proj(x, name):
        return jnp.dot(x, p[name]["kernel"].astype(x.dtype)) + p[name]["bias"].astype(
            x.dtype
        )

    q = proj(x[:, :1], "q")  # only the mean token's output is used
    k = proj(x, "k")
    v = proj(x, "v")
    dh = c // num_heads
    q = q.reshape(b, 1, num_heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, num_heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, num_heads, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3)
    ctx = ctx.reshape(b, 1, c)[:, 0]
    return jnp.dot(ctx, p["c"]["kernel"].astype(ctx.dtype)) + p["c"]["bias"].astype(
        ctx.dtype
    )


def resnet_forward(params, images, cfg: ResNetConfig, dtype=jnp.float32,
                   output_grid=True):
    """images [B, H, W, 3] -> tokens [B, (H/32)*(W/32), width*32] in
    output_grid mode (GIT's, CLIP/model.py:156-157), else pooled
    [B, output_dim]."""
    x = images.astype(dtype)
    stem = params["stem"]
    x = jax.nn.relu(_bn(_conv(x, stem["conv1"], stride=2, padding=1), stem["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, stem["conv2"], padding=1), stem["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, stem["conv3"], padding=1), stem["bn3"]))
    x = _avg_pool(x, 2)
    for gi, blocks in enumerate(params["layers"]):
        stride = 1 if gi == 0 else 2
        for bi, bp in enumerate(blocks):
            x = _bottleneck(x, bp, stride if bi == 0 else 1)
    if output_grid:
        b, hh, ww, c = x.shape
        return x.reshape(b, hh * ww, c)
    return attention_pool(x, params["attnpool"], cfg.heads)


def convert_resnet_state_dict(sd, cfg: ResNetConfig, prefix=""):
    """torch ModifiedResNet state dict -> gitax params (NHWC kernels)."""

    def conv(name):
        w = np.asarray(sd[prefix + name].detach().cpu().float().numpy())
        return w.transpose(2, 3, 1, 0)  # OIHW -> HWIO

    def bn(name):
        g = lambda s: np.asarray(sd[prefix + name + s].detach().cpu().float().numpy())
        return {
            "scale": g(".weight"),
            "bias": g(".bias"),
            "mean": g(".running_mean"),
            "var": g(".running_var"),
        }

    params = {
        "stem": {
            "conv1": conv("conv1.weight"),
            "bn1": bn("bn1"),
            "conv2": conv("conv2.weight"),
            "bn2": bn("bn2"),
            "conv3": conv("conv3.weight"),
            "bn3": bn("bn3"),
        },
        "layers": [],
    }
    for gi, n_blocks in enumerate(cfg.layers):
        group = []
        for bi in range(n_blocks):
            base = "layer{}.{}.".format(gi + 1, bi)
            bp = {
                "conv1": conv(base + "conv1.weight"),
                "bn1": bn(base + "bn1"),
                "conv2": conv(base + "conv2.weight"),
                "bn2": bn(base + "bn2"),
                "conv3": conv(base + "conv3.weight"),
                "bn3": bn(base + "bn3"),
            }
            if prefix + base + "downsample.0.weight" in sd:
                bp["downsample"] = {
                    "conv": conv(base + "downsample.0.weight"),
                    "bn": bn(base + "downsample.1"),
                }
            group.append(bp)
        params["layers"].append(group)

    def lin(name):
        g = lambda s: np.asarray(sd[prefix + name + s].detach().cpu().float().numpy())
        return {"kernel": g(".weight").T, "bias": g(".bias")}

    if prefix + "attnpool.positional_embedding" in sd:
        params["attnpool"] = {
            "positional_embedding": np.asarray(
                sd[prefix + "attnpool.positional_embedding"].detach().float().numpy()
            ),
            "q": lin("attnpool.q_proj"),
            "k": lin("attnpool.k_proj"),
            "v": lin("attnpool.v_proj"),
            "c": lin("attnpool.c_proj"),
        }
    return params
