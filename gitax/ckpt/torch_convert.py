"""Torch GIT/CLIP checkpoint -> gitax params pytree.

The published checkpoints are torch state dicts saved as
``{'model': state_dict}`` at output/{model}/snapshot/model.pt
(reference inference.py:84-86).  This module maps those names onto the
gitax pytree:

  * torch Linear weights are [out, in]; gitax kernels are [in, out]
    (transposed on import),
  * the ViT patchify conv becomes a [P*P*3, width] matmul kernel,
  * q/k/v projections are fused into one [D, 3D] kernel,
  * per-layer tensors are stacked on a leading layer axis (for
    lax.scan-driven blocks),
  * name robustness uses the reference's suffix-alignment idea
    (torch_common.py:100-145): keys are matched by maximal common
    suffix, so "module."-prefixed or re-wrapped checkpoints load.

Everything here is host-side numpy — no device transfer until the
caller puts the pytree where it wants it.
"""

from __future__ import annotations

import io
import logging
import re
from typing import Dict

import numpy as np

from ..models.config import GitConfig, ViTConfig


def _np(t):
    """torch tensor (or array) -> float32 numpy without importing torch
    at module scope."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def load_torch_checkpoint(path):
    """Load a model.pt; returns the inner state dict with 'module.'
    prefixes stripped (reference torch_common.py:41-56)."""
    import torch

    from ..io import fileio

    with fileio.open_file(path, "rb") as fp:
        # torch.load takes any seekable file-like; only buffer when the
        # backend stream cannot seek (buffering a multi-GB model.pt
        # doubles peak host memory for nothing on the local path)
        src = fp if getattr(fp, "seekable", lambda: False)() else io.BytesIO(fp.read())
        blob = torch.load(src, map_location="cpu", weights_only=False)
    state = blob.get("model", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in state.items():
        while k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def align_by_suffix(expected_keys, loaded: Dict[str, object]):
    """For each expected key, pick the loaded key sharing the longest
    suffix (reference align_and_update_state_dicts,
    torch_common.py:100-145). Returns {expected: loaded_value}."""
    loaded_keys = sorted(loaded)
    result = {}
    for ek in expected_keys:
        best, best_len = None, 0
        for lk in loaded_keys:
            if ek.endswith(lk) or lk.endswith(ek):
                n = min(len(ek), len(lk))
                if n > best_len:
                    best, best_len = lk, n
        if best is not None:
            result[ek] = loaded[best]
        else:
            logging.info("no checkpoint match for %s", ek)
    return result


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------

_VIT_SUFFIXES = (
    "conv1.weight",
    "class_embedding",
    "positional_embedding",
    "ln_pre.weight",
    "ln_pre.bias",
    "ln_post.weight",
    "ln_post.bias",
)


def _detect_prefix(sd, probe="conv1.weight", hint=""):
    """Find the key prefix for the visual tower ('image_encoder.',
    'visual.', or '')."""
    pat = re.compile(r"^(.*?)" + re.escape(probe) + r"$")
    candidates = [m.group(1) for k in sd if (m := pat.match(k))]
    if not candidates:
        raise KeyError("no key ending in {} found".format(probe))
    if hint:
        for c in candidates:
            if hint in c:
                return c
    return min(candidates, key=len)


def convert_vit_state_dict(sd, cfg: ViTConfig, prefix=None):
    """Visual tower torch names -> gitax vit params.

    Accepts GIT checkpoints ('image_encoder.*'), CLIP checkpoints
    ('visual.*'), or bare VisualTransformer dicts.
    """
    if prefix is None:
        prefix = _detect_prefix(sd, hint="image_encoder")

    def g(name):
        return _np(sd[prefix + name])

    p, w = cfg.patch_size, cfg.width
    conv = g("conv1.weight")  # [width, 3, P, P]
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(p * p * 3, w)

    n = cfg.layers
    qkv_k, qkv_b, out_k, out_b = [], [], [], []
    ln1_s, ln1_b, ln2_s, ln2_b = [], [], [], []
    fc_k, fc_b, pj_k, pj_b = [], [], [], []
    for i in range(n):
        base = "transformer.resblocks.{}.".format(i)
        qkv_k.append(g(base + "attn.in_proj_weight").T)  # [D, 3D]
        qkv_b.append(g(base + "attn.in_proj_bias"))
        out_k.append(g(base + "attn.out_proj.weight").T)
        out_b.append(g(base + "attn.out_proj.bias"))
        ln1_s.append(g(base + "ln_1.weight"))
        ln1_b.append(g(base + "ln_1.bias"))
        ln2_s.append(g(base + "ln_2.weight"))
        ln2_b.append(g(base + "ln_2.bias"))
        fc_k.append(g(base + "mlp.c_fc.weight").T)
        fc_b.append(g(base + "mlp.c_fc.bias"))
        pj_k.append(g(base + "mlp.c_proj.weight").T)
        pj_b.append(g(base + "mlp.c_proj.bias"))

    stack = lambda xs: np.stack(xs, axis=0)
    return {
        "patch_kernel": patch_kernel,
        "class_embedding": g("class_embedding"),
        "positional_embedding": g("positional_embedding"),
        "ln_pre": {"scale": g("ln_pre.weight"), "bias": g("ln_pre.bias")},
        "blocks": {
            "ln_1": {"scale": stack(ln1_s), "bias": stack(ln1_b)},
            "attn": {
                "qkv": {"kernel": stack(qkv_k), "bias": stack(qkv_b)},
                "out": {"kernel": stack(out_k), "bias": stack(out_b)},
            },
            "ln_2": {"scale": stack(ln2_s), "bias": stack(ln2_b)},
            "mlp": {
                "c_fc": {"kernel": stack(fc_k), "bias": stack(fc_b)},
                "c_proj": {"kernel": stack(pj_k), "bias": stack(pj_b)},
            },
        },
        "ln_post": {"scale": g("ln_post.weight"), "bias": g("ln_post.bias")},
    }


# ---------------------------------------------------------------------------
# textual head
# ---------------------------------------------------------------------------


def convert_textual_state_dict(sd, cfg: GitConfig, prefix="textual."):
    def g(name):
        return _np(sd[prefix + name])

    n = cfg.num_layers
    qkv_k, qkv_b, out_k, out_b = [], [], [], []
    aln_s, aln_b, mln_s, mln_b = [], [], [], []
    in_k, in_b, op_k, op_b = [], [], [], []
    for i in range(n):
        base = "transformer.encoder.layer.{}.".format(i)
        q = g(base + "attention.self.query.weight").T
        k = g(base + "attention.self.key.weight").T
        v = g(base + "attention.self.value.weight").T
        qkv_k.append(np.concatenate([q, k, v], axis=1))
        qkv_b.append(
            np.concatenate(
                [
                    g(base + "attention.self.query.bias"),
                    g(base + "attention.self.key.bias"),
                    g(base + "attention.self.value.bias"),
                ]
            )
        )
        out_k.append(g(base + "attention.output.dense.weight").T)
        out_b.append(g(base + "attention.output.dense.bias"))
        aln_s.append(g(base + "attention.output.LayerNorm.weight"))
        aln_b.append(g(base + "attention.output.LayerNorm.bias"))
        in_k.append(g(base + "intermediate.dense.weight").T)
        in_b.append(g(base + "intermediate.dense.bias"))
        op_k.append(g(base + "output.dense.weight").T)
        op_b.append(g(base + "output.dense.bias"))
        mln_s.append(g(base + "output.LayerNorm.weight"))
        mln_b.append(g(base + "output.LayerNorm.bias"))

    stack = lambda xs: np.stack(xs, axis=0)
    return {
        "visual_projection": {
            "linear": {
                "kernel": g("visual_projection.0.weight").T,
                "bias": g("visual_projection.0.bias"),
            },
            "ln": {
                "scale": g("visual_projection.1.weight"),
                "bias": g("visual_projection.1.bias"),
            },
        },
        "embedding": {
            "words": g("embedding.words.weight"),
            "positions": g("embedding.positions.weight"),
            "ln": {
                "scale": g("embedding.layer_norm.weight"),
                "bias": g("embedding.layer_norm.bias"),
            },
        },
        "blocks": {
            "attn": {
                "qkv": {"kernel": stack(qkv_k), "bias": stack(qkv_b)},
                "out": {"kernel": stack(out_k), "bias": stack(out_b)},
            },
            "attn_ln": {"scale": stack(aln_s), "bias": stack(aln_b)},
            "mlp": {
                "intermediate": {"kernel": stack(in_k), "bias": stack(in_b)},
                "output": {"kernel": stack(op_k), "bias": stack(op_b)},
            },
            "mlp_ln": {"scale": stack(mln_s), "bias": stack(mln_b)},
        },
        # tied head: only the bias is a free parameter (decoder.py:500-505)
        "output_bias": g("output.bias"),
    }


def export_git_state_dict(params, cfg: GitConfig):
    """gitax params pytree -> reference-style torch state-dict names
    (numpy values; caller may torch.save({'model': ...})).  Inverse of
    convert_git_state_dict, so models fine-tuned in gitax can be used by
    the PyTorch reference."""
    out = {}

    def put(name, arr):
        out[name] = np.asarray(arr, np.float32)

    # image encoder
    ie = params["image_encoder"]
    p, w = cfg.encoder.patch_size, cfg.encoder.width
    put(
        "image_encoder.conv1.weight",
        np.asarray(ie["patch_kernel"], np.float32)
        .reshape(p, p, 3, w)
        .transpose(3, 2, 0, 1),
    )
    put("image_encoder.class_embedding", ie["class_embedding"])
    put("image_encoder.positional_embedding", ie["positional_embedding"])
    for ln in ("ln_pre", "ln_post"):
        put("image_encoder.{}.weight".format(ln), ie[ln]["scale"])
        put("image_encoder.{}.bias".format(ln), ie[ln]["bias"])
    blocks = ie["blocks"]
    for i in range(cfg.encoder.layers):
        base = "image_encoder.transformer.resblocks.{}.".format(i)
        put(base + "attn.in_proj_weight", np.asarray(blocks["attn"]["qkv"]["kernel"])[i].T)
        put(base + "attn.in_proj_bias", np.asarray(blocks["attn"]["qkv"]["bias"])[i])
        put(base + "attn.out_proj.weight", np.asarray(blocks["attn"]["out"]["kernel"])[i].T)
        put(base + "attn.out_proj.bias", np.asarray(blocks["attn"]["out"]["bias"])[i])
        for ln in ("ln_1", "ln_2"):
            put(base + ln + ".weight", np.asarray(blocks[ln]["scale"])[i])
            put(base + ln + ".bias", np.asarray(blocks[ln]["bias"])[i])
        put(base + "mlp.c_fc.weight", np.asarray(blocks["mlp"]["c_fc"]["kernel"])[i].T)
        put(base + "mlp.c_fc.bias", np.asarray(blocks["mlp"]["c_fc"]["bias"])[i])
        put(base + "mlp.c_proj.weight", np.asarray(blocks["mlp"]["c_proj"]["kernel"])[i].T)
        put(base + "mlp.c_proj.bias", np.asarray(blocks["mlp"]["c_proj"]["bias"])[i])

    # textual head
    tx = params["textual"]
    put("textual.visual_projection.0.weight", np.asarray(tx["visual_projection"]["linear"]["kernel"]).T)
    put("textual.visual_projection.0.bias", tx["visual_projection"]["linear"]["bias"])
    put("textual.visual_projection.1.weight", tx["visual_projection"]["ln"]["scale"])
    put("textual.visual_projection.1.bias", tx["visual_projection"]["ln"]["bias"])
    put("textual.embedding.words.weight", tx["embedding"]["words"])
    put("textual.embedding.positions.weight", tx["embedding"]["positions"])
    put("textual.embedding.layer_norm.weight", tx["embedding"]["ln"]["scale"])
    put("textual.embedding.layer_norm.bias", tx["embedding"]["ln"]["bias"])
    tb = tx["blocks"]
    d = cfg.hidden_size
    for i in range(cfg.num_layers):
        base = "textual.transformer.encoder.layer.{}.".format(i)
        qkv_k = np.asarray(tb["attn"]["qkv"]["kernel"])[i]  # [D, 3D]
        qkv_b = np.asarray(tb["attn"]["qkv"]["bias"])[i]
        put(base + "attention.self.query.weight", qkv_k[:, :d].T)
        put(base + "attention.self.key.weight", qkv_k[:, d : 2 * d].T)
        put(base + "attention.self.value.weight", qkv_k[:, 2 * d :].T)
        put(base + "attention.self.query.bias", qkv_b[:d])
        put(base + "attention.self.key.bias", qkv_b[d : 2 * d])
        put(base + "attention.self.value.bias", qkv_b[2 * d :])
        put(base + "attention.output.dense.weight", np.asarray(tb["attn"]["out"]["kernel"])[i].T)
        put(base + "attention.output.dense.bias", np.asarray(tb["attn"]["out"]["bias"])[i])
        put(base + "attention.output.LayerNorm.weight", np.asarray(tb["attn_ln"]["scale"])[i])
        put(base + "attention.output.LayerNorm.bias", np.asarray(tb["attn_ln"]["bias"])[i])
        put(base + "intermediate.dense.weight", np.asarray(tb["mlp"]["intermediate"]["kernel"])[i].T)
        put(base + "intermediate.dense.bias", np.asarray(tb["mlp"]["intermediate"]["bias"])[i])
        put(base + "output.dense.weight", np.asarray(tb["mlp"]["output"]["kernel"])[i].T)
        put(base + "output.dense.bias", np.asarray(tb["mlp"]["output"]["bias"])[i])
        put(base + "output.LayerNorm.weight", np.asarray(tb["mlp_ln"]["scale"])[i])
        put(base + "output.LayerNorm.bias", np.asarray(tb["mlp_ln"]["bias"])[i])
    # tied output head (weight == word embedding, decoder.py:500-505)
    put("textual.output.weight", tx["embedding"]["words"])
    put("textual.output.bias", tx["output_bias"])

    if "img_temporal_embedding" in params:
        emb = np.asarray(params["img_temporal_embedding"], np.float32)
        for i in range(emb.shape[0]):
            put("img_temperal_embedding.{}".format(i), emb[i].reshape(1, 1, -1))
    return out


def infer_visual_config(sd, prefix="visual."):
    """Infer the visual-tower architecture from state-dict shapes, like
    the reference's build_model (CLIP/model.py:402-425).  Returns
    ('vit', ViTConfig) or ('resnet', ResNetConfig)."""
    if prefix + "conv1.weight" in sd and any(
        k.startswith(prefix + "transformer.") for k in sd
    ):
        conv = sd[prefix + "conv1.weight"]
        width = conv.shape[0]
        patch = conv.shape[-1]
        grid = int(round((sd[prefix + "positional_embedding"].shape[0] - 1) ** 0.5))
        block_re = re.compile(
            re.escape(prefix) + r"transformer\.resblocks\.(\d+)\."
        )
        layers = len({m.group(1) for k in sd if (m := block_re.match(k))})
        return "vit", ViTConfig(
            patch_size=int(patch),
            width=int(width),
            layers=layers,
            heads=int(width) // 64,
            input_resolution=int(patch * grid),
        )
    from ..models.resnet import ResNetConfig

    counts = tuple(
        len(
            {
                m.group(1)
                for k in sd
                if (
                    m := re.match(
                        re.escape(prefix) + r"layer{}\.(\d+)\.".format(i), k
                    )
                )
            }
        )
        for i in (1, 2, 3, 4)
    )
    width = sd[prefix + "layer1.0.conv1.weight"].shape[0]
    out_grid = int(
        round((sd[prefix + "attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
    )
    out_dim = sd[prefix + "attnpool.c_proj.weight"].shape[0]
    return "resnet", ResNetConfig(
        layers=counts,
        width=int(width),
        output_dim=int(out_dim),
        heads=int(width) * 32 // 64,
        input_resolution=out_grid * 32,
    )


def load_clip_visual(sd, prefix="visual."):
    """CLIP checkpoint -> (kind, config, gitax params) for the visual
    tower, auto-detecting ViT vs ModifiedResNet."""
    kind, cfg = infer_visual_config(sd, prefix)
    if kind == "vit":
        return kind, cfg, convert_vit_state_dict(sd, cfg, prefix=prefix)
    from ..models.resnet import convert_resnet_state_dict

    return kind, cfg, convert_resnet_state_dict(sd, cfg, prefix=prefix)


def convert_git_state_dict(sd, cfg: GitConfig):
    """Full GIT checkpoint -> {'image_encoder', 'textual',
    'img_temporal_embedding'?} pytree."""
    params = {
        "image_encoder": convert_vit_state_dict(
            sd, cfg.encoder, prefix="image_encoder."
        ),
        "textual": convert_textual_state_dict(sd, cfg),
    }
    # reference spells it 'img_temperal_embedding' (decoder.py:833)
    temporal = sorted(
        (k for k in sd if k.startswith("img_temperal_embedding.")),
        key=lambda k: int(k.rsplit(".", 1)[1]),
    )
    if temporal:
        params["img_temporal_embedding"] = np.stack(
            [_np(sd[k]).reshape(-1) for k in temporal], axis=0
        )
    return params
