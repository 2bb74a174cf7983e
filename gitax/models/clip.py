"""Full CLIP model: text tower + contrastive head (reference
CLIP/model.py:277-375).

GIT only uses CLIP's visual tower at runtime (model.py:63-91), but the
reference ships the full model and its checkpoint loader; gitax matches
that surface so CLIP checkpoints load whole and image/text similarity is
available.  The text tower is a causal pre-norm transformer over BPE
tokens with EOT pooling (the highest token id) and a learned projection.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .nn import layer_norm, linear, quick_gelu, self_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    ln_eps: float = 1e-5


def text_forward(params, tokens, cfg: CLIPTextConfig, dtype=jnp.float32):
    """tokens [B, T<=context] int32 -> embeddings [B, embed_dim]
    (reference encode_text, CLIP/model.py:346-359)."""
    t = tokens.shape[1]
    x = jnp.take(params["token_embedding"], tokens, axis=0).astype(dtype)
    x = x + params["positional_embedding"][:t].astype(dtype)
    causal = jnp.where(
        jnp.arange(t)[None, :] > jnp.arange(t)[:, None], -jnp.inf, 0.0
    ).astype(jnp.float32)[None, None]

    def scan_fn(carry, bp):
        h1 = layer_norm(carry, bp["ln_1"], cfg.ln_eps)
        carry = carry + self_attention(h1, bp["attn"], cfg.heads, mask=causal)
        h = layer_norm(carry, bp["ln_2"], cfg.ln_eps)
        h = linear(quick_gelu(linear(h, bp["mlp"]["c_fc"])), bp["mlp"]["c_proj"])
        return carry + h, None

    x, _ = jax.lax.scan(scan_fn, x, params["blocks"])
    x = layer_norm(x, params["ln_final"], cfg.ln_eps)
    # pool at the EOT token = highest token id per row (CLIP/model.py:357)
    eot = jnp.argmax(tokens, axis=1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return jnp.dot(pooled, params["text_projection"].astype(pooled.dtype))


def clip_similarity(image_features, text_features, logit_scale):
    """Cosine-similarity logits (reference CLIP/model.py:361-375)."""
    im = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    tx = text_features / jnp.linalg.norm(text_features, axis=-1, keepdims=True)
    scale = jnp.exp(logit_scale)
    logits_per_image = scale * im @ tx.T
    return logits_per_image, logits_per_image.T


def convert_clip_text_state_dict(sd, cfg: CLIPTextConfig):
    """torch CLIP checkpoint (text tower keys at top level) -> params."""

    def g(name):
        t = sd[name]
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, np.float32)

    n = cfg.layers
    stacks = {k: [] for k in (
        "qkv_k", "qkv_b", "out_k", "out_b", "ln1_s", "ln1_b", "ln2_s", "ln2_b",
        "fc_k", "fc_b", "pj_k", "pj_b")}
    for i in range(n):
        base = "transformer.resblocks.{}.".format(i)
        stacks["qkv_k"].append(g(base + "attn.in_proj_weight").T)
        stacks["qkv_b"].append(g(base + "attn.in_proj_bias"))
        stacks["out_k"].append(g(base + "attn.out_proj.weight").T)
        stacks["out_b"].append(g(base + "attn.out_proj.bias"))
        stacks["ln1_s"].append(g(base + "ln_1.weight"))
        stacks["ln1_b"].append(g(base + "ln_1.bias"))
        stacks["ln2_s"].append(g(base + "ln_2.weight"))
        stacks["ln2_b"].append(g(base + "ln_2.bias"))
        stacks["fc_k"].append(g(base + "mlp.c_fc.weight").T)
        stacks["fc_b"].append(g(base + "mlp.c_fc.bias"))
        stacks["pj_k"].append(g(base + "mlp.c_proj.weight").T)
        stacks["pj_b"].append(g(base + "mlp.c_proj.bias"))
    s = {k: np.stack(v) for k, v in stacks.items()}
    return {
        "token_embedding": g("token_embedding.weight"),
        "positional_embedding": g("positional_embedding"),
        "blocks": {
            "ln_1": {"scale": s["ln1_s"], "bias": s["ln1_b"]},
            "attn": {
                "qkv": {"kernel": s["qkv_k"], "bias": s["qkv_b"]},
                "out": {"kernel": s["out_k"], "bias": s["out_b"]},
            },
            "ln_2": {"scale": s["ln2_s"], "bias": s["ln2_b"]},
            "mlp": {
                "c_fc": {"kernel": s["fc_k"], "bias": s["fc_b"]},
                "c_proj": {"kernel": s["pj_k"], "bias": s["pj_b"]},
            },
        },
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
        "text_projection": g("text_projection"),
        "logit_scale": g("logit_scale"),
    }
