"""Label-smoothed cross-entropy matching the reference
SmoothLabelCrossEntropyLoss (decoder.py:620-671) and the shift/mask
training protocol (decoder.py:939-959).

The reference computes per-element KL divergence between the smoothed
one-hot target and log-softmax logits, sums over the class dim and means
over tokens selected by `need_predict` — including the constant
``t*log(t)`` entropy term of the smoothed target (torch F.kl_div
semantics), which we reproduce for loss-value parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_label_cross_entropy(logits, targets, valid_mask, eps=0.1):
    """logits [N, V] (any float dtype; upcast to f32 like decoder.py:639),
    targets [N] int, valid_mask [N] bool.  Returns mean over valid rows of
    sum_v t_v * (log t_v - logprob_v) with t = smoothed one-hot."""
    logits = logits.astype(jnp.float32)
    n, v = logits.shape
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    on = 1.0 - eps
    off = eps / (v - 1)
    # sum_v t_v * log t_v  (constant per row)
    entropy = on * jnp.log(on) + (v - 1) * off * jnp.log(off)
    # sum_v t_v * logprob_v = off * sum_v logprob_v + (on - off) * logprob_target
    lp_target = jnp.take_along_axis(logprobs, targets[:, None], axis=1)[:, 0]
    cross = off * jnp.sum(logprobs, axis=-1) + (on - off) * lp_target
    per_row = entropy - cross
    valid = valid_mask.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(per_row * valid) / count


def caption_loss(logits, caption_tokens, need_predict, eps=0.1, padding_idx=0):
    """Teacher-forcing loss: logits[:, :-1] vs tokens[:, 1:], rows where
    shifted need_predict == 1 (decoder.py:939-959).  Targets at masked
    positions are replaced by padding_idx exactly like the reference
    (decoder.py:940-942) — they are excluded by the mask anyway."""
    feat = logits[:, :-1]
    target = caption_tokens[:, 1:]
    mask = need_predict[:, 1:] == 1
    target = jnp.where(mask, target, padding_idx)
    b, t, v = feat.shape
    return smooth_label_cross_entropy(
        feat.reshape(b * t, v), target.reshape(-1), mask.reshape(-1), eps
    )
