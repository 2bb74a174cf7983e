"""Pallas fused-attention kernel vs the XLA reference (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gitax.models.textual import build_unified_mask
from gitax.ops.flash_attention import attention_xla, fused_attention


def rand_qkv(b, h, t, d, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(
        jnp.asarray(rng.randn(b, h, t, d), jnp.float32) for _ in range(3)
    )


@pytest.mark.parametrize("t", [257, 128, 30])
def test_full_attention_parity(t):
    q, k, v = rand_qkv(2, 3, t, 64)
    ref = attention_xla(q, k, v)
    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_git_mask_parity():
    """Kernel-generated block mask == build_unified_mask."""
    m, tt = 5, 7
    t = m + tt
    q, k, v = rand_qkv(2, 2, t, 64, seed=1)
    mask = build_unified_mask(m, tt, batch=2)
    ref = attention_xla(q, k, v, mask=mask)
    out = fused_attention(q, k, v, num_memory=m, masked=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_bf16_path():
    q, k, v = rand_qkv(1, 2, 40, 64)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = fused_attention(qb, kb, vb, interpret=True)
    ref = attention_xla(qb, kb, vb)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_qkv_entry_matches_classic(t=37):
    """flash_qkv_attention (token-major packed entry) == attention_xla
    on the same fused qkv tensor."""
    from gitax.ops.flash_attention import flash_qkv_attention

    b, h, d = 2, 3, 192
    dh = d // h
    rng = np.random.RandomState(5)
    qkv = jnp.asarray(rng.randn(b, t, 3 * d), jnp.float32) * 0.5
    y = qkv.reshape(b, t, 3, h, dh)
    q, k, v = (y[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    ref = attention_xla(q, k, v)  # [B,H,T,Dh]
    ref = ref.transpose(0, 2, 1, 3).reshape(b, t, d)
    out = flash_qkv_attention(qkv, h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_vit_forward_flash_flag_matches():
    """vit_forward(flash=True via interpret) == flash=False (the flash
    branch routes through flash_qkv_attention)."""
    from gitax.models.config import ViTConfig
    from gitax.models.vit import init_vit_params, vit_forward

    cfg = ViTConfig(16, 64, 2, 2, 32)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    ref = vit_forward(params, img, cfg, flash=False)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = vit_forward(params, img, cfg, flash=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_auto_flash_rule(monkeypatch):
    """flash=None auto-enable (round 3): ON only for S >=
    FLASH_AUTO_MIN_SEQ in non-f32 dtypes on a Pallas backend — f32
    parity mode and CPU never flip (their numerics stay the reference's
    XLA path)."""
    from gitax.ops import flash_attention as fa

    # real environment: CPU test runner -> always off
    assert not fa.auto_flash(2048, jnp.bfloat16) or fa.use_pallas()

    monkeypatch.setattr(fa, "use_pallas", lambda: True)
    assert fa.auto_flash(fa.FLASH_AUTO_MIN_SEQ, jnp.bfloat16)
    assert fa.auto_flash(1601, jnp.bfloat16)
    assert not fa.auto_flash(fa.FLASH_AUTO_MIN_SEQ - 1, jnp.bfloat16)
    assert not fa.auto_flash(257, jnp.bfloat16)
    # f32 parity mode never auto-enables, any length
    assert not fa.auto_flash(1601, jnp.float32)

    monkeypatch.setattr(fa, "use_pallas", lambda: False)
    assert not fa.auto_flash(1601, jnp.bfloat16)


def test_prefill_flash_matches_xla():
    """prefill(flash=True) == prefill(flash=False): same logits and KV
    cache (interpret-mode kernel on CPU)."""
    from gitax.models import GitConfig, GitModel, ViTConfig
    from jax.experimental.pallas import tpu as pltpu

    cfg = GitConfig(
        encoder=ViTConfig(16, 32, 1, 2, 32), visual_feature_size=32,
        vocab_size=97, hidden_size=32, num_layers=2, num_heads=2,
        feedforward_size=64, max_caption_length=64,
    )
    model = GitModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    vis = jnp.asarray(rng.randn(2, 7, 32), jnp.float32)
    prefix = jnp.asarray(rng.randint(0, 97, (2, 3)), jnp.int32)
    logits_ref, cache_ref = model.prefill(params, vis, prefix, 8)
    with pltpu.force_tpu_interpret_mode():
        from gitax.models.textual import prefill as prefill_fn

        logits_fl, cache_fl = prefill_fn(
            params["textual"], vis, prefix, cfg, 8, flash=True
        )
    np.testing.assert_allclose(
        np.asarray(logits_fl), np.asarray(logits_ref), rtol=2e-4, atol=2e-4
    )
    for a, b in ((cache_fl.mem_k, cache_ref.mem_k),
                 (cache_fl.mem_v, cache_ref.mem_v),
                 (cache_fl.txt_kv, cache_ref.txt_kv)):
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-4
            )
