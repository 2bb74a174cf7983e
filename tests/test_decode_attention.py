"""Fused decode-attention Pallas kernel (ops/decode_attention.py) vs the
XLA decode path — interpret mode (CPU).  On-chip token-equality is
exercised by the bench/verify drive (the kernel only compiles for real
TPU backends)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gitax.decode import BeamSearchConfig
from gitax.models import GitModel, GitConfig, ViTConfig
from gitax.ops.decode_attention import decode_attention, kernel_supported


def _xla_reference(q, kn, vn, kv, anc, pos, mem_k, mem_v, mem_bias, B, K, H, Dh, M, T):
    dt = q.dtype
    kvn = jnp.concatenate([kn, vn], -1).reshape(B * K, H * 2 * Dh)
    kv_upd = kv.at[pos].set(kvn)
    kvb = kv_upd.reshape(T, B, K, H, 2 * Dh)
    tk, tv = kvb[..., :Dh], kvb[..., Dh:]
    qb = q.reshape(B, K, H, Dh)
    mem_s = jnp.einsum("bkhd,bhmd->bkhm", qb, mem_k,
                       preferred_element_type=jnp.float32)
    mem_s = mem_s + mem_bias[:, None, None, :]
    anc_oh = jax.nn.one_hot(anc.reshape(B, K, T), K, dtype=jnp.float32)
    sc = jnp.einsum("bkhd,tbjhd->bkjht", qb, tk,
                    preferred_element_type=jnp.float32)
    txt_s = jnp.einsum("bkjht,bktj->bkht", sc, anc_oh)
    txt_s = txt_s + jnp.where(jnp.arange(T) <= pos, 0.0, -1e30)
    probs = jax.nn.softmax(jnp.concatenate([mem_s, txt_s], -1), -1).astype(dt)
    ctx_m = jnp.einsum("bkhm,bhmd->bkhd", probs[..., :M], mem_v,
                       preferred_element_type=dt)
    pe = jnp.einsum("bkht,bktj->bkjht", probs[..., M:], anc_oh.astype(dt))
    ctx_t = jnp.einsum("bkjht,tbjhd->bkhd", pe, tv, preferred_element_type=dt)
    return (ctx_m + ctx_t).reshape(B * K, H * Dh), kv_upd



def _make_inputs(B, K, seed, H=2, Dh=64, M=17, T=9):
    """Shared random kernel inputs: raw tensors plus the packed layouts
    decode_attention consumes (one home — the plain and int8 tests must
    stay shape-synchronized)."""
    BK = B * K
    rng = np.random.RandomState(seed)
    dt = jnp.float32
    q = jnp.asarray(rng.randn(BK, H, Dh), dt) * 0.3
    kn = jnp.asarray(rng.randn(BK, H, Dh), dt) * 0.3
    vn = jnp.asarray(rng.randn(BK, H, Dh), dt) * 0.3
    kv = jnp.asarray(rng.randn(T, BK, H * 2 * Dh), dt) * 0.3
    anc = jnp.asarray(rng.randint(0, K, (BK, T)), jnp.int32)
    mem_k = jnp.asarray(rng.randn(B, H, M, Dh), dt) * 0.3
    mem_v = jnp.asarray(rng.randn(B, H, M, Dh), dt) * 0.3
    mem_bias = jnp.asarray(rng.randn(B, M), jnp.float32)
    qz = jnp.concatenate([q, jnp.zeros_like(q)], -1).reshape(BK, H * 2 * Dh)
    kvn = jnp.concatenate([kn, vn], -1).reshape(BK, H * 2 * Dh)
    mem_kv = jnp.concatenate([mem_k, mem_v], -1)
    return dict(q=q, kn=kn, vn=vn, kv=kv, anc=anc, mem_k=mem_k, mem_v=mem_v,
                mem_bias=mem_bias, qz=qz, kvn=kvn, mem_kv=mem_kv,
                B=B, K=K, BK=BK, H=H, Dh=Dh, M=M, T=T)


@pytest.mark.parametrize("B,K", [(4, 4), (4, 2), (8, 1), (2, 8)])
def test_kernel_matches_xla_formulation(B, K):
    i = _make_inputs(B, K, seed=B * 10 + K)
    pos = 5
    BK, H, Dh = i["BK"], i["H"], i["Dh"]

    ctx128, kv_new = decode_attention(
        i["qz"], i["kvn"], i["kv"], i["anc"], pos, i["mem_kv"], i["mem_bias"],
        beams=K, num_heads=H, head_dim=Dh, interpret=True,
    )
    ctx = ctx128.reshape(BK, H, 2 * Dh)[..., Dh:].reshape(BK, H * Dh)
    ctx_ref, kv_ref = _xla_reference(
        i["q"], i["kn"], i["vn"], i["kv"], i["anc"], pos, i["mem_k"],
        i["mem_v"], i["mem_bias"], B, K, H, Dh, i["M"], i["T"]
    )
    np.testing.assert_allclose(
        np.asarray(ctx), np.asarray(ctx_ref), atol=3e-6, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(kv_new), np.asarray(kv_ref))


def test_kernel_supported_alignment():
    assert kernel_supported(32, 4)   # g=2, 32 % 2 == 0
    assert kernel_supported(8, 1)    # g=8
    assert not kernel_supported(4, 1)
    assert kernel_supported(2, 8)    # g=1
    assert not kernel_supported(3, 4)


def test_generate_with_kernel_interpret_token_equal():
    """Whole beam search with the fused kernel (interpret) emits the
    exact tokens of the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    tok_cfg = GitConfig(
        encoder=ViTConfig(16, 32, 1, 2, 32),
        visual_feature_size=32,
        vocab_size=64,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        feedforward_size=64,
        max_caption_length=32,
    )
    model = GitModel(tok_cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params["textual"]["embedding"]["words"] = (
        params["textual"]["embedding"]["words"] * 20.0
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    beam = BeamSearchConfig(num_beams=4, max_steps=10, eos_id=2)
    seqs_xla, lp_xla = model.generate(params, img, beam=beam, sos_id=1)
    with pltpu.force_tpu_interpret_mode():
        seqs_ker, lp_ker = model.generate(
            params, img, beam=beam, sos_id=1, decode_kernel=True
        )
    np.testing.assert_array_equal(np.asarray(seqs_xla), np.asarray(seqs_ker))
    np.testing.assert_allclose(
        np.asarray(lp_xla), np.asarray(lp_ker), atol=1e-5, rtol=1e-5
    )


def test_kernel_int8_memory_matches_dequantized_reference():
    """int8 memory path == the XLA formulation run on the DEQUANTIZED
    memory (the quantization is the only approximation)."""
    from gitax.ops.decode_attention import quantize_memory

    B, K = 4, 4
    i = _make_inputs(B, K, seed=7)
    pos = 5
    BK, H, Dh, M, T = i["BK"], i["H"], i["Dh"], i["M"], i["T"]
    mem_q8, mem_scale = quantize_memory(i["mem_kv"])

    ctx128, kv_new = decode_attention(
        i["qz"], i["kvn"], i["kv"], i["anc"], pos, mem_q8, i["mem_bias"],
        mem_scale,
        beams=K, num_heads=H, head_dim=Dh, interpret=True,
    )
    ctx = ctx128.reshape(BK, H, 2 * Dh)[..., Dh:].reshape(BK, H * Dh)

    # dequantized reference
    scl = jnp.concatenate(
        [jnp.repeat(mem_scale[..., :1], Dh, -1),
         jnp.repeat(mem_scale[..., 1:], Dh, -1)], -1
    )  # [B, H, 2Dh]
    deq = mem_q8.astype(jnp.float32) * scl[:, :, None, :]
    ctx_ref, kv_ref = _xla_reference(
        i["q"], i["kn"], i["vn"], i["kv"], i["anc"], pos,
        deq[..., :Dh], deq[..., Dh:], i["mem_bias"], B, K, H, Dh, M, T,
    )
    np.testing.assert_allclose(
        np.asarray(ctx), np.asarray(ctx_ref), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(kv_new), np.asarray(kv_ref))
    # and the quantization error itself is small
    np.testing.assert_allclose(
        np.asarray(deq), np.asarray(i["mem_kv"]),
        atol=2 * float(mem_scale.max()),
    )


def test_generate_int8_kernel_close_to_xla():
    """generate(decode_kernel='int8') emits finite scores and (at these
    scales) the same tokens as the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    cfg = GitConfig(
        encoder=ViTConfig(16, 32, 1, 2, 32),
        visual_feature_size=32,
        vocab_size=64,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        feedforward_size=64,
        max_caption_length=32,
    )
    model = GitModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params["textual"]["embedding"]["words"] = (
        params["textual"]["embedding"]["words"] * 20.0
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    beam = BeamSearchConfig(num_beams=4, max_steps=10, eos_id=2)
    seqs_xla, lp_xla = model.generate(params, img, beam=beam, sos_id=1)
    with pltpu.force_tpu_interpret_mode():
        seqs_ker, lp_ker = model.generate(
            params, img, beam=beam, sos_id=1, decode_kernel="int8"
        )
    np.testing.assert_array_equal(np.asarray(seqs_xla), np.asarray(seqs_ker))
    np.testing.assert_allclose(
        np.asarray(lp_xla), np.asarray(lp_ker), atol=5e-3, rtol=5e-3
    )


def test_kernel_pays_policy():
    """Measured auto-enable policy: bf16 memory only below the M
    crossover (the kernel wins at M=264, loses at M=1208/1542 on v5e);
    int8 memory always (the kernel is its only consumer)."""
    from gitax.ops.decode_attention import KERNEL_AUTO_MAX_MEM, kernel_pays

    assert kernel_pays(264, mem_int8=False)   # GIT_LARGE captioning
    assert kernel_pays(KERNEL_AUTO_MAX_MEM, mem_int8=False)
    assert not kernel_pays(1208, mem_int8=False)  # high-res VQA
    assert not kernel_pays(1544, mem_int8=False)  # video
    assert kernel_pays(1544, mem_int8=True)


def test_large_memory_bf16_falls_back_to_xla():
    """Video/high-res-scale bf16 memories are past the kernel's measured
    auto-enable crossover; the decode step must fall back to the XLA
    path (no pallas_call — this test runs WITHOUT interpret mode, so
    reaching the kernel would fail on CPU)."""
    from gitax.ops.decode_attention import kernel_fits

    # the streamed memory keeps the VMEM footprint O(M): every GIT
    # shape fits, including video
    assert kernel_fits(8, 4, 12, 64, 1544, 64)
    assert kernel_fits(32, 4, 12, 64, 264, 24)

    # real decoder head geometry (12 heads x 64) and a video-scale
    # memory: 156/4 = 39x39 grid + cls = 1522 tokens
    cfg = GitConfig(
        encoder=ViTConfig(4, 32, 1, 2, 156),
        visual_feature_size=32,
        vocab_size=64,
        hidden_size=768,
        num_layers=1,
        num_heads=12,
        feedforward_size=128,
        max_caption_length=16,
    )
    model = GitModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 156, 156, 3), jnp.float32)
    beam = BeamSearchConfig(num_beams=4, max_steps=4, eos_id=2)
    seqs_xla, _ = model.generate(params, img, beam=beam, sos_id=1)
    seqs_ker, _ = model.generate(
        params, img, beam=beam, sos_id=1, decode_kernel=True
    )
    np.testing.assert_array_equal(np.asarray(seqs_xla), np.asarray(seqs_ker))


def test_large_memory_int8_uses_kernel():
    """decode_kernel='int8' engages the kernel even past the bf16
    crossover (the quantized layout has no XLA consumer) — token-equal
    with the XLA bf16 path at these scales, and the 1522-token memory
    exercises the M-axis 8-padding (1522 -> 1528)."""
    from jax.experimental.pallas import tpu as pltpu

    cfg = GitConfig(
        encoder=ViTConfig(4, 32, 1, 2, 156),
        visual_feature_size=32,
        vocab_size=64,
        hidden_size=768,
        num_layers=1,
        num_heads=12,
        feedforward_size=128,
        max_caption_length=16,
    )
    model = GitModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params["textual"]["embedding"]["words"] = (
        params["textual"]["embedding"]["words"] * 20.0
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 156, 156, 3), jnp.float32)
    beam = BeamSearchConfig(num_beams=4, max_steps=4, eos_id=2)
    seqs_xla, _ = model.generate(params, img, beam=beam, sos_id=1)
    with pltpu.force_tpu_interpret_mode():
        seqs_ker, _ = model.generate(
            params, img, beam=beam, sos_id=1, decode_kernel="int8"
        )
    np.testing.assert_array_equal(np.asarray(seqs_xla), np.asarray(seqs_ker))


def test_unaligned_batch_falls_back_to_xla():
    """Batches the 8-aligned row DMA cannot split fall back to the XLA
    path (no pallas_call — this test runs WITHOUT interpret mode, so
    reaching either kernel would fail on CPU)."""
    cfg = GitConfig(
        encoder=ViTConfig(16, 32, 1, 2, 32),
        visual_feature_size=32,
        vocab_size=64,
        hidden_size=32,
        num_layers=1,
        num_heads=2,
        feedforward_size=64,
        max_caption_length=16,
    )
    model = GitModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(3, 32, 32, 3), jnp.float32)  # b=3, g=2
    beam = BeamSearchConfig(num_beams=4, max_steps=4, eos_id=2)
    seqs_xla, _ = model.generate(params, img, beam=beam, sos_id=1)
    seqs_ker, _ = model.generate(
        params, img, beam=beam, sos_id=1, decode_kernel=True
    )
    np.testing.assert_array_equal(np.asarray(seqs_xla), np.asarray(seqs_ker))
