"""Data-parallel batched generation over a device mesh (the v5e-8
serving configuration: batch sharded over 'data', params replicated or
TP-sharded; the whole beam search runs SPMD)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gitax.decode import BeamSearchConfig
from gitax.models import GitModel, GitConfig, ViTConfig
from gitax.parallel import make_mesh, shard_params

TINY = GitConfig(
    encoder=ViTConfig(16, 64, 2, 2, 32),
    visual_feature_size=64,
    vocab_size=128,
    hidden_size=48,
    num_layers=2,
    num_heads=4,
    feedforward_size=96,
    max_caption_length=32,
)


def test_data_parallel_generate():
    model = GitModel(TINY)
    mesh = make_mesh(data=8, model=1)
    params = shard_params(model.init_params(jax.random.PRNGKey(0)), mesh)
    beam = BeamSearchConfig(num_beams=2, max_steps=8, eos_id=102)

    @jax.jit
    def serve(params, images):
        return model.generate(params, images, beam=beam)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(16, 32, 32, 3), jnp.float32)
    imgs = jax.device_put(imgs, NamedSharding(mesh, P("data", None, None, None)))
    with jax.sharding.set_mesh(mesh):
        seqs, lps = serve(params, imgs)
    assert seqs.shape == (16, 8)  # incl. [CLS]: no explicit prefix -> no strip
    assert np.isfinite(np.asarray(lps)).all()

    # sharded result must equal the single-device result
    params_local = jax.device_get(params)
    model2 = GitModel(TINY)
    seqs_ref, _ = jax.jit(
        lambda p, im: model2.generate(p, im, beam=beam)
    )(params_local, jax.device_get(imgs))
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(seqs_ref))


def test_tensor_parallel_generate():
    """TP over heads/FFN during generation (model axis 2)."""
    model = GitModel(TINY)
    mesh = make_mesh(data=4, model=2)
    params = shard_params(model.init_params(jax.random.PRNGKey(0)), mesh)
    beam = BeamSearchConfig(num_beams=2, max_steps=6, eos_id=102)

    @jax.jit
    def serve(params, images):
        return model.generate(params, images, beam=beam)

    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(8, 32, 32, 3), jnp.float32)
    imgs = jax.device_put(imgs, NamedSharding(mesh, P("data", None, None, None)))
    with jax.sharding.set_mesh(mesh):
        seqs, _ = serve(params, imgs)
    assert seqs.shape == (8, 6)
