"""Orbax save/restore + train-state resume + lock/retry IO + loggers."""

import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_params_save_restore_roundtrip(tmp_path):
    from gitax.ckpt import restore_params, save_params

    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "nested": {"b": jnp.ones((4,), jnp.int32)},
    }
    path = save_params(str(tmp_path / "ckpt"), tree, step=3)
    assert "step_00000003" in path
    back = restore_params(str(tmp_path / "ckpt"), step=3)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(
        np.asarray(back["nested"]["b"]), np.asarray(tree["nested"]["b"])
    )


def test_train_state_resume(tmp_path):
    import optax

    from gitax.ckpt import latest_step, restore_train_state, save_train_state
    from gitax.models import GitModel, GitConfig, ViTConfig
    from gitax.training import init_train_state, make_train_step

    cfg = GitConfig(
        encoder=ViTConfig(16, 64, 2, 2, 32),
        visual_feature_size=64,
        vocab_size=128,
        hidden_size=48,
        num_layers=2,
        num_heads=4,
        feedforward_size=96,
        max_caption_length=32,
    )
    model = GitModel(cfg)
    tx = optax.adam(1e-3)
    state = init_train_state(model, jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(model, tx))
    batch = {
        "image": jnp.zeros((2, 32, 32, 3)),
        "caption_tokens": jnp.asarray([[101, 5, 102], [101, 7, 102]]),
        "need_predict": jnp.asarray([[0, 1, 1], [0, 1, 1]]),
    }
    state, _ = step(state, batch)
    state, _ = step(state, batch)
    save_train_state(str(tmp_path / "train"), state)
    assert latest_step(str(tmp_path / "train")) == 2

    template = init_train_state(model, jax.random.PRNGKey(0), tx)
    restored = restore_train_state(str(tmp_path / "train"), template)
    assert int(restored.step) == 2
    np.testing.assert_array_equal(
        np.asarray(restored.params["textual"]["output_bias"]),
        np.asarray(state.params["textual"]["output_bias"]),
    )
    # resumed state steps further without error
    state3, metrics = step(restored, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_exclusive_open_and_retry(tmp_path):
    from gitax.common import exclusive_open_to_read, limited_retry_agent

    f = tmp_path / "x.txt"
    f.write_text("content")
    with exclusive_open_to_read(str(f)) as fp:
        assert fp.read() == "content"

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return "ok"

    assert limited_retry_agent(5, flaky) == "ok"
    assert calls["n"] == 3

    with pytest.raises(IOError):
        limited_retry_agent(2, lambda: (_ for _ in ()).throw(IOError("always")))


def test_step_logger(caplog):
    from gitax.runtime.profiling import StepLogger

    sl = StepLogger(log_every=2)
    with caplog.at_level(logging.INFO):
        sl.update(1, {"loss": 2.0})
        sl.update(2, {"loss": 1.0, "grad_norm": 0.5})
    assert any("step=2" in m for m in caplog.messages)
    assert any("window_min=1.0" in m for m in caplog.messages)
