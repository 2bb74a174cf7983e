"""ModifiedResNet encoder parity vs the torch reference (C14)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_compat import import_reference_modules

import jax.numpy as jnp

from gitax.models.resnet import (
    ResNetConfig,
    convert_resnet_state_dict,
    resnet_forward,
)

clip_model, _ = import_reference_modules()

CFG = ResNetConfig(layers=(1, 1, 1, 1), width=8, output_dim=32, heads=4,
                   input_resolution=32)


@pytest.fixture(scope="module")
def torch_resnet():
    torch.manual_seed(0)
    m = clip_model.ModifiedResNet(
        layers=[1, 1, 1, 1], output_dim=32, heads=4, input_resolution=32, width=8
    )
    # randomize BN stats so parity actually exercises them
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.3, 0.3)
                mod.running_var.uniform_(0.7, 1.4)
    return m.eval()


def test_resnet_grid_parity(torch_resnet):
    torch_resnet.output_grid = True
    params = convert_resnet_state_dict(torch_resnet.state_dict(), CFG)
    rng = np.random.RandomState(0)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = torch_resnet(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(
        resnet_forward(params, jnp.asarray(img), CFG, output_grid=True)
    )
    assert ours.shape == ref.shape == (2, 1, 8 * 32)  # 32/32 = 1x1 grid
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_resnet_attnpool_parity(torch_resnet):
    torch_resnet.output_grid = False
    params = convert_resnet_state_dict(torch_resnet.state_dict(), CFG)
    rng = np.random.RandomState(1)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = torch_resnet(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(
        resnet_forward(params, jnp.asarray(img), CFG, output_grid=False)
    )
    assert ours.shape == ref.shape == (2, 32)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_infer_visual_config_vit():
    torch.manual_seed(0)
    vit = clip_model.VisualTransformer(
        input_resolution=32, patch_size=16, width=64, layers=2, heads=2,
        output_dim=64, output_grid=True, grid_after_ln=True)
    sd = {"visual." + k: v for k, v in vit.state_dict().items()}
    from gitax.ckpt.torch_convert import infer_visual_config

    kind, cfg = infer_visual_config(sd)
    assert kind == "vit"
    assert (cfg.patch_size, cfg.width, cfg.layers, cfg.input_resolution) == (
        16, 64, 2, 32)


def test_infer_visual_config_resnet(torch_resnet):
    sd = {"visual." + k: v for k, v in torch_resnet.state_dict().items()}
    from gitax.ckpt.torch_convert import infer_visual_config, load_clip_visual

    kind, cfg = infer_visual_config(sd)
    assert kind == "resnet"
    assert cfg.layers == (1, 1, 1, 1) and cfg.width == 8
    kind, cfg, params = load_clip_visual(sd)
    assert "stem" in params and len(params["layers"]) == 4
