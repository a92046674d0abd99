"""Smoke + shape tests for the full model zoo (reference inline tests:
resunet.py:990-1068, msdnet.py:94-100, unet3d_lite.py:112-116)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elektronn3_tpu import models


def run(model, shape, **apply_kw):
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, x, train=False)
    out = model.apply(variables, x, train=False,
                      rngs={"dropout": key}, **apply_kw)
    return out, variables


def test_resunet_3d():
    m = models.ResUNet(in_channels=1, out_channels=2, n_blocks=3,
                       start_filts=4, planar_blocks=(0,),
                       enc_res_blocks=2, dec_res_blocks=2,
                       normalization="none")
    out, _ = run(m, (1, 8, 16, 16, 1))
    assert out.shape == (1, 8, 16, 16, 2)


def test_resunet_2d_residual_grad():
    m = models.ResUNet(in_channels=1, out_channels=2, n_blocks=2,
                       start_filts=4, dim=2, enc_res_blocks=1,
                       dec_res_blocks=1, normalization="none")
    out, variables = run(m, (1, 16, 16, 1))
    assert out.shape == (1, 16, 16, 2)

    def loss(p):
        return jnp.mean(m.apply({"params": p}, jnp.ones((1, 16, 16, 1)),
                                train=False) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.all(np.isfinite(l))
               for l in jax.tree_util.tree_leaves(g))


def test_resunet_res0_is_unet():
    """enc_res_blocks == dec_res_blocks == 0 (the reference default)
    delegates to the UNet forward: identical param tree, bit-identical
    outputs with transplanted params — so the #2 model rides the same
    executor planning (incl. the fused flat levels on TPU) as UNet
    (reference resunet.py:598-935 runs the same cuDNN path as unet)."""
    kw = dict(in_channels=1, out_channels=2, n_blocks=3, start_filts=4,
              planar_blocks=(0,), normalization="batch", dim=3)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 8, 16, 16, 1)),
        jnp.float32)
    mr = models.ResUNet(**kw)
    mu = models.UNet(full_norm=True, **kw)
    vr = mr.init({"params": key}, x, train=False)
    vu = mu.init({"params": key}, x, train=False)
    assert (jax.tree_util.tree_structure(vr)
            == jax.tree_util.tree_structure(vu))
    out_r = mr.apply(vu, x, train=False)
    out_u = mu.apply(vu, x, train=False)
    assert np.array_equal(np.asarray(out_r), np.asarray(out_u))


def test_resunet_res0_fused_gating(monkeypatch):
    """The delegated ResUNet inherits UNet's fused-executor planning:
    on a (faked) TPU backend with bf16, the headline level geometries
    pass the same gates as UNet's."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    m = models.ResUNet(in_channels=1, out_channels=2, n_blocks=2,
                       start_filts=32, planar_blocks=(0,), dim=3,
                       normalization="batch", dtype=jnp.bfloat16)
    assert m._flat_fused_ok(True, 32, 88, 88)
    assert m._flat_fused64_ok(False, 64, 44, 44, 44, True)


def test_vnet():
    m = models.VNet(fac=4)
    out, _ = run(m, (1, 16, 16, 16, 1), mutable=["batch_stats"])
    assert out[0].shape == (1, 16, 16, 16, 2)


@pytest.mark.parametrize("cls", [models.fcn32s, models.fcn8s])
def test_fcn_3d(cls):
    m = cls(n_classes=2, red_fac=16)
    out, _ = run(m, (1, 32, 32, 32, 1))
    assert out.shape == (1, 32, 32, 32, 2)


@pytest.mark.parametrize("cls", [models.FCN8s, models.FCNs])
def test_fcn_2d(cls):
    m = cls(n_class=2, backbone="vgg11", in_channels=3)
    out, _ = run(m, (1, 32, 32, 3), mutable=["batch_stats"])
    assert out[0].shape == (1, 32, 32, 2)


def test_msdnet_2d_and_3d():
    for shape, vol in [((1, 16, 16, 1), False), ((1, 8, 16, 16, 1), True)]:
        m = models.MSDNet(in_channels=1, out_channels=2, num_layers=6,
                          volumetric=vol)
        out, _ = run(m, shape, mutable=["batch_stats"])
        assert out[0].shape == shape[:-1] + (2,)


def test_tiramisu():
    m = models.FCDenseNet57(n_classes=3, in_channels=1)
    out, _ = run(m, (1, 32, 32, 1), mutable=["batch_stats"])
    assert out[0].shape == (1, 32, 32, 3)


def test_unet3d_lite():
    m = models.UNet3dLite()
    out, _ = run(m, (1, 22, 140, 140, 1))
    # Reference parity: output spatial shape (10, 52, 52)
    assert out.shape == (1, 10, 52, 52, 2)


def test_simple_nets():
    out, _ = run(models.Simple3DNet(), (1, 8, 8, 8, 1))
    assert out.shape == (1, 8, 8, 8, 2)
    out, _ = run(models.Extended3DNet(), (2, 8, 16, 16, 1))
    assert out.shape == (2, 8, 16, 16, 2)
    out, _ = run(models.N3DNet(), (1, 8, 16, 16, 1))
    assert out.shape == (1, 8, 16, 16, 2)


def test_stacked_conv2scalar():
    m = models.StackedConv2Scalar(in_channels=1, n_classes=5)
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1, 1, 128, 128, 1))
    variables = m.init({"params": key, "dropout": key}, x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 5)


def test_stacked_conv2scalar_latent_add():
    m = models.StackedConv2ScalarWithLatentAdd(in_channels=1, n_classes=5,
                                               n_scalar=2)
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1, 1, 128, 128, 1))
    scal = jnp.ones((1, 2))
    variables = m.init({"params": key, "dropout": key}, x, scal,
                       train=False)
    out = m.apply(variables, x, scal, train=False)
    assert out.shape == (1, 5)


def test_model_utils():
    from elektronn3_tpu.models import model_utils as mu
    m = models.UNet(in_channels=1, out_channels=2, n_blocks=2,
                    start_filts=4, dim=2, normalization="none")
    variables = models.init_unet(m, (1, 16, 16, 1))
    n = mu.num_params(variables)
    assert n > 1000
    path = mu.find_first_conv(m, variables)
    assert path is not None
    rf = mu.visualize_receptive_field(m, variables, (1, 32, 32, 1))
    assert rf.shape == (32, 32)
    assert rf.max() > 0
    # Receptive field is localized: corners see no gradient
    assert rf[0, 0] == 0
