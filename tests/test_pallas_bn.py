"""Pallas fused BatchNorm: numeric parity vs flax nn.BatchNorm
(interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from elektronn3_tpu.ops.pallas_bn import (
    batch_norm_inference,
    batch_norm_train,
)


@pytest.mark.parametrize("C", [32, 64])
def test_bn_train_forward_matches_flax(C, rng):
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(4, 10, 12, C)), jnp.float32)
    gamma = jnp.asarray(rng.normal(1, 0.1, size=(C,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.1, size=(C,)), jnp.float32)

    y, mean, var = batch_norm_train(x, gamma, beta, 1e-5)

    bn = nn.BatchNorm(use_running_average=False, epsilon=1e-5,
                      momentum=0.9)
    variables = bn.init(jax.random.PRNGKey(0), x)
    variables = {
        "params": {"scale": gamma, "bias": beta},
        "batch_stats": variables["batch_stats"],
    }
    y_ref, _ = bn.apply(variables, x, mutable=["batch_stats"])
    assert np.allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)
    # Stats
    xr = np.asarray(x).reshape(-1, C)
    assert np.allclose(np.asarray(mean), xr.mean(0), atol=1e-4)
    assert np.allclose(np.asarray(var), xr.var(0), atol=1e-3)


def test_bn_train_ragged_rows(rng):
    """Row count not divisible by the tile size (masking path)."""
    C = 32
    x = jnp.asarray(rng.normal(size=(3, 7, 11, C)), jnp.float32)  # R=231
    gamma = jnp.ones((C,))
    beta = jnp.zeros((C,))
    y, mean, var = batch_norm_train(x, gamma, beta, 1e-5)
    xr = np.asarray(x).reshape(-1, C)
    assert np.allclose(np.asarray(mean), xr.mean(0), atol=1e-4)
    assert np.allclose(np.asarray(var), xr.var(0), atol=1e-3)
    expect = (xr - xr.mean(0)) / np.sqrt(xr.var(0) + 1e-5)
    assert np.allclose(np.asarray(y).reshape(-1, C), expect, atol=1e-3)


def test_bn_gradients_match_flax(rng):
    C = 32
    x = jnp.asarray(rng.normal(1.0, 2.0, size=(2, 8, 8, C)), jnp.float32)
    gamma = jnp.asarray(rng.normal(1, 0.1, size=(C,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.1, size=(C,)), jnp.float32)
    g_out = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

    def ours(x, gamma, beta):
        y, _, _ = batch_norm_train(x, gamma, beta, 1e-5)
        return jnp.sum(y * g_out)

    bn = nn.BatchNorm(use_running_average=False, epsilon=1e-5)
    bs = bn.init(jax.random.PRNGKey(0), x)["batch_stats"]

    def theirs(x, gamma, beta):
        y, _ = bn.apply(
            {"params": {"scale": gamma, "bias": beta},
             "batch_stats": bs}, x, mutable=["batch_stats"])
        return jnp.sum(y * g_out)

    go = jax.grad(ours, argnums=(0, 1, 2))(x, gamma, beta)
    gt = jax.grad(theirs, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(go, gt):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-3), \
            np.abs(np.asarray(a) - np.asarray(b)).max()


def test_bn_inference(rng):
    C = 32
    x = jnp.asarray(rng.normal(size=(2, 8, 8, C)), jnp.float32)
    gamma = jnp.ones((C,))
    beta = jnp.zeros((C,))
    mean = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, size=(C,)), jnp.float32)
    y = batch_norm_inference(x, gamma, beta, mean, var, 1e-5)
    expect = (np.asarray(x) - np.asarray(mean)) / np.sqrt(
        np.asarray(var) + 1e-5)
    assert np.allclose(np.asarray(y), expect, atol=1e-4)


def test_unet_with_pallas_bn(rng):
    """UNet end-to-end with normalization='batchp'."""
    from elektronn3_tpu.models.unet import UNet, init_unet
    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=8,
                 dim=2, normalization="batchp")
    shape = (2, 16, 16, 1)
    variables = init_unet(model, shape)
    assert "batch_stats" in variables
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    out, mut = model.apply(variables, x, train=True,
                           mutable=["batch_stats"])
    assert out.shape == (2, 16, 16, 2)
    # Running stats updated
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))
    # Grad flows
    def loss(p):
        o, _ = model.apply({"params": p,
                            "batch_stats": variables["batch_stats"]},
                           x, train=True, mutable=["batch_stats"])
        return jnp.mean(o ** 2)
    g = jax.grad(loss)(variables["params"])
    assert all(np.all(np.isfinite(l))
               for l in jax.tree_util.tree_leaves(g))
