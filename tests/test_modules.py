"""Tests for L2 building blocks: axial attention + reversible blocks,
WSConv, EvoNorm, L1BatchNorm, GatherExcite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elektronn3_tpu.modules import (
    AxialAttention,
    AxialImageTransformer,
    AxialPositionalEmbedding,
    EvoNorm,
    GatherExcite,
    L1BatchNorm,
    L1GroupNorm,
    SelfAttention,
    WSConv,
    WSConvTranspose,
)


def test_self_attention_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 16)), jnp.float32)
    mod = SelfAttention(dim=16, heads=4)
    key = jax.random.PRNGKey(0)
    v = mod.init(key, x)
    out = mod.apply(v, x)
    assert out.shape == (2, 10, 16)


def test_axial_attention_2d(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 16)), jnp.float32)
    mod = AxialAttention(dim=16, num_dimensions=2, heads=4)
    key = jax.random.PRNGKey(0)
    v = mod.init(key, x)
    out = mod.apply(v, x)
    assert out.shape == x.shape


def test_axial_attention_3d(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 6, 8, 8)), jnp.float32)
    mod = AxialAttention(dim=8, num_dimensions=3, heads=2,
                         sum_axial_out=False)
    key = jax.random.PRNGKey(0)
    v = mod.init(key, x)
    out = mod.apply(v, x)
    assert out.shape == x.shape


def test_axial_positional_embedding(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 16)), jnp.float32)
    mod = AxialPositionalEmbedding(dim=16, shape=(8, 12))
    key = jax.random.PRNGKey(0)
    v = mod.init(key, x)
    out = mod.apply(v, x)
    assert out.shape == x.shape
    assert not np.allclose(np.asarray(out), np.asarray(x))


@pytest.mark.parametrize("reversible", [False, True])
def test_axial_image_transformer(reversible, rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)), jnp.float32)
    mod = AxialImageTransformer(dim=16, depth=2, heads=2,
                                reversible=reversible)
    key = jax.random.PRNGKey(0)
    v = mod.init(key, x)
    out = mod.apply(v, x)
    assert out.shape == x.shape

    def loss(p):
        return jnp.mean(mod.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    assert any(np.abs(l).sum() > 0 for l in leaves)


def test_reversible_matches_nonreversible_gradients(rng):
    """The reversible sequence's custom backward must produce the same
    gradients as plain autodiff through the same computation."""
    from elektronn3_tpu.modules.axial_attention import (
        ReversibleSequence, _rev_sequence)
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(x.shape[-1])(jnp.tanh(x))

    x = jnp.asarray(rng.normal(size=(3, 8)), jnp.float32)
    xx = jnp.concatenate([x, x], axis=-1)
    mod = ReversibleSequence(
        blocks=lambda: [(Tiny(), Tiny()), (Tiny(), Tiny())])
    key = jax.random.PRNGKey(0)
    v = mod.init(key, xx)

    def loss_rev(p):
        return jnp.mean(mod.apply({"params": p}, xx) ** 2)

    g_rev = jax.grad(loss_rev)(v["params"])

    # Plain (non-custom-vjp) recomputation of the same function:
    def loss_plain(p):
        x1, x2 = jnp.split(xx, 2, axis=-1)
        for i in range(2):
            f_params = p[f"f_layers_{i}"]
            g_params = p[f"g_layers_{i}"]
            x1 = x1 + Tiny().apply({"params": f_params}, x2)
            x2 = x2 + Tiny().apply({"params": g_params}, x1)
        return jnp.mean(jnp.concatenate([x1, x2], -1) ** 2)

    g_plain = jax.grad(loss_plain)(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_rev),
                    jax.tree_util.tree_leaves(g_plain)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_wsconv(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    mod = WSConv(features=8, kernel_size=(3, 3), padding="SAME")
    key = jax.random.PRNGKey(0)
    v = mod.init(key, x)
    out = mod.apply(v, x)
    assert out.shape == (2, 8, 8, 8)
    # Standardized kernel: check the effective kernel stats indirectly —
    # gain=1, raw kernel standardized to zero mean/unit*fan-in variance.
    from elektronn3_tpu.modules.wsconv import _standardize
    k = v["params"]["kernel"]
    gain = jnp.ones((1, 1, 1, 8))
    ks = _standardize(k, gain)
    assert np.allclose(np.asarray(ks).mean(axis=(0, 1, 2)), 0, atol=1e-5)


def test_wsconv_transpose(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    mod = WSConvTranspose(features=8, kernel_size=(2, 2), strides=(2, 2))
    key = jax.random.PRNGKey(0)
    v = mod.init(key, x)
    out = mod.apply(v, x)
    assert out.shape == (2, 16, 16, 8)


@pytest.mark.parametrize("version", ["S0", "B0"])
def test_evonorm(version, rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    mod = EvoNorm(version=version, groups=4)
    key = jax.random.PRNGKey(0)
    v = mod.init(key, x, train=True)
    if version == "B0":
        out, mut = mod.apply(v, x, train=True, mutable=["batch_stats"])
        assert "batch_stats" in mut
    else:
        out = mod.apply(v, x, train=True)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_l1_batchnorm(rng):
    x = jnp.asarray(rng.normal(3.0, 2.0, size=(4, 8, 8, 8)), jnp.float32)
    mod = L1BatchNorm()
    key = jax.random.PRNGKey(0)
    v = mod.init(key, x, train=True)
    out, mut = mod.apply(v, x, train=True, mutable=["batch_stats"])
    # Normalized output: ~zero mean, ~unit scale
    o = np.asarray(out)
    assert abs(o.mean()) < 0.1
    assert 0.5 < o.std() < 2.0
    # Eval mode uses running stats
    out_eval = mod.apply({"params": v["params"],
                          "batch_stats": mut["batch_stats"]}, x,
                         train=False)
    assert np.all(np.isfinite(np.asarray(out_eval)))


def test_l1_groupnorm(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)), jnp.float32)
    mod = L1GroupNorm(groups=4)
    key = jax.random.PRNGKey(0)
    v = mod.init(key, x)
    out = mod.apply(v, x)
    assert out.shape == x.shape


@pytest.mark.parametrize("extent,param_gather", [(0, False), (2, False),
                                                 (0, True)])
def test_gather_excite(extent, param_gather, rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    mod = GatherExcite(channels=16, extent=extent,
                       param_gather=param_gather, spatial_dim=2)
    key = jax.random.PRNGKey(0)
    v = mod.init(key, x)
    out = mod.apply(v, x)
    assert out.shape == x.shape
