"""UNet config-sweep acceptance tests.

Port of the reference's inline test suite (elektronn3/models/unet.py:
938-1026: test_model, test_2d_config, test_planar_configs) to pytest,
plus JAX-specific checks (jit, grad, bf16, checkpointing).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elektronn3_tpu.models.unet import UNet, init_unet


def run_model(model, input_shape):
    variables = init_unet(model, input_shape)
    x = jnp.asarray(np.random.default_rng(0).normal(size=input_shape),
                    jnp.float32)
    out, _ = model.apply(variables, x, train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    return out


def test_3d_basic():
    model = UNet(in_channels=1, out_channels=2, n_blocks=3, start_filts=8,
                 dim=3)
    out = run_model(model, (1, 8, 16, 16, 1))
    assert out.shape == (1, 8, 16, 16, 2)


def test_grad_flows():
    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
                 dim=2, normalization="none")
    shape = (1, 16, 16, 1)
    variables = init_unet(model, shape)
    x = jnp.ones(shape)

    def loss_fn(params):
        out = model.apply({"params": params}, x, train=False)
        return jnp.mean(out ** 2)

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    assert any(np.abs(l).sum() > 0 for l in leaves)


@pytest.mark.parametrize("n_blocks", [1, 2, 3, 4])
def test_2d_config(n_blocks):
    """Reference test_2d_config (unet.py:993-1004)."""
    model = UNet(in_channels=1, out_channels=2, n_blocks=n_blocks,
                 start_filts=4, dim=2)
    out = run_model(model, (1, 32, 32, 1))
    assert out.shape == (1, 32, 32, 2)


def test_planar_configs_powerset():
    """Reference test_planar_configs (unet.py:1007-1026): sweep the full
    powerset of planar_blocks for n_blocks up to 3 (4 is covered
    selectively below to keep CI time bounded)."""
    for n_blocks in [1, 2, 3]:
        for r in range(n_blocks + 1):
            for pb in itertools.combinations(range(n_blocks), r):
                model = UNet(in_channels=1, out_channels=2,
                             n_blocks=n_blocks, start_filts=2,
                             planar_blocks=pb, dim=3,
                             normalization="none")
                out = run_model(model, (1, 8, 16, 16, 1))
                assert out.shape == (1, 8, 16, 16, 2), \
                    f"n_blocks={n_blocks} planar={pb}"


@pytest.mark.parametrize("pb", [(), (0,), (0, 3), (1, 2)])
def test_planar_4blocks(pb):
    model = UNet(in_channels=1, out_channels=2, n_blocks=4, start_filts=2,
                 planar_blocks=pb, dim=3, normalization="none")
    out = run_model(model, (1, 8, 16, 16, 1))
    assert out.shape == (1, 8, 16, 16, 2)


@pytest.mark.parametrize("up_mode", [
    "transpose", "resizeconv_nearest", "resizeconv_linear",
    "resizeconv_nearest1", "resizeconv_linear1"])
def test_up_modes(up_mode):
    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
                 up_mode=up_mode, dim=2, normalization="none")
    out = run_model(model, (1, 16, 16, 1))
    assert out.shape == (1, 16, 16, 2)


def test_merge_add():
    model = UNet(in_channels=1, out_channels=2, n_blocks=3, start_filts=4,
                 merge_mode="add", dim=2, normalization="none")
    out = run_model(model, (1, 16, 16, 1))
    assert out.shape == (1, 16, 16, 2)


@pytest.mark.parametrize("norm", ["batch", "instance", "group", "group4",
                                  "none"])
def test_normalizations(norm):
    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=8,
                 normalization=norm, dim=2)
    out = run_model(model, (2, 16, 16, 1))
    assert out.shape == (2, 16, 16, 2)


@pytest.mark.parametrize("act", ["relu", "silu", "leaky", "prelu", "rrelu"])
def test_activations(act):
    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
                 activation=act, dim=2, normalization="none")
    out = run_model(model, (1, 16, 16, 1))
    assert out.shape == (1, 16, 16, 2)


def test_attention():
    model = UNet(in_channels=1, out_channels=2, n_blocks=3, start_filts=4,
                 attention=True, dim=3, normalization="none")
    out = run_model(model, (1, 8, 16, 16, 1))
    assert out.shape == (1, 8, 16, 16, 2)


def test_valid_conv_mode():
    """Valid convs shrink the output; reference shape math: each conv3
    removes 2 per dim per conv, scaled through pooling levels."""
    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
                 conv_mode="valid", dim=2, normalization="none")
    out = run_model(model, (1, 48, 48, 1))
    # Encoder b0: 48-4=44, pool->22; b1: 22-4=18; up: 36, -4=32... output
    # must be smaller than input and spatially square.
    assert out.shape[0] == 1 and out.shape[-1] == 2
    assert out.shape[1] == out.shape[2]
    assert out.shape[1] < 48


def test_odd_input_shapes():
    """Ceil-mode pooling + autocrop must handle odd spatial dims
    (reference autocrop step 1)."""
    model = UNet(in_channels=1, out_channels=2, n_blocks=3, start_filts=4,
                 dim=2, normalization="none")
    out = run_model(model, (1, 27, 33, 1))
    assert out.shape == (1, 27, 33, 2)


def test_checkpointing_same_output():
    kwargs = dict(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
                  dim=2, normalization="none")
    m1 = UNet(**kwargs, checkpointing=False)
    m2 = UNet(**kwargs, checkpointing=True)
    shape = (1, 16, 16, 1)
    v = init_unet(m1, shape)
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    o1 = m1.apply(v, x, train=False)
    o2 = m2.apply(v, x, train=False)
    assert np.allclose(o1, o2, atol=1e-6)

    def loss1(p):
        return jnp.mean(m1.apply({"params": p}, x, train=False) ** 2)

    def loss2(p):
        return jnp.mean(m2.apply({"params": p}, x, train=False) ** 2)

    g1 = jax.grad(loss1)(v["params"])
    g2 = jax.grad(loss2)(v["params"])
    for l1, l2 in zip(jax.tree_util.tree_leaves(g1),
                      jax.tree_util.tree_leaves(g2)):
        assert np.allclose(l1, l2, atol=1e-5)


def test_bfloat16_compute():
    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=8,
                 dim=3, normalization="none", dtype=jnp.bfloat16)
    out = run_model(model, (1, 8, 16, 16, 1))
    # bf16 models emit bf16 logits by default (halves the logit
    # volume's HBM traffic; losses and the Predictor upcast
    # internally — see UNet.logit_dtype). Explicit f32 still wins.
    assert out.dtype == jnp.bfloat16
    assert out.shape == (1, 8, 16, 16, 2)
    m32 = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=8,
               dim=3, normalization="none", dtype=jnp.bfloat16,
               logit_dtype=jnp.float32)
    assert run_model(m32, (1, 8, 16, 16, 1)).dtype == jnp.float32


def test_invalid_configs_raise():
    with pytest.raises(ValueError):
        run_model(UNet(up_mode="bogus"), (1, 8, 8, 8, 1))
    with pytest.raises(ValueError):
        run_model(UNet(merge_mode="bogus"), (1, 8, 8, 8, 1))
    with pytest.raises(ValueError):
        run_model(UNet(dim=4), (1, 8, 8, 8, 1))
    with pytest.raises(ValueError):
        run_model(UNet(n_blocks=3, planar_blocks=(5,)), (1, 8, 8, 8, 1))
    with pytest.raises(ValueError):
        # wrong channel count / layout
        run_model(UNet(in_channels=1, dim=2, normalization="none"),
                  (1, 16, 16, 3))


def test_jit_forward():
    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
                 dim=2, normalization="none")
    shape = (1, 16, 16, 1)
    v = init_unet(model, shape)

    @jax.jit
    def fwd(params, x):
        return model.apply({"params": params}, x, train=False)

    x = jnp.ones(shape)
    out = fwd(v["params"], x)
    assert out.shape == (1, 16, 16, 2)
