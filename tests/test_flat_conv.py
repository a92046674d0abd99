"""Flat-layout Pallas conv executor: numeric parity vs XLA convs.

Runs in interpret mode on CPU (ops/flat_conv.py falls back off-TPU);
shapes are tiny to keep interpretation fast. Covers the kernel (fwd +
custom VJP) and the full UNet flat path (pallas_flat=True) against the
standard XLA path on identical parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elektronn3_tpu.ops import flat_conv as fc


CASES = [
    # B, D, H, W, cin, cout, kd
    (1, 2, 8, 12, 32, 32, 1),
    (1, 2, 6, 10, 64, 32, 1),
    (1, 2, 6, 10, 32, 64, 3),
]


@pytest.mark.parametrize("B,D,H,W,cin,cout,kd", CASES)
def test_flat_conv3_forward_matches_xla(rng, B, D, H, W, cin, cout, kd):
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(kd, 3, 3, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    outs = fc.flat_conv3(fc.to_flat(x, kd=kd), w, b, kd, H, W)
    got = fc.from_flat(outs, H, W, padded=True)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("B,D,H,W,cin,cout,kd", CASES[1:])
def test_flat_conv3_grads_match_xla(rng, B, D, H, W, cin, cout, kd):
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(kd, 3, 3, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H, W, cout)), jnp.float32)

    def loss_flat(x5, w, b):
        outs = fc.flat_conv3(fc.to_flat(x5, kd=kd), w, b, kd, H, W)
        return jnp.sum((fc.from_flat(outs, H, W, padded=True) - tgt) ** 2)

    def loss_ref(x5, w, b):
        out = jax.lax.conv_general_dilated(
            x5, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        return jnp.sum((out - tgt) ** 2)

    g1 = jax.grad(loss_flat, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g1, g2):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=2e-3 * scale)


def test_seam_ops_match_references(rng):
    import flax.linen as nn
    B, D, H, W = 1, 2, 8, 12
    # conv3_into_flat (small-C_in first conv)
    x = jnp.asarray(rng.normal(size=(B, D, H, W, 1)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, 1, 32)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    got = fc.from_flat(fc.conv3_into_flat(x, w, b, H, W), H, W, padded=True)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # pool_flat
    x32 = jnp.asarray(rng.normal(size=(B, D, H, W, 32)), jnp.float32)
    ch = fc.to_flat(x32)
    ref = jax.lax.reduce_window(x32, -jnp.inf, jax.lax.max,
                                (1, 1, 2, 2, 1), (1, 1, 2, 2, 1), "VALID")
    assert np.allclose(np.asarray(fc.pool_flat(ch, H, W)),
                       np.asarray(ref), atol=0)

    # upconv2_transpose_to_flat
    dec = jnp.asarray(rng.normal(size=(B, D, H // 2, W // 2, 64)),
                      jnp.float32)
    wt = jnp.asarray(rng.normal(size=(1, 2, 2, 64, 32)) * 0.2, jnp.float32)
    got = fc.from_flat(fc.upconv2_transpose_to_flat(dec, wt, b, H, W),
                       H, W, padded=True)
    ct = nn.ConvTranspose(32, (1, 2, 2), strides=(1, 2, 2))
    ref = ct.apply({"params": {"kernel": wt, "bias": b}}, dec)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # conv1x1_from_flat
    w1 = jnp.asarray(rng.normal(size=(1, 1, 1, 32, 2)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(2,)), jnp.float32)
    got = fc.conv1x1_from_flat(ch, w1, b1, H, W)
    ref = jax.lax.conv_general_dilated(
        x32, w1, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b1
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_flat_unet_matches_standard_unet(rng):
    """Full model: pallas_flat=True vs False on identical params —
    outputs, batch stats, and gradients (param trees identical)."""
    from elektronn3_tpu.models.unet import UNet, init_unet

    shape = (1, 4, 8, 12, 1)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    kw = dict(in_channels=1, out_channels=2, n_blocks=2, start_filts=32,
              planar_blocks=(0,), dim=3, normalization="batch")
    m_ref = UNet(pallas_flat=False, **kw)
    m_flat = UNet(pallas_flat=True, **kw)
    v = init_unet(m_ref, shape)

    o_ref, mut_ref = m_ref.apply(v, x, train=True, mutable=["batch_stats"])
    o_flat, mut_flat = m_flat.apply(v, x, train=True,
                                    mutable=["batch_stats"])
    assert np.allclose(np.asarray(o_ref), np.asarray(o_flat), atol=1e-4)
    for a, r in zip(jax.tree_util.tree_leaves(mut_flat["batch_stats"]),
                    jax.tree_util.tree_leaves(mut_ref["batch_stats"])):
        assert np.allclose(np.asarray(a), np.asarray(r), atol=1e-5)

    def loss(params, model):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g_r = jax.tree_util.tree_leaves(jax.grad(loss)(v["params"], m_ref))
    g_f = jax.tree_util.tree_leaves(jax.grad(loss)(v["params"], m_flat))
    assert len(g_r) == len(g_f)
    for a, r in zip(g_f, g_r):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-3 * scale)
