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



pytestmark = pytest.mark.slow  # multi-minute on the 1-core CI host

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


# ---------------------------------------------------------------------------
# Fused executor (ops/flat_fused.py): prologue + stats + kernels
# ---------------------------------------------------------------------------

def _lane(v, n):
    return jnp.stack([jnp.tile(v[i * 32:(i + 1) * 32], 4) for i in range(n)])


def test_fused_conv_pool_upconv_match_references(rng):
    import flax.linen as nn
    from elektronn3_tpu.ops import flat_fused as ff

    B, D, H, W = 1, 2, 6, 16
    cin, cout = 64, 32
    nin = cin // 32
    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(cin,)) * 0.5 + 1.0, jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(cin,)) * 0.2, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H, W, cout)), jnp.float32)
    cs = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

    def loss_ref(x5, inv_c, shift_c, w, b):
        a = jnp.maximum(x5 * inv_c + shift_c, 0.0)
        y = jax.lax.conv_general_dilated(
            a, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        s = jnp.sum(y, axis=(0, 1, 2, 3))
        q = jnp.sum(y * y, axis=(0, 1, 2, 3))
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s * cs) + jnp.sum(q * cq)

    def loss_fused(x5, inv_c, shift_c, w, b):
        xs = fc.to_flat(x5)
        ys, (s, q) = ff.conv_bnact_flat(
            xs, _lane(inv_c, nin), _lane(shift_c, nin), w, b, H, W,
            (0,) * nin, True, "relu")
        y = fc.from_flat(ys, H, W, padded=True)
        s_c, q_c = ff.fold_lane_stats(s), ff.fold_lane_stats(q)
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s_c * cs) + jnp.sum(q_c * cq)

    l1 = loss_ref(x5, inv_c, shift_c, w, b)
    l2 = loss_fused(x5, inv_c, shift_c, w, b)
    assert abs(float(l1 - l2)) < 1e-2 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2, 3, 4))(x5, inv_c, shift_c, w, b)
    g2 = jax.grad(loss_fused, (0, 1, 2, 3, 4))(x5, inv_c, shift_c, w, b)
    for a, r in zip(g2, g1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r), atol=1e-4 * scale)

    # pool (C=32, includes the strided dense-row compose)
    from elektronn3_tpu.ops.flat_fused import pool_bnact_flat
    x32 = x5[..., :32]

    def loss_pool_ref(x32):
        a = jnp.maximum(x32 * inv_c[:32] + shift_c[:32], 0.0)
        p = jax.lax.reduce_window(a, -jnp.inf, jax.lax.max,
                                  (1, 1, 2, 2, 1), (1, 1, 2, 2, 1), "VALID")
        return jnp.sum(p * tgt[:, :, :H // 2, :W // 2, :32])

    def loss_pool_fused(x32):
        p = pool_bnact_flat(fc.to_flat(x32), _lane(inv_c[:32], 1),
                            _lane(shift_c[:32], 1), H, W, (0,), "relu")
        return jnp.sum(p * tgt[:, :, :H // 2, :W // 2, :32])

    assert abs(float(loss_pool_ref(x32) - loss_pool_fused(x32))) < 1e-3
    gp1 = jax.grad(loss_pool_ref)(x32)
    gp2 = jax.grad(loss_pool_fused)(x32)
    assert np.allclose(np.asarray(gp1), np.asarray(gp2), atol=1e-5)

    # upconv (cin=64 -> 32, flax ConvTranspose semantics)
    from elektronn3_tpu.ops.flat_fused import upconv_bn_flat
    dec = jnp.asarray(rng.normal(size=(B, D, H // 2, W // 2, 64)),
                      jnp.float32)
    wt = jnp.asarray(rng.normal(size=(1, 2, 2, 64, 32)) * 0.2, jnp.float32)
    ct = nn.ConvTranspose(32, (1, 2, 2), strides=(1, 2, 2))

    def loss_up_ref(dec, wt, b):
        y = ct.apply({"params": {"kernel": wt, "bias": b}}, dec)
        s = jnp.sum(y, axis=(0, 1, 2, 3))
        return jnp.sum((y - tgt[..., :32]) ** 2) + jnp.sum(s * cs)

    def loss_up_fused(dec, wt, b):
        (yc,), (s, q) = upconv_bn_flat(dec, wt, b, H, W, True)
        y = fc.from_flat((yc,), H, W, padded=True)
        return jnp.sum((y - tgt[..., :32]) ** 2) \
            + jnp.sum(ff.fold_lane_stats(s) * cs)

    b32 = b[:32]
    assert abs(float(loss_up_ref(dec, wt, b32)
                     - loss_up_fused(dec, wt, b32))) < 1e-2
    gu1 = jax.grad(loss_up_ref, (0, 1, 2))(dec, wt, b32)
    gu2 = jax.grad(loss_up_fused, (0, 1, 2))(dec, wt, b32)
    for a, r in zip(gu2, gu1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r), atol=1e-4 * scale)


def test_fused_unet_matches_standard_unet(rng):
    """Full model on the FUSED executor (pallas_flat=True with aligned
    W) vs the standard XLA path: outputs, running stats, eval outputs
    and every parameter gradient."""
    from elektronn3_tpu.models.unet import UNet, init_unet

    shape = (1, 4, 8, 16, 1)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    kw = dict(in_channels=1, out_channels=2, n_blocks=2, start_filts=32,
              planar_blocks=(0,), dim=3, normalization="batch")
    m_ref = UNet(pallas_flat=False, **kw)
    m_fused = UNet(pallas_flat=True, **kw)
    v = init_unet(m_ref, shape)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(init_unet(m_fused, shape))

    def items(tree):
        return sorted(((jax.tree_util.keystr(k), a) for k, a in
                       jax.tree_util.tree_leaves_with_path(tree)),
                      key=lambda t: t[0])

    o_ref, mut_ref = m_ref.apply(v, x, train=True, mutable=["batch_stats"])
    o_f, mut_f = m_fused.apply(v, x, train=True, mutable=["batch_stats"])
    assert np.allclose(np.asarray(o_ref), np.asarray(o_f), atol=1e-4)
    for (k1, a), (k2, r) in zip(items(mut_f["batch_stats"]),
                                items(mut_ref["batch_stats"])):
        assert np.allclose(np.asarray(a), np.asarray(r), atol=1e-5), k1
    assert np.allclose(np.asarray(m_ref.apply(v, x, train=False)),
                       np.asarray(m_fused.apply(v, x, train=False)),
                       atol=1e-4)

    def loss(params, model):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g_r = jax.grad(loss)(v["params"], m_ref)
    g_f = jax.grad(loss)(v["params"], m_fused)
    for (k1, a), (k2, r) in zip(items(g_f), items(g_r)):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-4 * scale), k1


def test_conv1_bnstats_flat_matches_xla(rng):
    """Fused first-layer conv (raw input -> flat chunk + stats):
    forward, stats, and ALL grads (dx, dw, db, stats cotangents) match
    the XLA conv formulation."""
    from elektronn3_tpu.ops import flat_fused as ff

    B, D, H, W = 1, 3, 6, 20
    cout = 32
    x = jnp.asarray(rng.normal(size=(B, D, H, W, 1)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, 1, cout)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H, W, cout)), jnp.float32)
    cs = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

    def loss_ref(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
        s = jnp.sum(y, axis=(0, 1, 2, 3))
        q = jnp.sum(y * y, axis=(0, 1, 2, 3))
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s * cs) + jnp.sum(q * cq)

    def loss_fused(x, w, b):
        (chunk,), (s, q) = ff.conv1_bnstats_flat(x, w, b, H, W)
        y = fc.from_flat((chunk,), H, W, padded=True).astype(jnp.float32)
        s_c, q_c = ff.fold_lane_stats(s), ff.fold_lane_stats(q)
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s_c * cs) + jnp.sum(q_c * cq)

    l1, l2 = loss_ref(x, w, b), loss_fused(x, w, b)
    assert abs(float(l1 - l2)) < 2e-2 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_fused, (0, 1, 2))(x, w, b)
    for a, r in zip(g2, g1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=2e-2 * scale), (a.shape)


def test_conv1_input_grad_switch(rng):
    """input_grad=False (the default: network inputs carry no grad,
    matching torch's input.requires_grad=False) must leave every
    parameter gradient bitwise unchanged and return a zero input
    cotangent; True computes the real dx (saliency/adversarial)."""
    import jax
    from elektronn3_tpu.models.unet import UNet, init_unet

    shape = (1, 4, 8, 8, 1)
    kw = dict(in_channels=1, out_channels=2, n_blocks=2, start_filts=32,
              planar_blocks=(0,), dim=3, normalization="batch",
              dtype=jnp.bfloat16, pallas_flat=True)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    grads = {}
    for ig in (False, True):
        m = UNet(input_grad=ig, **kw)
        v = init_unet(m, shape)

        def loss(params, xx):
            out, _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                xx, train=True, mutable=["batch_stats"])
            return jnp.mean(out.astype(jnp.float32) ** 2)

        grads[ig] = jax.jit(jax.grad(loss, argnums=(0, 1)))(
            v["params"], x)
    for a, b in zip(jax.tree_util.tree_leaves(grads[False][0]),
                    jax.tree_util.tree_leaves(grads[True][0])):
        assert float(jnp.max(jnp.abs(a - b))) == 0.0
    assert float(jnp.max(jnp.abs(grads[False][1]))) == 0.0
    assert float(jnp.max(jnp.abs(grads[True][1]))) > 0.0


def test_fused_per_sample_stats_match_references(rng):
    """want_stats='per_sample' / per-sample (n, B, 128) prologues
    (group/instance norm, round 4): conv, pool, upconv and conv1
    match pure-JAX references for values AND gradients, including the
    per-sample stats side outputs and their cotangents (b-indexed
    stat blocks reset at each sample's first grid step)."""
    import flax.linen as nn
    from elektronn3_tpu.ops import flat_fused as ff

    B, D, H, W = 2, 3, 6, 16
    cin, cout = 64, 32
    nin = cin // 32

    def lane_ps(v, n):  # (B, C) -> (n, B, 128)
        return jnp.stack(
            [jnp.tile(v[:, i * 32:(i + 1) * 32], (1, 4))
             for i in range(n)])

    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(B, cin)) * 0.5 + 1.0,
                        jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(B, cin)) * 0.2, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H, W, cout)), jnp.float32)
    cs = jnp.asarray(rng.normal(size=(B, cout)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(B, cout)) * 0.1, jnp.float32)

    def bc(p):
        return p[:, None, None, None, :]

    def loss_ref(x5, inv_c, shift_c, w, b):
        a = jnp.maximum(x5 * bc(inv_c) + bc(shift_c), 0.0)
        y = jax.lax.conv_general_dilated(
            a, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        s = jnp.sum(y, axis=(1, 2, 3))
        q = jnp.sum(y * y, axis=(1, 2, 3))
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s * cs) + jnp.sum(q * cq)

    def loss_fused(x5, inv_c, shift_c, w, b):
        xs = fc.to_flat(x5)
        ys, (s, q) = ff.conv_bnact_flat(
            xs, lane_ps(inv_c, nin), lane_ps(shift_c, nin), w, b, H, W,
            (0,) * nin, True, "relu")
        y = fc.from_flat(ys, H, W, padded=True)
        s_c, q_c = ff.fold_lane_stats(s), ff.fold_lane_stats(q)
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s_c * cs) + jnp.sum(q_c * cq)

    l1 = loss_ref(x5, inv_c, shift_c, w, b)
    l2 = loss_fused(x5, inv_c, shift_c, w, b)
    assert abs(float(l1 - l2)) < 1e-2 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2, 3, 4))(x5, inv_c, shift_c, w, b)
    g2 = jax.grad(loss_fused, (0, 1, 2, 3, 4))(x5, inv_c, shift_c, w, b)
    for a, r in zip(g2, g1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-4 * scale)

    # pool with per-sample prologue (dinv/dshift b-indexed outputs)
    x32 = x5[..., :32]
    inv32, shift32 = inv_c[:, :32], shift_c[:, :32]

    def loss_pool_ref(x32, inv32, shift32):
        a = jnp.maximum(x32 * bc(inv32) + bc(shift32), 0.0)
        p = jax.lax.reduce_window(a, -jnp.inf, jax.lax.max,
                                  (1, 1, 2, 2, 1), (1, 1, 2, 2, 1),
                                  "VALID")
        return jnp.sum(p * tgt[:, :, :H // 2, :W // 2, :32])

    def loss_pool_fused(x32, inv32, shift32):
        p = ff.pool_bnact_flat(fc.to_flat(x32), lane_ps(inv32, 1),
                               lane_ps(shift32, 1), H, W, (0,), "relu")
        return jnp.sum(p * tgt[:, :, :H // 2, :W // 2, :32])

    assert abs(float(loss_pool_ref(x32, inv32, shift32)
                     - loss_pool_fused(x32, inv32, shift32))) < 1e-3
    gp1 = jax.grad(loss_pool_ref, (0, 1, 2))(x32, inv32, shift32)
    gp2 = jax.grad(loss_pool_fused, (0, 1, 2))(x32, inv32, shift32)
    for a, r in zip(gp2, gp1):
        assert np.allclose(np.asarray(a), np.asarray(r), atol=1e-4)

    # upconv with want_stats='per_sample'
    dec = jnp.asarray(rng.normal(size=(B, D, H // 2, W // 2, 64)),
                      jnp.float32)
    wt = jnp.asarray(rng.normal(size=(1, 2, 2, 64, 32)) * 0.2,
                     jnp.float32)
    ct = nn.ConvTranspose(32, (1, 2, 2), strides=(1, 2, 2))

    def loss_up_ref(dec, wt, b):
        y = ct.apply({"params": {"kernel": wt, "bias": b}}, dec)
        s = jnp.sum(y, axis=(1, 2, 3))
        q = jnp.sum(y * y, axis=(1, 2, 3))
        return (jnp.sum((y - tgt[..., :32]) ** 2) + jnp.sum(s * cs)
                + jnp.sum(q * cq))

    def loss_up_fused(dec, wt, b):
        (yc,), (s, q) = ff.upconv_bn_flat(dec, wt, b, H, W,
                                          "per_sample")
        y = fc.from_flat((yc,), H, W, padded=True)
        s_c, q_c = ff.fold_lane_stats(s), ff.fold_lane_stats(q)
        return (jnp.sum((y - tgt[..., :32]) ** 2) + jnp.sum(s_c * cs)
                + jnp.sum(q_c * cq))

    lu1 = loss_up_ref(dec, wt, b)
    lu2 = loss_up_fused(dec, wt, b)
    assert abs(float(lu1 - lu2)) < 1e-2 * max(1.0, abs(float(lu1)))
    gu1 = jax.grad(loss_up_ref, (0, 1, 2))(dec, wt, b)
    gu2 = jax.grad(loss_up_fused, (0, 1, 2))(dec, wt, b)
    for a, r in zip(gu2, gu1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-4 * scale)

    # conv1 (single-channel first layer) with per_sample=True
    x1 = x5[..., :1]
    w1 = jnp.asarray(rng.normal(size=(1, 3, 3, 1, 32)) * 0.3,
                     jnp.float32)

    def loss_c1_ref(x1, w1, b):
        y = jax.lax.conv_general_dilated(
            x1, w1, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        s = jnp.sum(y, axis=(1, 2, 3))
        q = jnp.sum(y * y, axis=(1, 2, 3))
        return (jnp.sum((y - tgt[..., :32]) ** 2) + jnp.sum(s * cs)
                + jnp.sum(q * cq))

    def loss_c1_fused(x1, w1, b):
        (yc,), (s, q) = ff.conv1_bnstats_flat(
            x1, w1, b, H, W, jnp.float32, True, True)
        y = fc.from_flat((yc,), H, W, padded=True)
        s_c, q_c = ff.fold_lane_stats(s), ff.fold_lane_stats(q)
        return (jnp.sum((y - tgt[..., :32]) ** 2) + jnp.sum(s_c * cs)
                + jnp.sum(q_c * cq))

    lc1 = loss_c1_ref(x1, w1, b)
    lc2 = loss_c1_fused(x1, w1, b)
    assert abs(float(lc1 - lc2)) < 1e-2 * max(1.0, abs(float(lc1)))
    gc1 = jax.grad(loss_c1_ref, (0, 1, 2))(x1, w1, b)
    gc2 = jax.grad(loss_c1_fused, (0, 1, 2))(x1, w1, b)
    for a, r in zip(gc2, gc1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-4 * scale)
