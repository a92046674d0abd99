"""CC=64 fused flat executor (ops/flat_fused64.py): numeric parity vs
XLA formulations, in interpret mode on CPU. Tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elektronn3_tpu.ops import flat_fused64 as f64



pytestmark = pytest.mark.slow  # multi-minute on the 1-core CI host

@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _conv_ref(a, w):
    return jax.lax.conv_general_dilated(
        a, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_to_from_flat64_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 4, 6, 64)), jnp.float32)
    chunks = f64.to_flat64(x)
    assert len(chunks) == 1
    back = f64.from_flat64(chunks, 4, 6, 64)
    assert np.allclose(np.asarray(back), np.asarray(x))
    x2 = jnp.asarray(rng.normal(size=(1, 3, 4, 6, 128)), jnp.float32)
    assert np.allclose(np.asarray(f64.from_flat64(f64.to_flat64(x2),
                                                  4, 6, 128)),
                       np.asarray(x2))
    # narrow-channel pad into one chunk
    x3 = jnp.asarray(rng.normal(size=(1, 3, 4, 6, 32)), jnp.float32)
    assert np.allclose(np.asarray(f64.from_flat64(f64.to_flat64(x3),
                                                  4, 6, 32)),
                       np.asarray(x3))


@pytest.mark.parametrize("cin,cout", [(64, 64), (128, 64), (32, 64)])
def test_conv3_bnact_flat64_matches_xla(rng, cin, cout):
    B, D, H, W = 1, 4, 4, 6
    nin = max(1, cin // 64)
    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(cin,)) * 0.5 + 1.0, jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(cin,)) * 0.2, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H, W, cout)), jnp.float32)
    cs = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

    def loss_ref(x5, inv_c, shift_c, w, b):
        a = jnp.maximum(x5 * inv_c + shift_c, 0.0)
        y = _conv_ref(a, w) + b
        s = jnp.sum(y, axis=(0, 1, 2, 3))
        q = jnp.sum(y * y, axis=(0, 1, 2, 3))
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s * cs) + jnp.sum(q * cq)

    cpad = nin * 64 - cin

    def loss_f64(x5, inv_c, shift_c, w, b):
        xs = f64.to_flat64(x5)
        inv_l = f64.lane_vec64(jnp.pad(inv_c, (0, cpad)))
        shift_l = f64.lane_vec64(jnp.pad(shift_c, (0, cpad)))
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cpad), (0, 0)))
        ys, (s, q) = f64.conv3_bnact_flat64(
            xs, inv_l, shift_l, wp, b, H, W, True, "relu")
        y = f64.from_flat64(ys, H, W, cout)
        s_c = f64.fold_lane_stats64(s)
        q_c = f64.fold_lane_stats64(q)
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s_c * cs) + jnp.sum(q_c * cq)

    l1 = loss_ref(x5, inv_c, shift_c, w, b)
    l2 = loss_f64(x5, inv_c, shift_c, w, b)
    assert abs(float(l1 - l2)) < 1e-2 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2, 3, 4))(x5, inv_c, shift_c, w, b)
    g2 = jax.grad(loss_f64, (0, 1, 2, 3, 4))(x5, inv_c, shift_c, w, b)
    for a, r in zip(g2, g1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-3 * scale), a.shape


def test_pool222_bnact_flat64_matches_xla(rng):
    B, D, H, W, C = 1, 4, 4, 6, 64
    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(C,)) * 0.5 + 1.0, jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(C,)) * 0.2, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D // 2, H // 2, W // 2, C)),
                      jnp.float32)

    def loss_ref(x5, inv_c, shift_c):
        a = jnp.maximum(x5 * inv_c + shift_c, 0.0)
        p = jax.lax.reduce_window(a, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 2, 1), (1, 2, 2, 2, 1),
                                  "VALID")
        return jnp.sum((p - tgt) ** 2)

    def loss_f64(x5, inv_c, shift_c):
        xs = f64.to_flat64(x5)
        p = f64.pool222_bnact_flat64(
            xs, f64.lane_vec64(inv_c), f64.lane_vec64(shift_c),
            H, W, C, "relu")
        return jnp.sum((p - tgt) ** 2)

    l1 = loss_ref(x5, inv_c, shift_c)
    l2 = loss_f64(x5, inv_c, shift_c)
    assert abs(float(l1 - l2)) < 1e-3 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2))(x5, inv_c, shift_c)
    g2 = jax.grad(loss_f64, (0, 1, 2))(x5, inv_c, shift_c)
    for a, r in zip(g2, g1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-3 * scale), a.shape


@pytest.mark.parametrize("cin,cout", [(128, 64), (256, 128)])
def test_upconv222_bn_flat64_matches_xla(rng, cin, cout):
    import flax.linen as nn

    B, D1, H1, W1 = 1, 2, 2, 3
    H, W = 2 * H1, 2 * W1
    dec = jnp.asarray(rng.normal(size=(B, D1, H1, W1, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(2, 2, 2, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, 2 * D1, H, W, cout)),
                      jnp.float32)
    cs = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

    mod = nn.ConvTranspose(cout, (2, 2, 2), strides=(2, 2, 2))

    def loss_ref(dec, w, b):
        y = mod.apply({"params": {"kernel": w, "bias": b}}, dec)
        s = jnp.sum(y, axis=(0, 1, 2, 3))
        q = jnp.sum(y * y, axis=(0, 1, 2, 3))
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s * cs) + jnp.sum(q * cq)

    def loss_f64(dec, w, b):
        chunks, (s, q) = f64.upconv222_bn_flat64(dec, w, b, H, W, True)
        y = f64.from_flat64(chunks, H, W, cout)
        s_c = f64.fold_lane_stats64(s)
        q_c = f64.fold_lane_stats64(q)
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s_c * cs) + jnp.sum(q_c * cq)

    l1, l2 = loss_ref(dec, w, b), loss_f64(dec, w, b)
    assert abs(float(l1 - l2)) < 1e-3 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2))(dec, w, b)
    g2 = jax.grad(loss_f64, (0, 1, 2))(dec, w, b)
    for a, r in zip(g2, g1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-3 * scale), a.shape


def test_fused64_unet_matches_standard_unet(rng):
    """n_blocks=3 UNet with planar L0 (fused CC=32 executor) and a
    C=64 3D L1 (fused64 executor): outputs, batch stats, and every
    parameter gradient match the standard XLA path."""
    from elektronn3_tpu.models.unet import UNet, init_unet

    shape = (1, 4, 8, 16, 1)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    kw = dict(in_channels=1, out_channels=2, n_blocks=3, start_filts=32,
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
    assert np.allclose(np.asarray(o_ref), np.asarray(o_f), atol=2e-4)
    for (k1, a), (k2, r) in zip(items(mut_f["batch_stats"]),
                                items(mut_ref["batch_stats"])):
        assert np.allclose(np.asarray(a), np.asarray(r), atol=1e-5), k1
    assert np.allclose(np.asarray(m_ref.apply(v, x, train=False)),
                       np.asarray(m_fused.apply(v, x, train=False)),
                       atol=2e-4)

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
                           atol=2e-4 * scale), k1


def test_pool_compact32_into_conv64(rng):
    """L0 pool with out_form='compact32' feeds the fused64 conv1 via
    the in-kernel lane shuffle (forms=('pool32',)): the chain matches
    XLA pool + conv, gradients included."""
    from elektronn3_tpu.ops import flat_conv as fc
    from elektronn3_tpu.ops import flat_fused as ffu

    B, D, H0, W0 = 1, 3, 8, 12           # L0 level (planar, C=32)
    H, W = H0 // 2, W0 // 2              # pooled = L1 level
    C0, C1 = 32, 64
    x5 = jnp.asarray(rng.normal(size=(B, D, H0, W0, C0)), jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(C0,)) * 0.5 + 1.0, jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(C0,)) * 0.2, jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C0, C1)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(C1,)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H, W, C1)), jnp.float32)

    def lane32(v):
        return jnp.stack([jnp.tile(v[i * 32:(i + 1) * 32], 4)
                          for i in range(v.shape[0] // 32)])

    def loss_ref(x5, inv_c, shift_c, w, b):
        a = jnp.maximum(x5 * inv_c + shift_c, 0.0)
        p = jax.lax.reduce_window(a, -jnp.inf, jax.lax.max,
                                  (1, 1, 2, 2, 1), (1, 1, 2, 2, 1),
                                  "VALID")
        y = _conv_ref(p, w) + b
        return jnp.sum((y - tgt) ** 2)

    def loss_chain(x5, inv_c, shift_c, w, b):
        xs = fc.to_flat(x5)
        compacts = ffu.pool_bnact_flat(
            xs, lane32(inv_c), lane32(shift_c), H0, W0, (0,), "relu",
            "compact32")
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 32), (0, 0)))
        id_inv = jnp.ones((1, 128), jnp.float32)
        id_shift = jnp.zeros((1, 128), jnp.float32)
        ys, _ = f64.conv3_bnact_flat64(
            tuple(compacts), id_inv, id_shift, wp, b, H, W, False,
            "linear", ("pool32",))
        y = f64.from_flat64(ys, H, W, C1)
        return jnp.sum((y - tgt) ** 2)

    l1 = loss_ref(x5, inv_c, shift_c, w, b)
    l2 = loss_chain(x5, inv_c, shift_c, w, b)
    assert abs(float(l1 - l2)) < 1e-3 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2, 3, 4))(x5, inv_c, shift_c, w, b)
    g2 = jax.grad(loss_chain, (0, 1, 2, 3, 4))(x5, inv_c, shift_c, w, b)
    for a, r in zip(g2, g1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-3 * scale), a.shape


@pytest.mark.parametrize("cin,cout", [(64, 64), (128, 64)])
def test_conv_planar_kd1_flat64_matches_xla(rng, cin, cout):
    """kd=1 (planar / 2D-model) conv through the generalized
    conv3_bnact_flat64."""
    B, D, H, W = 1, 3, 4, 6
    nin = cin // 64
    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(cin,)) * 0.5 + 1.0, jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(cin,)) * 0.2, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H, W, cout)), jnp.float32)
    cs = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

    def loss_ref(x5, inv_c, shift_c, w, b):
        a = jnp.maximum(x5 * inv_c + shift_c, 0.0)
        y = _conv_ref(a, w) + b
        s = jnp.sum(y, axis=(0, 1, 2, 3))
        q = jnp.sum(y * y, axis=(0, 1, 2, 3))
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s * cs) + jnp.sum(q * cq)

    def loss_f64(x5, inv_c, shift_c, w, b):
        xs = f64.to_flat64(x5)
        ys, (s, q) = f64.conv3_bnact_flat64(
            xs, f64.lane_vec64(inv_c), f64.lane_vec64(shift_c),
            w, b, H, W, True, "relu")
        y = f64.from_flat64(ys, H, W, cout)
        s_c = f64.fold_lane_stats64(s)
        q_c = f64.fold_lane_stats64(q)
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s_c * cs) \
            + jnp.sum(q_c * cq)

    l1 = loss_ref(x5, inv_c, shift_c, w, b)
    l2 = loss_f64(x5, inv_c, shift_c, w, b)
    assert abs(float(l1 - l2)) < 1e-2 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2, 3, 4))(x5, inv_c, shift_c, w, b)
    g2 = jax.grad(loss_f64, (0, 1, 2, 3, 4))(x5, inv_c, shift_c, w, b)
    for a, r in zip(g2, g1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-3 * scale), a.shape


def test_pool122_bnact_flat64_matches_xla(rng):
    B, D, H, W, C = 1, 3, 4, 6, 64
    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(C,)) * 0.5 + 1.0, jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(C,)) * 0.2, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H // 2, W // 2, C)),
                      jnp.float32)

    def loss_ref(x5, inv_c, shift_c):
        a = jnp.maximum(x5 * inv_c + shift_c, 0.0)
        p = jax.lax.reduce_window(a, -jnp.inf, jax.lax.max,
                                  (1, 1, 2, 2, 1), (1, 1, 2, 2, 1),
                                  "VALID")
        return jnp.sum((p - tgt) ** 2)

    def loss_f64(x5, inv_c, shift_c):
        xs = f64.to_flat64(x5)
        p = f64.pool122_bnact_flat64(
            xs, f64.lane_vec64(inv_c), f64.lane_vec64(shift_c),
            H, W, C, "relu")
        return jnp.sum((p - tgt) ** 2)

    l1 = loss_ref(x5, inv_c, shift_c)
    l2 = loss_f64(x5, inv_c, shift_c)
    assert abs(float(l1 - l2)) < 1e-3 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2))(x5, inv_c, shift_c)
    g2 = jax.grad(loss_f64, (0, 1, 2))(x5, inv_c, shift_c)
    for a, r in zip(g2, g1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-3 * scale), a.shape


def test_upconv122_bn_flat64_matches_xla(rng):
    import flax.linen as nn

    B, D, H1, W1 = 1, 2, 2, 3
    H, W = 2 * H1, 2 * W1
    dec = jnp.asarray(rng.normal(size=(B, D, H1, W1, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 2, 2, 128, 64)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H, W, 64)), jnp.float32)
    cs = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)

    mod = nn.ConvTranspose(64, (1, 2, 2), strides=(1, 2, 2))

    def loss_ref(dec, w, b):
        y = mod.apply({"params": {"kernel": w, "bias": b}}, dec)
        s = jnp.sum(y, axis=(0, 1, 2, 3))
        q = jnp.sum(y * y, axis=(0, 1, 2, 3))
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s * cs) + jnp.sum(q * cq)

    def loss_f64(dec, w, b):
        (yc,), (s, q) = f64.upconv122_bn_flat64(dec, w, b, H, W, True)
        y = f64.from_flat64((yc,), H, W, 64)
        s_c = f64.fold_lane_stats64(s)
        q_c = f64.fold_lane_stats64(q)
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s_c * cs) \
            + jnp.sum(q_c * cq)

    l1 = loss_ref(dec, w, b)
    l2 = loss_f64(dec, w, b)
    assert abs(float(l1 - l2)) < 1e-2 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2))(dec, w, b)
    g2 = jax.grad(loss_f64, (0, 1, 2))(dec, w, b)
    for a, r in zip(g2, g1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-3 * scale), a.shape


@pytest.mark.parametrize("kw,shape", [
    # planar C=64 L1 (kd=1 fused64: planar conv, pool122, upconv122)
    (dict(in_channels=1, out_channels=2, n_blocks=3, start_filts=32,
          planar_blocks=(0, 1), dim=3, normalization="batch"),
     (1, 2, 8, 16, 1)),
    # 2D model: every level planar-by-construction (D=1 lift); L0 on
    # the CC=32 executor, L1 on the kd=1 fused64 executor
    (dict(in_channels=1, out_channels=2, n_blocks=3, start_filts=32,
          dim=2, normalization="batch"),
     (2, 16, 16, 1)),
])
def test_fused_planar_and_2d_unet_match_standard(rng, kw, shape):
    """Planar C=64 levels (kd=1) and 2D models through the fused
    executors: outputs, batch stats, and every parameter gradient
    match the XLA path; param trees interop."""
    from elektronn3_tpu.models.unet import UNet, init_unet

    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
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
    assert o_ref.shape == o_f.shape
    assert np.allclose(np.asarray(o_ref), np.asarray(o_f), atol=2e-4)
    for (k1, a), (k2, r) in zip(items(mut_f["batch_stats"]),
                                items(mut_ref["batch_stats"])):
        assert np.allclose(np.asarray(a), np.asarray(r), atol=1e-5), k1
    assert np.allclose(np.asarray(m_ref.apply(v, x, train=False)),
                       np.asarray(m_fused.apply(v, x, train=False)),
                       atol=2e-4)

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
                           atol=2e-4 * scale), k1


@pytest.mark.parametrize("cin,cout", [(64, 64), (128, 64)])
def test_conv_d_halo_tiling_matches_dense(rng, cin, cout):
    """H-tiled 2D mode (d_halo=True): an (8, W) image processed as two
    4-row H-slabs with halo strips matches the whole-image dense conv,
    gradients and stats included."""
    B, Hf, W = 1, 8, 6
    Ht, nt = 4, 2
    x4 = jnp.asarray(rng.normal(size=(B, Hf, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(cin,)) * 0.5 + 1.0, jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(cin,)) * 0.2, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, Hf, W, cout)), jnp.float32)
    cs = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

    def loss_ref(x4, inv_c, shift_c, w, b):
        a = jnp.maximum(x4[:, None] * inv_c + shift_c, 0.0)
        y = _conv_ref(a, w)[:, 0] + b
        s = jnp.sum(y, axis=(0, 1, 2))
        q = jnp.sum(y * y, axis=(0, 1, 2))
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s * cs) + jnp.sum(q * cq)

    def loss_tiled(x4, inv_c, shift_c, w, b):
        x5 = x4.reshape(B, nt, Ht, W, cin)
        xs = f64.to_flat64(x5)
        ys, (s, q) = f64.conv3_bnact_flat64(
            xs, f64.lane_vec64(inv_c), f64.lane_vec64(shift_c),
            w, b, Ht, W, True, "relu", None, True)
        y = f64.from_flat64(ys, Ht, W, cout).reshape(B, Hf, W, cout)
        s_c = f64.fold_lane_stats64(s)
        q_c = f64.fold_lane_stats64(q)
        return jnp.sum((y - tgt) ** 2) + jnp.sum(s_c * cs) \
            + jnp.sum(q_c * cq)

    l1 = loss_ref(x4, inv_c, shift_c, w, b)
    l2 = loss_tiled(x4, inv_c, shift_c, w, b)
    assert abs(float(l1 - l2)) < 1e-2 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2, 3, 4))(x4, inv_c, shift_c, w, b)
    g2 = jax.grad(loss_tiled, (0, 1, 2, 3, 4))(x4, inv_c, shift_c, w, b)
    for a, r in zip(g2, g1):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-3 * scale), a.shape


def test_fused_2d_tiled_halo_unet_matches_standard(rng):
    """2D model with forced H-tiling (tile2d=8 on a 16-row image):
    the d_halo fused path (CC32 L0 + fused64 L1, halo strips at slab
    boundaries) matches the XLA path exactly."""
    from elektronn3_tpu.models.unet import UNet, init_unet

    shape = (2, 16, 16, 1)
    kw = dict(in_channels=1, out_channels=2, n_blocks=3, start_filts=32,
              dim=2, normalization="batch")
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    m_ref = UNet(pallas_flat=False, **kw)
    m_fused = UNet(pallas_flat=True, tile2d=8, **kw)
    v = init_unet(m_ref, shape)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(init_unet(m_fused, shape))

    def items(tree):
        return sorted(((jax.tree_util.keystr(k), a) for k, a in
                       jax.tree_util.tree_leaves_with_path(tree)),
                      key=lambda t: t[0])

    o_ref, mut_ref = m_ref.apply(v, x, train=True, mutable=["batch_stats"])
    o_f, mut_f = m_fused.apply(v, x, train=True, mutable=["batch_stats"])
    assert o_ref.shape == o_f.shape
    assert np.allclose(np.asarray(o_ref), np.asarray(o_f), atol=2e-4)
    for (k1, a), (k2, r) in zip(items(mut_f["batch_stats"]),
                                items(mut_ref["batch_stats"])):
        assert np.allclose(np.asarray(a), np.asarray(r), atol=1e-5), k1

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
                           atol=2e-4 * scale), k1


def test_fused128_unet_matches_standard(rng):
    """C=128 fused64 level (2 chunks, start_filts=64): encoder L1 at
    C=128 (kd=3) plus the planar C=64 L0 and its decoder — outputs,
    batch stats, and every parameter gradient match the XLA path."""
    from elektronn3_tpu.models.unet import UNet, init_unet

    shape = (1, 4, 4, 8, 1)
    kw = dict(in_channels=1, out_channels=2, n_blocks=2, start_filts=64,
              planar_blocks=(0,), dim=3, normalization="batch")
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
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
    assert o_ref.shape == o_f.shape
    assert np.allclose(np.asarray(o_ref), np.asarray(o_f), atol=2e-4)
    for (k1, a), (k2, r) in zip(items(mut_f["batch_stats"]),
                                items(mut_ref["batch_stats"])):
        assert np.allclose(np.asarray(a), np.asarray(r), atol=1e-5), k1

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
                           atol=2e-4 * scale), k1


@pytest.mark.parametrize("planar,shape", [
    ((0,), (1, 4, 8, 8, 1)),    # planar L0: up_1 = upconv122_f64in
    ((), (1, 8, 8, 8, 1)),      # 3D L0: up_1 = upconv222_f64in
    ((), (1, 16, 16, 1)),       # 2D model: (2,2,...) param shapes
])
def test_c128_decoder_chain_matches_standard(rng, planar, shape):
    """Fully fused C=128 decoder chain (start_filts=64, n_blocks=3):
    up_0 runs the generalized 256 -> 128 dense upconv (nk = no = 2,
    upconv222_bn_flat64) + the 4-chunk merge conv, and up_1 consumes
    up_0's FlatActs64 carry directly (upconv222_f64in /
    upconv122_f64in) — no materialize seam. Outputs and every
    parameter gradient match the XLA path."""
    from elektronn3_tpu.models.unet import UNet, init_unet

    kw = dict(in_channels=1, out_channels=2, n_blocks=3, start_filts=64,
              planar_blocks=planar, dim=len(shape) - 2,
              normalization="batch")
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    m_ref = UNet(pallas_flat=False, **kw)
    m_fused = UNet(pallas_flat=True, **kw)
    v = init_unet(m_ref, shape)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(init_unet(m_fused, shape))
    # the fused chain must actually engage: up_1's upconv consumes the
    # FlatActs64 carry (its jaxpr contains the f64in custom_vjp)
    jpr = str(jax.make_jaxpr(
        lambda p: m_fused.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"]))(v["params"]))
    assert "_f64in" in jpr

    def items(tree):
        return sorted(((jax.tree_util.keystr(k), a) for k, a in
                       jax.tree_util.tree_leaves_with_path(tree)),
                      key=lambda t: t[0])

    o_ref, mut_ref = m_ref.apply(v, x, train=True, mutable=["batch_stats"])
    o_f, mut_f = m_fused.apply(v, x, train=True, mutable=["batch_stats"])
    assert o_ref.shape == o_f.shape
    assert np.allclose(np.asarray(o_ref), np.asarray(o_f), atol=2e-4)
    for (k1, a), (k2, r) in zip(items(mut_f["batch_stats"]),
                                items(mut_ref["batch_stats"])):
        assert np.allclose(np.asarray(a), np.asarray(r), atol=1e-5), k1

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
                           atol=2e-4 * scale), k1
