"""vup fast-path parity (round 5): conv_bnact_flat_vup +
upconv122_stats_from_flat64 vs the composed materializing path
(upconv122_from_flat64 -> conv_bnact_flat).

The vup pair recomputes the (1,2,2) upconv rows inside the merge
conv's prologue instead of materializing them across the L1->L0
executor seam (the MFU ledger's last recorded headline lever). The
forward must reproduce the composed path bitwise in f32 (identical op
order via the shared _upconv122_f64_y recompute); gradients match up
to f32 re-association only, because the stats cotangent folds in a
separate carry pass (dcarry = sum of two exact contributions) and the
dx0 chunk no longer round-trips through HBM. Reference geometry:
reference models/unet.py:328-409 (UpConv).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elektronn3_tpu.ops import flat_conv as fc
from elektronn3_tpu.ops import flat_fused as ffu
from elektronn3_tpu.ops import flat_fused64 as f64

B, D, H, W = 2, 3, 8, 8
H1, W1 = H // 2, W // 2


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def _mkargs(rng, dtype=jnp.float32, per_sample=False):
    x64 = jnp.asarray(rng.normal(size=(B, D, H1, W1, 64)), dtype)
    (carry,) = f64.to_flat64(x64)
    skip5 = jnp.asarray(rng.normal(size=(B, D, H, W, 32)), dtype)
    (skip,) = fc.to_flat(skip5)
    pshape = (lambda n: (n, B, 128)) if per_sample else \
        (lambda n: (n, 128))
    invc = jnp.asarray(rng.normal(size=pshape(1)) * 0.3 + 1.0,
                       jnp.float32)
    shiftc = jnp.asarray(rng.normal(size=pshape(1)) * 0.2, jnp.float32)
    wu = jnp.asarray(rng.normal(size=(1, 2, 2, 64, 32)) * 0.2,
                     jnp.float32)
    bu = jnp.asarray(rng.normal(size=(32,)) * 0.1, jnp.float32)
    inv = jnp.asarray(rng.normal(size=pshape(2)) * 0.3 + 1.0,
                      jnp.float32)
    shift = jnp.asarray(rng.normal(size=pshape(2)) * 0.2, jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, 64, 32)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(32,)) * 0.1, jnp.float32)
    return [carry, invc, shiftc, wu, bu, skip, inv, shift, w, b]


def _composed(carry, invc, shiftc, wu, bu, skip, inv, shift, w, b,
              want_stats, wantu, act="relu"):
    (yu,), stu = f64.upconv122_from_flat64(
        carry, invc, shiftc, wu, bu, H, W, wantu, act)
    ys, st = ffu.conv_bnact_flat((yu, skip), inv, shift, w, b, H, W,
                                 (0, 0), want_stats, act)
    return ys, st, stu


def _vup(carry, invc, shiftc, wu, bu, skip, inv, shift, w, b,
         want_stats, wantu, act="relu"):
    stu = (f64.upconv122_stats_from_flat64(
        carry, invc, shiftc, wu, bu, H, W, wantu, act)
        if wantu else None)
    ys, st = ffu.conv_bnact_flat_vup(
        carry, invc, shiftc, wu, bu, (skip,), inv, shift, w, b, H, W,
        (0, 0), want_stats, act, act)
    return ys, st, stu


def _flat(out):
    ys, st, stu = out
    parts = list(ys)
    if st is not None:
        parts += list(st)
    if stu is not None:
        parts += list(stu)
    return parts


@pytest.mark.parametrize("wantu,want_stats", [
    (True, True),          # train, batch norm
    (False, True),         # eval-mode upconv prologue (running stats)
    (False, False),        # no stats anywhere
])
def test_vup_forward_bitwise(rng, wantu, want_stats):
    args = _mkargs(rng)
    a = _flat(_composed(*args, want_stats, wantu))
    v = _flat(_vup(*args, want_stats, wantu))
    assert len(a) == len(v)
    for i, (x, y) in enumerate(zip(a, v)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=f"part {i}")


def test_vup_forward_bitwise_per_sample(rng):
    args = _mkargs(rng, per_sample=True)
    a = _flat(_composed(*args, "per_sample", "per_sample"))
    v = _flat(_vup(*args, "per_sample", "per_sample"))
    for i, (x, y) in enumerate(zip(a, v)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=f"part {i}")


def _mkloss(fn, rng, want_stats, wantu):
    probes = {}

    def loss(*args):
        ys, st, stu = fn(*args, want_stats, wantu)
        r = np.random.default_rng(7)
        tot = 0.0
        for y in ys:
            p = jnp.asarray(r.normal(size=y.shape), jnp.float32)
            tot = tot + jnp.sum(y.astype(jnp.float32) * p)
        for pair in (st, stu):
            if pair is not None:
                for v in pair:
                    p = jnp.asarray(r.normal(size=v.shape), jnp.float32)
                    tot = tot + jnp.sum(v * p)
        return tot

    return loss


@pytest.mark.parametrize("wantu,want_stats", [
    (True, True),
    (False, True),
])
def test_vup_grads_match_composed(rng, wantu, want_stats):
    args = _mkargs(rng)
    g_a = jax.grad(_mkloss(_composed, rng, want_stats, wantu),
                   argnums=tuple(range(10)))(*args)
    g_v = jax.grad(_mkloss(_vup, rng, want_stats, wantu),
                   argnums=tuple(range(10)))(*args)
    names = ["carry", "invc", "shiftc", "wu", "bu", "skip", "inv",
             "shift", "w", "b"]
    for n, a, v in zip(names, g_a, g_v):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(v), np.asarray(a),
                                   rtol=0, atol=3e-5 * scale,
                                   err_msg=n)


def test_vup_grads_match_per_sample(rng):
    args = _mkargs(rng, per_sample=True)
    g_a = jax.grad(_mkloss(_composed, rng, "per_sample", "per_sample"),
                   argnums=tuple(range(10)))(*args)
    g_v = jax.grad(_mkloss(_vup, rng, "per_sample", "per_sample"),
                   argnums=tuple(range(10)))(*args)
    for i, (a, v) in enumerate(zip(g_a, g_v)):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(v), np.asarray(a),
                                   rtol=0, atol=3e-5 * scale,
                                   err_msg=str(i))


def test_vup_pad_rows_never_read(rng):
    """Poisoned carry/skip pad rows (the round-3 advisor concern for
    merged backwards) must not change outputs or grads: the vup
    prologue slices body rows only and the scratch pads are re-zeroed
    every grid step."""
    args = _mkargs(rng)
    carry, skip = args[0], args[5]
    G1, R1, P1 = f64.flat_geometry64(H1, W1)
    G, R, P = fc.flat_geometry(H, W)
    pois_c = carry.at[:, :, 0:P1].set(1e30).at[
        :, :, P1 + R1:2 * P1 + R1].set(-1e30)
    pois_s = skip.at[:, :, 0:P].set(1e30).at[
        :, :, P + R:2 * P + R].set(-1e30)
    args_p = [pois_c] + args[1:5] + [pois_s] + args[6:]

    a = _flat(_vup(*args, True, True))
    p = _flat(_vup(*args_p, True, True))
    for x, y in zip(a, p):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    loss = _mkloss(_vup, rng, True, True)
    g_a = jax.grad(loss, argnums=(1, 2, 3, 4, 6, 7, 8, 9))(*args)
    g_p = jax.grad(loss, argnums=(1, 2, 3, 4, 6, 7, 8, 9))(*args_p)
    for a_, p_ in zip(g_a, g_p):
        assert np.all(np.isfinite(np.asarray(p_)))
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(p_))


def test_vup_bf16_close(rng):
    """bf16 smoke: forward bitwise (same rounding points), grads close
    (the vup dcarry skips the dx0 chunk's bf16 round-trip, so exact
    equality is not expected)."""
    args = _mkargs(rng, dtype=jnp.bfloat16)
    a = _flat(_composed(*args, True, True))
    v = _flat(_vup(*args, True, True))
    for i, (x, y) in enumerate(zip(a, v)):
        np.testing.assert_array_equal(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            err_msg=f"part {i}")
    g_a = jax.grad(_mkloss(_composed, rng, True, True),
                   argnums=(0, 3, 8))(*args)
    g_v = jax.grad(_mkloss(_vup, rng, True, True),
                   argnums=(0, 3, 8))(*args)
    for i, (x, y) in enumerate(zip(g_a, g_v)):
        scale = max(1.0, float(jnp.max(jnp.abs(
            jnp.asarray(x, jnp.float32)))))
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(x, np.float32),
            rtol=0, atol=3e-2 * scale, err_msg=str(i))


@pytest.mark.slow
def test_vup_unet_matches_materializing(rng, monkeypatch):
    """Full fused UNet with the vup path on vs off: identical param
    tree, matching outputs, batch stats, eval outputs and grads."""
    from elektronn3_tpu.models.unet import UNet, init_unet

    shape = (1, 4, 8, 16, 1)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    kw = dict(in_channels=1, out_channels=2, n_blocks=2,
              start_filts=32, planar_blocks=(0,), dim=3,
              normalization="batch", pallas_flat=True)
    model = UNet(**kw)

    monkeypatch.setenv("E3TPU_VUP", "0")
    v = init_unet(model, shape)
    o_ref, mut_ref = model.apply(v, x, train=True,
                                 mutable=["batch_stats"])
    e_ref = model.apply(v, x, train=False)

    monkeypatch.setenv("E3TPU_VUP", "1")
    v2 = init_unet(model, shape)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v2)
    o_v, mut_v = model.apply(v, x, train=True, mutable=["batch_stats"])
    e_v = model.apply(v, x, train=False)

    assert np.allclose(np.asarray(o_ref, np.float32),
                       np.asarray(o_v, np.float32), atol=1e-5)
    assert np.allclose(np.asarray(e_ref, np.float32),
                       np.asarray(e_v, np.float32), atol=1e-5)

    def items(tree):
        return sorted(((jax.tree_util.keystr(k), a) for k, a in
                       jax.tree_util.tree_leaves_with_path(tree)),
                      key=lambda t: t[0])

    for (k1, a), (k2, r) in zip(items(mut_v["batch_stats"]),
                                items(mut_ref["batch_stats"])):
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-5), k1

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    monkeypatch.setenv("E3TPU_VUP", "0")
    g_r = jax.grad(loss)(v["params"])
    monkeypatch.setenv("E3TPU_VUP", "1")
    g_v = jax.grad(loss)(v["params"])
    for (k1, a), (k2, r) in zip(items(g_v), items(g_r)):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-4 * scale), k1
