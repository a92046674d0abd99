"""Per-sample (group/instance-norm) stats + prologues for the fused64
ops (round 5): the C=64/128 executors' upconvs and head must match
pure-JAX references for values AND gradients when called with
want_stats='per_sample' and/or per-sample (n, B, 128) prologue lane
vectors — the wiring that lets group/instance-norm models run fused at
C=64/128 levels (reference models/unet.py:77-111 get_normalization).

The conv/pool fused64 ops gained per-sample support in round 4 (tested
via tests/test_flat_norm.py model parity); these tests pin the ops
added in round 5: upconv222/122_bn_flat64 stats, upconv222/122_f64in
prologue+stats, upconv122_from_flat64 prologue+stats, and the flat64
head's per-sample prologue.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import pytest

from elektronn3_tpu.ops import flat_conv as fc
from elektronn3_tpu.ops import flat_fused as ff
from elektronn3_tpu.ops import flat_fused64 as f64


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _lane_ps64(v):
    """(B, C) per-sample per-channel -> (C//64, B, 128) lane vectors."""
    n = v.shape[1] // 64
    return jnp.stack([jnp.tile(v[:, i * 64:(i + 1) * 64], (1, 2))
                      for i in range(n)])


def _bc(p):  # (B, C) against (B, D, H, W, C)
    return p[:, None, None, None, :]


def _grads_close(g_fused, g_ref, atol_fac=1e-4):
    for a, r in zip(g_fused, g_ref):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=atol_fac * scale), \
            (a.shape, float(np.max(np.abs(np.asarray(a - r)))))


@pytest.mark.parametrize("mode", ["222", "122"])
def test_upconv64_dense_per_sample_stats(rng, mode):
    """upconv222/122_bn_flat64 with want_stats='per_sample': b-indexed
    stat blocks + their cotangents."""
    B, D1, H1, W1, cin, cout = 2, 2, 2, 4, 128, 64
    H, W = 2 * H1, 2 * W1
    kz = 2 if mode == "222" else 1
    Dd = 2 * D1 if mode == "222" else D1
    dec = jnp.asarray(rng.normal(size=(B, D1, H1, W1, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(kz, 2, 2, cin, cout)) * 0.2,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, Dd, H, W, cout)), jnp.float32)
    cs = jnp.asarray(rng.normal(size=(B, cout)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(B, cout)) * 0.1, jnp.float32)
    ct = nn.ConvTranspose(cout, (kz, 2, 2), strides=(kz, 2, 2))
    op = (f64.upconv222_bn_flat64 if mode == "222"
          else f64.upconv122_bn_flat64)

    def loss_ref(dec, w, b):
        y = ct.apply({"params": {"kernel": w, "bias": b}}, dec)
        s = jnp.sum(y, axis=(1, 2, 3))
        q = jnp.sum(y * y, axis=(1, 2, 3))
        return (jnp.sum((y - tgt) ** 2) + jnp.sum(s * cs)
                + jnp.sum(q * cq))

    def loss_fused(dec, w, b):
        ys, (s, q) = op(dec, w, b, H, W, "per_sample")
        y = f64.from_flat64(ys, H, W, cout)
        s_c = f64.fold_lane_stats64(s)
        q_c = f64.fold_lane_stats64(q)
        return (jnp.sum((y - tgt) ** 2) + jnp.sum(s_c * cs)
                + jnp.sum(q_c * cq))

    l1, l2 = loss_ref(dec, w, b), loss_fused(dec, w, b)
    assert abs(float(l1 - l2)) < 1e-2 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2))(dec, w, b)
    g2 = jax.grad(loss_fused, (0, 1, 2))(dec, w, b)
    _grads_close(g2, g1)


@pytest.mark.parametrize("mode", ["222", "122"])
def test_upconv_f64in_per_sample(rng, mode):
    """upconv222/122_f64in with a per-sample prologue AND
    want_stats='per_sample' (the fused64 -> fused64 decoder seam of a
    group-norm start_filts=64 model)."""
    B, D1, H1, W1, cin, cout = 2, 2, 2, 4, 64, 64
    H, W = 2 * H1, 2 * W1
    kz = 2 if mode == "222" else 1
    Dd = 2 * D1 if mode == "222" else D1
    x5 = jnp.asarray(rng.normal(size=(B, D1, H1, W1, cin)), jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(B, cin)) * 0.5 + 1.0,
                        jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(B, cin)) * 0.2, jnp.float32)
    w = jnp.asarray(rng.normal(size=(kz, 2, 2, cin, cout)) * 0.2,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, Dd, H, W, cout)), jnp.float32)
    cs = jnp.asarray(rng.normal(size=(B, cout)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(B, cout)) * 0.1, jnp.float32)
    ct = nn.ConvTranspose(cout, (kz, 2, 2), strides=(kz, 2, 2))
    op = f64.upconv222_f64in if mode == "222" else f64.upconv122_f64in

    def loss_ref(x5, inv_c, shift_c, w, b):
        a = jnp.maximum(x5 * _bc(inv_c) + _bc(shift_c), 0.0)
        y = ct.apply({"params": {"kernel": w, "bias": b}}, a)
        s = jnp.sum(y, axis=(1, 2, 3))
        q = jnp.sum(y * y, axis=(1, 2, 3))
        return (jnp.sum((y - tgt) ** 2) + jnp.sum(s * cs)
                + jnp.sum(q * cq))

    def loss_fused(x5, inv_c, shift_c, w, b):
        xs = f64.to_flat64(x5)
        ys, (s, q) = op(xs, _lane_ps64(inv_c), _lane_ps64(shift_c),
                        w, b, H, W, "per_sample", "relu")
        y = f64.from_flat64(ys, H, W, cout)
        s_c = f64.fold_lane_stats64(s)
        q_c = f64.fold_lane_stats64(q)
        return (jnp.sum((y - tgt) ** 2) + jnp.sum(s_c * cs)
                + jnp.sum(q_c * cq))

    args = (x5, inv_c, shift_c, w, b)
    l1, l2 = loss_ref(*args), loss_fused(*args)
    assert abs(float(l1 - l2)) < 1e-2 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss_fused, (0, 1, 2, 3, 4))(*args)
    _grads_close(g2, g1)


def test_upconv122_from_flat64_per_sample(rng):
    """upconv122_from_flat64 (fused64 -> CC32 decoder seam) with a
    per-sample prologue and want_stats='per_sample'."""
    B, D, H1, W1 = 2, 2, 3, 8
    cin, cout = 64, 32
    H, W = 2 * H1, 2 * W1
    x5 = jnp.asarray(rng.normal(size=(B, D, H1, W1, cin)), jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(B, cin)) * 0.5 + 1.0,
                        jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(B, cin)) * 0.2, jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 2, 2, cin, cout)) * 0.2,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H, W, cout)), jnp.float32)
    cs = jnp.asarray(rng.normal(size=(B, cout)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(B, cout)) * 0.1, jnp.float32)
    ct = nn.ConvTranspose(cout, (1, 2, 2), strides=(1, 2, 2))

    def loss_ref(x5, inv_c, shift_c, w, b):
        a = jnp.maximum(x5 * _bc(inv_c) + _bc(shift_c), 0.0)
        y = ct.apply({"params": {"kernel": w, "bias": b}}, a)
        s = jnp.sum(y, axis=(1, 2, 3))
        q = jnp.sum(y * y, axis=(1, 2, 3))
        return (jnp.sum((y - tgt) ** 2) + jnp.sum(s * cs)
                + jnp.sum(q * cq))

    def loss_fused(x5, inv_c, shift_c, w, b):
        (chunk,) = f64.to_flat64(x5)
        (yc,), (s, q) = f64.upconv122_from_flat64(
            chunk, _lane_ps64(inv_c), _lane_ps64(shift_c),
            w, b, H, W, "per_sample", "relu")
        y = fc.from_flat((yc,), H, W, padded=True)
        s_c = ff.fold_lane_stats(s)
        q_c = ff.fold_lane_stats(q)
        return (jnp.sum((y - tgt) ** 2) + jnp.sum(s_c * cs)
                + jnp.sum(q_c * cq))

    args = (x5, inv_c, shift_c, w, b)
    l1, l2 = loss_ref(*args), loss_fused(*args)
    assert abs(float(l1 - l2)) < 1e-2 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss_fused, (0, 1, 2, 3, 4))(*args)
    _grads_close(g2, g1)


def test_head64_per_sample_prologue(rng):
    """head_bnact_from_flat64 with per-sample prologues (group-norm
    start_filts=64 models): values + per-sample dinv/dshift."""
    B, D, H, W = 2, 2, 4, 6
    cin, cout = 64, 3
    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(B, cin)) * 0.5 + 1.0,
                        jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(B, cin)) * 0.2, jnp.float32)
    w = jnp.asarray(rng.normal(size=(cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H, W, cout)), jnp.float32)

    def loss_ref(x5, inv_c, shift_c, w, b):
        a = jnp.maximum(x5 * _bc(inv_c) + _bc(shift_c), 0.0)
        y = jnp.einsum("bdhwc,co->bdhwo", a, w) + b
        return jnp.sum((y - tgt) ** 2)

    def loss_fused(x5, inv_c, shift_c, w, b):
        xs = f64.to_flat64(x5)
        y = f64.head_bnact_from_flat64(
            xs, _lane_ps64(inv_c), _lane_ps64(shift_c),
            w.reshape(1, 1, 1, cin, cout), b, H, W, "relu")
        return jnp.sum((y - tgt) ** 2)

    args = (x5, inv_c, shift_c, w, b)
    l1, l2 = loss_ref(*args), loss_fused(*args)
    assert abs(float(l1 - l2)) < 1e-3 * max(1.0, abs(float(l1)))
    g1 = jax.grad(loss_ref, (0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss_fused, (0, 1, 2, 3, 4))(*args)
    _grads_close(g2, g1)
