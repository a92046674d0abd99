"""Extreme-pad-row gradient guards for the merged CONV backwards.

The fused conv backwards (ops/flat_fused.py `_conv_bnact_bwd`,
ops/flat_fused64.py `_conv64_bwd`) reduce dinv/dshift and the wgrad
accumulators over ALL chunk rows — pad/halo rows included — relying on
the output cotangent being zero there. tests/test_flat_head.py guards
this invariant for the HEAD kernels; these tests guard it for the conv
kernels themselves (round-3/4 advisor item).

Construction: seed the P pad rows of every input chunk with
extreme-but-finite values (+-1e30) and take the loss over INTERIOR
output rows only (h in [1, H-2]). Interior outputs never read an
h-boundary tap, so a pure-JAX zero-padded reference has EXACTLY zero
pad-row influence — the losses must agree and every parameter gradient
(inv, shift, w, b) must match autodiff of the reference. A backward
that starts consuming pad-row garbage (e.g. an unmasked dy_tot scratch
row, a wgrad A^T@dY over a stale pad slot) shows up at 1e30 scale, not
inside tolerance. Boundary output rows (h=0, H-1) legitimately consume
pad rows (that is how d_halo H-tiling feeds real neighbor data through
the same kernel), so they are excluded from the loss on both arms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elektronn3_tpu.ops import flat_conv as fc
from elektronn3_tpu.ops import flat_fused as ff
from elektronn3_tpu.ops import flat_fused64 as f64


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _lane32(v):
    return jnp.stack([jnp.tile(v[i * 32:(i + 1) * 32], 4)
                      for i in range(v.shape[0] // 32)])


def _seed_pad_rows(chunks, P, R):
    """+-1e30 into the leading/trailing P pad rows of each chunk."""
    out = []
    for k, c in enumerate(chunks):
        sign = (-1.0) ** k
        c = c.at[:, :, :P].set(1e30 * sign)
        c = c.at[:, :, P + R:].set(-1e30 * sign)
        out.append(c)
    return tuple(out)


def _check(loss_fused, loss_ref, params, atol_fac=1e-4):
    l_f = float(jax.jit(loss_fused)(*params))
    l_r = float(jax.jit(loss_ref)(*params))
    assert np.isfinite(l_f)
    assert abs(l_f - l_r) < 1e-3 * max(1.0, abs(l_r)), (l_f, l_r)
    argnums = tuple(range(len(params)))
    g_f = jax.jit(jax.grad(loss_fused, argnums))(*params)
    g_r = jax.jit(jax.grad(loss_ref, argnums))(*params)
    for a, r in zip(g_f, g_r):
        assert bool(jnp.all(jnp.isfinite(a))), "non-finite fused grad"
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=atol_fac * scale), \
            (a.shape, float(np.max(np.abs(np.asarray(a - r)))), scale)


def test_conv_bnact_flat_pad_row_grads(rng):
    """CC=32 planar conv (flat_fused.py) with poisoned pad rows."""
    B, D, H, W = 1, 2, 6, 16
    cin, cout = 64, 32
    nin = cin // 32
    G, R, P = fc.flat_geometry(H, W)
    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    xs = _seed_pad_rows(fc.to_flat(x5), P, R)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(cin,)) * 0.5 + 1.0, jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(cin,)) * 0.2, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H - 2, W, cout)),
                      jnp.float32)

    def loss_fused(inv_c, shift_c, w, b):
        # want_stats=True exercises the stats-enabled backward with
        # zero (ds, dq) cotangents; the stats VALUES are legitimately
        # pad-poisoned through the h-boundary rows, so they stay out
        # of the loss.
        ys, _ = ff.conv_bnact_flat(
            xs, _lane32(inv_c), _lane32(shift_c), w, b, H, W,
            (0,) * nin, True, "relu")
        y = fc.from_flat(ys, H, W, padded=True)
        return jnp.sum((y[:, :, 1:H - 1] - tgt) ** 2)

    def loss_ref(inv_c, shift_c, w, b):
        a = jnp.maximum(x5 * inv_c + shift_c, 0.0)
        y = jax.lax.conv_general_dilated(
            a, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        return jnp.sum((y[:, :, 1:H - 1] - tgt) ** 2)

    _check(loss_fused, loss_ref, (inv_c, shift_c, w, b))


@pytest.mark.parametrize("kd", [3, 1], ids=["kd3", "kd1"])
def test_conv3_bnact_flat64_pad_row_grads(rng, kd):
    """C=64 fused64 conv (kd=3 z-window / kd=1 planar) with poisoned
    pad rows."""
    B, D, H, W = 1, 3, 6, 6
    cin = cout = 64
    G, R, P = f64.flat_geometry64(H, W)
    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    xs = _seed_pad_rows(f64.to_flat64(x5), P, R)
    w = jnp.asarray(rng.normal(size=(kd, 3, 3, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(cin,)) * 0.5 + 1.0, jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(cin,)) * 0.2, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H - 2, W, cout)),
                      jnp.float32)

    def loss_fused(inv_c, shift_c, w, b):
        ys, _ = f64.conv3_bnact_flat64(
            xs, f64.lane_vec64(inv_c), f64.lane_vec64(shift_c),
            w, b, H, W, True, "relu")
        y = f64.from_flat64(ys, H, W, cout)
        return jnp.sum((y[:, :, 1:H - 1] - tgt) ** 2)

    def loss_ref(inv_c, shift_c, w, b):
        a = jnp.maximum(x5 * inv_c + shift_c, 0.0)
        y = jax.lax.conv_general_dilated(
            a, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        return jnp.sum((y[:, :, 1:H - 1] - tgt) ** 2)

    _check(loss_fused, loss_ref, (inv_c, shift_c, w, b))
