"""Input-chunk-split merged conv backward (ops/flat_fused64.py
bwd_ki_split, round 5): when the unsplit backward's scoped-VMEM
estimate exceeds the 16 MB gate, _conv64_bwd partitions the input
chunks over several pallas_calls — each stages all dy/y chunks but
only its group's x views, w slices, dx outputs and m0/mc f32 tap
accumulators. This is what admits 4-chunk decoder merge convs (C=128
levels of sf=64 models, reference models/unet.py:550-935 geometry) to
fused TRAINING.

Each (i, o) tap accumulator sees the identical grid-step accumulation
order split or not, so forced-split grads must match the unsplit
kernel essentially bitwise (and XLA autodiff within f32 tolerance).
E3TPU_FORCE_KI_SPLIT is the test hook; the production split decision
is deterministic from geometry (backend-independent), so these
interpret-mode runs exercise the same partition the chip takes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elektronn3_tpu.ops import flat_fused64 as f64

pytestmark = pytest.mark.slow  # interpret-mode kernels, 1-core host


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _conv_ref(a, w):
    return jax.lax.conv_general_dilated(
        a, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _grads(loss, argnums, *args):
    return jax.grad(loss, argnums)(*args)


def _merge_conv_losses(rng, cin=256, cout=128, B=1, D=4, H=4, W=6):
    """(loss_ref, loss_f64, args) for a 4-chunk merge-conv geometry."""
    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(cin,)) * 0.5 + 1.0,
                        jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(cin,)) * 0.2, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H, W, cout)), jnp.float32)
    cs = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

    def loss_ref(x5, inv_c, shift_c, w, b):
        a = jnp.maximum(x5 * inv_c + shift_c, 0.0)
        y = _conv_ref(a, w) + b
        s = jnp.sum(y, axis=(0, 1, 2, 3))
        q = jnp.sum(y * y, axis=(0, 1, 2, 3))
        return (jnp.sum((y - tgt) ** 2) + jnp.sum(s * cs)
                + jnp.sum(q * cq))

    def loss_f64(x5, inv_c, shift_c, w, b):
        xs = f64.to_flat64(x5)
        inv_l = f64.lane_vec64(inv_c)
        shift_l = f64.lane_vec64(shift_c)
        ys, (s, q) = f64.conv3_bnact_flat64(
            xs, inv_l, shift_l, w, b, H, W, True, "relu")
        y = f64.from_flat64(ys, H, W, cout)
        s_c = f64.fold_lane_stats64(s)
        q_c = f64.fold_lane_stats64(q)
        return (jnp.sum((y - tgt) ** 2) + jnp.sum(s_c * cs)
                + jnp.sum(q_c * cq))

    return loss_ref, loss_f64, (x5, inv_c, shift_c, w, b)


@pytest.mark.parametrize("split", [2, 3, 4])
def test_ki_split_matches_unsplit_and_xla(rng, split, monkeypatch):
    """Forced ki-split grads == unsplit fused grads (same accumulation
    order per tap: near-bitwise) and == XLA autodiff (f32 tol).
    split=3 covers the uneven-partition path (groups of 2, 2)... of a
    4-chunk input (ceil partition: 2 + 2)."""
    loss_ref, loss_f64, args = _merge_conv_losses(rng)
    argn = (0, 1, 2, 3, 4)

    monkeypatch.delenv("E3TPU_FORCE_KI_SPLIT", raising=False)
    g_unsplit = _grads(loss_f64, argn, *args)
    monkeypatch.setenv("E3TPU_FORCE_KI_SPLIT", str(split))
    g_split = _grads(loss_f64, argn, *args)
    l_split = loss_f64(*args)
    monkeypatch.delenv("E3TPU_FORCE_KI_SPLIT", raising=False)

    g_ref = _grads(loss_ref, argn, *args)
    l_ref = loss_ref(*args)
    assert abs(float(l_ref - l_split)) < 1e-2 * max(1.0,
                                                    abs(float(l_ref)))
    for a, u, r in zip(g_split, g_unsplit, g_ref):
        # split vs unsplit: identical accumulation orders
        assert np.allclose(np.asarray(a), np.asarray(u),
                           atol=1e-6), a.shape
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-3 * scale), a.shape


def test_ki_split_d_halo(rng, monkeypatch):
    """Split slicing composes with the 2D-tiled halo-strip operands
    (each group rebuilds only its chunks' strip views)."""
    B, D, H, W, cin, cout = 1, 3, 4, 6, 128, 64
    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(cin,)) * 0.5 + 1.0,
                        jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(cin,)) * 0.2, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H, W, cout)), jnp.float32)

    def loss_f64(x5, inv_c, shift_c, w, b):
        xs = f64.to_flat64(x5)
        ys, _ = f64.conv3_bnact_flat64(
            xs, f64.lane_vec64(inv_c), f64.lane_vec64(shift_c),
            w, b, H, W, False, "relu", d_halo=True)
        y = f64.from_flat64(ys, H, W, cout)
        return jnp.sum((y - tgt) ** 2)

    argn = (0, 1, 2, 3, 4)
    args = (x5, inv_c, shift_c, w, b)
    monkeypatch.delenv("E3TPU_FORCE_KI_SPLIT", raising=False)
    g_unsplit = _grads(loss_f64, argn, *args)
    monkeypatch.setenv("E3TPU_FORCE_KI_SPLIT", "2")
    g_split = _grads(loss_f64, argn, *args)
    monkeypatch.delenv("E3TPU_FORCE_KI_SPLIT", raising=False)
    for a, u in zip(g_split, g_unsplit):
        assert np.allclose(np.asarray(a), np.asarray(u),
                           atol=1e-6), a.shape


def test_ki_split_per_sample_prologue(rng, monkeypatch):
    """Split slicing of per-sample (nin, B, 128) prologue vectors and
    b-indexed dinv/dshift accumulator concat (group/instance norm)."""
    B, D, H, W, cin, cout = 2, 4, 4, 6, 128, 64
    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    inv_c = jnp.asarray(rng.normal(size=(B, cin)) * 0.5 + 1.0,
                        jnp.float32)
    shift_c = jnp.asarray(rng.normal(size=(B, cin)) * 0.2, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, D, H, W, cout)), jnp.float32)
    cs = jnp.asarray(rng.normal(size=(B, cout)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(B, cout)) * 0.1, jnp.float32)

    def lane_ps(v):
        n = v.shape[1] // 64
        return jnp.stack([jnp.tile(v[:, i * 64:(i + 1) * 64], (1, 2))
                          for i in range(n)])

    def loss_ref(x5, inv_c, shift_c, w, b):
        a = jnp.maximum(x5 * inv_c[:, None, None, None, :]
                        + shift_c[:, None, None, None, :], 0.0)
        y = _conv_ref(a, w) + b
        s = jnp.sum(y, axis=(1, 2, 3))
        q = jnp.sum(y * y, axis=(1, 2, 3))
        return (jnp.sum((y - tgt) ** 2) + jnp.sum(s * cs)
                + jnp.sum(q * cq))

    def loss_f64(x5, inv_c, shift_c, w, b):
        xs = f64.to_flat64(x5)
        ys, (s, q) = f64.conv3_bnact_flat64(
            xs, lane_ps(inv_c), lane_ps(shift_c), w, b, H, W,
            "per_sample", "relu")
        y = f64.from_flat64(ys, H, W, cout)
        s_c = f64.fold_lane_stats64(s)
        q_c = f64.fold_lane_stats64(q)
        return (jnp.sum((y - tgt) ** 2) + jnp.sum(s_c * cs)
                + jnp.sum(q_c * cq))

    argn = (0, 1, 2, 3, 4)
    args = (x5, inv_c, shift_c, w, b)
    monkeypatch.delenv("E3TPU_FORCE_KI_SPLIT", raising=False)
    g_unsplit = _grads(loss_f64, argn, *args)
    monkeypatch.setenv("E3TPU_FORCE_KI_SPLIT", "2")
    g_split = _grads(loss_f64, argn, *args)
    monkeypatch.delenv("E3TPU_FORCE_KI_SPLIT", raising=False)
    g_ref = _grads(loss_ref, argn, *args)
    for a, u, r in zip(g_split, g_unsplit, g_ref):
        assert np.allclose(np.asarray(a), np.asarray(u),
                           atol=1e-6), a.shape
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert np.allclose(np.asarray(a), np.asarray(r),
                           atol=1e-3 * scale), a.shape
