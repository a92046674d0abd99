"""Regression tests for the flat-layout BatchNorm variance clamp.

The sum/sumsq variance formulation `var = E[x^2] - E[x]^2` cancels
catastrophically in f32 for large-mean, low-variance channels and can
go (hugely) negative; rsqrt(var + eps) is then NaN. Both flat norm
modules must clamp var to >= 0 before rsqrt (round-3 advisor fixed
FlatBNStats only; round-4 closes FlatBatchNorm — modules/flat_norm.py).

Reference semantics: nn.BatchNorm (torch) computes var via a
numerically stable two-pass/Welford path, so this failure mode is an
artifact of the side-output (sum, sumsq) design and needs the clamp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elektronn3_tpu.modules.flat_norm import FlatBatchNorm, FlatBNStats
from elektronn3_tpu.ops.flat_conv import CC, flat_geometry


def _const_chunks(rng, base, H, W, B, D, nchunks):
    G, R, P = flat_geometry(H, W)
    chunks = []
    for _ in range(nchunks):
        x = np.zeros((B, D, R + 2 * P, 128), np.float32)
        x[:, :, P:P + R, :] = (
            base + rng.normal(scale=1e-3, size=(B, D, R, 128))
        ).astype(np.float32)
        chunks.append(jnp.asarray(x))
    return tuple(chunks)


@pytest.mark.parametrize("base", [1e3, 3e4])
def test_flatbatchnorm_large_mean_constant_channel(rng, base):
    """A large-mean near-constant channel must normalize finitely."""
    H, W, B, D, nchunks = 6, 20, 2, 3, 2
    chunks = _const_chunks(rng, base, H, W, B, D, nchunks)
    bn = FlatBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), chunks, H=H, W=W,
                        use_running_average=False)
    outs, _ = bn.apply(variables, chunks, H=H, W=W,
                       use_running_average=False,
                       mutable=["batch_stats"])
    for y in outs:
        assert bool(jnp.all(jnp.isfinite(y))), (
            "FlatBatchNorm emitted non-finite output for a large-mean "
            "constant channel (negative-variance cancellation)")


def test_flatbnstats_large_mean_constant_channel():
    """Sibling guard: FlatBNStats stays clamped (fixed in round 3)."""
    C, count = 64, 100_000
    base = jnp.float32(3e4)
    s = jnp.full((C,), base * count, jnp.float32)
    # sumsq rounded such that q/count - mean^2 < 0
    q = jnp.full((C,), (base * base) * count * (1 - 1e-6), jnp.float32)
    bn = FlatBNStats(cc=64)
    variables = bn.init(jax.random.PRNGKey(0), s, q, count, 1, False)
    (inv, shift), _ = bn.apply(variables, s, q, count, 1, False,
                               mutable=["batch_stats"])
    assert bool(jnp.all(jnp.isfinite(inv)))
    assert bool(jnp.all(jnp.isfinite(shift)))


# ---------------------------------------------------------------------------
# Group/instance norm via per-sample kernel statistics (round 4):
# FlatGNStats (modules/flat_norm.py) + the fused executors'
# want_stats='per_sample' path. Reference models/unet.py:77-111
# get_normalization ('group', 'group<G>', 'instance').
# ---------------------------------------------------------------------------

import flax.linen as nn

from elektronn3_tpu.modules.flat_norm import (
    FlatGNStats, identity_prologue, norm_kind)


def test_norm_kind_classification():
    assert norm_kind("batch", 64) == ("batch", 0)
    assert norm_kind(None, 64) == ("none", 0)
    assert norm_kind("none", 64) == ("none", 0)
    assert norm_kind("group", 64) == ("group", 8)
    assert norm_kind("group16", 64) == ("group", 16)
    assert norm_kind("instance", 64) == ("group", 64)
    with pytest.raises(ValueError):
        norm_kind("spectral", 64)


def test_identity_prologue_per_sample_form():
    inv, shift = identity_prologue(3, 4)
    assert inv.shape == (3, 4, 128) and shift.shape == (3, 4, 128)
    assert bool(jnp.all(inv == 1.0)) and bool(jnp.all(shift == 0.0))


@pytest.mark.parametrize("num_groups", [8, 32])  # 32 == instance (C=32)
def test_flatgnstats_matches_nn_groupnorm(rng, num_groups):
    """FlatGNStats((B,C) per-sample sums) must reproduce nn.GroupNorm's
    normalization exactly (same epsilon 1e-6, per-channel affine)."""
    B, D, H, W, C = 2, 3, 4, 5, 32
    x = jnp.asarray(rng.normal(size=(B, D, H, W, C)) * 3 + 1,
                    jnp.float32)
    gn = nn.GroupNorm(num_groups=num_groups)
    variables = gn.init(jax.random.PRNGKey(0), x)
    # non-trivial affine
    variables = {"params": {
        "scale": jnp.asarray(rng.normal(size=(C,)), jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(C,)), jnp.float32)}}
    ref = gn.apply(variables, x)

    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=(1, 2, 3))
    q = jnp.sum(xf * xf, axis=(1, 2, 3))
    mod = FlatGNStats(num_groups=num_groups, cc=32)
    (inv, shift) = mod.apply({"params": variables["params"]},
                             s, q, D * H * W, 1)
    assert inv.shape == (1, B, 128)
    # chunk lane layout: (JG=4 w-phases) x (CC=32 channels); apply the
    # prologue the way a consumer kernel would (channel c = lane c%32)
    got = xf * inv[0][:, None, None, None, :32] \
        + shift[0][:, None, None, None, :32]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


def _unet_grad_compare(norm, dim, train, with_f64_ref=False):
    """Returns (outs, grads) keyed by arm: False=XLA f32, True=fused
    f32, and (if with_f64_ref) 'f64'=XLA float64 oracle sharing the
    exact same parameter values (f32 init cast up, verified bitwise
    equal to f64 init)."""
    from elektronn3_tpu.models.unet import UNet
    rng = np.random.default_rng(0)
    if dim == 2:
        x = jnp.asarray(rng.normal(size=(2, 16, 24, 1)), jnp.float32)
        kw = dict(dim=2)
    else:
        x = jnp.asarray(rng.normal(size=(2, 6, 16, 24, 1)), jnp.float32)
        kw = dict(dim=3, planar_blocks=(0, 1))
    arms = [(False, jnp.float32), (True, jnp.float32)]
    if with_f64_ref:
        arms.append(("f64", jnp.float64))
    outs, grads = {}, {}
    params32 = None
    for arm, dtype in arms:
        from contextlib import nullcontext
        ctx = (jax.enable_x64(True) if dtype == jnp.float64
               else nullcontext())
        with ctx:
            model = UNet(in_channels=1, out_channels=2, n_blocks=2,
                         start_filts=32, normalization=norm,
                         dtype=dtype,
                         pallas_flat=(arm is True), **kw)
            key = jax.random.PRNGKey(0)
            xv = x.astype(dtype)
            variables = model.init({"params": key, "dropout": key},
                                   xv, train=True)
            if params32 is None:
                params32 = variables["params"]
            params = jax.tree_util.tree_map(
                lambda a: a.astype(dtype), params32)

            def loss_fn(p, xq):
                y, _ = model.apply(
                    {**variables, "params": p}, xq, train=train,
                    mutable=["batch_stats"], rngs={"dropout": key})
                return jnp.sum(y * y), y

            (_, y), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, xv)
            outs[arm] = np.asarray(y, np.float64)
            grads[arm] = g
    return outs, grads


@pytest.mark.parametrize("norm", ["group", "instance", "group16"])
@pytest.mark.parametrize("dim", [2, 3])
def test_fused_unet_groupnorm_parity(norm, dim):
    """Fused (interpret) vs XLA UNet with group/instance norm, judged
    against a float64 XLA oracle on identical parameters. dim=3 uses
    planar blocks with D>1, exercising the per-b stats reset across
    grid d-steps.

    Instance norm's f32 gradient is ill-conditioned under XLA's
    decomposition (flax GroupNorm's E[x²]−E[x]² cancellation):
    measured xla_f32→f64 error up to 2.1 absolute on ~90-magnitude
    grads, while the fused arm (HIGHEST-precision two-pass stats)
    stays ≤1.6e-3 of the oracle — 1000x closer. So the assertion is
    accuracy-vs-oracle per leaf: the fused arm must be within
    max(2x the XLA arm's own oracle error, a small absolute floor)."""
    outs, grads = _unet_grad_compare(norm, dim, train=True,
                                     with_f64_ref=True)
    assert np.abs(outs[True] - outs[False]).max() < 1e-4

    flat_fused = jax.tree_util.tree_flatten_with_path(grads[True])[0]
    flat_xla = jax.tree_util.tree_leaves(grads[False])
    flat_ref = jax.tree_util.tree_leaves(grads["f64"])
    for (path, gf), gx, gr in zip(flat_fused, flat_xla, flat_ref):
        gf = np.asarray(gf, np.float64)
        gx = np.asarray(gx, np.float64)
        gr = np.asarray(gr)
        name = "/".join(str(p.key) for p in path)
        err_fused = np.abs(gf - gr).max()
        err_xla = np.abs(gx - gr).max()
        tol = max(2.0 * err_xla, 1e-2 * (1.0 + np.abs(gr).max() * 1e-3))
        assert err_fused <= tol, (
            f"{name}: fused->f64 err {err_fused} > {tol} "
            f"(xla->f64 err {err_xla})")


def test_fused_unet_groupnorm_eval_parity():
    """Group norm computes statistics in EVAL mode too (no running
    averages) — the fused path must keep emitting per-sample stats
    when train=False."""
    outs, _ = _unet_grad_compare("group", 2, train=False)
    assert np.abs(outs[True] - outs[False]).max() < 1e-4
