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
