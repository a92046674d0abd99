"""bf16 max-pool gradient routing (round 5): the pool backwards
recompute the pooled maxima from their f32 prologues in-kernel instead
of re-reading the stored (out_dtype-cast) pooled chunk. Before this,
bf16 models compared f32 a' against the BF16-ROUNDED stored max, so
the argmax selection failed wherever the max was not bf16-representable
— silently dropping most of the pooled-branch cotangent (the skip
branch masked this in full models). Reference semantics: torch's
max_pool backward routes by stored indices, never by value comparison
(reference models/unet.py:202-253 pooling).

Assertion: for bf16 inputs the fused pool gradient must equal the f32
fused gradient's ROUTING (same nonzero selection pattern) and value
within bf16 input-rounding tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elektronn3_tpu.ops import flat_conv as fc
from elektronn3_tpu.ops import flat_fused as ff
from elektronn3_tpu.ops import flat_fused64 as f64

pytestmark = pytest.mark.slow  # interpret-mode kernels, 1-core host


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def _routing_close(g_bf16, g_f32):
    a = np.asarray(g_bf16, np.float32)
    r = np.asarray(g_f32, np.float32)
    # identical selection pattern (the f32 prologue is computed from
    # the SAME bf16 x in both runs, so ties/selections coincide)
    assert ((a != 0) == (r != 0)).all(), \
        f"routing mismatch: {np.abs((a != 0).mean() - (r != 0).mean())}"
    scale = max(1.0, np.abs(r).max())
    assert np.allclose(a, r, atol=2e-2 * scale)


def test_pool32_bf16_routing(rng):
    B, D, H, W, C = 1, 2, 4, 8, 32
    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.bfloat16)
    inv = jnp.asarray(rng.normal(size=(C,)) * 0.5 + 1.0, jnp.float32)
    shift = jnp.asarray(rng.normal(size=(C,)) * 0.2, jnp.float32)
    lane = lambda v: jnp.tile(v.reshape(1, C), (1, 128 // C))

    def grad_for(dtype):
        def loss(x5d):
            y = ff.pool_bnact_flat(fc.to_flat(x5d), lane(inv),
                                   lane(shift), H, W, (0,), "relu")
            return jnp.sum(y.astype(jnp.float32) ** 2)
        # f32 run still STARTS from the same bf16 values
        return jax.grad(loss)(x5.astype(dtype))

    _routing_close(grad_for(jnp.bfloat16), grad_for(jnp.float32))


@pytest.mark.parametrize("mode", ["222", "122"])
def test_pool64_bf16_routing(rng, mode):
    B, D, H, W, C = 1, 2, 4, 6, 64
    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.bfloat16)
    inv = jnp.asarray(rng.normal(size=(C,)) * 0.5 + 1.0, jnp.float32)
    shift = jnp.asarray(rng.normal(size=(C,)) * 0.2, jnp.float32)

    def grad_for(dtype):
        def loss(x5d):
            xs = f64.to_flat64(x5d)
            fn = (f64.pool222_bnact_flat64 if mode == "222"
                  else f64.pool122_bnact_flat64)
            y = fn(xs, f64.lane_vec64(inv), f64.lane_vec64(shift),
                   H, W, C, "relu")
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.grad(loss)(x5.astype(dtype))

    _routing_close(grad_for(jnp.bfloat16), grad_for(jnp.float32))
