"""Fused BatchNorm (training mode) as Pallas TPU kernels.

The op-level profile of the headline training step (docs/design.md)
shows ~37% of step time in BatchNorm statistic/normalization traffic
(`convert_reduce_fusion`). These kernels compute the whole BN training
forward in two linear passes over HBM (stats accumulate in VMEM
scratch) and the backward in two more, with a `jax.custom_vjp` wiring —
instead of XLA's separate convert+reduce+normalize chains.

Layout: operates on ``(R, C)`` with channels minor (the natural
flattening of channels-last activations); C is one of {8..512}.
Row tiles stream through VMEM; per-channel accumulators live in a
VMEM scratch that persists across the sequential grid steps.

Falls back to interpret mode off-TPU (tests run on CPU).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_R = 1024


def _interpret() -> bool:
    from elektronn3_tpu.ops.flat_conv import _interpret as _fc_interpret
    return _fc_interpret()   # shared knob (E3TPU_PALLAS_INTERPRET)


def _grid_rows(R: int) -> Tuple[int, int]:
    tile = min(_TILE_R, R)
    return pl.cdiv(R, tile), tile


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _stats_kernel(x_ref, n_ref, sums_ref, acc_ref):
    """Accumulate per-channel sum and sum-of-squares across row tiles."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.float32)
    # Mask rows past the true row count (last tile may be ragged).
    tile_r = x.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + i * tile_r
    valid = (row_ids < n_ref[0]).astype(jnp.float32)
    xv = x * valid
    acc_ref[0, :] += jnp.sum(xv, axis=0)
    acc_ref[1, :] += jnp.sum(xv * xv, axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        sums_ref[...] = acc_ref[...]


def _normalize_kernel(x_ref, scale_ref, shift_ref, out_ref):
    """y = x * scale + shift (per-channel affine of pre-folded stats)."""
    x = x_ref[...].astype(jnp.float32)
    y = x * scale_ref[0, :] + shift_ref[0, :]
    out_ref[...] = y.astype(out_ref.dtype)


def _bn_stats(x2d: jnp.ndarray, R: int) -> jnp.ndarray:
    grid, tile = _grid_rows(x2d.shape[0])
    C = x2d.shape[1]
    return pl.pallas_call(
        _stats_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((2, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, C), jnp.float32)],
        interpret=_interpret(),
    )(x2d, jnp.array([R], jnp.int32))


def _bn_normalize(x2d, scale, shift):
    grid, tile = _grid_rows(x2d.shape[0])
    C = x2d.shape[1]
    return pl.pallas_call(
        _normalize_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=_interpret(),
    )(x2d, scale[None], shift[None])


def _pad_rows(x2d: jnp.ndarray) -> jnp.ndarray:
    R = x2d.shape[0]
    _, tile = _grid_rows(R)
    pad = (-R) % tile
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    return x2d


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def batch_norm_train(x, gamma, beta, eps: float = 1e-5):
    """Fused training-mode batch norm: returns (y, mean, var).

    Gradients flow through ``y`` only; the returned batch statistics are
    treated as stop-gradient (standard running-stat semantics)."""
    return _bn_fwd_impl(x, gamma, beta, eps)


def _bn_fwd_impl(x, gamma, beta, eps):
    shape = x.shape
    C = shape[-1]
    x2d = x.reshape(-1, C)
    R = x2d.shape[0]
    x2dp = _pad_rows(x2d)
    sums = _bn_stats(x2dp, R)
    mean = sums[0] / R
    var = jnp.maximum(sums[1] / R - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    scale = gamma.astype(jnp.float32) * inv
    shift = beta.astype(jnp.float32) - mean * scale
    y = _bn_normalize(x2dp, scale, shift)[:R]
    return y.reshape(shape), mean, var


def _bn_fwd(x, gamma, beta, eps):
    y, mean, var = _bn_fwd_impl(x, gamma, beta, eps)
    return (y, mean, var), (x, gamma, mean, var)


# -- backward kernels -------------------------------------------------------

def _bwd_reduce_kernel(g_ref, x_ref, mean_ref, inv_ref, n_ref,
                       sums_ref, acc_ref):
    """Accumulate dbeta = sum g and dgamma = sum g * xhat."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g = g_ref[...].astype(jnp.float32)
    x = x_ref[...].astype(jnp.float32)
    tile_r = g.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0) + i * tile_r
    valid = (row_ids < n_ref[0]).astype(jnp.float32)
    g = g * valid
    xhat = (x - mean_ref[0, :]) * inv_ref[0, :]
    acc_ref[0, :] += jnp.sum(g, axis=0)
    acc_ref[1, :] += jnp.sum(g * xhat, axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        sums_ref[...] = acc_ref[...]


def _bwd_dx_kernel(g_ref, x_ref, a_ref, b_ref, c_ref, dx_ref):
    """dx = a * g + b * x + c (per-channel affine, pre-folded)."""
    g = g_ref[...].astype(jnp.float32)
    x = x_ref[...].astype(jnp.float32)
    dx = a_ref[0, :] * g + b_ref[0, :] * x + c_ref[0, :]
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _bn_bwd(eps, residuals, cotangents):
    gy, _gmean, _gvar = cotangents  # stats are stop-gradient
    x, gamma, mean, var = residuals
    shape = x.shape
    C = shape[-1]
    x2d = _pad_rows(x.reshape(-1, C))
    g2d = _pad_rows(gy.reshape(-1, C))
    R = int(np.prod(shape[:-1]))
    inv = jax.lax.rsqrt(var + eps)

    grid, tile = _grid_rows(x2d.shape[0])
    sums = pl.pallas_call(
        _bwd_reduce_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((2, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, C), jnp.float32)],
        interpret=_interpret(),
    )(g2d, x2d, mean[None], inv[None], jnp.array([R], jnp.int32))
    dbeta = sums[0]
    dgamma = sums[1]

    # dx = gamma*inv * (g - dbeta/R - xhat * dgamma/R)
    #    = (gamma*inv) * g + (-gamma*inv^2*dgamma/R) * x + c
    gi = gamma.astype(jnp.float32) * inv
    a = gi
    b = -gi * inv * dgamma / R
    c = -gi * dbeta / R - b * mean
    dx = pl.pallas_call(
        _bwd_dx_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, gy.dtype),
        interpret=_interpret(),
    )(g2d, x2d, a[None], b[None], c[None])
    dx = dx[:R].reshape(shape)
    return dx, dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype)


batch_norm_train.defvjp(_bn_fwd, _bn_bwd)


def batch_norm_inference(x, gamma, beta, mean, var, eps: float = 1e-5):
    """Eval-mode BN using running statistics (single fused pass)."""
    shape = x.shape
    C = shape[-1]
    x2d = x.reshape(-1, C)
    R = x2d.shape[0]
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = gamma.astype(jnp.float32) * inv
    shift = beta.astype(jnp.float32) - mean.astype(jnp.float32) * scale
    y = _bn_normalize(_pad_rows(x2d), scale, shift)[:R]
    return y.reshape(shape)
