"""BatchNorm over flat-layout activation chunks (ops/flat_conv.py).

Drop-in semantic equivalent of ``nn.BatchNorm`` (momentum 0.9, eps
1e-5, per-channel stats) for activations stored as tuples of flat
(B, D, Rp, 128) chunks. Variable tree matches nn.BatchNorm — params
scale/bias (C,), batch_stats mean/var (C,) — so checkpoints interop
with the non-flat model path.

Correctness notes:
- Stats reduce over lanes first (dense 128-minor reduction = full
  memory bandwidth), then fold the JG w-phases per channel. Zero pad
  rows/columns contribute nothing to the sums; the divisor is the TRUE
  element count (B * D * H * W), so statistics are exactly those of the
  unpadded tensor.
- The affine shift beta would break the flat-layout zero-padding
  contract, so the output is re-masked (pad rows and pad width columns
  forced back to zero).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from elektronn3_tpu.ops.flat_conv import (
    CC, JG, flat_geometry, width_mask,
)


class FlatBatchNorm(nn.Module):
    """BatchNorm on flat chunks. Call with (chunks, H, W, train).

    ``axis_name``: name of a mapped (shard_map) batch axis. When set,
    batch statistics are psum'd over it so per-shard kernels produce
    the GLOBAL batch statistics — the flat-executor analog of
    ``nn.BatchNorm(axis_name=...)`` (cross-device batch norm under
    explicit data parallelism; parallel/shard_step design).
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype = jnp.float32
    param_dtype = jnp.float32

    @nn.compact
    def __call__(self, chunks: Sequence[jnp.ndarray], *, H: int, W: int,
                 use_running_average: bool) -> Tuple[jnp.ndarray, ...]:
        n = len(chunks)
        C = n * CC
        B, D, Rp, _ = chunks[0].shape
        G, R, P = flat_geometry(H, W)
        count = B * D * H * W
        if self.axis_name is not None:
            count *= jax.lax.axis_size(self.axis_name)

        scale = self.param("scale", nn.initializers.ones, (C,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            sums = []
            sqs = []
            for xc in chunks:
                xf = xc.astype(jnp.float32)
                sums.append(jnp.sum(xf, axis=(0, 1, 2)))       # (128,)
                sqs.append(jnp.sum(xf * xf, axis=(0, 1, 2)))
            # fold (j, ci) lanes -> per-channel
            s = jnp.concatenate(
                [v.reshape(JG, CC).sum(0) for v in sums])      # (C,)
            sq = jnp.concatenate(
                [v.reshape(JG, CC).sum(0) for v in sqs])
            if self.axis_name is not None:
                s = jax.lax.psum(s, self.axis_name)
                sq = jax.lax.psum(sq, self.axis_name)
            mean = s / count
            var = sq / count - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        # The sum/sumsq formulation can go slightly negative from
        # cancellation (large mean, tiny true variance); clamp before
        # rsqrt like FlatBNStats below (running stats keep the raw
        # value for flax parity).
        inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + self.epsilon) \
            * scale.astype(jnp.float32)
        shift = bias.astype(jnp.float32) - mean * inv

        # Per-lane vectors + combined (row, lane) zero mask
        wmask = width_mask(W)                                  # (G, 128)
        rowmask = jnp.pad(jnp.tile(wmask, (H, 1)), ((P, P), (0, 0)))
        outs = []
        for i, xc in enumerate(chunks):
            inv_l = jnp.tile(inv[i * CC:(i + 1) * CC], JG)     # (128,)
            shift_l = jnp.tile(shift[i * CC:(i + 1) * CC], JG)
            y = (xc.astype(jnp.float32) * inv_l + shift_l) \
                * rowmask[None, None]
            outs.append(y.astype(xc.dtype))
        return tuple(outs)


class FlatBNStats(nn.Module):
    """BatchNorm driven by side-output statistics (ops/flat_fused.py).

    Instead of reading the activation tensor, this module consumes the
    per-channel (sum, sumsq) emitted by the fused conv/upconv kernels
    and returns the per-chunk prologue lane vectors (inv, shift) that
    the CONSUMER kernel applies on load (a' = act(inv * x + shift)).

    Variable tree is identical to ``nn.BatchNorm`` (params scale/bias
    (C,), batch_stats mean/var (C,)) so checkpoints interop with both
    the non-flat and the semi-fused model paths. Statistics semantics
    match nn.BatchNorm: biased batch variance, momentum 0.9, eps 1e-5
    (reference models/unet.py:77-111 get_normalization / BatchNorm3d).
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    cc: int = CC  # channel-chunk size (32 for flat32, 64 for flat64)
    # Mapped batch-axis name for cross-shard statistics (see
    # FlatBatchNorm.axis_name): kernels emit per-shard (sum, sumsq);
    # psum makes them global before the mean/var division.
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, s_c, q_c, count: int, n_chunks: int,
                 use_running_average: bool):
        if self.axis_name is not None:
            count = count * jax.lax.axis_size(self.axis_name)
            if not use_running_average:
                s_c = jax.lax.psum(s_c, self.axis_name)
                q_c = jax.lax.psum(q_c, self.axis_name)
        cc, jg = self.cc, 128 // self.cc
        C = n_chunks * cc
        scale = self.param("scale", nn.initializers.ones, (C,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = s_c / count
            var = q_c / count - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        # The sum/sumsq formulation can go slightly negative from
        # cancellation over millions of voxels; clamp before rsqrt
        # (running stats above keep the raw value for flax parity).
        inv_c = jax.lax.rsqrt(jnp.maximum(var, 0.0) + self.epsilon) * scale
        shift_c = bias - mean * inv_c
        inv = jnp.stack([jnp.tile(inv_c[i * cc:(i + 1) * cc], jg)
                         for i in range(n_chunks)])
        shift = jnp.stack([jnp.tile(shift_c[i * cc:(i + 1) * cc], jg)
                           for i in range(n_chunks)])
        return inv, shift


class FlatGNStats(nn.Module):
    """Group/instance norm driven by PER-SAMPLE side-output statistics.

    The fused kernels, when called with ``want_stats='per_sample'``,
    emit per-lane (sum, sumsq) per batch sample — shape
    (n_chunks, B, 128) — which ``fold_lane_stats`` reduces to
    per-channel (B, C). This module turns those into the per-sample
    prologue lane vectors (inv, shift), each (n_chunks, B, 128), that
    the CONSUMER kernels apply with b-indexed blocks.

    Semantics match the XLA executor's ``nn.GroupNorm`` (flax default
    epsilon 1e-6, per-channel affine; 'instance' == one group per
    channel), which itself mirrors the reference's GroupNorm/
    InstanceNorm choices (reference models/unet.py:77-111
    get_normalization). Unlike batch norm there is no running state
    and statistics are computed in eval mode too; under shard_map data
    parallelism the stats are intrinsically per-sample, so NO psum is
    needed (``axis_name`` is deliberately absent).

    Variable tree matches ``nn.GroupNorm`` (params scale/bias (C,))
    so checkpoints interop with the XLA model path.
    """
    num_groups: int
    epsilon: float = 1e-6
    cc: int = CC  # channel-chunk size (32 for flat32, 64 for flat64)

    @nn.compact
    def __call__(self, s_c, q_c, count: int, n_chunks: int):
        """s_c, q_c: (B, C) per-sample per-channel (sum, sumsq);
        count = spatial elements per sample (D*H*W)."""
        cc, jg = self.cc, 128 // self.cc
        C = n_chunks * cc
        g = self.num_groups
        assert C % g == 0, (C, g)
        gs = C // g
        scale = self.param("scale", nn.initializers.ones, (C,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          jnp.float32)
        B = s_c.shape[0]
        denom = count * gs
        mean_g = s_c.reshape(B, g, gs).sum(-1) / denom        # (B, g)
        var_g = q_c.reshape(B, g, gs).sum(-1) / denom \
            - mean_g * mean_g
        # clamp before rsqrt: cancellation guard (see FlatBNStats)
        rstd = jax.lax.rsqrt(jnp.maximum(var_g, 0.0) + self.epsilon)
        mean = jnp.repeat(mean_g, gs, axis=1)                 # (B, C)
        inv_c = jnp.repeat(rstd, gs, axis=1) * scale[None]
        shift_c = bias[None] - mean * inv_c
        inv = jnp.stack([jnp.tile(inv_c[:, i * cc:(i + 1) * cc],
                                  (1, jg))
                         for i in range(n_chunks)])     # (n, B, 128)
        shift = jnp.stack([jnp.tile(shift_c[:, i * cc:(i + 1) * cc],
                                    (1, jg))
                           for i in range(n_chunks)])
        return inv, shift


def identity_prologue(n_chunks: int, batch: Optional[int] = None):
    """(inv, shift) lane vectors for a no-norm prologue. With
    ``batch``, the per-sample (n, B, 128) form — used when a sibling
    prologue in the same level is per-sample (group/instance norm) so
    concatenated prologues keep one rank."""
    if batch is not None:
        return (jnp.ones((n_chunks, batch, 128), jnp.float32),
                jnp.zeros((n_chunks, batch, 128), jnp.float32))
    return (jnp.ones((n_chunks, 128), jnp.float32),
            jnp.zeros((n_chunks, 128), jnp.float32))


def norm_kind(norm: Optional[str], channels: int):
    """Classify a normalization name for the fused executors.

    Returns (kind, num_groups): kind in {'batch', 'none', 'group'};
    num_groups is set for kind == 'group' ('instance' == one group per
    channel; 'group<G>' parses G, plain 'group' = 8 — matching
    modules/layers.py get_normalization)."""
    if norm is None or norm in ("none",):
        return "none", 0
    if norm in ("batch", "batchp"):
        return "batch", 0
    if norm == "instance":
        return "group", channels
    if norm.startswith("group"):
        g = int(norm[len("group"):]) if len(norm) > len("group") else 8
        return "group", g
    raise ValueError(f"Unknown normalization: {norm!r}")
