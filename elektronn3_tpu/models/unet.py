"""Flagship configurable 2D/3D U-Net, TPU-native.

Re-design of the reference flagship model
(elektronn3/models/unet.py:550-935) in flax/JAX with channels-last
layout:

- Input: ``(N, H, W, C)`` for ``dim=2``; ``(N, D, H, W, C)`` for
  ``dim=3``. Channels-last keeps C in TPU lanes so XLA maps convs to the
  MXU directly.
- Config surface parity: ``n_blocks``, ``start_filts``, ``up_mode``
  ('transpose' | 'resizeconv_nearest' | 'resizeconv_linear' |
  'resizeconv_nearest1' | 'resizeconv_linear1'), ``merge_mode``
  ('concat' | 'add'), ``planar_blocks`` (anisotropic 1x3x3 kernels +
  1x2x2 pooling), ``activation``, ``normalization``
  ('batch'/'instance'/'group'/'group<G>'/'none'), ``attention`` (grid
  attention, arXiv:1804.03999), ``full_norm``, ``dim``, ``conv_mode``
  ('same' | 'valid').
- Block op order parity (post-activation normalization, see
  unet.py:245-253 DownConv.forward and :385-409 UpConv.forward):
  conv → norm → act (reference applies norm before act inside blocks).
- ``autocrop`` (unet.py:256-325) handles odd-shape/valid-conv merging —
  shapes are static under jit, so crops resolve at trace time.
- Gradient checkpointing: ``checkpointing=True`` wraps each block in
  ``jax.checkpoint`` (reference forward_gradcp, unet.py:918-935).
- Mixed precision: pass ``dtype=jnp.bfloat16`` for bf16 compute with
  fp32 params (TPU-native AMP; no loss scaling needed).

Weight init parity: Xavier/Glorot normal for conv kernels, zeros for
biases (unet.py:883-892).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
import numpy as np
from flax import linen as nn

from elektronn3_tpu.modules.layers import (
    GridAttention,
    apply_norm,
    conv_kernel,
    get_activation,
    get_normalization,
    pool_window,
    resize_linear,
    resize_nearest,
)
from elektronn3_tpu.modules.flat_norm import (
    FlatBatchNorm, FlatBNStats, FlatGNStats, identity_prologue,
    norm_kind)
from elektronn3_tpu.ops import flat_conv as _fc
from elektronn3_tpu.ops import flat_fused as _ffu
from elektronn3_tpu.ops import flat_fused64 as _ff64

import functools
import logging
import os

logger = logging.getLogger(__name__)
# One decline log line per distinct (level, config) across traces —
# flax re-traces __call__ several times per jit compile.
_DECLINES_LOGGED: set = set()

Dtype = Any

# Activations that map 0 -> 0 (required to preserve the flat layout's
# zero-padding contract, ops/flat_conv.py module docstring).
_FLAT_SAFE_ACTS = ("relu", "leaky", "lrelu", "prelu", "silu", "swish",
                   "tanh", "gelu")

# Minimum level voxels (D*H*W) for 'auto' to engage the C=128 fused
# executor — below this the per-block kernel overheads lose to XLA
# (measured on v5e: 22^3 L2 fused costs ~+9 ms/step vs XLA; see
# BASELINE.md "C=128 crossover"). Env-overridable for calibration.
_FUSED128_MIN_VOX = int(os.environ.get("E3TPU_FUSED128_MIN_VOX",
                                       60_000))

# Per-chunk flat-row bounds for the CC=32 executor, calibrated against
# the v5e's 16 MB scoped-VMEM limit (2026-08-17 measurements):
# the TRAIN (backward) kernels stage ~2x the live slabs of the eval
# forward plus f32 staging temporaries — a d_halo conv2 backward OOM'd
# at 3220 unpadded rows (16.2 MB) while the same slab's forward fits
# (the 164 MVox/s 2D pred run); the headline 3D levels (2024 rows)
# train with >5 MB headroom. Unpadded H*G rows; env-overridable for
# other TPU generations. TRAIN recalibrated round 4 (2026-08-19
# probe at 2D 640x640: 2600 -> 46.9, 3000 -> 53.5, 3300 -> 53.4
# MVox/s, no OOM): 3000 rows picks taller 2D train slabs.
_FUSED_ROWS_TRAIN = int(os.environ.get("E3TPU_FUSED_ROWS_TRAIN", 3000))
_FUSED_ROWS_EVAL = int(os.environ.get("E3TPU_FUSED_ROWS_EVAL", 3400))


def _vup_on() -> bool:
    """vup path (round 5, measured dead end — default OFF): the CC=32
    decoder merge conv consumes the deeper fused64 level's carry
    directly, recomputing the (1,2,2) upconv rows in its prologue
    (ops/flat_fused.conv_bnact_flat_vup), so the materialized upconv
    chunk (>= 262 MB/pass of L1->L0 seam traffic — the MFU ledger's
    last recorded headline lever) never exists. MEASURED SLOWER on the
    v5e (2026-08-20 A/B, headline config): 53.7 vs 48.2 ms/step
    (50.7 vs 56.4 MVox/s). Per-op profile: the merge conv is
    COMPUTE-bound with the seam reads already DMA-hidden, so deleting
    them bought nothing, while the in-kernel recompute's even/odd row
    interleave (an unaligned sublane shuffle) is serial VPU work that
    appears 5x per step (conv1 fwd +0.64 ms, conv1 bwd +2.87 ms with
    two rebuilds, stats-cotangent pass +0.98 ms vs the materializing
    upconv backward). Best-case fixes (stage-A reuse, taller stats-bwd
    blocking) leave ~+2.9 ms — the sign does not flip. Kept as an
    opt-in capability (E3TPU_VUP=1), parity-tested in
    tests/test_flat_vup.py; see docs/design.md round-5 findings."""
    return os.environ.get("E3TPU_VUP", "0").lower() in (
        "1", "on", "true", "auto")

UP_MODES = ("transpose", "resizeconv_nearest", "resizeconv_linear",
            "resizeconv_nearest1", "resizeconv_linear1")
MERGE_MODES = ("concat", "add")
CONV_MODES = ("same", "valid")

_kernel_init = nn.initializers.xavier_normal()


def _ceil_maxpool(x: jnp.ndarray, window: Sequence[int]) -> jnp.ndarray:
    """Max pool with ceil_mode=True semantics (reference DownConv uses
    MaxPool(ceil_mode=True), unet.py:229): pad odd spatial dims with -inf
    so no input element is dropped."""
    pads = [(0, 0)]
    needs_pad = False
    for s, w in zip(x.shape[1:-1], window):
        r = (-s) % w
        pads.append((0, r))
        needs_pad = needs_pad or r > 0
    pads.append((0, 0))
    if needs_pad:
        x = jnp.pad(x, pads, constant_values=-jnp.inf)
    return nn.max_pool(x, tuple(window), strides=tuple(window))


def autocrop(from_down: jnp.ndarray,
             from_up: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crop encoder/decoder features so they can be merged.

    Channels-last port of the reference's TorchScript autocrop
    (unet.py:256-325): (1) crop the upsampled decoder tensor by 1 in dims
    where the shape difference is odd (ceil-mode pooling artifact);
    (2) center-crop the encoder tensor for valid-conv shape shrinkage.
    All shapes are static at trace time.
    """
    ds = from_down.shape[1:-1]
    us = from_up.shape[1:-1]
    if ds == us:
        return from_down, from_up
    # Step 1: odd-shape handling
    upcrop = [u - ((u - d) % 2) for d, u in zip(ds, us)]
    slc = (slice(None),) + tuple(slice(0, c) for c in upcrop) + (slice(None),)
    from_up = from_up[slc]
    # Step 2: center-crop for valid convs
    ds = from_down.shape[1:-1]
    us = from_up.shape[1:-1]
    for d, u in zip(ds, us):
        assert d >= u, f"Encoder feature smaller than decoder: {ds} vs {us}"
    slc = (slice(None),) + tuple(
        slice((d - u) // 2, (d + u) // 2) for d, u in zip(ds, us)
    ) + (slice(None),)
    from_down = from_down[slc]
    return from_down, from_up


class _Conv1IntoFlat(nn.Module):
    """Planar 3x3 conv from a small-C_in 5D input straight into flat
    chunks (ops/flat_conv.conv3_into_flat). Param tree matches
    nn.Conv."""
    features: int
    H: int
    W: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x5):
        cin = x5.shape[-1]
        kernel = self.param("kernel", _kernel_init,
                            (1, 3, 3, cin, self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return _fc.conv3_into_flat(x5.astype(self.dtype),
                                   kernel.astype(self.dtype),
                                   bias.astype(self.dtype),
                                   self.H, self.W)


class _UpconvToFlat(nn.Module):
    """Planar (1,2,2)-stride-2 transposed conv from the small deeper
    tensor straight into flat chunks. Param tree matches
    nn.ConvTranspose."""
    features: int
    H: int
    W: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, dec):
        cin = dec.shape[-1]
        kernel = self.param("kernel", _kernel_init,
                            (1, 2, 2, cin, self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return _fc.upconv2_transpose_to_flat(
            dec.astype(self.dtype), kernel.astype(self.dtype),
            bias.astype(self.dtype), self.H, self.W)


class _Conv1x1FromFlat(nn.Module):
    """1x1 conv head consuming flat chunks, emitting 5D logits. Param
    tree matches nn.Conv((1,1,1))."""
    features: int
    H: int
    W: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, chunks):
        cin = _fc.CC * len(chunks)
        kernel = self.param("kernel", _kernel_init,
                            (1, 1, 1, cin, self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        chunks = tuple(c.astype(self.dtype) for c in chunks)
        return _fc.conv1x1_from_flat(chunks, kernel.astype(self.dtype),
                                     bias.astype(self.dtype),
                                     self.H, self.W)


class _FlatConv(nn.Module):
    """3x3 (planar) 'same' conv on flat chunks via the Pallas flat-
    layout kernel (ops/flat_conv.py). Param tree matches nn.Conv
    (kernel (kd,3,3,cin,cout) + bias (cout,)) for checkpoint interop."""
    features: int
    kd: int
    H: int
    W: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, chunks):
        cin = _fc.CC * len(chunks)
        kernel = self.param("kernel", _kernel_init,
                            (self.kd, 3, 3, cin, self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return _fc.flat_conv3(tuple(chunks), kernel.astype(self.dtype),
                              bias.astype(self.dtype),
                              self.kd, self.H, self.W)


def _flat_act(act, chunks):
    return tuple(act(c) for c in chunks)


def _act_name(activation) -> str:
    """Kernel-prologue activation id for the fused flat executor."""
    return "leaky" if activation in ("leaky", "lrelu") else "relu"


def _want_stats(kind: str, *, normed: bool, train: bool):
    """Kernel stats request for a conv followed by ``kind`` norm:
    batch norm needs global (sum, sumsq) in training only (eval uses
    running stats); group/instance norm needs PER-SAMPLE stats in
    both train and eval (no running state). ``normed=False`` (a
    full_norm=False position) needs none."""
    if not normed or kind == "none":
        return False
    if kind == "group":
        return "per_sample"
    return train


def _stats_prologue(kind: str, ngroups: int, st, fold, *, count: int,
                    spatial: int, n: int, B: int, axis_name, nidx: int,
                    train: bool, cc: int, normed: bool = True):
    """(inv, shift, nidx') prologue lane vectors from fused-kernel
    stat side outputs — the norm dispatch shared by every fused
    DownConv/UpConv branch. ``st`` is the (s, q) side-output pair (or
    None when the kernel was called without stats), ``fold`` the
    executor's per-lane fold fn (fold_lane_stats / fold_lane_stats64).
    ``spatial`` is the per-sample element count D*H*W (group/instance
    divisor); ``count`` the global B*D*H*W (batch divisor). Creates
    the norm submodule with the XLA path's auto-name
    (BatchNorm_<i>/GroupNorm_<i>) so checkpoints interop."""
    if not normed or kind == "none":
        inv, shift = identity_prologue(n, B if kind == "group" else None)
        return inv, shift, nidx
    if kind == "group":
        inv, shift = FlatGNStats(num_groups=ngroups, cc=cc,
                                 name=f"GroupNorm_{nidx}")(
            fold(st[0]), fold(st[1]), spatial, n)
    else:
        s = fold(st[0]) if st else None
        q = fold(st[1]) if st else None
        inv, shift = FlatBNStats(cc=cc, axis_name=axis_name,
                                 name=f"BatchNorm_{nidx}")(
            s, q, count, n, not train)
    return inv, shift, nidx + 1


def _lift2d(x, tile: int = 0):
    """2D (N, H, W, C) -> the fused executors' 5D view.

    The flat executors treat a 2D model as a 3D volume of planar
    (kd=1) H-slabs. tile=0 (or tile == H): ONE slab (N, 1, H, W, C) —
    the whole image per kernel grid step. Otherwise the image is
    H-tiled into (N, H/tile, tile, W, C) slabs (a free, contiguous
    reshape) and the convs run with d_halo strips so big images fit
    the VMEM row bound."""
    if x.ndim != 4:
        return x
    if tile and tile < x.shape[1]:
        B, H, W, C = x.shape
        return x.reshape(B, H // tile, tile, W, C)
    return x[:, None]


def _drop2d(y):
    """Inverse of _lift2d on dense outputs: merge the slab axes back
    into (N, H, W, C) (contiguous, free)."""
    if y.ndim != 5:
        return y
    B, D, h, W, C = y.shape
    return y.reshape(B, D * h, W, C)


def _p2d(shape, dim):
    """Fused-module param shape: drop the leading depth-tap axis for
    dim=2 so param trees match the 2D XLA path (nn.Conv/ConvTranspose
    with 2D kernels) for checkpoint interop."""
    return shape[1:] if dim == 2 else shape


def _k2d(kernel, dim):
    """Lift a 2D kernel param back to the fused ops' leading-depth
    form ((1, kh, kw, cin, cout))."""
    return kernel[None] if dim == 2 else kernel


class _Im2colConv(nn.Module):
    """Planar 3x3 'same' conv as an im2col GEMM (for small C_in where
    XLA's conv emitter is pathologically slow — measured 6.5 ms f+b
    for the headline 1->32 conv vs ~2 ms for this form). Param tree
    matches nn.Conv. Emits the 5D dense channels-last tensor."""
    features: int
    dim: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        H, W = x.shape[2], x.shape[3]
        kernel = self.param("kernel", _kernel_init,
                            _p2d((1, 3, 3, cin, self.features),
                                 self.dim),
                            self.param_dtype)
        kernel = _k2d(kernel, self.dim)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        xp = jnp.pad(x.astype(self.dtype),
                     ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        pats = jnp.concatenate(
            [xp[:, :, t:t + H, s:s + W, :]
             for t in range(3) for s in range(3)], axis=-1)
        w2 = kernel.reshape(9 * cin, self.features).astype(self.dtype)
        y = jax.lax.dot_general(
            pats, w2, dimension_numbers=(((4,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if pats.dtype == jnp.float32 else None))
        return (y + bias.astype(jnp.float32)).astype(self.dtype)


class _FusedConv64(nn.Module):
    """Fused prologue + 3x3x3 (or planar (1,3,3) / 2D 3x3) conv +
    stats side outputs on flat64 chunks
    (ops/flat_fused64.conv3_bnact_flat64). Param tree matches nn.Conv
    for the same block in the non-fused path (kernel
    (kd,3,3,cin_real,features) for dim=3, (3,3,cin_real,features) for
    dim=2) so checkpoints interop; cin is zero-padded up to the chunk
    multiple inside."""
    features: int
    H: int
    W: int
    cin_real: int
    want_stats: bool
    act: str
    forms: Optional[Tuple[str, ...]] = None
    kd: int = 3
    dim: int = 3
    d_halo: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, inv, shift):
        if self.dim == 2:
            kernel = self.param("kernel", _kernel_init,
                                (3, 3, self.cin_real, self.features),
                                self.param_dtype)
            w = kernel[None]
        else:
            kernel = self.param("kernel", _kernel_init,
                                (self.kd, 3, 3, self.cin_real,
                                 self.features),
                                self.param_dtype)
            w = kernel
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        cpad = len(xs) * _ff64.CC64 - self.cin_real
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cpad), (0, 0)))
        return _ff64.conv3_bnact_flat64(
            tuple(xs), inv, shift, w, bias, self.H, self.W,
            self.want_stats, self.act, self.forms, self.d_halo)


class _FusedUpconv64(nn.Module):
    """Stride-2 transposed conv (128 -> 64) into a flat64 chunk +
    stats: (2,2,2) for 3D levels (upconv222_bn_flat64), (1,2,2) for
    planar levels ((2,2) param shape for dim=2; upconv122_bn_flat64).
    Param tree matches nn.ConvTranspose for the same level in the
    non-fused path so checkpoints interop."""
    features: int
    H: int
    W: int
    want_stats: bool
    planar: bool = False
    dim: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, dec):
        cin = dec.shape[-1]
        # Draw order matters: flax folds a per-module call counter
        # into the param rng, so kernel-then-bias (nn.ConvTranspose's
        # order) keeps same-seed inits identical to the XLA path.
        if self.dim == 2:
            w = self.param("kernel", _kernel_init,
                           (2, 2, cin, self.features),
                           self.param_dtype)[None]
        elif self.planar:
            w = self.param("kernel", _kernel_init,
                           (1, 2, 2, cin, self.features),
                           self.param_dtype)
        else:
            w = self.param("kernel", _kernel_init,
                           (2, 2, 2, cin, self.features),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        if self.dim == 3 and not self.planar:
            return _ff64.upconv222_bn_flat64(
                dec.astype(self.dtype), w, bias, self.H, self.W,
                self.want_stats)
        return _ff64.upconv122_bn_flat64(
            dec.astype(self.dtype), w, bias, self.H, self.W,
            self.want_stats)


class _FusedUpconv64F(nn.Module):
    """Stride-2 transposed conv consuming a FlatActs64 carry (the
    deeper level is ALSO fused64) and emitting features//64 flat64
    chunks + stats (ops/flat_fused64.upconv222_f64in / upconv122_f64in)
    — no materialize seam between chained fused64 decoder levels.
    Param tree matches nn.ConvTranspose for checkpoint interop."""
    features: int
    H: int
    W: int
    want_stats: bool
    act: str
    planar: bool = False
    dim: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, acts):
        cin = len(acts.chunks) * _ff64.CC64
        chunks = tuple(c.astype(self.dtype) for c in acts.chunks)
        # kernel-then-bias draw order: see _FusedUpconv64.
        if self.dim == 2:
            w = self.param("kernel", _kernel_init,
                           (2, 2, cin, self.features),
                           self.param_dtype)[None]
        elif self.planar:
            w = self.param("kernel", _kernel_init,
                           (1, 2, 2, cin, self.features),
                           self.param_dtype)
        else:
            w = self.param("kernel", _kernel_init,
                           (2, 2, 2, cin, self.features),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        if self.dim == 3 and not self.planar:
            return _ff64.upconv222_f64in(
                chunks, acts.inv, acts.shift, w, bias, self.H,
                self.W, self.want_stats, self.act)
        return _ff64.upconv122_f64in(
            chunks, acts.inv, acts.shift, w, bias, self.H, self.W,
            self.want_stats, self.act)


class _Conv1FusedFlat(nn.Module):
    """First-layer planar 3x3 conv (C_in == 1) straight into a flat
    chunk with BN-stat side outputs (ops/flat_fused.conv1_bnstats_flat).
    Param tree matches nn.Conv (kernel (1,3,3,1,C) + bias).

    input_grad=False by default: the operand is the NETWORK INPUT,
    which carries no gradient in training (torch likewise defaults
    input.requires_grad=False), and the merged backward kernel's
    dgrad matmuls cannot be DCE'd by XLA — skipping them in-kernel
    saves the dgrad's MXU work. Set UNet(input_grad=True) when
    differentiating w.r.t. the input (saliency, adversarial)."""
    features: int
    H: int
    W: int
    dim: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    input_grad: bool = False
    per_sample: bool = False  # per-sample stats (group/instance norm)

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", _kernel_init,
                            _p2d((1, 3, 3, 1, self.features), self.dim),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return _ffu.conv1_bnstats_flat(x, _k2d(kernel, self.dim), bias,
                                       self.H, self.W, self.dtype,
                                       self.input_grad, self.per_sample)


class _FusedConv(nn.Module):
    """Fused prologue + planar 3x3 conv + stats side outputs
    (ops/flat_fused.conv_bnact_flat). Param tree matches nn.Conv.
    ``dup_weights`` implements 'add' merging: conv(u + e) ==
    conv_concat([u, e]) with duplicated weights."""
    features: int
    H: int
    W: int
    wrs: Tuple[int, ...]
    want_stats: bool
    act: str
    dup_weights: bool = False
    dim: int = 3
    d_halo: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, inv, shift):
        nin = len(xs)
        cin = nin * _fc.CC // (2 if self.dup_weights else 1)
        kernel = self.param("kernel", _kernel_init,
                            _p2d((1, 3, 3, cin, self.features),
                                 self.dim),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        k = _k2d(kernel, self.dim).astype(self.dtype)
        if self.dup_weights:
            k = jnp.concatenate([k, k], axis=3)
        return _ffu.conv_bnact_flat(
            tuple(xs), inv, shift, k, bias.astype(self.dtype),
            self.H, self.W, tuple(self.wrs), self.want_stats, self.act,
            self.d_halo)


class _FusedUpconv(nn.Module):
    """Fused (1,2,2)-stride-2 transposed conv into flat chunks + stats
    (ops/flat_fused.upconv_bn_flat). Param tree matches
    nn.ConvTranspose."""
    features: int
    H: int
    W: int
    want_stats: bool
    dim: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, dec):
        cin = dec.shape[-1]
        kernel = self.param("kernel", _kernel_init,
                            _p2d((1, 2, 2, cin, self.features),
                                 self.dim),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return _ffu.upconv_bn_flat(
            dec.astype(self.dtype),
            _k2d(kernel, self.dim).astype(self.dtype),
            bias.astype(self.dtype), self.H, self.W, self.want_stats)


class _FusedUpconvF64(nn.Module):
    """(1,2,2)-stride-2 transposed conv consuming the fused64 decoder
    level's FlatActs64 directly (prologue in kernel) — no materialize
    seam (ops/flat_fused64.upconv122_from_flat64). Param tree matches
    nn.ConvTranspose."""
    features: int
    H: int
    W: int
    want_stats: bool
    act: str
    dim: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, acts):
        kernel = self.param("kernel", _kernel_init,
                            _p2d((1, 2, 2, _ff64.CC64, self.features),
                                 self.dim),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return _ff64.upconv122_from_flat64(
            acts.chunks[0], acts.inv, acts.shift,
            _k2d(kernel, self.dim), bias,
            self.H, self.W, self.want_stats, self.act)


class _VupUpconv(nn.Module):
    """Owns the (1,2,2) upconv parameters for the vup fast path (same
    param tree as _FusedUpconvF64 under name='upconv', so checkpoints
    stay executor-independent). ``stats`` runs the stats-only carry
    pass (ops/flat_fused64.upconv122_stats_from_flat64 — the upconv
    output itself is never materialized; the vup merge conv recomputes
    it in its prologue); ``wb`` exposes the kernel/bias for that merge
    conv."""
    features: int
    H: int
    W: int
    dim: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.kernel = self.param("kernel", _kernel_init,
                                 _p2d((1, 2, 2, _ff64.CC64,
                                       self.features), self.dim),
                                 self.param_dtype)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), self.param_dtype)

    def wb(self):
        return _k2d(self.kernel, self.dim), self.bias

    def stats(self, acts, want_stats, act):
        w, b = self.wb()
        return _ff64.upconv122_stats_from_flat64(
            acts.chunks[0], acts.inv, acts.shift, w, b,
            self.H, self.W, want_stats, act)


class _FusedConvVup(nn.Module):
    """Decoder merge conv with a VIRTUAL upconv chunk
    (ops/flat_fused.conv_bnact_flat_vup): chunk 0 is recomputed
    in-kernel from the deeper level's FlatActs64 carry, so the
    materialized upconv output never exists in HBM. Param tree matches
    _FusedConv under name='conv1'."""
    features: int
    H: int
    W: int
    wrs: Sequence[int]
    want_stats: bool
    act: str
    act_c: str
    dim: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, acts, wu, bu, xs, inv, shift):
        nin = 1 + len(xs)
        cin = nin * _fc.CC
        kernel = self.param("kernel", _kernel_init,
                            _p2d((1, 3, 3, cin, self.features),
                                 self.dim),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        k = _k2d(kernel, self.dim).astype(self.dtype)
        return _ffu.conv_bnact_flat_vup(
            acts.chunks[0], acts.inv, acts.shift, wu, bu, tuple(xs),
            inv, shift, k, bias.astype(self.dtype), self.H, self.W,
            tuple(self.wrs), self.want_stats, self.act, self.act_c)


class _FusedHead(nn.Module):
    """Prologue + 1x1 conv head from flat chunks (XLA; the prologue
    fuses into the einsum). Param tree matches nn.Conv((1,1,1))."""
    features: int
    H: int
    W: int
    act: str
    dim: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    out_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, chunks, inv, shift):
        cin = _fc.CC * len(chunks)
        kernel = self.param("kernel", _kernel_init,
                            _p2d((1, 1, 1, cin, self.features),
                                 self.dim),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return _ffu.head_bnact_from_flat(
            chunks, inv, shift,
            _k2d(kernel, self.dim).astype(self.dtype),
            bias.astype(self.dtype), self.H, self.W, self.act,
            out_dtype=self.out_dtype)


class _FusedHead64(nn.Module):
    """Prologue + 1x1 conv head from flat64 chunks (XLA GEMM; the
    prologue fuses into the einsum) — used when the decoder ends at a
    C=64/128 level (start_filts=64 models), replacing the
    materialize-then-conv seam. Param tree matches nn.Conv((1,1,1))."""
    features: int
    H: int
    W: int
    act: str
    dim: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    out_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, chunks, inv, shift):
        cin = _ff64.CC64 * len(chunks)
        kernel = self.param("kernel", _kernel_init,
                            _p2d((1, 1, 1, cin, self.features),
                                 self.dim),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return _ff64.head_bnact_from_flat64(
            chunks, inv, shift,
            _k2d(kernel, self.dim).astype(self.dtype),
            bias.astype(self.dtype), self.H, self.W, self.act,
            out_dtype=self.out_dtype)


class DownConv(nn.Module):
    """Two convolutions + optional max-pool. Reference unet.py:202-253."""
    out_channels: int
    pooling: bool = True
    planar: bool = False
    activation: Union[str, Callable] = "relu"
    normalization: Optional[str] = "batch"
    full_norm: bool = True
    dim: int = 3
    conv_mode: str = "same"
    flat: bool = False
    fused: bool = False
    fused64: bool = False
    pool_form: str = "dense5"  # 'compact32': emit the pool's compact
    #                            form for a fused64 next level
    tile: int = 0   # dim=2 H-tiling slab height (0 = untiled)
    input_grad: bool = False   # see _Conv1FusedFlat
    # Mapped (shard_map) batch-axis name for cross-shard batch-norm
    # statistics (parallel/shard_step); None outside shard_map.
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        ks = conv_kernel(3, self.dim, self.planar)
        padding = "SAME" if self.conv_mode == "same" else "VALID"
        act = get_activation(self.activation)
        norm_kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                       axis_name=self.axis_name)

        if self.fused64:
            # Fully fused C=64 executor (ops/flat_fused64.py):
            # conv1 -> BN -> act -> conv2 -> BN -> act -> pool, all
            # kernel-resident in the flat64 chunk layout. kd=3 for 3D
            # levels; kd=1 (planar conv + (1,2,2) pool) for planar
            # levels and 2D models (dim=2 lifts to a D-tiled 5D view).
            kd = 1 if (self.planar or self.dim == 2) else 3
            tiled = self.dim == 2 and self.tile > 0
            if isinstance(x, _ff64.PoolCompact32):
                # The L0 pool's compact output feeds conv1 directly
                # (in-kernel lane shuffle) — no XLA relayout seam.
                H, W = x.H, x.W
                B, Dd = x.chunks[0].shape[0], x.chunks[0].shape[1]
                cin = 32
                xs0 = x.chunks
                forms = ("pool32",)
            else:
                if self.dim == 2:
                    x = _lift2d(x, self.tile)
                H, W = x.shape[2], x.shape[3]
                B, Dd = x.shape[0], x.shape[1]
                cin = x.shape[-1]
                xs0 = _ff64.to_flat64(x.astype(self.dtype))
                forms = ("flat64",) * len(xs0)
            count = B * Dd * H * W
            C = self.out_channels
            n = C // _ff64.CC64
            kind, ngroups = norm_kind(self.normalization, C)
            aname = _act_name(self.activation)
            # group/instance norm: the conv ops key per-sample stat
            # emission off the PROLOGUE rank, so conv1's identity
            # prologue must carry the batch axis too.
            id_inv, id_shift = identity_prologue(
                len(xs0), B if kind == "group" else None)
            nidx = 0
            pro = functools.partial(
                _stats_prologue, kind, ngroups,
                fold=_ff64.fold_lane_stats64, count=count,
                spatial=Dd * H * W, n=n, B=B,
                axis_name=self.axis_name, train=train, cc=_ff64.CC64)
            want1 = _want_stats(kind, normed=self.full_norm,
                                train=train)
            y1, st1 = _FusedConv64(C, H, W, cin_real=cin,
                                   want_stats=want1, act="linear",
                                   forms=forms, kd=kd, dim=self.dim,
                                   d_halo=tiled,
                                   dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="conv1")(xs0, id_inv, id_shift)
            inv1, shift1, nidx = pro(st1, nidx=nidx,
                                     normed=self.full_norm)
            want2 = _want_stats(kind, normed=True, train=train)
            y2, st2 = _FusedConv64(C, H, W, cin_real=C,
                                   want_stats=want2, act=aname,
                                   kd=kd, dim=self.dim,
                                   d_halo=tiled,
                                   dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="conv2")(y1, inv1, shift1)
            inv2, shift2, nidx = pro(st2, nidx=nidx)
            if self.pooling:
                # Skip routed through the pool primitive: its cotangent
                # is summed into dx in-kernel (no XLA add_any seam).
                poolfn = (_ff64.pool122_bnact_flat64_skip if kd == 1
                          else _ff64.pool222_bnact_flat64_skip)
                y, skip = poolfn(y2, inv2, shift2, H, W, C, aname)
                acts = _ff64.FlatActs64(tuple(skip), inv2, shift2)
            else:
                acts = _ff64.FlatActs64(y2, inv2, shift2)
                y = _ff64.materialize_flat_acts64(y2, inv2, shift2,
                                                  H, W, C, aname)
            if self.dim == 2:
                y = _drop2d(y)
            return y, acts

        if self.fused:
            # Fully fused flat executor (ops/flat_fused.py): conv1 in
            # XLA (small C_in), then BN-stats/apply/act/conv/pool all
            # kernel-resident — zero full-resolution XLA seams.
            # dim=2 models run as planar H-slabs (_lift2d; d_halo
            # strips when tiled).
            tiled = self.dim == 2 and self.tile > 0
            if self.dim == 2:
                x = _lift2d(x, self.tile)
            H, W = x.shape[2], x.shape[3]
            B, Dd = x.shape[0], x.shape[1]
            count = B * Dd * H * W
            spatial = Dd * H * W
            C = self.out_channels
            n = C // _fc.CC
            kind, ngroups = norm_kind(self.normalization, C)
            aname = _act_name(self.activation)
            nidx = 0
            pro = functools.partial(
                _stats_prologue, kind, ngroups,
                fold=_ffu.fold_lane_stats, count=count, spatial=spatial,
                n=n, B=B, axis_name=self.axis_name, train=train,
                cc=_fc.CC)
            if x.shape[-1] == 1 and C == _fc.CC and W <= 128 \
                    and not tiled:
                # Fully fused conv1: direct Pallas conv from the raw
                # input into the flat chunk + stats side outputs — no
                # XLA im2col/layout seams (ops/flat_fused.py conv1).
                xs1, st1 = _Conv1FusedFlat(
                    C, H, W, dim=self.dim, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    input_grad=self.input_grad,
                    per_sample=kind == "group", name="conv1")(x)
                wrs1 = (0,)
                inv1, shift1, nidx = pro(st1, nidx=nidx,
                                         normed=self.full_norm)
            else:
                # conv1 runs on the UNTILED image (its own H-taps must
                # cross slab boundaries), then the dense output is
                # re-sliced into slabs for the kernel-resident chain.
                xin = (x.reshape(B, 1, Dd * H, W, x.shape[-1])
                       if tiled else x)
                y1 = _Im2colConv(C, dim=self.dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="conv1")(xin)
                if tiled:
                    y1 = y1.reshape(B, Dd, H, W, C)
                st1 = (_ffu.channel_stats_dense(y1, kind == "group")
                       if self.full_norm and kind != "none" else None)
                inv1, shift1, nidx = pro(st1, fold=lambda v: v,
                                         nidx=nidx,
                                         normed=self.full_norm)
                if C == _fc.CC and _ffu.dense_rows_ok(W):
                    xs1 = (_ffu.as_dense_rows(y1),)
                    wrs1 = (W * _fc.CC // 128,)
                else:
                    xs1 = _fc.to_flat(y1)
                    wrs1 = (0,) * n
            want2 = _want_stats(kind, normed=True, train=train)
            ys2, st2 = _FusedConv(C, H, W, wrs=wrs1, want_stats=want2,
                                  act=aname, dim=self.dim,
                                  d_halo=tiled,
                                  dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="conv2")(xs1, inv1, shift1)
            inv2, shift2, nidx = pro(st2, nidx=nidx)
            if self.pooling:
                # Route the skip through the pool primitive
                # (pool_bnact_flat_skip): single consumer for ys2, so
                # the decoder's skip cotangent is summed into dx
                # in-kernel instead of a chunk-sized XLA add_any.
                form = ("compact32" if self.pool_form == "compact32"
                        else "dense5")
                y, skip = _ffu.pool_bnact_flat_skip(
                    ys2, inv2, shift2, H, W, (0,) * n, aname, form)
                if form == "compact32":
                    y = _ff64.PoolCompact32(y, H // 2, W // 2)
                acts = _ffu.FlatActs(tuple(skip), inv2, shift2)
            else:
                acts = _ffu.FlatActs(ys2, inv2, shift2)
                y = _ffu.materialize_flat_acts(ys2, inv2, shift2, H, W,
                                               aname)
            if self.dim == 2 and isinstance(y, jnp.ndarray):
                y = _drop2d(y)
            return y, acts

        if self.flat:
            # Flat-layout executor (ops/flat_conv.py): everything at
            # this level's full resolution stays in the flat layout —
            # no 5D materialization (a single seam costs ~7.5 ms at the
            # headline L0 size). Norm names mirror the non-flat path's
            # flax auto-naming for checkpoint interop.
            H, W = x.shape[2], x.shape[3]
            if x.shape[-1] <= 4:
                chunks = _Conv1IntoFlat(self.out_channels, H, W,
                                        dtype=self.dtype,
                                        param_dtype=self.param_dtype,
                                        name="conv1")(x)
            else:
                y = nn.Conv(self.out_channels, ks, padding=padding,
                            kernel_init=_kernel_init, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="conv1")(x)
                chunks = _fc.to_flat(y)
            nidx = 0
            if self.full_norm and self.normalization == "batch":
                chunks = FlatBatchNorm(axis_name=self.axis_name, name=f"BatchNorm_{nidx}")(
                    chunks, H=H, W=W, use_running_average=not train)
                nidx += 1
            chunks = _flat_act(act, chunks)
            chunks = _FlatConv(self.out_channels, 1, H, W,
                               dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="conv2")(chunks)
            if self.normalization == "batch":
                chunks = FlatBatchNorm(axis_name=self.axis_name, name=f"BatchNorm_{nidx}")(
                    chunks, H=H, W=W, use_running_average=not train)
            chunks = _flat_act(act, chunks)
            y = (_fc.pool_flat(chunks, H, W) if self.pooling
                 else _fc.from_flat(chunks, H, W, padded=True))
            return y, chunks

        y = nn.Conv(self.out_channels, ks, padding=padding,
                    kernel_init=_kernel_init, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(x)
        y = checkpoint_name(y, "conv_out")
        if self.full_norm:
            y = apply_norm(get_normalization(self.normalization, **norm_kw),
                           y, train=train)
        y = act(y)
        y = nn.Conv(self.out_channels, ks, padding=padding,
                    kernel_init=_kernel_init, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(y)
        y = checkpoint_name(y, "conv_out")
        y = apply_norm(get_normalization(self.normalization, **norm_kw),
                       y, train=train)
        y = act(y)
        before_pool = y
        if self.pooling:
            y = _ceil_maxpool(y, pool_window(self.dim, self.planar))
        return y, before_pool


class ResizeConv(nn.Module):
    """2x resize + conv upsampling (anti-checkerboard). Reference
    unet.py:411-449."""
    out_channels: int
    kernel_size: int = 3
    planar: bool = False
    dim: int = 3
    upsampling_mode: str = "nearest"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        factor = pool_window(self.dim, self.planar)
        if self.upsampling_mode == "nearest":
            up = resize_nearest(x, factor)
        else:
            up = resize_linear(x, factor)
        if self.kernel_size == 3:
            ks = conv_kernel(3, self.dim, self.planar)
            pad = "SAME"
        elif self.kernel_size == 1:
            ks = (1,) * self.dim
            pad = "VALID"
        else:
            raise ValueError(
                f"kernel_size={self.kernel_size} not supported. Choose 1 or 3.")
        return nn.Conv(self.out_channels, ks, padding=pad,
                       kernel_init=_kernel_init, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv")(up)


class UpConv(nn.Module):
    """Upsample + merge skip + two convolutions. Reference
    unet.py:328-409."""
    in_channels: int
    out_channels: int
    merge_mode: str = "concat"
    up_mode: str = "transpose"
    planar: bool = False
    activation: Union[str, Callable] = "relu"
    normalization: Optional[str] = "batch"
    full_norm: bool = True
    dim: int = 3
    conv_mode: str = "same"
    attention: bool = False
    flat: bool = False
    fused: bool = False
    fused64: bool = False
    flat_hw: Tuple[int, int] = (0, 0)
    tile: int = 0   # dim=2 H-tiling slab height (0 = untiled)
    # Mapped (shard_map) batch-axis name for cross-shard batch-norm
    # statistics (parallel/shard_step); None outside shard_map.
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, enc, dec, train: bool = True):
        ks = conv_kernel(3, self.dim, self.planar)
        padding = "SAME" if self.conv_mode == "same" else "VALID"
        act = get_activation(self.activation)
        norm_kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                       axis_name=self.axis_name)

        if self.fused64:
            # Fully fused C=64 decoder level: stride-2 upconv -> BN
            # -> act -> concat skip -> conv1 -> BN -> act -> conv2 ->
            # BN -> act, kernel-resident (ops/flat_fused64.py). enc is
            # FlatActs64; dec is the deeper level's dense tensor.
            # kd=1 (planar (1,2,2) upconv) for planar levels / dim=2.
            kd = 1 if (self.planar or self.dim == 2) else 3
            tiled = self.dim == 2 and self.tile > 0
            from64 = isinstance(dec, _ff64.FlatActs64)
            if self.dim == 2 and not from64:
                dec = _lift2d(dec, self.tile // 2)
            H, W = self.flat_hw
            C = self.out_channels
            n = C // _ff64.CC64
            if from64:
                B, D1 = dec.chunks[0].shape[0], dec.chunks[0].shape[1]
            else:
                B, D1 = dec.shape[0], dec.shape[1]
            Dd = D1 * (1 if kd == 1 else 2)
            count = B * Dd * H * W
            kind, ngroups = norm_kind(self.normalization, C)
            aname = _act_name(self.activation)
            nidx = 0
            pro = functools.partial(
                _stats_prologue, kind, ngroups,
                fold=_ff64.fold_lane_stats64, count=count,
                spatial=Dd * H * W, n=n, B=B,
                axis_name=self.axis_name, train=train, cc=_ff64.CC64)
            wantu = _want_stats(kind, normed=self.full_norm,
                                train=train)
            if from64:
                # Deeper carry is a fused64 level: upconv straight
                # from its chunks (prologue in kernel, no materialize
                # seam — ops/flat_fused64.upconv222_f64in).
                yu, stu = _FusedUpconv64F(C, H, W, want_stats=wantu,
                                          act=aname,
                                          planar=self.planar,
                                          dim=self.dim,
                                          dtype=self.dtype,
                                          param_dtype=self.param_dtype,
                                          name="upconv")(dec)
            else:
                yu, stu = _FusedUpconv64(C, H, W, want_stats=wantu,
                                         planar=self.planar,
                                         dim=self.dim,
                                         dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name="upconv")(dec)
            invu, shiftu, nidx = pro(stu, nidx=nidx,
                                     normed=self.full_norm)
            xs = tuple(yu) + tuple(enc.chunks)
            inv_s = jnp.concatenate([invu, enc.inv])
            shift_s = jnp.concatenate([shiftu, enc.shift])
            want1 = _want_stats(kind, normed=self.full_norm,
                                train=train)
            y1, st1 = _FusedConv64(C, H, W, cin_real=len(xs) * _ff64.CC64,
                                   want_stats=want1, act=aname,
                                   kd=kd, dim=self.dim, d_halo=tiled,
                                   dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="conv1")(xs, inv_s, shift_s)
            inv1, shift1, nidx = pro(st1, nidx=nidx,
                                     normed=self.full_norm)
            want2 = _want_stats(kind, normed=True, train=train)
            y2, st2 = _FusedConv64(C, H, W, cin_real=C,
                                   want_stats=want2, act=aname,
                                   kd=kd, dim=self.dim, d_halo=tiled,
                                   dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="conv2")(y1, inv1, shift1)
            inv2, shift2, nidx = pro(st2, nidx=nidx)
            return _ff64.FlatActs64(y2, inv2, shift2), None

        if self.fused:
            # Fully fused flat executor: enc arrives as FlatActs (raw
            # chunks + prologue); upconv/convs are Pallas kernels with
            # the BN-apply + act of their inputs fused into the load.
            tiled = self.dim == 2 and self.tile > 0
            if self.dim == 2 and not isinstance(dec, _ff64.FlatActs64):
                dec = _lift2d(dec, self.tile // 2)
            H, W = self.flat_hw
            C = self.out_channels
            n = C // _fc.CC
            if isinstance(dec, _ff64.FlatActs64):
                B, Dd = dec.chunks[0].shape[0], dec.chunks[0].shape[1]
            else:
                B, Dd = dec.shape[0], dec.shape[1]
            count = B * Dd * H * W
            kind, ngroups = norm_kind(self.normalization, C)
            aname = _act_name(self.activation)
            nidx = 0
            pro = functools.partial(
                _stats_prologue, kind, ngroups,
                fold=_ffu.fold_lane_stats, count=count,
                spatial=Dd * H * W, n=n, B=B, axis_name=self.axis_name,
                train=train, cc=_fc.CC)
            wantu = _want_stats(kind, normed=self.full_norm,
                                train=train)
            vup_ok = (isinstance(dec, _ff64.FlatActs64) and not tiled
                      and self.merge_mode != "add" and _vup_on())
            if vup_ok:
                # vup fast path: no materialized upconv chunk — the
                # merge conv recomputes it from the carry in-kernel;
                # stats (when the prologue needs them) come from one
                # carry-sized stats pass. Same param tree and BN-state
                # slot order as the materializing branch.
                up = _VupUpconv(C, H, W, dim=self.dim,
                                dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="upconv")
                stu = up.stats(dec, wantu, aname) if wantu else None
                invu, shiftu, nidx = pro(stu, nidx=nidx,
                                         normed=self.full_norm)
                inv_s = jnp.concatenate([invu, enc.inv])
                shift_s = jnp.concatenate([shiftu, enc.shift])
                want1 = _want_stats(kind, normed=self.full_norm,
                                    train=train)
                wu, bu = up.wb()
                y1, st1 = _FusedConvVup(
                    C, H, W, wrs=(0,) * (1 + len(enc.chunks)),
                    want_stats=want1, act=aname, act_c=aname,
                    dim=self.dim, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="conv1")(dec, wu, bu, tuple(enc.chunks),
                                  inv_s, shift_s)
            else:
                if isinstance(dec, _ff64.FlatActs64):
                    yu, stu = _FusedUpconvF64(C, H, W, want_stats=wantu,
                                              act=aname, dim=self.dim,
                                              dtype=self.dtype,
                                              param_dtype=self.param_dtype,
                                              name="upconv")(dec)
                else:
                    yu, stu = _FusedUpconv(C, H, W, want_stats=wantu,
                                           dim=self.dim,
                                           dtype=self.dtype,
                                           param_dtype=self.param_dtype,
                                           name="upconv")(dec)
                invu, shiftu, nidx = pro(stu, nidx=nidx,
                                         normed=self.full_norm)
                xs = tuple(yu) + tuple(enc.chunks)
                inv_s = jnp.concatenate([invu, enc.inv])
                shift_s = jnp.concatenate([shiftu, enc.shift])
                want1 = _want_stats(kind, normed=self.full_norm,
                                    train=train)
                y1, st1 = _FusedConv(C, H, W, wrs=(0,) * len(xs),
                                     want_stats=want1, act=aname,
                                     dup_weights=self.merge_mode == "add",
                                     dim=self.dim, d_halo=tiled,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name="conv1")(xs, inv_s, shift_s)
            inv1, shift1, nidx = pro(st1, nidx=nidx,
                                     normed=self.full_norm)
            want2 = _want_stats(kind, normed=True, train=train)
            y2, st2 = _FusedConv(C, H, W, wrs=(0,) * n, want_stats=want2,
                                 act=aname, dim=self.dim,
                                 d_halo=tiled,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="conv2")(y1, inv1, shift1)
            inv2, shift2, nidx = pro(st2, nidx=nidx)
            return _ffu.FlatActs(y2, inv2, shift2), None

        if self.flat:
            # Flat-layout executor: enc arrives as flat chunks; the
            # upsampling conv runs in XLA on the (small) deeper-level
            # tensor, everything at this level's full resolution runs
            # on dense flat chunks.
            H, W = self.flat_hw
            up_chunks = _UpconvToFlat(self.out_channels, H, W,
                                      dtype=self.dtype,
                                      param_dtype=self.param_dtype,
                                      name="upconv")(dec)
            nidx = 0
            if self.full_norm and self.normalization == "batch":
                up_chunks = FlatBatchNorm(axis_name=self.axis_name, name=f"BatchNorm_{nidx}")(
                    up_chunks, H=H, W=W, use_running_average=not train)
                nidx += 1
            up_chunks = _flat_act(act, up_chunks)
            if self.merge_mode == "concat":
                mrg = tuple(up_chunks) + tuple(enc)
            else:
                mrg = tuple(u + e for u, e in zip(up_chunks, enc))
            y = _FlatConv(self.out_channels, 1, H, W, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="conv1")(mrg)
            if self.full_norm and self.normalization == "batch":
                y = FlatBatchNorm(axis_name=self.axis_name, name=f"BatchNorm_{nidx}")(
                    y, H=H, W=W, use_running_average=not train)
                nidx += 1
            y = _flat_act(act, y)
            y = _FlatConv(self.out_channels, 1, H, W, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="conv2")(y)
            if self.normalization == "batch":
                y = FlatBatchNorm(axis_name=self.axis_name, name=f"BatchNorm_{nidx}")(
                    y, H=H, W=W, use_running_average=not train)
            y = _flat_act(act, y)
            return y, None  # flat chunks; UNet handles the head/seam

        # Upsample decoder features
        if self.up_mode == "transpose":
            window = pool_window(self.dim, self.planar)
            updec = nn.ConvTranspose(
                self.out_channels, window, strides=window,
                kernel_init=_kernel_init, dtype=self.dtype,
                param_dtype=self.param_dtype, name="upconv")(dec)
        elif self.up_mode.startswith("resizeconv"):
            mode = "nearest" if "nearest" in self.up_mode else "linear"
            kernel_size = 1 if self.up_mode.endswith("1") else 3
            updec = ResizeConv(self.out_channels, kernel_size=kernel_size,
                               planar=self.planar, dim=self.dim,
                               upsampling_mode=mode, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="upconv")(dec)
        else:
            raise ValueError(f"Unknown up_mode {self.up_mode!r}")

        enc, updec = autocrop(enc, updec)
        att = None
        if self.attention:
            enc, att = GridAttention(
                in_channels=enc.shape[-1], gating_channels=dec.shape[-1],
                dim=self.dim, dtype=self.dtype,
                param_dtype=self.param_dtype, name="attention")(enc, dec)
        if self.full_norm:
            updec = apply_norm(
                get_normalization(self.normalization, **norm_kw), updec,
                train=train)
        updec = act(updec)
        if self.merge_mode == "concat":
            mrg = jnp.concatenate([updec, enc], axis=-1)
        else:
            mrg = updec + enc
        y = nn.Conv(self.out_channels, ks, padding=padding,
                    kernel_init=_kernel_init, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(mrg)
        y = checkpoint_name(y, "conv_out")
        if self.full_norm:
            y = apply_norm(get_normalization(self.normalization, **norm_kw),
                           y, train=train)
        y = act(y)
        y = nn.Conv(self.out_channels, ks, padding=padding,
                    kernel_init=_kernel_init, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(y)
        y = checkpoint_name(y, "conv_out")
        y = apply_norm(get_normalization(self.normalization, **norm_kw),
                       y, train=train)
        y = act(y)
        return y, att


class UNet(nn.Module):
    """Configurable 2D/3D U-Net for dense prediction on (an)isotropic
    volumetric data. See module docstring; reference unet.py:550-935.

    Input: channels-last ``(N, [D,] H, W, C_in)``.
    Output: raw logits ``(N, [D,] H, W, out_channels)`` (apply softmax in
    the loss, reference unet.py:911).
    """
    in_channels: int = 1
    out_channels: int = 2
    n_blocks: int = 3
    start_filts: int = 32
    up_mode: str = "transpose"
    merge_mode: str = "concat"
    planar_blocks: Sequence[int] = ()
    batch_norm: str = "unset"  # deprecated alias guard (unet.py:768-778)
    attention: bool = False
    activation: Union[str, Callable] = "relu"
    normalization: str = "batch"
    full_norm: bool = True
    dim: int = 3
    conv_mode: str = "same"
    checkpointing: Union[bool, str] = False
    # Flat-layout Pallas executor for full-resolution planar levels
    # (ops/flat_conv.py). The conv kernels beat XLA convs 2.5-3.3x in
    # isolation (docs/design.md round-2 notes), but XLA's layout glue
    # at the flat<->5D seams (pool/upconv/head) currently costs more
    # than the kernels save, so 'auto' resolves to OFF until those are
    # kernel-fused as well. True forces the flat path (tests use the
    # interpreter off-TPU); False disables.
    pallas_flat: Union[bool, str] = "auto"
    # dim=2 H-tiling override: force the L0 slab height instead of the
    # auto plan (_plan_tile2d). Tests use this to exercise the d_halo
    # path at small shapes; production leaves it None.
    tile2d: Optional[int] = None
    # Name of a mapped (shard_map) batch axis for explicit data
    # parallelism: batch-norm statistics are psum'd over it so
    # per-shard fused kernels produce GLOBAL batch statistics,
    # matching the GSPMD executor's semantics. Set by
    # Trainer(mesh=...) via model.clone(axis_name='data') — the model
    # must then be applied inside jax.shard_map over that axis (a bare
    # apply raises an unbound-axis error). None (default) outside
    # shard_map.
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # Output logit dtype. None = float32 (reference semantics). For
    # bf16 models, jnp.bfloat16 halves the HBM traffic of the logit
    # volume (written once, read by the loss fwd+bwd) — the losses in
    # modules/loss.py upcast internally, so training math stays f32,
    # and the Predictor upcasts before softmax. None resolves to bf16
    # for bf16 models (measured on the v5e: -0.45 ms/step on the
    # headline workload with a bitwise-equal-through-upcast loss
    # trajectory; reference AMP likewise emits half-precision logits
    # under autocast) and f32 otherwise; pass jnp.float32 explicitly
    # to force f32 logits from a bf16 model.
    logit_dtype: Optional[Dtype] = None
    # Compute the gradient w.r.t. the network INPUT through the fused
    # first-layer conv. False (the default, matching torch's
    # input.requires_grad=False) skips the first conv's dgrad matmuls
    # inside the merged backward kernel, where XLA cannot DCE them.
    # Set True for saliency maps / adversarial training / composing
    # the UNet behind differentiable preprocessing — with False, a
    # jax.grad w.r.t. the input returns ZEROS on the fused path.
    input_grad: bool = False

    def _logit_dtype(self):
        if self.logit_dtype is not None:
            return self.logit_dtype
        return jnp.bfloat16 if self.dtype == jnp.bfloat16 \
            else jnp.float32

    def _flat_level_ok(self, planar: bool, channels: int, H: int,
                       W: int) -> bool:
        """Is the (semi-fused) flat-layout executor applicable here?"""
        if self.pallas_flat is not True:
            # 'auto' resolves to the FUSED executor where applicable
            # (_flat_fused_ok); the semi-fused path (XLA seams) is
            # never profitable on its own (docs/design.md round-2).
            return False
        act_ok = isinstance(self.activation, str) and \
            self.activation in _FLAT_SAFE_ACTS
        return (self.dim == 3 and self.conv_mode == "same" and planar
                and not self.attention
                and self.normalization in ("batch", "none")
                and act_ok
                and channels % _fc.CC == 0 and channels <= 64
                and H % 2 == 0 and W % 2 == 0)

    def _flat_fused_ok(self, planar: bool, channels: int, H: int,
                       W: int, merge: bool = False,
                       train: bool = True) -> bool:
        """Is the FULLY FUSED flat executor applicable here?

        Requirements beyond _flat_level_ok: C == 32 (dense-row adapter,
        cin-64 upconv), W % 8 == 0 (pooled dense-row alignment) and an
        activation with an in-kernel derivative. 'auto' engages this
        path on TPU backends (measured faster than the XLA executor);
        off-TPU it stays off (interpret mode is for tests only).

        The per-chunk row bound is train/eval dependent
        (_FUSED_ROWS_TRAIN/_EVAL): backward kernels carry roughly
        twice the forward's live slabs, so a level can run fused
        inference while training falls back to XLA at the same shape.
        merge (decoder concat) is accepted for call-site symmetry with
        _flat_fused64_ok; the calibrated per-chunk bound already
        covers the measured 2-chunk merge cases.
        """
        if self.pallas_flat is False:
            return False
        if self.pallas_flat == "auto" and (
                jax.default_backend() != "tpu"
                or self.dtype != jnp.bfloat16):
            # bf16-only in 'auto' mode — see _flat_fused64_ok.
            return False
        act_ok = isinstance(self.activation, str) and \
            self.activation in ("relu", "leaky", "lrelu")
        bound = _FUSED_ROWS_TRAIN if train else _FUSED_ROWS_EVAL
        return ((planar or self.dim == 2)
                and self.conv_mode == "same"
                and not self.attention
                and self._norm_fused_ok(channels)
                and act_ok and channels == _fc.CC
                and H % 2 == 0 and W % 8 == 0
                # scoped-VMEM bound on per-chunk flat rows
                and H * ((W + _fc.W_OFF) // _fc.JG) <= bound)

    def _norm_fused_ok(self, channels: int) -> bool:
        """Normalizations the fused executors cover: batch/none, and
        group/instance via per-sample kernel statistics (round 4 —
        b-indexed stat blocks + FlatGNStats; reference
        models/unet.py:77-111 get_normalization)."""
        try:
            kind, ngroups = norm_kind(self.normalization, channels)
        except ValueError:
            return False
        if kind == "group":
            # invalid group counts fall back to the XLA path, which
            # raises flax's descriptive GroupNorm error
            return channels % ngroups == 0
        return True

    def _flat_fused64_ok(self, planar: bool, channels: int, H: int,
                         W: int, D: int, pooling: bool,
                         merge: bool = False, train: bool = True,
                         tiled: bool = False) -> bool:
        """Is the fused C=64 executor applicable here?
        (ops/flat_fused64.py — kd=3 for 3D levels like the headline
        model's L1; kd=1 for planar C=64 levels and 2D models.)

        merge=True for decoder levels: their conv1 consumes the concat
        of upconv output and skip (2x the chunks). The last check is a
        per-kernel scoped-VMEM byte estimate mirroring the kernels'
        BlockSpecs + scratch (_ff64.conv64_vmem_bytes — the earlier
        row-count heuristic ignored the packed-weight blocks, which
        scale with nin*nout*kd and dominate for 4-chunk kd=3 merge
        convs: a C=128 decoder merge at (44,44,44) compiled at 17.35 MB
        scoped VMEM, 1.35 MB over the 16 MB limit, while its row count
        passed the old bound). The estimate is validated against three
        measured v5e points (see the estimator docstring)."""
        if self.pallas_flat is False:
            return False
        if self.pallas_flat == "auto" and (
                jax.default_backend() != "tpu"
                or self.dtype != jnp.bfloat16):
            # 'auto' engages only for bf16 on TPU: the f32 kernels'
            # VMEM working set exceeds the 16 MB scoped limit at
            # production sizes (and f32 MXU rate is half anyway).
            return False
        act_ok = isinstance(self.activation, str) and \
            self.activation in ("relu", "leaky", "lrelu")
        kd1 = planar or self.dim == 2
        nch = channels // _ff64.CC64             # chunks per tensor
        if (self.pallas_flat == "auto" and channels == 2 * _ff64.CC64
                and D * H * W < _FUSED128_MIN_VOX):
            # C=128 kernels lose to XLA at small levels (measured: the
            # headline model's 22^3 L2 ran 6 -> ~15 ms fused, costing
            # the whole step 51 -> 60 ms). 'auto' engages them only
            # when the level carries enough voxels to amortize the
            # per-block kernel overheads; pallas_flat=True forces.
            return False
        widest = 2 * nch if (merge and self.merge_mode == "concat") \
            else nch
        esize = 4 if self.dtype == jnp.float32 else 2
        if not self._norm_fused_ok(channels):
            return False
        # batch norm wants stats in training; group/instance norm
        # wants per-sample stats in training AND eval (no running
        # state) — size the VMEM estimate for whichever applies.
        kind = norm_kind(self.normalization, channels)[0]
        # Training backwards may run input-chunk-split (bwd_ki_split,
        # round 5): gate on the best feasible split's estimate — this
        # is what admits the C=128 4-chunk decoder merge to training.
        split = _ff64.bwd_ki_split(
            widest, nch, 1 if kd1 else 3, H, W, esize=esize,
            want_stats=kind != "none", tiled=tiled) if train else 1
        vmem = _ff64.conv64_vmem_bytes(
            widest, nch, 1 if kd1 else 3, H, W, esize=esize,
            want_stats=kind != "none", train=train,
            tiled=tiled, ki_split=split or 1)
        return (self.conv_mode == "same" and not self.attention
                and act_ok and channels in (_ff64.CC64, 2 * _ff64.CC64)
                and H % 2 == 0 and W % 2 == 0
                and (not pooling or kd1 or D % 2 == 0)
                # Interpret mode (CPU parity tests) has no scoped-VMEM
                # limit; the byte gate models the real chip only.
                and (_ff64._interpret()
                     or vmem + _ff64.VMEM_SLOP <= _ff64.VMEM_LIMIT))

    def _plan_tile2d(self, H0: int, W0: int, train: bool) -> int:
        """L0 slab height for 2D H-tiling: largest divisor of H0 that
        keeps every fused level's per-slab rows within the calibrated
        scoped-VMEM bound (_FUSED_ROWS_TRAIN/_EVAL; the backward
        kernels are the tight case, so training plans smaller slabs
        than inference). Each level's geometry is paired with the
        executor its channel count actually uses. Returns H0 when the
        whole image fits (untiled, no halo cost); 0 when no valid
        tiling exists."""
        bound = _FUSED_ROWS_TRAIN if train else _FUSED_ROWS_EVAL

        def fits(t: int) -> bool:
            w, tt = W0, t
            for i in range(self.n_blocks):
                ch = self.start_filts * (2 ** i)
                if tt < 2 or w < 4 or w % 2:
                    return True          # level declines anyway
                if ch == _fc.CC:
                    g = _fc.flat_geometry(2, w)[0]
                elif ch in (_ff64.CC64, 2 * _ff64.CC64):
                    g = _ff64.flat_geometry64(2, w)[0]
                else:
                    return True          # no fused executor deeper
                if tt * g > bound:
                    return False
                w, tt = w // 2, tt // 2
            return True

        if fits(H0):
            return H0
        t = (H0 - 1) & ~3                # slab % 4: L1 slab stays even
        while t >= 4:
            if H0 % t == 0 and fits(t):
                return t
            t -= 4
        return 0

    def _fused_decline_reason(self, planar: bool, channels: int,
                              H: int, W: int, D: int,
                              pooling: bool,
                              train: bool = True) -> str:
        """First reason the fused executors don't cover this level —
        logged so users learn they're on the (~2x slower) XLA path
        instead of silently falling back (round-2 review item)."""
        if self.pallas_flat == "auto" and jax.default_backend() != "tpu":
            return "backend is not TPU ('auto' engages on TPU only)"
        if self.pallas_flat == "auto" and self.dtype != jnp.bfloat16:
            return ("dtype is not bfloat16 (f32 working sets exceed the "
                    "16 MB VMEM limit at production sizes)")
        if self.conv_mode != "same":
            # Structural: the flat executors share one row geometry
            # between input and output chunks (same-size by
            # construction); valid convs shrink every spatial dim per
            # conv. Measured on the v5e (benchmark/coverage_bench.py
            # --conv-mode valid, bf16 8x(44,140,140)->(4,52,52)):
            # 101.1 ms/step, 68.3 M input-vox/s on the XLA path —
            # comparable per-input-voxel cost to the fused 'same'
            # headline (48.2 ms at 8x(44,88,88) = 56.3 MVox/s).
            return "conv_mode != 'same' (valid runs XLA; see " \
                   "docs/design.md coverage matrix)"
        if self.attention:
            return "attention=True is not kernel-fused"
        if not self._norm_fused_ok(channels):
            return (f"normalization {self.normalization!r} not fused "
                    f"(unknown name or C={channels} not divisible by "
                    f"the group count)")
        if not (isinstance(self.activation, str)
                and self.activation in ("relu", "leaky", "lrelu")):
            return f"activation {self.activation!r} has no fused deriv"
        if channels not in (_fc.CC, _ff64.CC64, 2 * _ff64.CC64):
            return (f"C={channels} has no fused executor "
                    f"(covered: C={_fc.CC} planar/2D, C={_ff64.CC64}, "
                    f"C={2 * _ff64.CC64})")
        if H % 2 != 0 or W % 2 != 0:
            return f"odd level shape H={H}, W={W}"
        if channels == _fc.CC and not (planar or self.dim == 2):
            return f"C={_fc.CC} executor is planar-only"
        if channels == _fc.CC and W % 8 != 0:
            return f"W={W} not 8-aligned (pooled dense rows)"
        if (self.pallas_flat == "auto" and channels == 2 * _ff64.CC64
                and D * H * W < _FUSED128_MIN_VOX):
            return (f"C=128 level too small for the fused executor "
                    f"({D * H * W} vox < {_FUSED128_MIN_VOX}; XLA "
                    f"measured faster — pallas_flat=True forces)")
        if channels == _ff64.CC64 and not planar and self.dim == 3 \
                and pooling and D % 2 != 0:
            return f"odd depth D={D} with (2,2,2) pooling"
        if channels == _fc.CC:
            bound = _FUSED_ROWS_TRAIN if train else _FUSED_ROWS_EVAL
            return (f"level VMEM working set too large "
                    f"({H * ((W + _fc.W_OFF) // _fc.JG)} per-chunk "
                    f"rows > {bound} "
                    f"{'train' if train else 'eval'} bound)")
        nch = channels // _ff64.CC64
        kd = 1 if (planar or self.dim == 2) else 3
        esize = 4 if self.dtype == jnp.float32 else 2
        wstats = norm_kind(self.normalization, channels)[0] != "none"

        def best_vmem(ni):
            s = (_ff64.bwd_ki_split(ni, nch, kd, H, W, esize=esize,
                                    want_stats=wstats) or 1) \
                if train else 1
            return _ff64.conv64_vmem_bytes(
                ni, nch, kd, H, W, esize=esize,
                want_stats=wstats, train=train, ki_split=s)

        vmem = best_vmem(nch)
        if vmem + _ff64.VMEM_SLOP <= _ff64.VMEM_LIMIT:
            # Encoder fits; the level was declined for decoder
            # coherence (see the planning loop).
            mv = best_vmem(2 * nch)
            return (f"decoder merge conv VMEM estimate too large "
                    f"({(mv + _ff64.VMEM_SLOP) / 2**20:.1f} MB > "
                    f"{_ff64.VMEM_LIMIT / 2**20:.0f} MB scoped limit; "
                    f"encoder-only fusion measured slower than XLA, "
                    f"so the whole level falls back)")
        return (f"level kernel VMEM estimate too large "
                f"({(vmem + _ff64.VMEM_SLOP) / 2**20:.1f} MB "
                f"> {_ff64.VMEM_LIMIT / 2**20:.0f} MB scoped limit "
                f"for the widest conv)")

    def _validate(self):
        if self.n_blocks < 1:
            raise ValueError("n_blocks must be > 0")
        if self.up_mode not in UP_MODES:
            raise ValueError(f'"{self.up_mode}" is not a valid mode for upsampling')
        if self.merge_mode not in MERGE_MODES:
            raise ValueError(
                f'"{self.merge_mode}" is not a valid mode for merging')
        if self.conv_mode not in CONV_MODES:
            raise ValueError(f'"{self.conv_mode}" is not a valid conv_mode')
        if self.dim not in (2, 3):
            raise ValueError("dim has to be 2 or 3")
        if len(self.planar_blocks) > self.n_blocks:
            raise ValueError(
                "planar_blocks can't be longer than n_blocks")
        if self.planar_blocks and (
                max(self.planar_blocks) >= self.n_blocks
                or min(self.planar_blocks) < 0):
            raise ValueError(
                "planar_blocks has invalid value range. All values have to "
                "be block indices, meaning integers between 0 and "
                f"n_blocks-1={self.n_blocks - 1}.")
        if self.batch_norm != "unset":
            raise RuntimeError(
                "The `batch_norm` option has been replaced with the more "
                "general `normalization` option.")

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        return self._unet_forward(x, train)

    def _unet_forward(self, x, train: bool):
        """Level-planned forward body. Undecorated so subclasses with
        their own ``@nn.compact __call__`` (models/resunet.py ResUNet —
        structurally a UNet when ``res_blocks == 0``) can delegate to
        the full executor planning, including the fused flat levels
        (flax allows one compact method per class, so the body cannot
        be shared via ``UNet.__call__`` directly)."""
        self._validate()
        if x.shape[-1] != self.in_channels:
            raise ValueError(
                f"Input has {x.shape[-1]} channels (last axis), model "
                f"expects {self.in_channels}. Input layout must be "
                "channels-last (N, [D,] H, W, C).")

        block_kw = dict(
            activation=self.activation, normalization=self.normalization,
            full_norm=self.full_norm, dim=self.dim,
            conv_mode=self.conv_mode, axis_name=self.axis_name,
            dtype=self.dtype, param_dtype=self.param_dtype)

        # Gradient checkpointing after each block (reference
        # forward_gradcp, unet.py:918-935) via flax's jax.checkpoint
        # lifting. static_argnums counts the module itself as 0.
        # checkpointing=True: full-block remat (max memory savings).
        # checkpointing='policy': save only conv outputs; norms and
        # activations are recomputed in the backward pass (trades cheap
        # VPU recompute for HBM activation traffic).
        remat_kw = {}
        if self.checkpointing == "policy":
            remat_kw["policy"] = \
                jax.checkpoint_policies.save_only_these_names("conv_out")
        DownCls = (nn.remat(DownConv, static_argnums=(2,), **remat_kw)
                   if self.checkpointing else DownConv)
        UpCls = (nn.remat(UpConv, static_argnums=(3,), **remat_kw)
                 if self.checkpointing else UpConv)

        # Plan per-level executors upfront from static shapes, so a
        # producer can emit its consumer's native format (the L0 pool
        # emits the compact32 form when L1 runs the fused64 executor).
        if self.dim == 3:
            pD, pH, pW = x.shape[1], x.shape[2], x.shape[3]
        else:
            pD, pH, pW = 1, x.shape[1], x.shape[2]
        # 2D H-tiling: big images run the fused executors as H-slabs
        # with halo strips (_lift2d / d_halo). tile0 is the L0 slab
        # height; each level's slab halves with its H.
        tile0 = 0
        if self.dim == 2 and self.pallas_flat is not False:
            t = self.tile2d or self._plan_tile2d(pH, pW, train)
            if t and t < pH:
                tile0 = t
        lvl_shape, lvl_fused, lvl_fused64, lvl_tile = [], [], [], []
        for i in range(self.n_blocks):
            planar_i = i in self.planar_blocks
            ch = self.start_filts * (2 ** i)
            pooling_i = i < self.n_blocks - 1
            gH = (tile0 >> i) if tile0 else pH   # fused-geometry H
            lvl_shape.append((pD, gH, pW))
            lvl_tile.append(gH if tile0 else 0)
            lvl_fused.append(self._flat_fused_ok(planar_i, ch, gH, pW,
                                                 train=train))
            # Level coherence: if this level's DECODER merge conv
            # would decline on the VMEM gate while the model would
            # otherwise fuse it (transpose + concat/add), run the
            # whole level on XLA — fusing only the encoder measured
            # SLOWER than pure XLA (v5e, sf=64 3-block model: 156 vs
            # 143 ms/step; the materialize-skip + XLA-decoder seams
            # eat the encoder kernels' win). Bottom level has no
            # decoder; non-transpose up modes never fuse decoders and
            # keep the (unmeasured) status-quo mix.
            dec_coherent = (
                i == self.n_blocks - 1
                or self.up_mode != "transpose"
                or self.merge_mode not in ("concat", "add")
                or self._flat_fused64_ok(
                    planar_i, ch, gH, pW, pD, False, merge=True,
                    train=train, tiled=bool(tile0)))
            lvl_fused64.append(
                (not lvl_fused[-1]) and dec_coherent
                and self._flat_fused64_ok(
                    planar_i, ch, gH, pW, pD, pooling_i,
                    train=train, tiled=bool(tile0)))
            if (self.pallas_flat is not False and not lvl_fused[-1]
                    and not lvl_fused64[-1]):
                reason = self._fused_decline_reason(
                    planar_i, ch, gH, pW, pD, pooling_i, train=train)
                key = (i, ch, pD, pH, pW, reason)
                if key not in _DECLINES_LOGGED:
                    _DECLINES_LOGGED.add(key)
                    # info on TPU (a user is actually losing ~2x on
                    # this level); debug elsewhere (CPU runs/tests
                    # would drown in 'backend is not TPU').
                    log = (logger.info
                           if jax.default_backend() == "tpu"
                           else logger.debug)
                    log("UNet level %d (C=%d, %dx%dx%d): fused flat "
                        "executor declined — %s; falling back to the "
                        "XLA executor for this level.",
                        i, ch, pD, pH, pW, reason)
            if pooling_i:
                pH, pW = -(-pH // 2), -(-pW // 2)
                if not planar_i and self.dim == 3:
                    pD = -(-pD // 2)

        encoder_outs = []
        encoder_hw = []   # (H, W) of each level (python ints, trace-time)
        outs = self.start_filts
        for i in range(self.n_blocks):
            pooling = i < self.n_blocks - 1
            planar = i in self.planar_blocks
            outs = self.start_filts * (2 ** i)
            _, H, W = lvl_shape[i]
            fused = lvl_fused[i]
            fused64 = (lvl_fused64[i]
                       and not isinstance(x, (tuple, _ffu.FlatActs,
                                              _ff64.FlatActs64)))
            flat = (not fused and not fused64) \
                and self._flat_level_ok(planar, outs, H, W)
            # Emit the pool's compact form when the next level consumes
            # it (fused64 conv1 with the single-chunk pool32 adapter).
            pool_form = ("compact32"
                         if (fused and pooling and outs == _fc.CC
                             and i + 1 < self.n_blocks
                             and lvl_fused64[i + 1])
                         else "dense5")
            down = DownCls(outs, pooling=pooling, planar=planar,
                           flat=flat, fused=fused, fused64=fused64,
                           pool_form=pool_form, tile=lvl_tile[i],
                           input_grad=self.input_grad,
                           name=f"down_{i}", **block_kw)
            x, before_pool = down(x, train)
            encoder_outs.append(before_pool)
            encoder_hw.append((H, W))

        up_hw = None
        for i in range(self.n_blocks - 1):
            ins = outs
            outs = ins // 2
            level = self.n_blocks - 2 - i
            planar = level in self.planar_blocks
            before_pool = encoder_outs[-(i + 2)]
            H, W = encoder_hw[level]
            skip_fused = isinstance(before_pool, _ffu.FlatActs)
            skip_fused64 = isinstance(before_pool, _ff64.FlatActs64)
            skip_flat = (not skip_fused) and isinstance(before_pool, tuple)
            # The upsampled decoder tensor must match the skip exactly
            # for the crop-free flat path (even dims guarantee it).
            up_fused = (skip_fused
                        and self._flat_fused_ok(planar, outs, H, W,
                                                merge=True, train=train)
                        and self.up_mode == "transpose"
                        and self.merge_mode in ("concat", "add")
                        and not isinstance(x, tuple))
            # Deeper carry: dense 5D (XLA level below) or a FlatActs64
            # from a chained fused64 decoder level (kept in flat form,
            # upconv via upconv222_f64in/upconv122_f64in).
            carry_dense = not isinstance(x, (tuple, _ffu.FlatActs,
                                             _ff64.FlatActs64))
            carry64_ok = (isinstance(x, _ff64.FlatActs64)
                          and ins == 2 * _ff64.CC64
                          and len(x.chunks) * _ff64.CC64 == ins
                          and up_hw == (H // 2, W // 2)
                          and (W // 2) % 2 == 0)
            up_fused64 = (skip_fused64
                          and self._flat_fused64_ok(
                              planar, outs, H, W,
                              lvl_shape[level][0], False, merge=True,
                              train=train,
                              tiled=bool(lvl_tile[level]))
                          and self.up_mode == "transpose"
                          and self.merge_mode == "concat"
                          and ins in (2 * _ff64.CC64, 4 * _ff64.CC64)
                          and (carry_dense or carry64_ok))
            up_flat = (skip_flat
                       and self._flat_level_ok(planar, outs, H, W)
                       and self.up_mode == "transpose"
                       and self.merge_mode in ("concat", "add"))
            if skip_fused and not up_fused:
                before_pool = _ffu.materialize_flat_acts(
                    before_pool.chunks, before_pool.inv, before_pool.shift,
                    H, W, _act_name(self.activation))
                if self.dim == 2:
                    before_pool = _drop2d(before_pool)
            elif skip_fused64 and not up_fused64:
                key = ("up", level, outs, H, W)
                if key not in _DECLINES_LOGGED:
                    _DECLINES_LOGGED.add(key)
                    log = (logger.info if jax.default_backend() == "tpu"
                           else logger.debug)
                    log("UNet up level %d (C=%d, %dx%d): fused decoder "
                        "declined (merge conv VMEM bound or geometry); "
                        "materializing the skip and falling back to the "
                        "XLA decoder for this level.", level, outs, H, W)
                before_pool = _ff64.materialize_flat_acts64(
                    before_pool.chunks, before_pool.inv, before_pool.shift,
                    H, W, len(before_pool.chunks) * _ff64.CC64,
                    _act_name(self.activation))
                if self.dim == 2:
                    before_pool = _drop2d(before_pool)
            elif skip_flat and not up_flat:
                before_pool = _fc.from_flat(before_pool, H, W, padded=True)
            if isinstance(x, _ffu.FlatActs):
                x = _ffu.materialize_flat_acts(
                    x.chunks, x.inv, x.shift, *up_hw,
                    _act_name(self.activation))
                if self.dim == 2:
                    x = _drop2d(x)
            elif isinstance(x, _ff64.FlatActs64):
                # A fused planar up level can consume the FlatActs64
                # decoder carry directly (upconv122_from_flat64), and
                # a fused64 up level via upconv222_f64in (carry64_ok).
                keep64 = (up_fused and len(x.chunks) == 1
                          and up_hw == (H // 2, W // 2)
                          and (W // 2) % 2 == 0) \
                    or (up_fused64 and carry64_ok)
                if not keep64:
                    x = _ff64.materialize_flat_acts64(
                        x.chunks, x.inv, x.shift, *up_hw,
                        len(x.chunks) * _ff64.CC64,
                        _act_name(self.activation))
                    if self.dim == 2:
                        x = _drop2d(x)
            elif isinstance(x, tuple):  # previous up emitted flat chunks
                x = _fc.from_flat(x, *up_hw, padded=True)
            up = UpCls(ins, outs, merge_mode=self.merge_mode,
                       up_mode=self.up_mode, planar=planar,
                       attention=self.attention, flat=up_flat,
                       fused=up_fused, fused64=up_fused64,
                       flat_hw=(H, W), tile=lvl_tile[level],
                       name=f"up_{i}",
                       **block_kw)
            x, _att = up(before_pool, x, train)
            up_hw = (H, W)

        if isinstance(x, _ffu.FlatActs):
            # Fused head: prologue + 1x1 conv from flat chunks.
            x = _FusedHead(self.out_channels, *up_hw,
                           act=_act_name(self.activation),
                           dim=self.dim, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           out_dtype=self._logit_dtype(),
                           name="conv_final")(x.chunks, x.inv, x.shift)
            if self.dim == 2:
                x = _drop2d(x)
        elif isinstance(x, _ff64.FlatActs64):
            # C=64/128 level feeding the head directly (no planar L0,
            # e.g. start_filts=64): fused head — prologue + 1x1 GEMM
            # straight from the flat64 chunks, no materialize seam.
            x = _FusedHead64(self.out_channels, *up_hw,
                             act=_act_name(self.activation),
                             dim=self.dim, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             out_dtype=self._logit_dtype(),
                             name="conv_final")(x.chunks, x.inv, x.shift)
            if self.dim == 2:
                x = _drop2d(x)
        elif isinstance(x, tuple):
            # Flat head: 1x1 conv straight from flat chunks.
            x = _Conv1x1FromFlat(self.out_channels, *up_hw,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="conv_final")(x)
        else:
            x = nn.Conv(self.out_channels, (1,) * self.dim,
                        kernel_init=_kernel_init, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_final")(x)
        return x.astype(self._logit_dtype())


def init_unet(model: UNet, input_shape: Sequence[int],
              rng: Optional[jax.Array] = None):
    """Initialize UNet variables for a channels-last input shape."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    x = jnp.zeros(tuple(input_shape), model.dtype)
    return model.init({"params": rng, "dropout": rng}, x, train=False)
