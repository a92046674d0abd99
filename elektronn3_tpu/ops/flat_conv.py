"""Flat-layout direct convolution: the TPU-native U-Net conv executor.

Motivation (measured on v5e, benchmark/conv_microbench.py + layout
probes): the headline U-Net's full-resolution convs (C = 32, reference
benchmark/train_benchmark.py:96-107) are bound by lane-padding — XLA
stores/streams (.., W, 32) activations at ~185 GB/s effective vs
~300 GB/s for dense 128-minor arrays, and its conv emitter reaches only
~8.8 TF/s there. This module keeps activations in a *flat* layout

    (B, D, R, 128)   with row r = h * G + g,  lane l = j * 32 + ci,
                     w = Jg * g + j,  G = W' * 32 / 128,  Jg = 4

i.e. rows are 128-lane groups of four w-positions x 32 channels of a
(zero-padded to W') width-W image. Channels beyond 32 are represented
as a LIST of 32-channel chunks — so `concat([a, b], channel)` is just
list concatenation and never materializes.

The conv becomes a sum of row-shifted 128x128 matmuls: for kernel tap
(z=kd, t=kh, kw) and out lane (j2, co), the input lane is
(j1 = j2 + kw - 1 - 4*delta, ci) of row r + (t-1)*G + delta. Packing
the tap weights into (128, 128) blocks per (z, t, delta) gives matmuls
with K = N = 128 (MXU fully occupied; 25% of MACs are structural zeros
from the delta decomposition — the ceiling is ~49 TF/s bf16, ~5x the
measured XLA L0 throughput, with dense HBM traffic).

Width padding contract: the image occupies w in [W_OFF, W_OFF + W);
columns outside are ZERO and every consumer must keep them zero (the
kernel masks its output; see `width_mask`). W_OFF = JG (= 4) keeps
'same' conv taps from wrapping into the previous/next h row AND makes
flat rows ROW-ALIGNED with dense channels-last rows (see the W_OFF
constant below for the alignment identity). Row padding: P =
G + 1 zero rows before/after each (b, d) slab; kd handled by z-shifted
views of a depth-padded array.

Used by elektronn3_tpu.models.unet (flat executor path). Backward =
dgrad via the same kernel with flipped/transposed weights + a wgrad
kernel accumulating A^T @ dY per tap block (see conv_flat_vjp).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CC = 32         # channel chunk size
JG = 128 // CC  # w-positions per row-group
# First valid w column inside the padded width. W_OFF = JG makes the
# flat layout ROW-ALIGNED with dense channels-last rows: when
# W * CC % 128 == 0, flat row (h, g) for g in [1, W/JG] is exactly the
# dense 5D row (h, g - 1) of a (.., H, W, CC) array viewed as
# (.., H * W * CC / 128, 128) — so 5D<->flat conversion is a row copy
# and the stride-2 upconv consumes whole dense rows (one matmul per
# row). Taps stay safe: >= JG zero columns on the left and >= 1 on the
# right of the image (pad_width).
W_OFF = 4


def _interpret() -> bool:
    # E3TPU_PALLAS_INTERPRET=1 forces interpret mode even on TPU —
    # benchmark/tpu_exactness_check.py uses it to compare the
    # Mosaic-compiled kernels against their interpret-mode semantics
    # on the same chip (read at trace time, per pallas_call).
    return (os.environ.get("E3TPU_PALLAS_INTERPRET", "") == "1"
            or jax.default_backend() != "tpu")


def _dot(a, b, **kw):
    """dot_general with exact (HIGHEST) precision for f32 operands.

    TPU matmuls at DEFAULT precision decompose f32 operands into bf16
    passes; the fused kernels must match the interpret/reference f32
    numerics when running an f32 model (pallas_flat=True). bf16
    operands keep the default path (exact bf16 MACs, f32 accumulate).
    """
    if a.dtype == jnp.float32:
        kw.setdefault("precision", jax.lax.Precision.HIGHEST)
    else:
        # Pin DEFAULT explicitly: a jax_default_matmul_precision
        # context (e.g. 'highest' around an XLA reference model) must
        # not leak fp32 contract precision onto bf16 kernel operands —
        # Mosaic rejects that combination ('Bad lhs type').
        kw.setdefault("precision", jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(a, b, **kw)


# ---------------------------------------------------------------------------
# Geometry helpers
# ---------------------------------------------------------------------------

def pad_width(W: int) -> int:
    """Padded width W' (multiple of JG) fitting w in [2, W+2) plus one
    zero column on the right. Prefers W' with G = W'/JG a multiple of 8
    (8-aligned row offsets -> cheap vector loads) when the extra width
    stays under 12.5%."""
    wp_min = -(-(W + W_OFF + 1) // JG) * JG
    wp_aligned = -(-wp_min // (8 * JG)) * (8 * JG)
    return wp_aligned if wp_aligned <= wp_min * 1.125 else wp_min


def flat_geometry(H: int, W: int) -> Tuple[int, int, int]:
    """Returns (G, R, P): row-groups per h row, rows per slab, row pad.
    P = G + 8 so the delta=0 row offsets P + (t-1)*G are 8-aligned
    whenever G is a multiple of 8."""
    Wp = pad_width(W)
    G = Wp // JG
    return G, H * G, G + 8


def width_mask(W: int, dtype=jnp.float32) -> jnp.ndarray:
    """(G, 128) mask: 1 on valid w columns, 0 on pad columns."""
    Wp = pad_width(W)
    G = Wp // JG
    w_of_lane = (np.arange(128) // CC)[None, :] + JG * np.arange(G)[:, None]
    valid = (w_of_lane >= W_OFF) & (w_of_lane < W_OFF + W)
    return jnp.asarray(valid, dtype)


def to_flat(x: jnp.ndarray, kd: int = 1) -> Tuple[jnp.ndarray, ...]:
    """(B, D, H, W, C) -> tuple of C//CC flat chunks (B, Dp, Rp, 128).

    Pads width to W', splits channels into CC-chunks, flattens (H, G)
    rows, pads P zero rows on both sides and (kd-1)//2 slabs along D.
    """
    B, D, H, W, C = x.shape
    assert C % CC == 0, C
    Wp = pad_width(W)
    G, R, P = flat_geometry(H, W)
    zpad = (kd - 1) // 2
    xpadded = jnp.pad(x, ((0, 0), (zpad, zpad), (0, 0),
                          (W_OFF, Wp - W - W_OFF), (0, 0)))
    chunks = []
    for c0 in range(0, C, CC):
        xc = xpadded[..., c0:c0 + CC]                    # (B, Dp, H, Wp, CC)
        xc = xc.reshape(B, D + 2 * zpad, R, 128)
        xc = jnp.pad(xc, ((0, 0), (0, 0), (P, P), (0, 0)))
        chunks.append(xc)
    return tuple(chunks)


def from_flat(chunks: Sequence[jnp.ndarray], H: int, W: int,
              padded: bool = False) -> jnp.ndarray:
    """Inverse of to_flat (expects unpadded-D chunks unless padded)."""
    G, R, P = flat_geometry(H, W)
    Wp = pad_width(W)
    outs = []
    for xc in chunks:
        B, D, Rp, _ = xc.shape
        body = xc[:, :, P:P + R] if padded or Rp != R else xc
        outs.append(body.reshape(B, D, H, Wp, CC)[:, :, :,
                                                  W_OFF:W_OFF + W, :])
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------

def pack_flat_weights(w: jnp.ndarray):
    """(kd, 3, 3, Cin, Cout) -> (w0, wplus, wminus).

    w0 (nin, nout, kd, 3, 128, 128): the delta=0 block — entries
    [(j1, ci), (j2, co)] = w[z, t, kw, ...] for j1 = j2 + kw - 1 in
    [0, JG). The two group-crossing taps live in dedicated CCxCC corner
    blocks instead of nearly-empty 128x128 blocks (2.7x fewer MACs):
    wplus (nin, nout, kd, 3, CC, CC) = w[z, t, kw=2] applied to A rows
    off+1 lanes j1=0 -> out j2=JG-1; wminus = w[z, t, kw=0], A rows
    off-1 lanes j1=JG-1 -> out j2=0.
    """
    kd, kh, kw_, cin, cout = w.shape
    assert kh == 3 and kw_ == 3
    nin, nout = cin // CC, cout // CC

    def chunked(kw):
        blk = w[:, :, kw].reshape(kd, 3, nin, CC, nout, CC)
        return jnp.transpose(blk, (2, 4, 0, 1, 3, 5))  # nin,nout,kd,t,ci,co

    w0 = jnp.zeros((nin, nout, kd, 3, 128, 128), w.dtype)
    for j2 in range(JG):
        for kw in range(3):
            j1 = j2 + kw - 1
            if not 0 <= j1 < JG:
                continue
            w0 = w0.at[:, :, :, :,
                       j1 * CC:(j1 + 1) * CC,
                       j2 * CC:(j2 + 1) * CC].set(chunked(kw))
    return w0, chunked(2), chunked(0)


def combine_corner_weights(wp: jnp.ndarray, wm: jnp.ndarray) -> jnp.ndarray:
    """(wplus, wminus) CCxCC corner blocks -> ONE anti-diagonal
    (..., 128, 128) combined-corner weight (flat64's trick,
    flat_fused64.py pack_weights64): the operand lane-selects rows
    off+1 into lanes 0:CC and rows off-1 into lanes 96:128, so
    [0:CC, 96:128] = wplus (j1=0 -> j2=JG-1) and [96:128, 0:CC] =
    wminus (j1=JG-1 -> j2=0). One full-occupancy 128x128 matmul
    replaces two CC-wide matmuls with misaligned narrow loads."""
    shape = wp.shape[:-2] + (128, 128)
    wc = jnp.zeros(shape, wp.dtype)
    wc = wc.at[..., 0:CC, 128 - CC:128].set(wp)
    wc = wc.at[..., 128 - CC:128, 0:CC].set(wm)
    return wc


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _flat_conv_kernel(*refs, kd: int, nin: int, nout: int, G: int, R: int,
                      P: int, H: int, out_dtype, has_bias: bool):
    """Grid step (b, d): all nout out chunks for one output slab."""
    n_in_refs = nin * kd
    ins = refs[:n_in_refs]           # [z * nin + i] -> (1, 1, Rp, 128)
    w0_ref = refs[n_in_refs]         # (nin, nout, kd, 3, 128, 128)
    wp_ref = refs[n_in_refs + 1]     # (nin, nout, kd, 3, CC, CC)
    wm_ref = refs[n_in_refs + 2]     # (nin, nout, kd, 3, CC, CC)
    mask_ref = refs[n_in_refs + 3]   # (G, 128)
    idx = n_in_refs + 4
    bias_ref = refs[idx] if has_bias else None  # (nout, 128)
    outs = refs[idx + int(has_bias):]

    dims = (((1,), (0,)), ((), ()))
    for o in range(nout):
        y = jnp.zeros((R, 128), jnp.float32)
        yc0 = jnp.zeros((R, CC), jnp.float32)   # -> out lanes [0, CC)
        yc3 = jnp.zeros((R, CC), jnp.float32)   # -> out lanes [3CC, 4CC)
        for z in range(kd):
            for i in range(nin):
                a_ref = ins[z * nin + i]
                for t in range(3):
                    off = P + (t - 1) * G
                    a = a_ref[0, 0, pl.ds(off, R), :]
                    y = y + _dot(
                        a, w0_ref[i, o, z, t], dimension_numbers=dims,
                        preferred_element_type=jnp.float32)
                    # group-crossing taps (kw = 2 from the next group's
                    # first w; kw = 0 from the previous group's last w)
                    a_hi = a_ref[0, 0, pl.ds(off + 1, R), 0:CC]
                    yc3 = yc3 + _dot(
                        a_hi, wp_ref[i, o, z, t], dimension_numbers=dims,
                        preferred_element_type=jnp.float32)
                    a_lo = a_ref[0, 0, pl.ds(off - 1, R), 128 - CC:128]
                    yc0 = yc0 + _dot(
                        a_lo, wm_ref[i, o, z, t], dimension_numbers=dims,
                        preferred_element_type=jnp.float32)
        y = y + jnp.concatenate(
            [yc0, jnp.zeros((R, 128 - 2 * CC), jnp.float32), yc3], axis=-1)
        if has_bias:
            y = y + bias_ref[o][None, :]
        y = (y.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128)
        # Output carries its own zeroed row padding (P rows both sides)
        # so chained convs and the VJP never pay a jnp.pad copy.
        outs[o][0, 0, 0:P] = jnp.zeros((P, 128), out_dtype)
        outs[o][0, 0, pl.ds(P, R)] = y.astype(out_dtype)
        outs[o][0, 0, P + R:2 * P + R] = jnp.zeros((P, 128), out_dtype)


@functools.partial(jax.jit, static_argnames=("kd", "H"))
def conv_flat(xs: Sequence[jnp.ndarray], wp, mask: jnp.ndarray,
              bias: Optional[jnp.ndarray] = None, *, kd: int, H: int):
    """Flat-layout 'same' stride-1 conv.

    Args:
        xs: nin flat chunks (B, D + kd - 1, Rp, 128), zero-padded
            (P rows both sides, zero pad columns, kd-1 extra D slabs).
        wp: packed weights (w0, wplus, wminus) from pack_flat_weights.
        mask: (G, 128) width mask (width_mask(W)).
        bias: optional (nout, 128) lane bias (tile(bias_co, JG)).
        kd: depth taps (1 planar / 3).
        H: image height (R = H * G).
    Returns:
        tuple of nout chunks (B, D, R, 128), dtype of xs[0].
    """
    w0, wplus, wminus = wp
    nin = len(xs)
    B, Dp, Rp, _ = xs[0].shape
    D = Dp - (kd - 1)
    G = mask.shape[0]
    R = H * G
    P = (Rp - R) // 2
    nout = w0.shape[1]
    dtype = xs[0].dtype

    kernel = functools.partial(
        _flat_conv_kernel, kd=kd, nin=nin, nout=nout, G=G, R=R, P=P, H=H,
        out_dtype=dtype, has_bias=bias is not None)

    def in_spec(z):
        return pl.BlockSpec((1, 1, Rp, 128),
                            lambda b, d, z=z: (b, d + z, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = []
    operands = []
    for z in range(kd):
        for i in range(nin):
            in_specs.append(in_spec(z))
            operands.append(xs[i])
    for warr in (w0, wplus, wminus):
        in_specs.append(pl.BlockSpec(warr.shape,
                                     lambda b, d, nd=warr.ndim: (0,) * nd,
                                     memory_space=pltpu.VMEM))
        operands.append(warr.astype(dtype))
    in_specs.append(pl.BlockSpec((G, 128), lambda b, d: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(mask.astype(jnp.float32))
    if bias is not None:
        in_specs.append(pl.BlockSpec((nout, 128), lambda b, d: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bias.astype(jnp.float32))

    flops = 2 * B * D * R * 128 * (128 + 2 * CC) * nin * nout * kd * 3
    out = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((1, 1, R + 2 * P, 128), lambda b, d: (b, d, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(nout)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, D, R + 2 * P, 128), dtype)
            for _ in range(nout)),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(nin * kd * B * D * Rp + nout * B * D * R)
            * 128 * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(*operands)
    return out


# ---------------------------------------------------------------------------
# Weight/bias gradient kernel
# ---------------------------------------------------------------------------

def _wgrad_kernel(*refs, kd: int, nin: int, nout: int, G: int, R: int,
                  P: int):
    """Accumulates tap-block gradients across (b, d) grid steps:
    M0[i,o,z,t] += A[off]^T dY ; corners Mp/Mm ; db += sum(dY rows)."""
    n_in_refs = nin * kd
    ins = refs[:n_in_refs]
    dys = refs[n_in_refs:n_in_refs + nout]   # (1, 1, Rp, 128) padded
    m0, mp, mm, db = refs[n_in_refs + nout:]

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        m0[...] = jnp.zeros_like(m0)
        mp[...] = jnp.zeros_like(mp)
        mm[...] = jnp.zeros_like(mm)
        db[...] = jnp.zeros_like(db)

    cdims = (((0,), (0,)), ((), ()))  # contract over rows
    for o in range(nout):
        dy = dys[o][0, 0, pl.ds(P, R), :]  # body rows only
        db[o, :] += jnp.sum(dy.astype(jnp.float32), axis=0)
        for z in range(kd):
            for i in range(nin):
                a_ref = ins[z * nin + i]
                for t in range(3):
                    off = P + (t - 1) * G
                    a = a_ref[0, 0, pl.ds(off, R), :]
                    m0[i, o, z, t] += _dot(
                        a, dy, dimension_numbers=cdims,
                        preferred_element_type=jnp.float32)
                    a_hi = a_ref[0, 0, pl.ds(off + 1, R), 0:CC]
                    mp[i, o, z, t] += _dot(
                        a_hi, dy[:, 128 - CC:128], dimension_numbers=cdims,
                        preferred_element_type=jnp.float32)
                    a_lo = a_ref[0, 0, pl.ds(off - 1, R), 128 - CC:128]
                    mm[i, o, z, t] += _dot(
                        a_lo, dy[:, 0:CC], dimension_numbers=cdims,
                        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("kd", "H"))
def _wgrad(xs, dys, mask, *, kd: int, H: int):
    """Returns (dw (kd,3,3,cin,cout) f32, db (cout,) f32)."""
    nin, nout = len(xs), len(dys)
    B, Dp, Rp, _ = xs[0].shape
    D = Dp - (kd - 1)
    G = mask.shape[0]
    R = H * G
    P = (Rp - R) // 2

    kernel = functools.partial(_wgrad_kernel, kd=kd, nin=nin, nout=nout,
                               G=G, R=R, P=P)
    in_specs = []
    operands = []
    for z in range(kd):
        for i in range(nin):
            in_specs.append(pl.BlockSpec(
                (1, 1, Rp, 128), lambda b, d, z=z: (b, d + z, 0, 0),
                memory_space=pltpu.VMEM))
            operands.append(xs[i])
    for o in range(nout):
        in_specs.append(pl.BlockSpec(
            (1, 1, R + 2 * P, 128), lambda b, d: (b, d, 0, 0),
            memory_space=pltpu.VMEM))
        operands.append(dys[o])

    const = lambda *idx: tuple(0 for _ in idx)
    m0, mp, mm, db = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((nin, nout, kd, 3, 128, 128),
                         lambda b, d: (0,) * 6, memory_space=pltpu.VMEM),
            pl.BlockSpec((nin, nout, kd, 3, CC, CC),
                         lambda b, d: (0,) * 6, memory_space=pltpu.VMEM),
            pl.BlockSpec((nin, nout, kd, 3, CC, CC),
                         lambda b, d: (0,) * 6, memory_space=pltpu.VMEM),
            pl.BlockSpec((nout, 128), lambda b, d: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nin, nout, kd, 3, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((nin, nout, kd, 3, CC, CC), jnp.float32),
            jax.ShapeDtypeStruct((nin, nout, kd, 3, CC, CC), jnp.float32),
            jax.ShapeDtypeStruct((nout, 128), jnp.float32),
        ),
        interpret=_interpret(),
    )(*operands)

    # barrier: keep the at[].set unpack chain from fusing with its
    # producers (XLA:TPU scatter-fusion miscompile — see
    # flat_fused64.conv3_bnact_flat64).
    m0, mp, mm = jax.lax.optimization_barrier((m0, mp, mm))
    # Unpack tap blocks -> dw. Each weight w[z,t,kw,ci,co] was used at
    # every (j1 = j2 + kw - 1, j2) block of w0 plus its corner block.
    cin, cout = nin * CC, nout * CC
    dw = jnp.zeros((kd, 3, 3, cin, cout), jnp.float32)
    for kw in range(3):
        acc = jnp.zeros((nin, nout, kd, 3, CC, CC), jnp.float32)
        for j2 in range(JG):
            j1 = j2 + kw - 1
            if 0 <= j1 < JG:
                acc = acc + m0[:, :, :, :,
                               j1 * CC:(j1 + 1) * CC,
                               j2 * CC:(j2 + 1) * CC]
        if kw == 2:
            acc = acc + mp
        if kw == 0:
            acc = acc + mm
        # (nin, nout, kd, t, ci, co) -> (kd, t, ci-full, co-full)
        blk = jnp.transpose(acc, (2, 3, 0, 4, 1, 5)).reshape(
            kd, 3, cin, cout)
        dw = dw.at[:, :, kw].set(blk)
    # db lanes (nout, (j2, co)) -> (cout,): sum over j2
    dbc = jnp.sum(db.reshape(nout, JG, CC), axis=1).reshape(cout)
    return dw, dbc


# ---------------------------------------------------------------------------
# Differentiable op
# ---------------------------------------------------------------------------

def _flip_transpose(w: jnp.ndarray) -> jnp.ndarray:
    """dgrad weights: flip all taps, swap ci<->co."""
    return jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))


def _lane_bias(b: jnp.ndarray) -> jnp.ndarray:
    """(cout,) -> (nout, 128) lane bias."""
    return jnp.tile(b.reshape(-1, CC), (1, JG))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flat_conv3(xs, w, b, kd: int, H: int, W: int):
    """'same' stride-1 3x3(x3) conv on flat chunks, differentiable.

    Args:
        xs: tuple of nin padded flat chunks (B, D + kd - 1, Rp, 128).
        w: raw weights (kd, 3, 3, cin, cout).
        b: bias (cout,) or None.
        kd, H, W: depth taps / image height / image width (static).
    Returns:
        tuple of nout padded flat chunks (B, D, Rp, 128).
    """
    mask = width_mask(W)
    # barrier: XLA:TPU miscompiles producer-into-pack fusion for
    # traced weights (see flat_fused64.conv3_bnact_flat64)
    return conv_flat(xs, pack_flat_weights(
        jax.lax.optimization_barrier(w)), mask,
                     None if b is None else _lane_bias(b), kd=kd, H=H)


def _flat_conv3_fwd(xs, w, b, kd, H, W):
    return flat_conv3(xs, w, b, kd, H, W), (xs, w, b is not None)


def _flat_conv3_bwd(kd, H, W, res, dys):
    xs, w, has_b = res
    mask = width_mask(W)
    # dgrad: 'same' conv of dy with flipped, ci/co-swapped weights.
    # dy chunks are padded with zero rows (conv_flat contract); width
    # pads are zero because the forward masked them — but the incoming
    # cotangent may be nonzero there, so mask it via the conv's own
    # output mask + a pre-mask on dy.
    dys = tuple(
        (dy.reshape(dy.shape[0], dy.shape[1], -1, 128)
         ).astype(xs[0].dtype) for dy in dys)
    dym = []
    B, D, Rp, _ = dys[0].shape
    G = mask.shape[0]
    R = H * G
    P = (Rp - R) // 2
    rowmask = jnp.pad(jnp.tile(mask, (H, 1)), ((P, P), (0, 0)))
    for dy in dys:
        dym.append(dy * rowmask.astype(dy.dtype)[None, None])
    dym = tuple(dym)  # masked, unpadded-D (for wgrad)
    dym_dg = dym
    if kd > 1:
        zpad = (kd - 1) // 2
        dym_dg = tuple(jnp.pad(dy, ((0, 0), (zpad, zpad), (0, 0), (0, 0)))
                       for dy in dym)
    dxs = conv_flat(dym_dg, pack_flat_weights(
        jax.lax.optimization_barrier(_flip_transpose(w))), mask,
                    None, kd=kd, H=H)
    if kd > 1:
        # Primal inputs are D-padded; their pad slabs are structural
        # zeros, so their cotangents are dropped (zeros).
        zpad = (kd - 1) // 2
        dxs = tuple(jnp.pad(dx, ((0, 0), (zpad, zpad), (0, 0), (0, 0)))
                    for dx in dxs)
    dw, db = _wgrad(xs, dym, mask, kd=kd, H=H)
    return (dxs, dw.astype(w.dtype),
            db.astype(w.dtype) if has_b else None)


flat_conv3.defvjp(_flat_conv3_fwd, _flat_conv3_bwd)


# ---------------------------------------------------------------------------
# Seam-free XLA companions (no full-resolution 5D materialization)
# ---------------------------------------------------------------------------
# The ops below keep the level's full-resolution data in the flat
# layout end-to-end. Every reshape is a dense row-major regrouping
# (free/fusable in XLA); the only big copies read or write DENSE flat
# arrays at full memory bandwidth. Measured motivation: a single
# 5D (.., W, 32) <-> flat conversion costs ~7.5 ms at (8,44,88,88,32)
# on the v5e, more than the conv it serves.

def _row_pad(x: jnp.ndarray, P: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (0, 0), (P, P), (0, 0)))


def conv3_into_flat(x5: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                    H: int, W: int):
    """Planar 3x3 'same' conv from a SMALL-C_in 5D input directly into
    padded flat chunks (used for the level's first conv, C_in <= 4:
    the im2col patches tensor is tiny, the output is written flat).

    x5 (B, D, H, W, cin); w (1, 3, 3, cin, cout); b (cout,) or None.
    """
    B, D, _, _, cin = x5.shape
    cout = w.shape[-1]
    Wp = pad_width(W)
    G, R, P = flat_geometry(H, W)
    xpad = jnp.pad(x5, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    pats = [xpad[:, :, t:t + H, s:s + W, :]
            for t in range(3) for s in range(3)]
    pat = jnp.concatenate(pats, -1)                     # (B,D,H,W,9cin)
    pat = jnp.pad(pat, ((0, 0), (0, 0), (0, 0),
                        (W_OFF, Wp - W - W_OFF), (0, 0)))
    pat = pat.reshape(B, D, R, JG, 9 * cin)
    wm = w.reshape(9 * cin, cout).astype(x5.dtype)      # (t,s,ci) major
    y = jnp.einsum("bdrjk,kc->bdrjc", pat, wm,
                   preferred_element_type=jnp.float32,
                   precision=(jax.lax.Precision.HIGHEST
                              if pat.dtype == jnp.float32 else None))
    if b is not None:
        y = y + b.astype(y.dtype)
    # width mask: pad columns got pat=0 but bias must not leak there
    wmask = width_mask(W, y.dtype).reshape(G, JG, CC)[:, :, :1]
    y = y.reshape(B, D, H, G, JG, cout) * wmask[None, None, None]
    y = y.reshape(B, D, R, JG, cout)
    chunks = []
    for c0 in range(0, cout, CC):
        yc = y[..., c0:c0 + CC].reshape(B, D, R, 128)
        chunks.append(_row_pad(yc, P).astype(x5.dtype))
    return tuple(chunks)


def pool_flat(chunks, H: int, W: int) -> jnp.ndarray:
    """(1, 2, 2) max-pool from padded flat chunks -> pooled 5D
    (B, D, H//2, W//2, C). Reads dense flat, writes the small pooled
    tensor; all reshapes are row-major regroupings."""
    G, R, P = flat_geometry(H, W)
    outs = []
    for xc in chunks:
        B, D, Rp, _ = xc.shape
        v = xc[:, :, P:P + R].reshape(B, D, H, G, 2, 2, CC)
        u = jnp.max(v, axis=5)                          # pool w pairs
        u = u.reshape(B, D, H // 2, 2, G * 2, CC)
        u = jnp.max(u, axis=3)                          # pool h pairs
        # pooled w' = w // 2; valid w in [W_OFF, W_OFF+W) -> w' in
        # [W_OFF//2, W_OFF//2 + W//2)
        outs.append(u[:, :, :, W_OFF // 2:W_OFF // 2 + W // 2, :])
    return jnp.concatenate(outs, axis=-1)


def upconv2_transpose_to_flat(dec: jnp.ndarray, w: jnp.ndarray,
                              b: jnp.ndarray, H: int, W: int):
    """Planar (1,2,2)-stride-2 transposed conv from the SMALL deeper-
    level 5D tensor directly into padded flat chunks at this level.

    Equivalent to four 1x1 convs (one per output phase (a, bb)) on the
    small input + a dense interleave into the flat layout. dec
    (B, D, H1, W1, cin) with H1 = H//2, W1 = W//2; w (1, 2, 2, cin,
    cout) (flax ConvTranspose kernel); b (cout,) or None.
    """
    B, D, H1, W1, cin = dec.shape
    cout = w.shape[-1]
    Wp = pad_width(W)
    G, R, P = flat_geometry(H, W)
    G2 = Wp // JG  # == G
    # out w2 = 2*(w1 + W_OFF//2) + bb; pad dec so w2 spans [0, Wp)
    left = W_OFF // 2
    decp = jnp.pad(dec, ((0, 0), (0, 0), (0, 0),
                         (left, Wp // 2 - W1 - left), (0, 0)))
    # flax ConvTranspose places in[h,w]*K[1-a, 1-p] at out[2h+a, 2w+p]
    # (gradient-of-conv convention) -> flip the phase taps.
    z = jnp.einsum("ndhwc,apco->ndhwapo", decp,
                   w[0, ::-1, ::-1].astype(dec.dtype),
                   precision=(jax.lax.Precision.HIGHEST
                              if dec.dtype == jnp.float32 else None),
                   preferred_element_type=jnp.float32)  # a=kh phase, b=kw phase
    if b is not None:
        z = z + b.astype(z.dtype)
    # rows (h, a, k), lanes (m, bb, co): w2 = 2*(2k + m) + bb
    z = z.reshape(B, D, H1, Wp // 4, 2, 2, 2, cout)  # h, k, m, a, bb, co
    z = jnp.transpose(z, (0, 1, 2, 5, 3, 4, 6, 7))   # b d h a k m bb co
    z = z.reshape(B, D, R, 2, 2, cout)
    wmask = width_mask(W, z.dtype)
    chunks = []
    for c0 in range(0, cout, CC):
        yc = z[..., c0:c0 + CC].reshape(B, D, H, G, 128) \
            * wmask[None, None, None]
        chunks.append(_row_pad(yc.reshape(B, D, R, 128), P)
                      .astype(dec.dtype))
    return tuple(chunks)


def _conv1x1_impl(chunks, w: jnp.ndarray, b, H: int, W: int):
    """Head forward: einsum over flat rows (XLA lowers this to a
    peak-bandwidth GEMM; a Pallas forward measured no win)."""
    G, R, P = flat_geometry(H, W)
    Wp = pad_width(W)
    cout = w.shape[-1]
    w2 = w.reshape(-1, cout)  # (cin, cout)
    ys = []
    for i, xc in enumerate(chunks):
        B, D, Rp, _ = xc.shape
        v = xc[:, :, P:P + R].reshape(B, D, R, JG, CC)
        ys.append(jnp.einsum("bdrjc,co->bdrjo", v,
                             w2[i * CC:(i + 1) * CC].astype(xc.dtype),
                             precision=(jax.lax.Precision.HIGHEST
                                        if xc.dtype == jnp.float32
                                        else None),
                             preferred_element_type=jnp.float32))
    y = sum(ys)
    if b is not None:
        y = y + b.astype(y.dtype)
    y = y.reshape(B, D, H, Wp, cout)[:, :, :, W_OFF:W_OFF + W, :]
    return y


def conv1x1_from_flat(chunks, w: jnp.ndarray, b: jnp.ndarray,
                      H: int, W: int) -> jnp.ndarray:
    """1x1 conv consuming padded flat chunks, emitting a (small) 5D
    (B, D, H, W, cout) tensor (the network head), with plain autodiff.

    A merged Pallas backward (dgrad + wgrad consuming the raw
    (H, W, cout) logit cotangent, to kill XLA's slice-adjoint pad of
    the cout-minor dy) was tried and REMOVED: building the
    (H, Wp, cout) -> (R, JG*cout) row view inside the kernel is a
    Mosaic "unsupported shape cast" (regrouping the tiled W dim into
    rows — the same wall as the pool stride-2 row gather and the
    head+loss fusion note in docs/design.md), and the cotangent is f32
    regardless of model dtype, so the kernel could not compile for any
    on-chip path (first exercised 2026-08-18: f32 semi-fused model)."""
    return _conv1x1_impl(chunks, w, b, H, W)
