"""Fused flat-layout U-Net level executor (Pallas, TPU).

This module is the round-2 completion of the flat-layout executor
(ops/flat_conv.py): it keeps a full-resolution planar U-Net level
ENTIRELY kernel-resident so the level never pays an XLA layout seam.
Measured motivation (docs/design.md round-2 notes): the flat conv
kernels beat XLA convs ~3x at C in {32, 64}, but every flat<->5D
crossing through XLA relayout codegen runs at 30-40 GB/s and costs
more than the kernels save. The fix implemented here:

- **BN statistics as conv side outputs**: each fused conv emits
  per-lane sum / sum-of-squares of its (masked) output, accumulated
  across the grid. Batch-norm statistics then cost one tiny (C,)-sized
  XLA computation instead of a full-resolution pass.
- **BN-apply + activation folded into the consumer's input load**
  (the "prologue"): the next kernel normalizes, activates and re-masks
  its input into a VMEM scratch before the matmul taps read it. No
  normalized full-resolution tensor ever exists in HBM.
- **Pool as a kernel** consuming flat chunks (with prologue) and
  emitting the pooled tensor as dense channels-last rows.
- **Upconv as one matmul**: with `W_OFF = JG` (see flat_conv.py), the
  (1,2,2)-stride-2 transposed conv consumes whole dense rows of the
  deeper 5D tensor — two (rows,128)x(128,128) matmuls per slab with
  phase-packed weights ("(w-parity, ci) contraction").
- **Dense-row input adapter**: when W % 4 == 0, a channels-last
  (.., H, W, 32) array viewed as (.., H*W*32/128, 128) is row-aligned
  with the flat layout, so the level's first conv (XLA, small C_in)
  feeds the fused conv directly — no to_flat copy.

Semantics match the reference's DownConv/UpConv blocks
(reference models/unet.py:202-253, :328-409: conv -> BN -> act ->
conv -> BN -> act -> pool / upconv -> BN -> act -> merge -> convs)
with BatchNorm statistics identical to nn.BatchNorm (momentum 0.9,
eps 1e-5, stats of the bf16-rounded activations).

Gradients are exact (including through the batch statistics): each
fused op is a custom_vjp whose backward is ONE merged Pallas kernel
computing dgrad + wgrad + prologue-parameter grads, with the
statistics cotangent folded into the incoming cotangent on load
(dy_tot = mask * (dy + ds + 2*y*dq)).

Only the single exact-tie max-pool case diverges from XLA: on an exact
float tie inside a pooling window the gradient is routed to every tied
element (XLA's SelectAndScatter picks the first). Ties of positive
activations are measure-zero; ties at zero are killed by the ReLU mask.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from elektronn3_tpu.ops.flat_conv import (
    CC, JG, W_OFF, flat_geometry, pad_width, width_mask,
    pack_flat_weights, combine_corner_weights, _flip_transpose,
    _interpret as _fc_interpret,
)

LEAKY_SLOPE = 0.1  # matches modules/layers.py leaky_relu01


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


def _interpret() -> bool:
    return _fc_interpret()   # shared knob (E3TPU_PALLAS_INTERPRET)


def _act_fwd(pre, act: str):
    if act == "relu":
        return jnp.maximum(pre, 0.0)
    if act == "leaky":
        return jnp.where(pre > 0, pre, LEAKY_SLOPE * pre)
    if act == "linear":
        return pre
    raise NotImplementedError(act)


def _act_deriv(pre, act: str):
    if act == "relu":
        return (pre > 0).astype(jnp.float32)
    if act == "leaky":
        return jnp.where(pre > 0, 1.0, LEAKY_SLOPE)
    if act == "linear":
        return jnp.ones_like(pre)
    raise NotImplementedError(act)


def dense_rows_ok(W: int, C: int = CC) -> bool:
    """Dense-adapter alignment: channels-last rows must tile into
    128-lane rows an integer number of times per image row."""
    return (W * C) % 128 == 0


def as_dense_rows(x5: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, D, H*W*C/128, 128) bitcast view."""
    B, D, H, W, C = x5.shape
    assert (W * C) % 128 == 0, (W, C)
    return x5.reshape(B, D, H * W * C // 128, 128)


def channel_stats_dense(x5: jnp.ndarray, per_sample: bool = False,
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel (sum, sumsq) of a channels-last tensor via its dense
    row view — a full-bandwidth 128-minor reduction (the (.., W, C)
    layout would reduce at the lane-padded rate). f32 accumulation.
    ``per_sample`` keeps the batch axis — (B, C) — for group/instance
    norm statistics."""
    B, D, H, W, C = x5.shape
    assert C <= 128 and 128 % C == 0, C
    xr = as_dense_rows(x5).astype(jnp.float32)
    axes = (1, 2) if per_sample else (0, 1, 2)
    s = jnp.sum(xr, axis=axes)
    q = jnp.sum(xr * xr, axis=axes)
    wp = 128 // C  # w-phases per 128-lane row
    if per_sample:
        return (s.reshape(B, wp, C).sum(1), q.reshape(B, wp, C).sum(1))
    return s.reshape(wp, C).sum(0), q.reshape(wp, C).sum(0)


def fold_lane_stats(s: jnp.ndarray) -> jnp.ndarray:
    """(n, 128) per-lane sums -> (C,) per-channel sums, or the
    per-sample form (n, B, 128) -> (B, C) (group/instance norm).

    NOTE: assumes the per-lane values for one channel are w-phase
    PARTIAL sums (fused-conv stats). For `lane_stats_dense` output the
    lanes are replicated per-channel totals; divide by JG after."""
    n = s.shape[0]
    if s.ndim == 3:
        B = s.shape[1]
        return jnp.concatenate(
            [s[i].reshape(B, JG, CC).sum(1) for i in range(n)], axis=1)
    return s.reshape(n, JG, CC).sum(1).reshape(n * CC)


# ---------------------------------------------------------------------------
# Fused conv: prologue(BN-apply + act) -> 3x3 planar conv -> bias,
# mask, stats side outputs. kd == 1 (planar levels) only.
# ---------------------------------------------------------------------------

def _build_scratch(ref, i, scratch, *, wr: int, G: int, R: int, P: int,
                   Ps: int, H: int, inv_ref, shift_ref, mask_ref,
                   act: str):
    """Load chunk i (dense or flat form), apply prologue, mask, store
    into scratch[i] body rows (pad rows pre-zeroed)."""
    if wr:  # dense-row adapter: (1, 1, H*wr, 128)
        a = ref[0, 0, :, :].astype(jnp.float32).reshape(H, wr, 128)
        z1 = jnp.zeros((H, 1, 128), jnp.float32)
        z2 = jnp.zeros((H, G - wr - 1, 128), jnp.float32)
        a = jnp.concatenate([z1, a, z2], axis=1)
    else:   # padded flat chunk: (1, 1, R + 2P, 128)
        a = ref[0, 0, pl.ds(P, R), :].astype(jnp.float32).reshape(H, G, 128)
    pre = a * inv_ref[i][None, None, :] + shift_ref[i][None, None, :]
    val = _act_fwd(pre, act) * mask_ref[...][None]
    scratch[i, pl.ds(Ps, R)] = val.reshape(R, 128).astype(scratch.dtype)


def _halo_valid(side) -> jnp.ndarray:
    """0.0 for halo strips at the volume edge (clamped neighbor view
    repeats the own slab; conv padding must stay zero)."""
    pd = pl.program_id(1)
    if side == 0:
        return (pd > 0).astype(jnp.float32)
    return (pd < pl.num_programs(1) - 1).astype(jnp.float32)


def _build_halo(ref, i, side, scratch, *, wr: int, G: int, R: int,
                P: int, Ps: int, H: int, inv_ref, shift_ref, mask_ref,
                act: str):
    """H-tiled (d_halo) mode: one prologued image-row halo strip from
    the adjacent H-slab into the scratch pad region (see flat_fused64
    _build_halo64). ref is a pre-shifted NARROW strip block
    (_halo_strips) — (1, 1, wr|G, 128), already holding the adjacent
    slab's boundary image row — not a full-slab view: full-slab halo
    views tripled the per-step VMEM footprint and OOM'd the 16 MB
    scoped limit for 2D decoder merge convs at production widths.
    side=0: prev slab's LAST row -> [Ps-G:Ps]; side=2: next slab's
    FIRST row -> [Ps+R:Ps+R+G]."""
    a = ref[0, 0, :, :].astype(jnp.float32)
    if wr:  # dense-row adapter: one image row = wr dense rows
        z1 = jnp.zeros((1, 128), jnp.float32)
        z2 = jnp.zeros((G - wr - 1, 128), jnp.float32)
        a = jnp.concatenate([z1, a, z2], axis=0)
    pre = a * inv_ref[i][None, :] + shift_ref[i][None, :]
    val = _act_fwd(pre, act) * mask_ref[...] * _halo_valid(side)
    scratch[i, pl.ds(Ps - G if side == 0 else Ps + R, G)] = \
        val.astype(scratch.dtype)


def _halo_strips(x, wr: int, G: int, R: int, P: int, H: int):
    """Pre-shifted narrow halo strips for d_halo mode, built by XLA
    glue (one tiny slice+pad per side — cheap vs tripling the kernel's
    slab traffic): strip0[:, d] holds slab d-1's LAST image row,
    strip2[:, d] slab d+1's FIRST image row; (B, D, wr|G, 128) each.
    Volume-edge strips are zero-padded; their (prologued, hence
    nonzero) contributions are killed in-kernel by _halo_valid."""
    if wr:   # dense-adapter chunk (B, D, H*wr, 128), unpadded
        last = x[:, :, (H - 1) * wr:H * wr, :]
        first = x[:, :, 0:wr, :]
    else:    # padded flat chunk (B, D, R + 2P, 128)
        last = x[:, :, P + R - G:P + R, :]
        first = x[:, :, P:P + G, :]
    z = jnp.zeros_like(last[:, :1])
    strip0 = jnp.concatenate([z, last[:, :-1]], axis=1)
    strip2 = jnp.concatenate([first[:, 1:], z], axis=1)
    return strip0, strip2


def _strip_views(x, wr: int, G: int, R: int, P: int, H: int):
    """(strip0, center, strip2) operand triple for d_halo mode, in the
    kernel's expected [side0, center, side2] order."""
    s0, s2 = _halo_strips(x, wr, G, R, P, H)
    return s0, x, s2


def _vup_scratch(carry_ref, scratch, m0u_ref, m1u_ref, bu_ref, invc_ref,
                 shiftc_ref, inv_ref, shift_ref, mask_ref, *, G: int,
                 R: int, P: int, Ps: int, H: int, act: str, vup: dict):
    """Virtual chunk 0 (vup mode): recompute the (1,2,2) upconv output
    slab from the deeper level's FlatActs64 carry (shared
    flat_fused64._upconv122_f64_y — bitwise the rows the materializing
    upconv kernel would store), then apply this conv's own prologue
    into scratch[0]. The materialized upconv chunk (2x the carry
    bytes, written + re-read across the L1->L0 executor seam) never
    exists in HBM. Returns (yc, Sc, prec, cx) for the backward's
    epilogue chain."""
    yc, Sc, prec, cx = vup["yfn"](
        carry_ref, invc_ref, shiftc_ref, m0u_ref, m1u_ref, mask_ref,
        bu_ref, G=G, R=R, P=P, H=H, G1=vup["G1"], R1=vup["R1"],
        P1=vup["P1"], H1=vup["H1"], W1=vup["W1"], WRd=vup["WRd"],
        out_dtype=scratch.dtype, act=vup["act_c"], nd=1)
    a = yc.astype(jnp.float32).reshape(H, G, 128)
    pre = a * inv_ref[0][None, None, :] + shift_ref[0][None, None, :]
    val = _act_fwd(pre, act) * mask_ref[...][None]
    scratch[0, pl.ds(Ps, R)] = val.reshape(R, 128).astype(scratch.dtype)
    return yc, Sc, prec, cx


def _fused_conv_kernel(*refs, nin: int, nout: int, G: int, R: int, P: int,
                       Ps: int, H: int, wrs, out_dtype, act: str,
                       want_stats: bool, d_halo: bool = False,
                       per_sample: bool = False, vup: dict = None):
    nv = 3 if d_halo else 1
    ins = refs[:nin * nv]
    w0_ref, wc_ref, mask_ref, bias_ref, inv_ref, shift_ref = \
        refs[nin * nv:nin * nv + 6]
    pos = nin * nv + 6
    if vup:
        m0u_ref, m1u_ref, bu_ref, invc_ref, shiftc_ref = \
            refs[pos:pos + 5]
        pos += 5
    outs = refs[pos:pos + nout]
    idx = pos + nout
    if want_stats:
        s_ref, q_ref = refs[idx:idx + 2]
        scratches = refs[idx + 2:]
    else:
        scratches = refs[idx:]
    scratch = scratches[0]  # (nin, R + 2*Ps, 128)

    if want_stats:
        # per_sample (group/instance norm): the stats blocks are
        # b-indexed (squeezed batch dim) — reset at each b's FIRST
        # grid step, accumulate over d only.
        first = (pl.program_id(1) == 0 if per_sample else
                 jnp.logical_and(pl.program_id(0) == 0,
                                 pl.program_id(1) == 0))

        @pl.when(first)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)
            q_ref[...] = jnp.zeros_like(q_ref)

    for i in range(nin):
        scratch[i, 0:Ps] = jnp.zeros((Ps, 128), scratch.dtype)
        scratch[i, Ps + R:2 * Ps + R] = jnp.zeros((Ps, 128), scratch.dtype)
        if vup and i == 0:
            _vup_scratch(ins[0], scratch, m0u_ref, m1u_ref, bu_ref,
                         invc_ref, shiftc_ref, inv_ref, shift_ref,
                         mask_ref, G=G, R=R, P=P, Ps=Ps, H=H, act=act,
                         vup=vup)
            continue
        _build_scratch(ins[i * nv + nv // 2], i, scratch, wr=wrs[i],
                       G=G, R=R, P=P,
                       Ps=Ps, H=H, inv_ref=inv_ref, shift_ref=shift_ref,
                       mask_ref=mask_ref, act=act)
        if d_halo:
            for side, v in ((0, ins[i * 3]), (2, ins[i * 3 + 2])):
                _build_halo(v, i, side, scratch, wr=wrs[i], G=G, R=R,
                            P=P, Ps=Ps, H=H, inv_ref=inv_ref,
                            shift_ref=shift_ref, mask_ref=mask_ref,
                            act=act)

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    dims = (((1,), (0,)), ((), ()))
    for o in range(nout):
        y = jnp.zeros((R, 128), jnp.float32)
        for i in range(nin):
            for t in range(3):
                off = Ps + (t - 1) * G
                a = scratch[i, pl.ds(off, R), :]
                y = y + _dot(
                    a, w0_ref[i, o, 0, t], dimension_numbers=dims,
                    preferred_element_type=jnp.float32)
                # Combined corner: ONE anti-diagonal matmul for both
                # group-crossing taps (see combine_corner_weights).
                a_hi = scratch[i, pl.ds(off + 1, R), :]
                a_lo = scratch[i, pl.ds(off - 1, R), :]
                a_c = jnp.where(lane < CC, a_hi, a_lo)
                y = y + _dot(
                    a_c, wc_ref[i, o, 0, t], dimension_numbers=dims,
                    preferred_element_type=jnp.float32)
        y = y + bias_ref[o][None, :]
        y = (y.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128)
        yc = y.astype(out_dtype)
        outs[o][0, 0, 0:P] = jnp.zeros((P, 128), out_dtype)
        outs[o][0, 0, pl.ds(P, R)] = yc
        outs[o][0, 0, P + R:2 * P + R] = jnp.zeros((P, 128), out_dtype)
        if want_stats:
            yf = yc.astype(jnp.float32)  # stats of the stored rounding
            s_ref[o, :] += jnp.sum(yf, axis=0)
            q_ref[o, :] += jnp.sum(yf * yf, axis=0)


def _conv_fwd_call(xs, inv, shift, wpk, bias_l, mask, *, H, W, wrs,
                   want_stats, act, nout, d_halo=False, vup=None,
                   vup_ops=None):
    w0, wplus, wminus = wpk
    wcomb = combine_corner_weights(wplus, wminus)
    nin = len(xs)
    G, R, P = flat_geometry(H, W)
    Ps = G + 8
    B = xs[0].shape[0]
    D = xs[0].shape[1]
    dtype = xs[1].dtype if vup else xs[0].dtype
    assert not (vup and d_halo), "vup mode is untiled-only"

    # per-sample prologue/stats (group/instance norm): inv/shift are
    # (nin, B, 128) and stats (nout, B, 128); the batch dim is carried
    # as a squeezed (None) block dim indexed by grid b, so the kernel
    # body sees the same (nin, 128)/(nout, 128) blocks as batch norm.
    per_sample = inv.ndim == 3
    kernel = functools.partial(
        _fused_conv_kernel, nin=nin, nout=nout, G=G, R=R, P=P, Ps=Ps, H=H,
        wrs=tuple(wrs), out_dtype=dtype, act=act, want_stats=want_stats,
        d_halo=d_halo, per_sample=per_sample, vup=vup)

    in_specs = []
    operands = []
    bd4 = lambda b, d: (b, d, 0, 0)
    for i, x in enumerate(xs):
        views = ((x,) if not d_halo else
                 _strip_views(x, wrs[i], G, R, P, H))
        for v in views:
            in_specs.append(pl.BlockSpec((1, 1, v.shape[2], 128), bd4,
                                         memory_space=pltpu.VMEM))
            operands.append(v)
    for warr in (w0, wcomb):
        in_specs.append(pl.BlockSpec(warr.shape,
                                     lambda b, d, nd=warr.ndim: (0,) * nd,
                                     memory_space=pltpu.VMEM))
        operands.append(warr.astype(dtype))
    in_specs.append(pl.BlockSpec((G, 128), lambda b, d: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(mask.astype(jnp.float32))
    for v in (bias_l, inv, shift):
        op, spec = _ps_in(v.astype(jnp.float32))
        in_specs.append(spec)
        operands.append(op)
    if vup:
        M0u, M1u, bu_l, invc, shiftc = vup_ops
        for warr in (M0u, M1u):
            in_specs.append(pl.BlockSpec((128, 128), lambda b, d: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(warr.astype(dtype))
        for v in (bu_l, invc, shiftc):
            op, spec = _ps_in(v.astype(jnp.float32))
            in_specs.append(spec)
            operands.append(op)

    out_specs = [pl.BlockSpec((1, 1, R + 2 * P, 128),
                              lambda b, d: (b, d, 0, 0),
                              memory_space=pltpu.VMEM)
                 for _ in range(nout)]
    out_shape = [jax.ShapeDtypeStruct((B, D, R + 2 * P, 128), dtype)
                 for _ in range(nout)]
    if want_stats:
        st_spec, st_shape = _ps_out(nout, B if per_sample else None)
        out_specs += [st_spec] * 2
        out_shape += [st_shape] * 2

    flops = 2 * B * D * R * 128 * (128 + 2 * CC) * nin * nout * 3
    res = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((nin, R + 2 * Ps, 128), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(nin + nout) * B * D * (R + 2 * P) * 128 * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(*operands)
    ys = tuple(res[:nout])
    if want_stats:
        stats = tuple(s.transpose(1, 0, 2) if per_sample else s
                      for s in res[nout:nout + 2])
    else:
        stats = None
    return ys, stats


# --- merged backward kernel: dgrad + wgrad + prologue grads ---------------

def _fused_conv_bwd_kernel(*refs, nin: int, nout: int, G: int, R: int,
                           P: int, Ps: int, H: int, wrs, act: str,
                           want_stats: bool, x_dtype,
                           d_halo: bool = False,
                           per_sample: bool = False, vup: dict = None):
    # inputs: xs[nin], dys[nout], ys[nout](stats only), wT(w0,wc),
    #         mask, inv, shift, [vup: m0u, m1u, bu, invc, shiftc],
    #         ds, dq  (xs/dys/ys get 3 clamped slab
    #         views each in d_halo mode)
    # outputs: dxs[nin], dinv, dshift, m0, mc, db,
    #          [vup: dM0u, dM1u, dbu, dinvc, dshiftc]
    # scratch: a' (nin, Rps, 128), dyt (nout, Rps, 128)
    nv = 3 if d_halo else 1
    pos = 0
    ins = refs[pos:pos + nin * nv]; pos += nin * nv
    dys = refs[pos:pos + nout * nv]; pos += nout * nv
    ys = refs[pos:pos + nout * nv] if want_stats else ()
    pos += nout * nv if want_stats else 0
    w0T, wcT = refs[pos:pos + 2]; pos += 2
    mask_ref = refs[pos]; pos += 1
    inv_ref, shift_ref = refs[pos:pos + 2]; pos += 2
    if vup:
        m0u_ref, m1u_ref, bu_ref, invc_ref, shiftc_ref = \
            refs[pos:pos + 5]
        pos += 5
    if want_stats:
        ds_ref, dq_ref = refs[pos:pos + 2]; pos += 2
    dxs = refs[pos:pos + nin]; pos += nin
    dinv_ref, dshift_ref, m0, mc, db = refs[pos:pos + 5]; pos += 5
    if vup:
        dM0u, dM1u, dbu_ref, dinvc_ref, dshiftc_ref = refs[pos:pos + 5]
        pos += 5
    a_s, dyt_s = refs[pos:pos + 2]

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    # per_sample: dinv/dshift blocks are b-indexed — reset at each b's
    # first grid step (the weight accumulators stay global).
    first_b = pl.program_id(1) == 0 if per_sample else first

    @pl.when(first)
    def _():
        m0[...] = jnp.zeros_like(m0)
        mc[...] = jnp.zeros_like(mc)
        db[...] = jnp.zeros_like(db)
        if vup:
            dM0u[...] = jnp.zeros_like(dM0u)
            dM1u[...] = jnp.zeros_like(dM1u)
            dbu_ref[...] = jnp.zeros_like(dbu_ref)

    @pl.when(first_b)
    def _():
        dinv_ref[...] = jnp.zeros_like(dinv_ref)
        dshift_ref[...] = jnp.zeros_like(dshift_ref)
        if vup:
            dinvc_ref[...] = jnp.zeros_like(dinvc_ref)
            dshiftc_ref[...] = jnp.zeros_like(dshiftc_ref)

    # Stage A: recompute normalized/activated inputs a' into scratch
    for i in range(nin):
        a_s[i, 0:Ps] = jnp.zeros((Ps, 128), a_s.dtype)
        a_s[i, Ps + R:2 * Ps + R] = jnp.zeros((Ps, 128), a_s.dtype)
        if vup and i == 0:
            _vup_scratch(ins[0], a_s, m0u_ref, m1u_ref, bu_ref,
                         invc_ref, shiftc_ref, inv_ref, shift_ref,
                         mask_ref, G=G, R=R, P=P, Ps=Ps, H=H, act=act,
                         vup=vup)
            continue
        _build_scratch(ins[i * nv + nv // 2], i, a_s, wr=wrs[i],
                       G=G, R=R, P=P,
                       Ps=Ps, H=H, inv_ref=inv_ref, shift_ref=shift_ref,
                       mask_ref=mask_ref, act=act)
        if d_halo:
            for side, v in ((0, ins[i * 3]), (2, ins[i * 3 + 2])):
                _build_halo(v, i, side, a_s, wr=wrs[i], G=G, R=R,
                            P=P, Ps=Ps, H=H, inv_ref=inv_ref,
                            shift_ref=shift_ref, mask_ref=mask_ref,
                            act=act)

    # Stage B: fold the stats cotangent into dy and mask:
    # dy_tot = mask * (dy + ds + 2 * y * dq)
    def _dy_tot(o, dyv, yv, rows, hg):
        dy = dyv[0, 0, rows, :].astype(jnp.float32)
        if want_stats:
            y = yv[0, 0, rows, :].astype(jnp.float32)
            dy = dy + ds_ref[o][None, :] + 2.0 * y * dq_ref[o][None, :]
        return (dy.reshape(hg, G, 128)
                * mask_ref[...][None]).reshape(hg * G, 128)

    for o in range(nout):
        dyt_s[o, 0:Ps] = jnp.zeros((Ps, 128), dyt_s.dtype)
        dyt_s[o, Ps + R:2 * Ps + R] = jnp.zeros((Ps, 128), dyt_s.dtype)
        dy = _dy_tot(o, dys[o * nv + nv // 2],
                     ys[o * nv + nv // 2] if want_stats else None,
                     pl.ds(P, R), H)
        dyt_s[o, pl.ds(Ps, R)] = dy.astype(dyt_s.dtype)
        db[o, :] += jnp.sum(dy, axis=0)
        if d_halo:
            # dy/y halo operands are pre-shifted narrow strips
            # (_halo_strips): the block IS the boundary image row.
            for side, iv in ((0, 0), (2, 2)):
                dyh = _dy_tot(o, dys[o * 3 + iv],
                              ys[o * 3 + iv] if want_stats else None,
                              pl.ds(0, G), 1) * _halo_valid(side)
                dst = Ps - G if side == 0 else Ps + R
                dyt_s[o, pl.ds(dst, G)] = dyh.astype(dyt_s.dtype)

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    dims = (((1,), (0,)), ((), ()))
    cdims = (((0,), (0,)), ((), ()))
    for i in range(nin):
        # dgrad: conv of dy_tot with flipped/transposed weights
        # (combined-corner form, same structure as the forward)
        g = jnp.zeros((R, 128), jnp.float32)
        for o in range(nout):
            for t in range(3):
                off = Ps + (t - 1) * G
                dyv = dyt_s[o, pl.ds(off, R), :]
                g = g + _dot(
                    dyv, w0T[o, i, 0, t], dimension_numbers=dims,
                    preferred_element_type=jnp.float32)
                d_hi = dyt_s[o, pl.ds(off + 1, R), :]
                d_lo = dyt_s[o, pl.ds(off - 1, R), :]
                d_c = jnp.where(lane < CC, d_hi, d_lo)
                g = g + _dot(
                    d_c, wcT[o, i, 0, t], dimension_numbers=dims,
                    preferred_element_type=jnp.float32)
        # prologue epilogue: da' -> (dx, dinv, dshift)
        wr = wrs[i]
        ic = ins[i * nv + nv // 2]
        if vup and i == 0:
            # Virtual chunk: recompute the upconv rows, run this
            # conv's prologue epilogue against them (dinv/dshift slot
            # 0 = the upconv-output prologue grads), then chain the
            # upconv-output cotangent through the (1,2,2) taps and the
            # carry's f64 prologue — dcarry replaces dx0, dWu/dbu and
            # the carry prologue grads accumulate in the extra refs.
            # Matches the composed upconv122_from_flat64 backward
            # expression-for-expression (mask idempotent re-apply).
            yc, Scu, prec, cx = vup["yfn"](
                ic, invc_ref, shiftc_ref, m0u_ref, m1u_ref, mask_ref,
                bu_ref, G=G, R=R, P=P, H=H, G1=vup["G1"], R1=vup["R1"],
                P1=vup["P1"], H1=vup["H1"], W1=vup["W1"],
                WRd=vup["WRd"], out_dtype=x_dtype, act=vup["act_c"],
                nd=1)
            x = yc.astype(jnp.float32).reshape(R, 128)
            pre = x * inv_ref[0][None, :] + shift_ref[0][None, :]
            gm = (g.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128) \
                * _act_deriv(pre, act)
            dinv_ref[0, :] += jnp.sum(gm * x, axis=0)
            dshift_ref[0, :] += jnp.sum(gm, axis=0)
            da = gm * inv_ref[0][None, :]       # cotangent w.r.t. yu
            H1v, W1v = vup["H1"], vup["W1"]
            G1v, R1v, P1v = vup["G1"], vup["R1"], vup["P1"]
            WRdv = vup["WRd"]
            dyt = (da.reshape(H, G, 128) * mask_ref[...]
                   ).reshape(R, 128)
            dbu_ref[0, :] += jnp.sum(dyt, axis=0)
            d3 = dyt.reshape(H1v, 2 * G, 128)
            E = d3[:, 1:1 + WRdv, :].reshape(
                H1v * WRdv, 128).astype(x_dtype)
            O = d3[:, G + 1:G + 1 + WRdv, :].reshape(
                H1v * WRdv, 128).astype(x_dtype)
            dimsT = (((1,), (1,)), ((), ()))
            dSu = _dot(E, m0u_ref[...], dimension_numbers=dimsT,
                       preferred_element_type=jnp.float32) \
                + _dot(O, m1u_ref[...], dimension_numbers=dimsT,
                       preferred_element_type=jnp.float32)
            dM0u[...] += _dot(Scu, E, dimension_numbers=cdims,
                              preferred_element_type=jnp.float32)
            dM1u[...] += _dot(Scu, O, dimension_numbers=cdims,
                              preferred_element_type=jnp.float32)
            z1 = jnp.zeros((H1v, 1, 128), jnp.float32)
            z2 = jnp.zeros((H1v, G1v - WRdv - 1, 128), jnp.float32)
            demb = jnp.concatenate(
                [z1, dSu.reshape(H1v, WRdv, 128), z2],
                axis=1).reshape(1, R1v, 128)
            dprec = demb * _act_deriv(prec, vup["act_c"])
            dinvc_ref[0, :] += jnp.sum(dprec * cx, axis=(0, 1))
            dshiftc_ref[0, :] += jnp.sum(dprec, axis=(0, 1))
            dcx = (dprec * invc_ref[0][None, None, :]
                   ).reshape(R1v, 128)
            dxs[0][0, 0, 0:P1v] = jnp.zeros((P1v, 128), x_dtype)
            dxs[0][0, 0, pl.ds(P1v, R1v)] = dcx.astype(x_dtype)
            dxs[0][0, 0, P1v + R1v:2 * P1v + R1v] = \
                jnp.zeros((P1v, 128), x_dtype)
        else:
            if wr:
                x = ic[0, 0, :, :].astype(jnp.float32).reshape(H, wr, 128)
                z1 = jnp.zeros((H, 1, 128), jnp.float32)
                z2 = jnp.zeros((H, G - wr - 1, 128), jnp.float32)
                x = jnp.concatenate([z1, x, z2], axis=1).reshape(R, 128)
            else:
                x = ic[0, 0, pl.ds(P, R), :].astype(jnp.float32)
            pre = x * inv_ref[i][None, :] + shift_ref[i][None, :]
            gm = (g.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128) \
                * _act_deriv(pre, act)
            dinv_ref[i, :] += jnp.sum(gm * x, axis=0)
            dshift_ref[i, :] += jnp.sum(gm, axis=0)
            dx = gm * inv_ref[i][None, :]
            if wr:
                dxv = dx.reshape(H, G, 128)[:, 1:1 + wr, :]
                dxs[i][0, 0, :, :] = dxv.reshape(H * wr, 128).astype(x_dtype)
            else:
                dxs[i][0, 0, 0:P] = jnp.zeros((P, 128), x_dtype)
                dxs[i][0, 0, pl.ds(P, R)] = dx.astype(x_dtype)
                dxs[i][0, 0, P + R:2 * P + R] = jnp.zeros((P, 128), x_dtype)
        # wgrad: a'^T dy_tot per tap block; the combined-corner
        # accumulator's useful blocks are [0:CC, 96:128] (= wplus grad,
        # a_hi lanes x dy high lanes) and [96:128, 0:CC] (= wminus).
        for o in range(nout):
            for t in range(3):
                off = Ps + (t - 1) * G
                a = a_s[i, pl.ds(off, R), :]
                dyv = dyt_s[o, pl.ds(Ps, R), :]
                m0[i, o, 0, t] += _dot(
                    a, dyv, dimension_numbers=cdims,
                    preferred_element_type=jnp.float32)
                a_hi = a_s[i, pl.ds(off + 1, R), :]
                a_lo = a_s[i, pl.ds(off - 1, R), :]
                a_c = jnp.where(lane < CC, a_hi, a_lo)
                mc[i, o, 0, t] += _dot(
                    a_c, dyv, dimension_numbers=cdims,
                    preferred_element_type=jnp.float32)


def _unpack_wgrad(m0, mc, nin, nout):
    """Tap-block accumulators -> dw (1, 3, 3, cin, cout) f32. mc is the
    combined-corner accumulator; its anti-diagonal blocks carry the
    wplus/wminus grads."""
    mp = mc[..., 0:CC, 128 - CC:128]
    mm = mc[..., 128 - CC:128, 0:CC]
    cin, cout = nin * CC, nout * CC
    dw = jnp.zeros((1, 3, 3, cin, cout), jnp.float32)
    for kw in range(3):
        acc = jnp.zeros((nin, nout, 1, 3, CC, CC), jnp.float32)
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
        blk = jnp.transpose(acc, (2, 3, 0, 4, 1, 5)).reshape(1, 3, cin, cout)
        dw = dw.at[:, :, kw].set(blk)
    return dw


def conv_bnact_flat(xs, inv, shift, w, b, H: int, W: int,
                    wrs: Tuple[int, ...], want_stats: bool, act: str,
                    d_halo: bool = False):
    """Public wrapper: always passes d_halo explicitly (custom_vjp
    nondiff args don't apply defaults). See _conv_bnact_vjp.

    The optimization_barrier on w isolates the weight packing's
    at[].set block construction from its producers — XLA:TPU
    miscompiles producer-into-pack fusion (e.g. a cin jnp.pad) for
    traced weights; see flat_fused64.conv3_bnact_flat64."""
    w = jax.lax.optimization_barrier(w)
    return _conv_bnact_vjp(xs, inv, shift, w, b, H, W, tuple(wrs),
                           want_stats, act, d_halo)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _conv_bnact_vjp(xs, inv, shift, w, b, H: int, W: int,
                    wrs: Tuple[int, ...], want_stats: bool, act: str,
                    d_halo: bool = False):
    """Fused prologue + planar 3x3 'same' conv + stats side outputs.

    Args:
        xs: tuple of input chunks. Chunk i is a padded flat chunk
            (B, D, R + 2P, 128) if ``wrs[i] == 0``, else a dense-row
            view (B, D, H * wrs[i], 128) of a channels-last tensor
            with wrs[i] = W_dense * CC / 128 rows per image row.
        inv, shift: (nin, 128) f32 per-chunk prologue lane vectors
            (BN-apply: a' = act(inv * x + shift), then re-masked).
        w: (1, 3, 3, nin*CC, cout) raw conv weights; b: (cout,).
        H, W: image height/width. wrs: static per-chunk adapter rows.
        want_stats: also return per-lane (sum, sumsq) of the output.
        act: 'relu' | 'leaky' | 'linear'.
    Returns:
        (ys, stats): nout padded flat chunks + ((nout,128),(nout,128))
        f32 stats or None.
    """
    bias_l = jnp.tile(b.reshape(-1, CC), (1, JG))
    ys, stats = _conv_fwd_call(
        xs, inv, shift, pack_flat_weights(w), bias_l, width_mask(W),
        H=H, W=W, wrs=wrs, want_stats=want_stats, act=act,
        nout=w.shape[-1] // CC, d_halo=d_halo)
    return ys, stats


def _conv_bnact_fwd(xs, inv, shift, w, b, H, W, wrs, want_stats, act,
                    d_halo=False):
    out = _conv_bnact_vjp(xs, inv, shift, w, b, H, W, wrs, want_stats,
                          act, d_halo)
    ys, _ = out
    return out, (xs, inv, shift, w, ys)


def _conv_bnact_bwd(H, W, wrs, want_stats, act, d_halo, res, cts):
    xs, inv, shift, w, ys = res
    dys_in, dstats = cts
    nin, nout = len(xs), len(ys)
    G, R, P = flat_geometry(H, W)
    Ps = G + 8
    B, D = xs[0].shape[0], xs[0].shape[1]
    dtype = xs[0].dtype
    mask = width_mask(W)
    w0T, wpT, wmT = pack_flat_weights(
        jax.lax.optimization_barrier(_flip_transpose(w)))
    wT = (w0T, combine_corner_weights(wpT, wmT))

    per_sample = inv.ndim == 3
    st_shape = (nout, B, 128) if per_sample else (nout, 128)
    # Incoming cotangents may be symbolic zeros; concretize.
    dys = tuple(jnp.zeros((B, D, R + 2 * P, 128), dtype) if dy is None
                else dy.astype(dtype) for dy in dys_in)
    if want_stats:
        ds, dq = dstats
        ds = jnp.zeros(st_shape, jnp.float32) if ds is None else ds
        dq = jnp.zeros(st_shape, jnp.float32) if dq is None else dq

    kernel = functools.partial(
        _fused_conv_bwd_kernel, nin=nin, nout=nout, G=G, R=R, P=P, Ps=Ps,
        H=H, wrs=tuple(wrs), act=act, want_stats=want_stats,
        x_dtype=dtype, d_halo=d_halo, per_sample=per_sample)

    in_specs, operands = [], []

    def add(arr, spec_shape, index_map):
        in_specs.append(pl.BlockSpec(spec_shape, index_map,
                                     memory_space=pltpu.VMEM))
        operands.append(arr)

    bd = lambda b_, d_: (b_, d_, 0, 0)

    def addv(arr, rows, wr=0):
        """Per-chunk operands: center only, or [strip0, center, strip2]
        with pre-shifted narrow halo strips (d_halo; see _halo_strips)."""
        if d_halo:
            for v in _strip_views(arr, wr, G, R, P, H):
                add(v, (1, 1, v.shape[2], 128), bd)
        else:
            add(arr, (1, 1, rows, 128), bd)

    for i, x in enumerate(xs):
        addv(x, x.shape[2], wrs[i])
    for dy in dys:
        addv(dy, R + 2 * P)
    if want_stats:
        for y in ys:
            addv(y, R + 2 * P)
    for warr in wT:
        add(warr.astype(dtype), warr.shape,
            lambda b_, d_, nd=warr.ndim: (0,) * nd)
    add(mask.astype(jnp.float32), (G, 128), lambda b_, d_: (0, 0))
    for v in (inv, shift):
        op, spec = _ps_in(v.astype(jnp.float32))
        in_specs.append(spec)
        operands.append(op)
    if want_stats:
        for v in (ds, dq):
            op, spec = _ps_in(v)
            in_specs.append(spec)
            operands.append(op)

    out_specs, out_shape = [], []
    for i in range(nin):
        rows = H * wrs[i] if wrs[i] else R + 2 * P
        out_specs.append(pl.BlockSpec((1, 1, rows, 128), bd,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, D, rows, 128), dtype))
    const2 = lambda b_, d_: (0, 0)
    for _ in range(2):   # dinv, dshift
        sp, sh = _ps_out(nin, B if per_sample else None)
        out_specs.append(sp)
        out_shape.append(sh)
    for shp in ((nin, nout, 1, 3, 128, 128), (nin, nout, 1, 3, 128, 128)):
        out_specs.append(pl.BlockSpec(
            shp, lambda b_, d_, nd=len(shp): (0,) * nd,
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(shp, jnp.float32))
    out_specs.append(pl.BlockSpec((nout, 128), const2,
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((nout, 128), jnp.float32))

    res_ = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((nin, R + 2 * Ps, 128), dtype),
                        pltpu.VMEM((nout, R + 2 * Ps, 128), dtype)],
        cost_estimate=pl.CostEstimate(
            # dgrad + wgrad, each the forward's FLOPs
            flops=2 * 2 * B * D * R * 128 * (128 + 2 * CC)
            * nin * nout * 3,
            bytes_accessed=(2 * nin + (3 if want_stats else 2) * nout)
            * B * D * (R + 2 * P) * 256,
            transcendentals=0),
        interpret=_interpret(),
    )(*operands)
    dxs = tuple(res_[:nin])
    dinv, dshift, m0, mc, db = res_[nin:nin + 5]
    if per_sample:
        dinv = dinv.transpose(1, 0, 2)
        dshift = dshift.transpose(1, 0, 2)
    # barrier: keep the at[].set/add unpack chain from fusing with its
    # producers (same XLA:TPU scatter-fusion miscompile as the weight
    # packing — see conv_bnact_flat).
    m0, mc = jax.lax.optimization_barrier((m0, mc))
    dw = _unpack_wgrad(m0, mc, nin, nout).astype(w.dtype)
    dbc = jnp.sum(db.reshape(nout, JG, CC), axis=1).reshape(-1)
    return dxs, dinv, dshift, dw, dbc.astype(w.dtype)


_conv_bnact_vjp.defvjp(_conv_bnact_fwd, _conv_bnact_bwd)


# ---------------------------------------------------------------------------
# vup merge conv: the decoder merge conv with chunk 0 VIRTUAL — the
# (1,2,2) upconv output recomputed in-kernel from the deeper level's
# FlatActs64 carry (see _vup_scratch). Kills the L1->L0 executor-seam
# materialization the MFU ledger singled out as the last headline
# lever (BASELINE.md round-5 ledger: up_2/upconv moves >= 262 MB/pass
# at stream rate only to be re-read by up_2/conv1). Batch statistics
# of the never-materialized upconv output come from
# flat_fused64.upconv122_stats_from_flat64 (one carry-sized stats
# pass); eval-mode BN needs no pass at all. The backward folds the
# whole chain — conv dgrad -> upconv-prologue grads -> (1,2,2) tap
# transpose -> carry-prologue grads -> dcarry — into the one merged
# kernel. vs the composed path, dcarry grads skip one bf16 rounding
# (the dx0 chunk that no longer round-trips through HBM).
#
# MEASURED DEAD END on the v5e (2026-08-20; default OFF, models/
# unet.py _vup_on): headline step 53.7 vs 48.2 ms. The merge conv is
# compute-bound (84% of packing ceiling) with the seam reads DMA-
# hidden, so deleting them bought nothing; the recompute's even/odd
# row interleave (unaligned sublane shuffle at WRd=22) is serial VPU
# work repeated 5x per step (fwd scratch, 2x bwd rebuild, stats fwd +
# stats bwd) at nd=1 with no D-batching. Kept as a parity-tested
# capability (tests/test_flat_vup.py) — a future Mosaic with cheap
# strided sublane stores changes the calculus.
# ---------------------------------------------------------------------------

def _vup_geom(H: int, W: int):
    from elektronn3_tpu.ops.flat_fused64 import (
        _upconv122_f64_y, flat_geometry64, CC64)
    H1, W1 = H // 2, W // 2
    assert W1 % 2 == 0, W1
    G1, R1, P1 = flat_geometry64(H1, W1)
    return dict(yfn=_upconv122_f64_y, G1=G1, R1=R1, P1=P1, H1=H1,
                W1=W1, WRd=W1 * CC64 // 128)


def conv_bnact_flat_vup(carry, invc, shiftc, wu, bu, xs, inv, shift,
                        w, b, H: int, W: int, wrs: Tuple[int, ...],
                        want_stats: bool, act: str, act_c: str):
    """Decoder merge conv with a virtual upconv chunk.

    Args:
        carry: (B, D, R1 + 2*P1, 128) flat64 chunk at (H/2, W/2) — the
            deeper fused64 level's FlatActs64 chunk.
        invc, shiftc: its (1, 128) prologue lane vectors (f64 layout).
        wu: (1, 2, 2, 64, CC) flax ConvTranspose kernel; bu: (CC,).
        xs: skip chunks (CC=32 layout). inv/shift: (1 + len(xs), 128)
            prologue vectors, slot 0 = the upconv-output prologue.
        w, b, H, W, wrs, want_stats, act: as conv_bnact_flat (wrs[0]
            must be 0; the virtual chunk has no dense adapter).
        act_c: the CARRY prologue's activation (deeper level's act).
    Returns:
        (ys, stats) as conv_bnact_flat.
    """
    wu = jax.lax.optimization_barrier(wu)
    w = jax.lax.optimization_barrier(w)
    return _conv_vup_vjp(carry, invc, shiftc, wu, bu, tuple(xs), inv,
                         shift, w, b, H, W, tuple(wrs), want_stats,
                         act, act_c)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(10, 11, 12, 13, 14, 15))
def _conv_vup_vjp(carry, invc, shiftc, wu, bu, xs, inv, shift, w, b,
                  H: int, W: int, wrs: Tuple[int, ...],
                  want_stats: bool, act: str, act_c: str):
    assert wrs[0] == 0, wrs
    bias_l = jnp.tile(b.reshape(-1, CC), (1, JG))
    bu_l = jnp.tile(bu.reshape(-1, CC), (1, JG))
    M0u, M1u = pack_upconv_weights(wu)
    ys, stats = _conv_fwd_call(
        (carry,) + tuple(xs), inv, shift, pack_flat_weights(w), bias_l,
        width_mask(W), H=H, W=W, wrs=wrs, want_stats=want_stats,
        act=act, nout=w.shape[-1] // CC,
        vup=dict(_vup_geom(H, W), act_c=act_c),
        vup_ops=(M0u, M1u, bu_l, invc, shiftc))
    return ys, stats


def _conv_vup_fwd(carry, invc, shiftc, wu, bu, xs, inv, shift, w, b,
                  H, W, wrs, want_stats, act, act_c):
    out = _conv_vup_vjp(carry, invc, shiftc, wu, bu, xs, inv, shift,
                        w, b, H, W, wrs, want_stats, act, act_c)
    ys, _ = out
    return out, (carry, invc, shiftc, wu, bu, xs, inv, shift, w, ys)


def _conv_vup_bwd(H, W, wrs, want_stats, act, act_c, res, cts):
    carry, invc, shiftc, wu, bu, xs, inv, shift, w, ys = res
    dys_in, dstats = cts
    vup = dict(_vup_geom(H, W), act_c=act_c)
    R1, P1 = vup["R1"], vup["P1"]
    nin, nout = 1 + len(xs), len(ys)
    G, R, P = flat_geometry(H, W)
    Ps = G + 8
    B, D = carry.shape[0], carry.shape[1]
    dtype = xs[0].dtype
    mask = width_mask(W)
    w0T, wpT, wmT = pack_flat_weights(
        jax.lax.optimization_barrier(_flip_transpose(w)))
    wT = (w0T, combine_corner_weights(wpT, wmT))
    M0u, M1u = pack_upconv_weights(
        jax.lax.optimization_barrier(wu))
    bu_l = jnp.tile(bu.reshape(-1, CC), (1, JG))

    per_sample = inv.ndim == 3
    st_shape = (nout, B, 128) if per_sample else (nout, 128)
    dys = tuple(jnp.zeros((B, D, R + 2 * P, 128), dtype) if dy is None
                else dy.astype(dtype) for dy in dys_in)
    if want_stats:
        ds, dq = dstats
        ds = jnp.zeros(st_shape, jnp.float32) if ds is None else ds
        dq = jnp.zeros(st_shape, jnp.float32) if dq is None else dq

    kernel = functools.partial(
        _fused_conv_bwd_kernel, nin=nin, nout=nout, G=G, R=R, P=P,
        Ps=Ps, H=H, wrs=tuple(wrs), act=act, want_stats=want_stats,
        x_dtype=dtype, d_halo=False, per_sample=per_sample, vup=vup)

    in_specs, operands = [], []

    def add(arr, spec_shape, index_map):
        in_specs.append(pl.BlockSpec(spec_shape, index_map,
                                     memory_space=pltpu.VMEM))
        operands.append(arr)

    bd = lambda b_, d_: (b_, d_, 0, 0)
    add(carry, (1, 1, R1 + 2 * P1, 128), bd)
    for x in xs:
        add(x, (1, 1, x.shape[2], 128), bd)
    for dy in dys:
        add(dy, (1, 1, R + 2 * P, 128), bd)
    if want_stats:
        for y in ys:
            add(y, (1, 1, R + 2 * P, 128), bd)
    for warr in wT:
        add(warr.astype(dtype), warr.shape,
            lambda b_, d_, nd=warr.ndim: (0,) * nd)
    add(mask.astype(jnp.float32), (G, 128), lambda b_, d_: (0, 0))
    for v in (inv, shift):
        op, spec = _ps_in(v.astype(jnp.float32))
        in_specs.append(spec)
        operands.append(op)
    for warr in (M0u, M1u):
        add(warr.astype(dtype), (128, 128), lambda b_, d_: (0, 0))
    for v in (bu_l, invc, shiftc):
        op, spec = _ps_in(v.astype(jnp.float32))
        in_specs.append(spec)
        operands.append(op)
    if want_stats:
        for v in (ds, dq):
            op, spec = _ps_in(v)
            in_specs.append(spec)
            operands.append(op)

    out_specs, out_shape = [], []
    out_specs.append(pl.BlockSpec((1, 1, R1 + 2 * P1, 128), bd,
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((B, D, R1 + 2 * P1, 128),
                                          dtype))
    for i in range(1, nin):
        rows = H * wrs[i] if wrs[i] else R + 2 * P
        out_specs.append(pl.BlockSpec((1, 1, rows, 128), bd,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, D, rows, 128), dtype))
    const2 = lambda b_, d_: (0, 0)
    for _ in range(2):   # dinv, dshift
        sp, sh = _ps_out(nin, B if per_sample else None)
        out_specs.append(sp)
        out_shape.append(sh)
    for shp in ((nin, nout, 1, 3, 128, 128), (nin, nout, 1, 3, 128, 128)):
        out_specs.append(pl.BlockSpec(
            shp, lambda b_, d_, nd=len(shp): (0,) * nd,
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(shp, jnp.float32))
    out_specs.append(pl.BlockSpec((nout, 128), const2,
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((nout, 128), jnp.float32))
    # vup extras: dM0u, dM1u, dbu, dinvc, dshiftc
    for _ in range(2):
        out_specs.append(pl.BlockSpec((128, 128), const2,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((128, 128), jnp.float32))
    out_specs.append(pl.BlockSpec((1, 128), const2,
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((1, 128), jnp.float32))
    for _ in range(2):   # dinvc, dshiftc
        sp, sh = _ps_out(1, B if per_sample else None)
        out_specs.append(sp)
        out_shape.append(sh)

    res_ = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((nin, R + 2 * Ps, 128), dtype),
                        pltpu.VMEM((nout, R + 2 * Ps, 128), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * D * R * 128 * (128 + 2 * CC)
            * nin * nout * 3,
            bytes_accessed=(2 * nin + (3 if want_stats else 2) * nout)
            * B * D * (R + 2 * P) * 256,
            transcendentals=0),
        interpret=_interpret(),
    )(*operands)
    dcarry = res_[0]
    dxs_rest = tuple(res_[1:nin])
    dinv, dshift, m0, mc, db = res_[nin:nin + 5]
    dM0u, dM1u, dbu, dinvc, dshiftc = res_[nin + 5:nin + 10]
    if per_sample:
        dinv = dinv.transpose(1, 0, 2)
        dshift = dshift.transpose(1, 0, 2)
        dinvc = dinvc.transpose(1, 0, 2)
        dshiftc = dshiftc.transpose(1, 0, 2)
    m0, mc = jax.lax.optimization_barrier((m0, mc))
    dw = _unpack_wgrad(m0, mc, nin, nout).astype(w.dtype)
    dbc = jnp.sum(db.reshape(nout, JG, CC), axis=1).reshape(-1)
    dM0u, dM1u = jax.lax.optimization_barrier((dM0u, dM1u))
    dwu = _unpack_upconv_wgrad(dM0u, dM1u).astype(wu.dtype)
    dbu_c = jnp.sum(dbu.reshape(JG, CC), axis=0).astype(wu.dtype)
    return (dcarry, dinvc, dshiftc, dwu, dbu_c, dxs_rest, dinv,
            dshift, dw, dbc.astype(w.dtype))


_conv_vup_vjp.defvjp(_conv_vup_fwd, _conv_vup_bwd)


# ---------------------------------------------------------------------------
# Fused pool: prologue(BN-apply + act) -> (1, 2, 2) max-pool, emitting
# the pooled tensor as dense channels-last rows. C in {32, 64}.
# ---------------------------------------------------------------------------

def _roll_lanes(x, k):
    """Roll the minor (lane) axis left by k (static)."""
    return jnp.concatenate([x[..., k:], x[..., :k]], axis=-1)


def _interleave_rows(a, b):
    """(N, M, 128), (N, M, 128) -> (N, 2M, 128) rows [a0, b0, a1, b1..]."""
    N, M, _ = a.shape
    return jnp.concatenate([a[:, :, None, :], b[:, :, None, :]],
                           axis=2).reshape(N, 2 * M, 128)


def _pool_compact(a3, H, G):
    """a' (H, G, 128) -> compact pooled (H//2, G, 128): lanes 0:32 =
    max over w-pair (j0, j1), lanes 32:64 = max over (j2, j3), rest 0;
    rows h-pair maxed."""
    m1 = jnp.maximum(a3, _roll_lanes(a3, CC))
    V = jnp.concatenate([m1[:, :, 0:CC], m1[:, :, 2 * CC:3 * CC],
                         jnp.zeros((H, G, 64), m1.dtype)], axis=2)
    V2 = V.reshape(H // 2, 2 * G, 128)
    return jnp.maximum(V2[:, :G], V2[:, G:])


def _pool_decompose_xla(dense5, G: int, nin: int):
    """XLA: dense (B, D, H2, W2, C) -> per-chunk COMPACT pooled rows
    (B, D, H2 * G, 128) (inverse of _pool_compose_xla; pad rows/lanes
    zero). Runs on the quarter-resolution tensor — cheap — so the pool
    backward kernel's expand is pure lane/row duplication."""
    B, D, H2, W2, C = dense5.shape
    WRp = W2 * C // 128
    dr = dense5.reshape(B, D, H2, WRp, 128)
    outs = []
    for i in range(nin):
        if nin == 1:
            v = dr.reshape(B, D, H2, 2 * WRp, 64)
        else:
            assert nin == 2
            e = dr[..., i * CC:(i + 1) * CC]
            o = dr[..., 64 + i * CC:64 + (i + 1) * CC]
            v = jnp.concatenate([e, o], axis=-1)        # (.., WRp, 64)
        grows = v.shape[3]
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (1, G - 1 - grows),
                        (0, 64)))
        outs.append(v.reshape(B, D, H2 * G, 128))
    return outs


def _pool_expand(Sc, H, G):
    """COMPACT pooled rows (H2 * G, 128) -> (H, G, 128) per-position
    pooled value in the a'-lane convention ((j, ci) lanes)."""
    H2 = H // 2
    Vh = Sc.reshape(H2, G, 128)
    # w-expand: lane j in {0,1} <- compact 0:32; j in {2,3} <- 32:64
    E = jnp.concatenate([Vh[:, :, 0:CC], Vh[:, :, 0:CC],
                         Vh[:, :, CC:2 * CC], Vh[:, :, CC:2 * CC]], axis=2)
    # h-expand: duplicate rows
    return jnp.concatenate([E[:, None, :, :], E[:, None, :, :]],
                           axis=1).reshape(H, G, 128)


def _ps_in(v):
    """(operand, BlockSpec) for an (n, 128) prologue/stat operand or
    its per-sample (n, B, 128) form (group/instance norm). Mosaic
    requires a block's LAST TWO dims to be (8, 128)-aligned or equal
    to the array dims, so the squeezed batch dim must lead: per-sample
    operands ship transposed to (B, n, 128) with block (None, n, 128)
    indexed (b, 0, 0). Kernels see the same (n, 128) block either
    way."""
    if v.ndim == 3:
        return v.transpose(1, 0, 2), pl.BlockSpec(
            (None, v.shape[0], 128), lambda b_, d_: (b_, 0, 0),
            memory_space=pltpu.VMEM)
    return v, pl.BlockSpec(v.shape, lambda b_, d_: (0, 0),
                           memory_space=pltpu.VMEM)


def _ps_out(n: int, B: Optional[int] = None):
    """(BlockSpec, ShapeDtypeStruct) for an (n, 128) f32 stat output,
    or its per-sample B-LEADING (B, n, 128) form (see _ps_in); apply
    `.transpose(1, 0, 2)` to the result to restore the canonical
    (n, B, 128) layout."""
    if B is not None:
        return (pl.BlockSpec((None, n, 128), lambda b_, d_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                jax.ShapeDtypeStruct((B, n, 128), jnp.float32))
    return (pl.BlockSpec((n, 128), lambda b_, d_: (0, 0),
                         memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct((n, 128), jnp.float32))


def _load_prologue(ref, i, *, wr, G, R, P, H, inv_ref, shift_ref,
                   mask_ref, act):
    """Like _build_scratch but returns (a' (H,G,128) f32, pre, x)."""
    if wr:
        x = ref[0, 0, :, :].astype(jnp.float32).reshape(H, wr, 128)
        z1 = jnp.zeros((H, 1, 128), jnp.float32)
        z2 = jnp.zeros((H, G - wr - 1, 128), jnp.float32)
        x = jnp.concatenate([z1, x, z2], axis=1)
    else:
        x = ref[0, 0, pl.ds(P, R), :].astype(jnp.float32).reshape(H, G, 128)
    pre = x * inv_ref[i][None, None, :] + shift_ref[i][None, None, :]
    return _act_fwd(pre, act) * mask_ref[...][None], pre, x


def _pool_fwd_kernel(*refs, nin: int, G: int, R: int, P: int, H: int,
                     WRp: int, wrs, act: str, out_dtype):
    # Emits the COMPACT pooled form per chunk: (H2 * G, 128) rows with
    # pooled values in lanes 0:64 ([w-pair-even | w-pair-odd] x CC).
    # The dense-row compose (a row-pair merge = stride-2 row gather,
    # which Mosaic cannot express as a vector op) happens in XLA on
    # the quarter-sized result — see pool_bnact_flat.
    ins = refs[:nin]
    mask_ref, inv_ref, shift_ref = refs[nin:nin + 3]
    outs = refs[nin + 3:]
    H2 = H // 2
    for i in range(nin):
        a3, _, _ = _load_prologue(ins[i], i, wr=wrs[i], G=G, R=R, P=P, H=H,
                                  inv_ref=inv_ref, shift_ref=shift_ref,
                                  mask_ref=mask_ref, act=act)
        V = _pool_compact(a3, H, G)                    # (H2, G, 128)
        outs[i][0, 0, :, :] = V.reshape(H2 * G, 128).astype(out_dtype)


def _pool_compose_xla(compacts, H: int, G: int, W2: int, C: int):
    """XLA: compact pooled chunks -> dense (B, D, H2, W2, C)."""
    H2 = compacts[0].shape[2] // G
    B, D = compacts[0].shape[0], compacts[0].shape[1]
    nin = len(compacts)
    if nin == 1:
        v = compacts[0].reshape(B, D, H2, G, 128)[:, :, :, 1:1 + W2 // 2,
                                                  0:64]
        return v.reshape(B, D, H2, W2, C)
    vs = [c.reshape(B, D, H2, G, 128)[:, :, :, 1:1 + W2 // 2, :]
          for c in compacts]
    assert nin == 2
    v0, v1 = vs
    dense = jnp.concatenate([v0[..., 0:CC], v1[..., 0:CC],
                             v0[..., CC:2 * CC], v1[..., CC:2 * CC]],
                            axis=-1)
    return dense.reshape(B, D, H2, W2, C)


def _pool_bwd_kernel(*refs, nin: int, G: int, R: int, P: int, H: int,
                     WRp: int, wrs, act: str, x_dtype,
                     with_skip: bool = False,
                     per_sample: bool = False):
    ins = refs[:nin]
    dy_refs = refs[nin:2 * nin]      # compact cotangent per chunk
    pos = 2 * nin
    # with_skip: the level's raw chunks also feed the decoder skip
    # (pool_bnact_flat_skip routes them through this primitive), so
    # the skip cotangent is summed in-kernel — replacing a separate
    # chunk-sized XLA add_any (measured 0.9 ms at the headline L0).
    dsk = refs[pos:pos + nin] if with_skip else ()
    pos += nin if with_skip else 0
    mask_ref, inv_ref, shift_ref = refs[pos:pos + 3]
    dxs = refs[pos + 3:pos + 3 + nin]
    dinv_ref, dshift_ref = refs[pos + 3 + nin:]

    first = (pl.program_id(1) == 0 if per_sample else
             jnp.logical_and(pl.program_id(0) == 0,
                             pl.program_id(1) == 0))

    @pl.when(first)
    def _():
        dinv_ref[...] = jnp.zeros_like(dinv_ref)
        dshift_ref[...] = jnp.zeros_like(dshift_ref)

    for i in range(nin):
        a3, pre, x = _load_prologue(ins[i], i, wr=wrs[i], G=G, R=R, P=P,
                                    H=H, inv_ref=inv_ref,
                                    shift_ref=shift_ref, mask_ref=mask_ref,
                                    act=act)
        # Pooled maxima recomputed from a3 (bitwise-identical to the
        # forward's _pool_compact on the same prologue) instead of
        # re-reading the stored y chunk: saves one compact-chunk HBM
        # read per chunk (~95 MB/step at the headline L0; the kernel
        # is bandwidth-bound — see BASELINE.md MFU ledger).
        yb = _pool_expand(_pool_compact(a3, H, G), H, G)
        dyb = _pool_expand(dy_refs[i][0, 0, :, :].astype(jnp.float32),
                           H, G)
        sel = (a3 == yb).astype(jnp.float32) * mask_ref[...][None]
        dpre = dyb * sel * _act_deriv(pre, act)
        dinv_ref[i, :] += jnp.sum((dpre * x).reshape(R, 128), axis=0)
        dshift_ref[i, :] += jnp.sum(dpre.reshape(R, 128), axis=0)
        dx = (dpre * inv_ref[i][None, None, :]).reshape(R, 128)
        wr = wrs[i]
        if wr:
            dxv = dx.reshape(H, G, 128)[:, 1:1 + wr, :] \
                .reshape(H * wr, 128)
            if with_skip:
                dxv = dxv + dsk[i][0, 0, :, :].astype(jnp.float32)
            dxs[i][0, 0, :, :] = dxv.astype(x_dtype)
        else:
            if with_skip:
                dx = dx + dsk[i][0, 0, pl.ds(P, R), :] \
                    .astype(jnp.float32)
            dxs[i][0, 0, 0:P] = jnp.zeros((P, 128), x_dtype)
            dxs[i][0, 0, pl.ds(P, R)] = dx.astype(x_dtype)
            dxs[i][0, 0, P + R:2 * P + R] = jnp.zeros((P, 128), x_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def pool_bnact_flat(xs, inv, shift, H: int, W: int, wrs, act: str,
                    out_form: str = "dense5"):
    """Prologue (BN-apply + act) + (1,2,2) max-pool from flat chunks to
    a dense channels-last (B, D, H/2, W/2, C) tensor — or, with
    ``out_form='compact32'`` (nin == 1 only), the kernel's raw COMPACT
    form (B, D, H/2 * G, 128): lanes [w-pair-even CC | w-pair-odd CC |
    zeros]. The compact form is row- and group-aligned with the flat64
    chunk layout of the pooled level (chunk64 row g covers pooled w'
    in {2(g-1), 2(g-1)+1} = exactly compact row g's two lane halves),
    so the fused64 conv1 consumes it with an in-kernel lane shuffle —
    no XLA compose/relayout seam in either direction.

    Alignment: H % 2 == 0, W % 2 == 0 and (W/2 * C) % 128 == 0.
    Gradient note: exact float ties inside a pooling window route the
    cotangent to every tied element (XLA picks one); ties at the ReLU
    zero level are masked out, other ties are measure-zero.
    """
    assert out_form in ("dense5", "compact32"), out_form
    nin = len(xs)
    C = nin * CC
    G, R, P = flat_geometry(H, W)
    H2, W2 = H // 2, W // 2
    # Dense-row compose needs 128-aligned rows; the compact form doesn't.
    assert out_form == "compact32" or (W2 * C) % 128 == 0, (W2, C)
    WRp = W2 * C // 128
    B, D = xs[0].shape[0], xs[0].shape[1]
    dtype = xs[0].dtype

    kernel = functools.partial(_pool_fwd_kernel, nin=nin, G=G, R=R, P=P,
                               H=H, WRp=WRp, wrs=tuple(wrs), act=act,
                               out_dtype=dtype)
    in_specs, operands = [], []
    bd = lambda b_, d_: (b_, d_, 0, 0)
    for x in xs:
        in_specs.append(pl.BlockSpec((1, 1, x.shape[2], 128), bd,
                                     memory_space=pltpu.VMEM))
        operands.append(x)
    in_specs.append(pl.BlockSpec((G, 128), lambda b_, d_: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(width_mask(W).astype(jnp.float32))
    for v in (inv, shift):
        op, spec = _ps_in(v.astype(jnp.float32))
        in_specs.append(spec)
        operands.append(op)
    res = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=tuple(in_specs),
        out_specs=tuple(
            pl.BlockSpec((1, 1, H2 * G, 128), bd, memory_space=pltpu.VMEM)
            for _ in range(nin)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, D, H2 * G, 128), dtype)
            for _ in range(nin)),
        interpret=_interpret(),
    )(*operands)
    if out_form == "compact32":
        assert nin == 1, "compact32 passthrough is single-chunk only"
        return res if isinstance(res, (tuple, list)) else (res,)
    return _pool_compose_xla(res, H, G, W2, C)


def _pool_fwd(xs, inv, shift, H, W, wrs, act, out_form="dense5"):
    out = pool_bnact_flat(xs, inv, shift, H, W, wrs, act, out_form)
    return out, (xs, inv, shift, out)


def _pool_bwd_impl(H, W, wrs, act, out_form, res, dpool, dskips=None):
    xs, inv, shift, pooled = res
    nin = len(xs)
    C = nin * CC
    G, R, P = flat_geometry(H, W)
    H2, W2 = H // 2, W // 2
    WRp = W2 * C // 128
    B, D = xs[0].shape[0], xs[0].shape[1]
    dtype = xs[0].dtype
    with_skip = dskips is not None

    per_sample = inv.ndim == 3
    kernel = functools.partial(_pool_bwd_kernel, nin=nin, G=G, R=R, P=P,
                               H=H, WRp=WRp, wrs=tuple(wrs), act=act,
                               x_dtype=dtype, with_skip=with_skip,
                               per_sample=per_sample)
    in_specs, operands = [], []
    bd = lambda b_, d_: (b_, d_, 0, 0)
    for x in xs:
        in_specs.append(pl.BlockSpec((1, 1, x.shape[2], 128), bd,
                                     memory_space=pltpu.VMEM))
        operands.append(x)
    # XLA decomposes dense -> compact on the quarter-res tensors so the
    # kernel's expand is pure duplication (measured: expand-from-dense
    # chains cost ~2.5 ms in-kernel). In compact32 form the cotangent
    # already IS compact. The pooled maxima themselves are NOT shipped:
    # the kernel recomputes them from its a' prologue (bitwise equal),
    # saving a compact-chunk HBM read per chunk (round 5).
    if out_form == "compact32":
        comps = [
            (jnp.zeros_like(pooled[i]) if dp is None else dp.astype(dtype))
            for i, dp in enumerate(dpool)]
    else:
        comps = _pool_decompose_xla(dpool.astype(dtype), G, nin)
    for arr in comps:
        in_specs.append(pl.BlockSpec((1, 1, H2 * G, 128), bd,
                                     memory_space=pltpu.VMEM))
        operands.append(arr.astype(dtype))
    if with_skip:
        for i, ds in enumerate(dskips):
            ds = (jnp.zeros_like(xs[i]) if ds is None
                  else ds.astype(dtype))
            in_specs.append(pl.BlockSpec((1, 1, ds.shape[2], 128), bd,
                                         memory_space=pltpu.VMEM))
            operands.append(ds)
    in_specs.append(pl.BlockSpec((G, 128), lambda b_, d_: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(width_mask(W).astype(jnp.float32))
    for v in (inv, shift):
        op, spec = _ps_in(v.astype(jnp.float32))
        in_specs.append(spec)
        operands.append(op)

    out_specs, out_shape = [], []
    for i in range(nin):
        rows = H * wrs[i] if wrs[i] else R + 2 * P
        out_specs.append(pl.BlockSpec((1, 1, rows, 128), bd,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, D, rows, 128), dtype))
    for _ in range(2):
        sp, sh = _ps_out(nin, B if per_sample else None)
        out_specs.append(sp)
        out_shape.append(sh)
    res_ = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands)
    dxs = tuple(res_[:nin])
    dinv, dshift = res_[nin], res_[nin + 1]
    if per_sample:
        dinv = dinv.transpose(1, 0, 2)
        dshift = dshift.transpose(1, 0, 2)
    return dxs, dinv, dshift


def _pool_bwd(H, W, wrs, act, out_form, res, dpool):
    return _pool_bwd_impl(H, W, wrs, act, out_form, res, dpool)


pool_bnact_flat.defvjp(_pool_fwd, _pool_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def pool_bnact_flat_skip(xs, inv, shift, H: int, W: int, wrs, act: str,
                         out_form: str = "dense5"):
    """pool_bnact_flat that ALSO returns the raw input chunks as a
    second output (the decoder skip). Routing the skip through this
    primitive gives the level's chunks a single consumer, so the skip
    cotangent arrives here and is summed into dx IN-KERNEL — replacing
    the chunk-sized XLA `add_any` that autodiff otherwise emits for
    the two-consumer split (measured 0.9 ms at the headline L0).
    The passthrough is an identity return of the inputs: zero-copy."""
    return (pool_bnact_flat(xs, inv, shift, H, W, wrs, act, out_form),
            xs)


def _pool_skip_fwd(xs, inv, shift, H, W, wrs, act, out_form="dense5"):
    out = pool_bnact_flat(xs, inv, shift, H, W, wrs, act, out_form)
    return (out, xs), (xs, inv, shift, out)


def _pool_skip_bwd(H, W, wrs, act, out_form, res, cts):
    dpool, dskips = cts
    return _pool_bwd_impl(H, W, wrs, act, out_form, res, dpool,
                          dskips=dskips)


pool_bnact_flat_skip.defvjp(_pool_skip_fwd, _pool_skip_bwd)


# ---------------------------------------------------------------------------
# Fused upconv: (1,2,2)-stride-2 transposed conv from the deeper-level
# 5D tensor (dense rows) straight into flat chunks, as two
# (rows,128)x(128,128) matmuls per slab with phase-packed block-diag
# weights. cin == 64, cout == 32 (the flat U-Net's decoder shape).
# ---------------------------------------------------------------------------

def pack_upconv_weights(w: jnp.ndarray):
    """(1, 2, 2, 64, 32) flax ConvTranspose kernel -> (M0, M1), each
    (128, 128): M_a[m*64+ci, j*32+co] = w[0, 1-a, 1-(j%2), ci, co] if
    m == j // 2 else 0 (flax places in[h1,w1]*K[1-a,1-p] at
    out[2h1+a, 2w1+p]; out lane j covers w_img = 4(g-1)+j, i.e.
    w1-parity m = j//2, phase p = j%2)."""
    _, kh, kw_, cin, cout = w.shape
    assert kh == 2 and kw_ == 2 and cin == 64 and cout == CC, w.shape
    Ms = []
    for a in range(2):
        M = jnp.zeros((128, 128), w.dtype)
        for j in range(JG):
            m, p = j // 2, j % 2
            M = M.at[m * 64:(m + 1) * 64,
                     j * CC:(j + 1) * CC].set(w[0, 1 - a, 1 - p])
        Ms.append(M)
    return tuple(Ms)


def _unpack_upconv_wgrad(dM0, dM1):
    """Inverse of pack_upconv_weights for gradients."""
    dw = jnp.zeros((1, 2, 2, 64, CC), jnp.float32)
    for a, dM in ((0, dM0), (1, dM1)):
        for j in range(JG):
            m, p = j // 2, j % 2
            dw = dw.at[0, 1 - a, 1 - p].add(
                dM[m * 64:(m + 1) * 64, j * CC:(j + 1) * CC])
    return dw


def _upconv_fwd_kernel(*refs, G: int, R: int, P: int, H: int, WRd: int,
                       out_dtype, want_stats):
    dec_ref, m0_ref, m1_ref, mask_ref, bias_ref = refs[:5]
    out = refs[5]
    if want_stats:
        s_ref, q_ref = refs[6:8]
        first = (pl.program_id(1) == 0 if want_stats == "per_sample"
                 else jnp.logical_and(pl.program_id(0) == 0,
                                      pl.program_id(1) == 0))

        @pl.when(first)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)
            q_ref[...] = jnp.zeros_like(q_ref)

    H1 = H // 2
    S = dec_ref[0, 0, :, :]                         # (H1*WRd, 128)
    dims = (((1,), (0,)), ((), ()))
    outE = _dot(S, m0_ref[...], dimension_numbers=dims,
                               preferred_element_type=jnp.float32)
    outO = _dot(S, m1_ref[...], dimension_numbers=dims,
                               preferred_element_type=jnp.float32)
    z1 = jnp.zeros((H1, 1, 128), jnp.float32)
    z2 = jnp.zeros((H1, G - WRd - 1, 128), jnp.float32)
    rows = jnp.concatenate(
        [z1, outE.reshape(H1, WRd, 128), z2,
         z1, outO.reshape(H1, WRd, 128), z2], axis=1)   # (H1, 2G, 128)
    y = rows.reshape(H, G, 128) + bias_ref[0][None, None, :]
    y = (y * mask_ref[...][None]).reshape(R, 128)
    yc = y.astype(out_dtype)
    out[0, 0, 0:P] = jnp.zeros((P, 128), out_dtype)
    out[0, 0, pl.ds(P, R)] = yc
    out[0, 0, P + R:2 * P + R] = jnp.zeros((P, 128), out_dtype)
    if want_stats:
        yf = yc.astype(jnp.float32)
        s_ref[0, :] += jnp.sum(yf, axis=0)
        q_ref[0, :] += jnp.sum(yf * yf, axis=0)


def _upconv_bwd_kernel(*refs, G: int, R: int, P: int, H: int, WRd: int,
                       want_stats: bool, x_dtype):
    pos = 0
    dec_ref, dy_ref = refs[pos:pos + 2]; pos += 2
    y_ref = None
    if want_stats:
        y_ref = refs[pos]; pos += 1
    m0_ref, m1_ref, mask_ref = refs[pos:pos + 3]; pos += 3
    if want_stats:
        ds_ref, dq_ref = refs[pos:pos + 2]; pos += 2
    ddec, dM0, dM1, db = refs[pos:pos + 4]

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dM0[...] = jnp.zeros_like(dM0)
        dM1[...] = jnp.zeros_like(dM1)
        db[...] = jnp.zeros_like(db)

    H1 = H // 2
    dy = dy_ref[0, 0, pl.ds(P, R), :].astype(jnp.float32)
    if want_stats:
        y = y_ref[0, 0, pl.ds(P, R), :].astype(jnp.float32)
        dy = dy + ds_ref[0][None, :] + 2.0 * y * dq_ref[0][None, :]
    dyt = (dy.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128)
    db[0, :] += jnp.sum(dyt, axis=0)
    d3 = dyt.reshape(H1, 2 * G, 128)
    E = d3[:, 1:1 + WRd, :].reshape(H1 * WRd, 128)
    O = d3[:, G + 1:G + 1 + WRd, :].reshape(H1 * WRd, 128)
    S = dec_ref[0, 0, :, :]
    dimsT = (((1,), (1,)), ((), ()))   # contract lanes with M^T
    cdims = (((0,), (0,)), ((), ()))
    Ec = E.astype(S.dtype)
    Oc = O.astype(S.dtype)
    dd = _dot(Ec, m0_ref[...], dimension_numbers=dimsT,
                             preferred_element_type=jnp.float32) \
        + _dot(Oc, m1_ref[...], dimension_numbers=dimsT,
                              preferred_element_type=jnp.float32)
    ddec[0, 0, :, :] = dd.astype(x_dtype)
    dM0[...] += _dot(S, Ec, dimension_numbers=cdims,
                                    preferred_element_type=jnp.float32)
    dM1[...] += _dot(S, Oc, dimension_numbers=cdims,
                                    preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def upconv_bn_flat(dec, w, b, H: int, W: int, want_stats: bool):
    """(1,2,2)-stride-2 transposed conv (flax ConvTranspose semantics,
    reference models/unet.py:328-409 'transpose' up_mode) from dec
    (B, D, H/2, W/2, 64) into one padded flat chunk at (H, W) with 32
    channels, plus optional per-lane (sum, sumsq) stats side outputs.
    """
    B, D, H1, W1, cin = dec.shape
    assert cin == 64 and H1 * 2 == H and W1 * 2 == W, dec.shape
    assert (W1 * cin) % 128 == 0, (W1, cin)
    WRd = W1 * cin // 128
    G, R, P = flat_geometry(H, W)
    dtype = dec.dtype
    M0, M1 = pack_upconv_weights(
        jax.lax.optimization_barrier(w))
    bias_l = jnp.tile(b.reshape(-1, CC), (1, JG))

    kernel = functools.partial(_upconv_fwd_kernel, G=G, R=R, P=P, H=H,
                               WRd=WRd, out_dtype=dtype,
                               want_stats=want_stats)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    in_specs = [
        pl.BlockSpec((1, 1, H1 * WRd, 128), bd, memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), c2, memory_space=pltpu.VMEM),
    ]
    operands = [dec.reshape(B, D, H1 * WRd, 128), M0.astype(dtype),
                M1.astype(dtype), width_mask(W).astype(jnp.float32),
                bias_l.astype(jnp.float32)]
    out_specs = [pl.BlockSpec((1, 1, R + 2 * P, 128), bd,
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, D, R + 2 * P, 128), dtype)]
    if want_stats:
        st_spec, st_shape = _ps_out(
            1, B if want_stats == "per_sample" else None)
        out_specs += [st_spec] * 2
        out_shape += [st_shape] * 2
    res = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands)
    y = res[0] if want_stats else res
    if not want_stats and isinstance(res, (tuple, list)):
        y = res[0]
    if want_stats:
        stats = tuple(
            s.transpose(1, 0, 2) if want_stats == "per_sample" else s
            for s in res[1:3])
    else:
        stats = None
    return (y,), stats


def _upconv_fwd(dec, w, b, H, W, want_stats):
    out = upconv_bn_flat(dec, w, b, H, W, want_stats)
    (y,), _ = out
    return out, (dec, w, y)


def _upconv_bwd(H, W, want_stats, res, cts):
    dec, w, y = res
    (dy_in,), dstats = cts
    B, D, H1, W1, cin = dec.shape
    WRd = W1 * cin // 128
    G, R, P = flat_geometry(H, W)
    dtype = dec.dtype
    M0, M1 = pack_upconv_weights(
        jax.lax.optimization_barrier(w))
    dy = (jnp.zeros((B, D, R + 2 * P, 128), dtype) if dy_in is None
          else dy_in.astype(dtype))
    if want_stats:
        st_shape = ((1, B, 128) if want_stats == "per_sample"
                    else (1, 128))
        ds, dq = dstats
        ds = jnp.zeros(st_shape, jnp.float32) if ds is None else ds
        dq = jnp.zeros(st_shape, jnp.float32) if dq is None else dq

    kernel = functools.partial(_upconv_bwd_kernel, G=G, R=R, P=P, H=H,
                               WRd=WRd, want_stats=want_stats,
                               x_dtype=dtype)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    in_specs = [pl.BlockSpec((1, 1, H1 * WRd, 128), bd,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, R + 2 * P, 128), bd,
                             memory_space=pltpu.VMEM)]
    operands = [dec.reshape(B, D, H1 * WRd, 128), dy]
    if want_stats:
        in_specs.append(pl.BlockSpec((1, 1, R + 2 * P, 128), bd,
                                     memory_space=pltpu.VMEM))
        operands.append(y)
    in_specs += [pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
                 pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
                 pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM)]
    operands += [M0.astype(dtype), M1.astype(dtype),
                 width_mask(W).astype(jnp.float32)]
    if want_stats:
        for v in (ds, dq):
            op, spec = _ps_in(v)
            in_specs.append(spec)
            operands.append(op)
    out_specs = [
        pl.BlockSpec((1, 1, H1 * WRd, 128), bd, memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), c2, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, D, H1 * WRd, 128), dtype),
        jax.ShapeDtypeStruct((128, 128), jnp.float32),
        jax.ShapeDtypeStruct((128, 128), jnp.float32),
        jax.ShapeDtypeStruct((1, 128), jnp.float32),
    ]
    dd, dM0, dM1, db = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands)
    # barrier: scatter-fusion miscompile guard (see conv_bnact_flat)
    dM0, dM1 = jax.lax.optimization_barrier((dM0, dM1))
    dw = _unpack_upconv_wgrad(dM0, dM1).astype(w.dtype)
    dbc = jnp.sum(db.reshape(1, JG, CC), axis=1).reshape(-1)
    return dd.reshape(dec.shape), dw, dbc.astype(w.dtype)


upconv_bn_flat.defvjp(_upconv_fwd, _upconv_bwd)


# ---------------------------------------------------------------------------
# Head: prologue + 1x1 conv, in XLA (small output; the prologue fuses
# into the einsum). Reference models/unet.py conv_final.
# ---------------------------------------------------------------------------

def _head_wbig(w2, i, cout, cc, jg):
    """Block-diagonal (128, jg*cout) GEMM weights for chunk i:
    Wbig[(j, ci), (j', co)] = w[ci, co] iff j == j'."""
    wblk = w2[i * cc:(i + 1) * cc]                   # (cc, cout)
    wbig = jnp.zeros((128, jg * cout), jnp.float32)
    for j in range(jg):
        wbig = wbig.at[j * cc:(j + 1) * cc,
                       j * cout:(j + 1) * cout].set(wblk)
    return wbig


def _bc_prologue(p):
    """Broadcast an inv/shift lane vector against (B, D, rows, 128):
    (128,) global or (B, 128) per-sample (group/instance norm)."""
    if p.ndim == 2:
        return p[:, None, None, :]
    return p[None, None, None]


def _head_impl(xs, inv, shift, w, b, H: int, W: int, act: str):
    G, R, P = flat_geometry(H, W)
    Wp = pad_width(W)
    cout = w.shape[-1]
    w2 = w.reshape(-1, cout).astype(jnp.float32)
    ys = []
    for i, xc in enumerate(xs):
        B, D, Rp, _ = xc.shape
        v = xc[:, :, P:P + R].astype(jnp.float32)
        pre = v * _bc_prologue(inv[i]) + _bc_prologue(shift[i])
        a = _act_fwd(pre, act)
        wbig = _head_wbig(w2, i, cout, CC, JG)
        # Memory-bound head GEMM: default precision on purpose (the
        # logits feed a softmax loss; f32-HIGHEST would slow the bf16
        # model's head ~2x for no training benefit).
        ys.append(_dot(
            a, wbig, dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))     # (B, D, R, JG*cout)
    y = sum(ys) + jnp.tile(b.astype(jnp.float32), JG)
    return y.reshape(B, D, H, Wp, cout)[:, :, :, W_OFF:W_OFF + W, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _head_bnact(xs, inv, shift, w, b, H: int, W: int, act: str):
    return _head_impl(xs, inv, shift, w, b, H, W, act)


def _head_fwd(xs, inv, shift, w, b, H, W, act):
    return _head_impl(xs, inv, shift, w, b, H, W, act), (xs, inv, shift, w, b)


def _head_bwd(H, W, act, res, dy):
    """Hand-written head backward: the dx path runs over ALL chunk
    rows with a ROW-PADDED dy (B, D, Rp, JG*cout ~ 25 MB at headline
    shapes), so dx is written ONCE at full chunk size — plain autodiff
    of the row slice emitted slice-adjoint pads of the chunk-sized dx
    (~0.57 ms of pure HBM pad traffic), and hoisting the slice past
    the GEMM instead broke XLA's forward prologue+dot fusion (it
    materialized the f32 activation, +0.9 ms measured). Pad rows hold
    well-defined finite chunk data (the conv kernels consume them as
    halos), and their dy is zero, so all parameter reductions are
    unchanged. Reductions (dw, dinv, dshift) share the full-row dpre."""
    xs, inv, shift, w, b = res
    G, R, P = flat_geometry(H, W)
    Wp = pad_width(W)
    cout = w.shape[-1]
    w2 = w.reshape(-1, cout).astype(jnp.float32)
    B, D = dy.shape[:2]
    dy = dy.astype(jnp.float32)
    dyp = jnp.pad(dy, ((0, 0), (0, 0), (0, 0),
                       (W_OFF, Wp - W_OFF - W), (0, 0)))
    dy_rows = dyp.reshape(B, D, R, JG * cout)
    db = jnp.sum(dy_rows, axis=(0, 1, 2)).reshape(JG, cout).sum(axis=0)
    dxs, dinvs, dshifts, dwblks = [], [], [], []
    for i, xc in enumerate(xs):
        Rp = xc.shape[2]
        dy_full = jnp.pad(dy_rows,
                          ((0, 0), (0, 0), (P, Rp - P - R), (0, 0)))
        wbig = _head_wbig(w2, i, cout, CC, JG)
        vf = xc.astype(jnp.float32)
        pref = vf * _bc_prologue(inv[i]) + _bc_prologue(shift[i])
        da = _dot(dy_full, wbig,
                  dimension_numbers=(((3,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32)  # (B, D, Rp, 128)
        dpre = da * _act_deriv(pref, act)
        dxs.append((dpre * _bc_prologue(inv[i])).astype(xc.dtype))
        # per-sample prologues keep their batch axis in the cotangent
        rax = (1, 2) if inv[i].ndim == 2 else (0, 1, 2)
        dinvs.append(jnp.sum(dpre * vf, axis=rax).astype(inv[i].dtype))
        dshifts.append(jnp.sum(dpre, axis=rax).astype(shift[i].dtype))
        a = _act_fwd(pref, act)
        dwbig = _dot(a.reshape(-1, 128), dy_full.reshape(-1, JG * cout),
                     dimension_numbers=(((0,), (0,)), ((), ())),
                     preferred_element_type=jnp.float32)  # (128, JG*cout)
        dwblks.append(sum(dwbig[j * CC:(j + 1) * CC,
                                j * cout:(j + 1) * cout]
                          for j in range(JG)))
    dw = jnp.concatenate(dwblks, axis=0).reshape(w.shape).astype(w.dtype)
    return (dxs, dinvs, dshifts, dw, db.astype(b.dtype))


_head_bnact.defvjp(_head_fwd, _head_bwd)


def head_bnact_from_flat(xs, inv, shift, w, b, H: int, W: int, act: str,
                         out_dtype=jnp.float32):
    """1x1 conv head consuming flat chunks with a BN-apply +
    activation prologue, emitting (B, D, H, W, cout) logits in
    ``out_dtype`` (f32 default; bf16 halves the logit volume's HBM
    traffic for bf16 models — losses upcast internally).

    Formulated as ONE lane-contraction GEMM per chunk with
    block-diagonal weights Wbig[(j, ci), (j', co)] = w[ci, co] iff
    j == j' — a clean (rows, 128) x (128, JG*cout) matmul that XLA
    fuses the prologue into (the per-j einsum formulation lowered to a
    slow reduce; measured 6.5 ms -> GEMM form is memory-bound). The
    backward is a hand-written VJP (see _head_bwd) that pads dy
    instead of dx. Reference models/unet.py conv_final."""
    return _head_bnact(list(xs), list(inv), list(shift), w, b,
                       H, W, act).astype(out_dtype)


# ---------------------------------------------------------------------------
# Fused conv1: first-layer planar 3x3 'same' conv (C_in == 1) from the
# raw network input STRAIGHT into one flat chunk, with BN statistic
# side outputs. Replaces the XLA im2col GEMM whose layout glue
# (patch concat, f32->bf16 convert of the dense output, lane-padded
# 5D -> dense-row relayout) measured ~8.5 ms f+b at the headline L0
# size for a conv whose useful FLOPs are worth ~0.1 ms.
#
# Formulation: the single input channel's W axis is stored in LANES
# (rows (B, D, H, 128), w = lane index, requires W <= 128). The conv
# becomes, per h-row and kh tap, ONE matmul with a sparse "selection"
# weight matrix S[dh] of shape (128, G*128):
#     S[dh][w_in, (g, j, co)] = K[dh, dw, co]
#        iff w_img(g, j) := JG*(g-1)+j is a valid image column and
#            w_in == w_img + dw - 1 is a valid input column,
# so  Y[h] = sum_dh A[h+dh-1] @ S[dh]  lands directly in the flat
# chunk's (g, (j, ci)) lane layout. Backward (one merged kernel):
# wgrad dS[dh] += A_dh^T @ dy_tot (unpacked to dK by the same
# selection constant), dgrad dA[h+dh-1] += dy_tot[h] @ S[dh]^T, with
# the statistics cotangent folded on load.
# Reference: first conv of DownConv, models/unet.py:202-253.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _conv1_selection(W: int) -> np.ndarray:
    """0/1 constant OH[w_in, g, j, dw] mapping input lanes to flat
    output lane groups for a 3-tap w conv."""
    G = pad_width(W) // JG
    oh = np.zeros((128, G, JG, 3), np.float32)
    for g in range(G):
        for j in range(JG):
            w_img = JG * (g - 1) + j
            if not (0 <= w_img < W):
                continue
            for dw in range(3):
                w_in = w_img + dw - 1
                if 0 <= w_in < W:
                    oh[w_in, g, j, dw] = 1.0
    return oh


def _conv1_build_s(w: jnp.ndarray, W: int) -> jnp.ndarray:
    """(1, 3, 3, 1, CC) conv kernel -> S (3, 128, G*128) selection
    matmul weights."""
    G = pad_width(W) // JG
    oh = jnp.asarray(_conv1_selection(W))
    k = w.reshape(3, 3, CC)                         # (dh, dw, co)
    # HIGHEST: under TPU DEFAULT this einsum runs as bf16 passes,
    # corrupting S (and thus every conv1 output/grad) at ~1e-3.
    s = jnp.einsum("wgjd,hdc->hwgjc", oh, k,
                   precision=jax.lax.Precision.HIGHEST)
    return s.reshape(3, 128, G * 128)


def _conv1_unpack_ds(ds: jnp.ndarray, W: int) -> jnp.ndarray:
    """Adjoint of _conv1_build_s: dS (3, 128, G*128) -> dK
    (1, 3, 3, 1, CC)."""
    G = pad_width(W) // JG
    oh = jnp.asarray(_conv1_selection(W))
    ds4 = ds.reshape(3, 128, G, JG, CC)
    dk = jnp.einsum("wgjd,hwgjc->hdc", oh, ds4,
                    precision=jax.lax.Precision.HIGHEST)
    return dk.reshape(1, 3, 3, 1, CC)


def _row_shifts(a: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """(H, 128) -> (a shifted down, a, a shifted up) with zero rows."""
    z = jnp.zeros((1, 128), a.dtype)
    return (jnp.concatenate([z, a[:-1]], axis=0), a,
            jnp.concatenate([a[1:], z], axis=0))


def _conv1_fwd_kernel(x_ref, s_ref, bias_ref, mask_ref, out_ref,
                      s_out, q_out, *, G: int, R: int, P: int, H: int,
                      out_dtype, per_sample: bool = False):
    # per_sample (group/instance norm): stats blocks are b-indexed —
    # reset at each b's first d step, accumulate over d only.
    first = (pl.program_id(1) == 0 if per_sample else
             jnp.logical_and(pl.program_id(0) == 0,
                             pl.program_id(1) == 0))

    @pl.when(first)
    def _():
        s_out[...] = jnp.zeros_like(s_out)
        q_out[...] = jnp.zeros_like(q_out)

    a = x_ref[0, 0, :, :]                            # (H, 128) bf16
    dims = (((1,), (0,)), ((), ()))
    y = jnp.zeros((H, G * 128), jnp.float32)
    for dh, a_dh in enumerate(_row_shifts(a)):
        y = y + _dot(
            a_dh, s_ref[dh], dimension_numbers=dims,
            preferred_element_type=jnp.float32)
    y = y.reshape(H, G, 128) + bias_ref[0][None, None, :]
    y = (y * mask_ref[...][None]).reshape(R, 128)
    yc = y.astype(out_dtype)
    out_ref[0, 0, 0:P] = jnp.zeros((P, 128), out_dtype)
    out_ref[0, 0, pl.ds(P, R)] = yc
    out_ref[0, 0, P + R:2 * P + R] = jnp.zeros((P, 128), out_dtype)
    yf = yc.astype(jnp.float32)                      # stored rounding
    s_out[0, :] += jnp.sum(yf, axis=0)
    q_out[0, :] += jnp.sum(yf * yf, axis=0)


def _conv1_bwd_kernel(x_ref, y_ref, dy_ref, ds_ref, dq_ref, mask_ref,
                      s_ref, *out_refs, G: int, R: int,
                      P: int, H: int, x_dtype, input_grad: bool):
    if input_grad:
        dsel_ref, db_ref, dx_ref = out_refs
    else:
        dsel_ref, db_ref = out_refs
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dsel_ref[...] = jnp.zeros_like(dsel_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    a = x_ref[0, 0, :, :]                            # (H, 128) bf16
    y = y_ref[0, 0, pl.ds(P, R), :].astype(jnp.float32)
    dy = dy_ref[0, 0, pl.ds(P, R), :].astype(jnp.float32)
    dyt = dy + ds_ref[0][None, :] + 2.0 * y * dq_ref[0][None, :]
    dyt = (dyt.reshape(H, G, 128) * mask_ref[...][None]).reshape(R, 128)
    db_ref[0, :] += jnp.sum(dyt, axis=0)
    dyh = dyt.reshape(H, G * 128).astype(a.dtype)
    cdims = (((0,), (0,)), ((), ()))
    ddims = (((1,), (1,)), ((), ()))                 # contract G*128
    da = jnp.zeros((H, 128), jnp.float32)
    z = jnp.zeros((1, 128), jnp.float32)
    for dh, a_dh in enumerate(_row_shifts(a)):
        dsel_ref[dh] += _dot(
            a_dh, dyh, dimension_numbers=cdims,
            preferred_element_type=jnp.float32)
        if not input_grad:
            # First-layer mode: the network input carries no gradient,
            # and the merged kernel's dgrad cannot be DCE'd by XLA —
            # skip the dA dots entirely (the dgrad matmuls contract
            # over G*128 and are ~40% of this kernel's MXU work).
            continue
        # dA[h + dh - 1] += dy[h] @ S[dh]^T
        t = _dot(dyh, s_ref[dh], dimension_numbers=ddims,
                                preferred_element_type=jnp.float32)
        if dh == 0:
            da = da + jnp.concatenate([t[1:], z], axis=0)
        elif dh == 1:
            da = da + t
        else:
            da = da + jnp.concatenate([z, t[:-1]], axis=0)
    if input_grad:
        dx_ref[0, 0, :, :] = da.astype(x_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def conv1_bnstats_flat(x, w, b, H: int, W: int, dtype=jnp.bfloat16,
                       input_grad: bool = True,
                       per_sample: bool = False):
    """Planar 3x3 'same' conv of a single-channel input into one flat
    chunk with per-lane (sum, sumsq) side outputs.

    Args:
        x: (B, D, H, W, 1) input (computed and stored in ``dtype``,
           the model's activation dtype).
        w: (1, 3, 3, 1, CC) kernel; b: (CC,) bias.
        per_sample: emit (1, B, 128) per-sample statistics instead of
           the global (1, 128) (group/instance norm).
    Returns:
        ((chunk,), (s, q)): flat chunk (B, D, R + 2P, 128) ``dtype``
        and per-lane f32 statistics of the stored (rounded) output.
    """
    B, D, Hx, Wx, cin = x.shape
    assert cin == 1 and Hx == H and Wx == W and W <= 128, x.shape
    G, R, P = flat_geometry(H, W)
    xr = jnp.pad(x[..., 0].astype(dtype), ((0, 0), (0, 0), (0, 0),
                                           (0, 128 - W)))
    s_mat = _conv1_build_s(
        jax.lax.optimization_barrier(w).astype(jnp.float32),
        W).astype(dtype)
    bias_l = jnp.tile(b.astype(jnp.float32).reshape(1, CC), (1, JG))

    kernel = functools.partial(_conv1_fwd_kernel, G=G, R=R, P=P, H=H,
                               out_dtype=dtype, per_sample=per_sample)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    st_spec, st_shape = _ps_out(1, B if per_sample else None)
    res = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=(
            pl.BlockSpec((1, 1, H, 128), bd, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128, G * 128), lambda b_, d_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM),
        ),
        out_specs=(
            pl.BlockSpec((1, 1, R + 2 * P, 128), bd,
                         memory_space=pltpu.VMEM),
            st_spec,
            st_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, D, R + 2 * P, 128), dtype),
            st_shape,
            st_shape,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * 3 * H * 128 * G * 128,
            bytes_accessed=B * D * (H * 128 + (R + 2 * P) * 128) * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(xr, s_mat, bias_l, width_mask(W).astype(jnp.float32))
    y, s, q = res
    if per_sample:
        s, q = s.transpose(1, 0, 2), q.transpose(1, 0, 2)
    return (y,), (s, q)


def _conv1_fwd(x, w, b, H, W, dtype, input_grad=True, per_sample=False):
    out = conv1_bnstats_flat(x, w, b, H, W, dtype, input_grad,
                             per_sample)
    (y,), _ = out
    return out, (x, y, w)


def _conv1_bwd(H, W, dtype, input_grad, per_sample, res, cts):
    x, y, w = res
    (dy_in,), dstats = cts
    B, D = x.shape[0], x.shape[1]
    G, R, P = flat_geometry(H, W)
    dy = (jnp.zeros((B, D, R + 2 * P, 128), dtype) if dy_in is None
          else dy_in.astype(dtype))
    ds, dq = (dstats if dstats is not None else (None, None))
    st_shape = (1, B, 128) if per_sample else (1, 128)
    ds = jnp.zeros(st_shape, jnp.float32) if ds is None else ds
    dq = jnp.zeros(st_shape, jnp.float32) if dq is None else dq
    xr = jnp.pad(x[..., 0].astype(dtype), ((0, 0), (0, 0), (0, 0),
                                           (0, 128 - W)))

    kernel = functools.partial(_conv1_bwd_kernel, G=G, R=R, P=P, H=H,
                               x_dtype=dtype, input_grad=input_grad)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    # Rebuild S for dgrad from the saved weights (tiny einsum).
    s_mat = _conv1_build_s(
        jax.lax.optimization_barrier(w).astype(jnp.float32),
        W).astype(dtype)
    out_specs = [
        pl.BlockSpec((3, 128, G * 128), lambda b_, d_: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), c2, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((3, 128, G * 128), jnp.float32),
        jax.ShapeDtypeStruct((1, 128), jnp.float32),
    ]
    if input_grad:
        out_specs.append(pl.BlockSpec((1, 1, H, 128), bd,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, D, H, 128), dtype))
    res_ = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=(
            pl.BlockSpec((1, 1, H, 128), bd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R + 2 * P, 128), bd,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R + 2 * P, 128), bd,
                         memory_space=pltpu.VMEM),
            _ps_in(ds)[1],
            _ps_in(dq)[1],
            pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128, G * 128), lambda b_, d_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(xr, y, dy, _ps_in(ds)[0], _ps_in(dq)[0],
      width_mask(W).astype(jnp.float32), s_mat)
    dsel, db = res_[0], res_[1]
    # barrier: scatter-fusion miscompile guard (see conv_bnact_flat)
    dsel = jax.lax.optimization_barrier(dsel)
    dw = _conv1_unpack_ds(dsel, W)
    dbc = jnp.sum(db.reshape(JG, CC), axis=0)
    if input_grad:
        dx = res_[2][..., :W, None].astype(x.dtype)
    else:
        # The network input carries no gradient; return a symbolic
        # zero XLA folds away (nothing consumes it).
        dx = jnp.zeros_like(x)
    return dx, dw, dbc


conv1_bnstats_flat.defvjp(_conv1_fwd, _conv1_bwd)


@jax.tree_util.register_pytree_node_class
class FlatActs:
    """A level's activations held in fused-flat form: the RAW conv
    output chunks plus the (inv, shift) prologue lane vectors the
    CONSUMER kernel applies on load. Registered as a pytree so the
    type survives jax tree operations (remat, scan, jit)."""

    def __init__(self, chunks, inv, shift):
        self.chunks = tuple(chunks)
        self.inv = inv
        self.shift = shift

    def tree_flatten(self):
        return (self.chunks, self.inv, self.shift), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        chunks, inv, shift = children
        return cls(chunks, inv, shift)


def materialize_flat_acts(chunks, inv, shift, H: int, W: int, act: str):
    """XLA fallback seam: apply the prologue and convert to 5D
    channels-last. Only used when a fused level feeds a non-fused
    consumer (odd configs); the fused fast path never calls this."""
    from elektronn3_tpu.ops.flat_conv import from_flat
    G, R, P = flat_geometry(H, W)
    outs = []
    rowmask = jnp.pad(jnp.tile(width_mask(W), (H, 1)), ((P, P), (0, 0)))
    for i, xc in enumerate(chunks):
        pre = xc.astype(jnp.float32) * _bc_prologue(inv[i]) \
            + _bc_prologue(shift[i])
        outs.append((_act_fwd(pre, act) * rowmask[None, None]
                     ).astype(xc.dtype))
    return from_flat(outs, H, W, padded=True)
