"""Fused flat-layout executor for C=64 3D (kd=3) U-Net levels.

The CC=32 executor (ops/flat_fused.py) covers full-resolution planar
levels. This module covers the next level down — the headline U-Net's
L1: (B, 44, 44, 44) with 64 channels and 3x3x3 kernels — which the
round-2 profile showed costs ~36 ms/step under XLA (down_1 + up_1 of
75 ms total): the conv emitter runs at 45-95 TF/s, every elementwise /
BN op pays 2x HBM bandwidth because a 64-channel minor dim is
lane-PADDED to 128 in XLA's (8,128) tiling, and the BN reductions
stream at ~113 GB/s.

Layout: chunks of CC64 = 64 channels with JG64 = 128 // 64 = 2
w-positions per row-group — lane l = (j, ci) with j = l // 64. The
payoff of JG = 2 is matmul occupancy: the within-row tap matmul's
128x128 weight block [(j1, ci), (j2, co)] has ALL FOUR 64x64 blocks
carrying real taps (j1 - j2 in {-1, 0, 1} covers kw = 0, 1, 2), i.e.
100% useful MACs, vs 62.5% for the JG=4/CC=32 packing. Row-crossing
w-taps use ONE combined corner matmul per tap: the operand selects
lanes 0:64 from row g+1 (j1 = 0) and lanes 64:128 from row g-1
(j1 = 1) — a lane-masked select of two row-shifted views, no rolls —
against a block-anti-diagonal 128x128 weight.

kd = 3 z-taps: chunks are D-padded by one zero slab on each side and
the kernels take three BlockSpec views per chunk (slabs d-1, d, d+1),
accumulating over z exactly like the row taps. Geometry: W_OFF64 =
JG64 = 2 keeps flat rows ROW-ALIGNED with dense channels-last rows of
a (.., H, W, 64) tensor when W is even.

Ops (mirroring flat_fused.py, reference models/unet.py:202-409):
- conv3_bnact_flat64: prologue (BN-apply + act) + 3x3x3 conv + per-lane
  (sum, sumsq) side outputs; ONE merged backward kernel (dgrad + wgrad
  + prologue grads, statistics cotangent folded on load).
- pool222_bnact_flat64: prologue + (2,2,2) max pool; kernel emits the
  compact pooled form per slab pair, XLA composes dense channels-last
  rows on the 1/8-size result.
- upconv222_bn_flat64: (2,2,2)-stride-2 transposed conv (cin 128/256
  -> cout 64/128) from the deeper level's dense tensor straight into
  flat64 chunks: one full 128x128 matmul per (z-phase, h-phase, k, o),
  h-interleave in kernel.
- upconv222_f64in / upconv122_f64in: the same upconv consuming
  FlatActs64 chunks (prologue in kernel) for chained fused64 decoder
  levels — input j-parity lanes route to odd/even output groups via
  two half-packed matmuls per phase.
- Chunk64 / FlatActs64: pytree carriers for raw chunks (+ prologue).

Gradient semantics match flat_fused.py (exact, including through batch
statistics; max-pool tie-routing caveat identical).
"""

from __future__ import annotations

import functools
import os as _os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from elektronn3_tpu.ops.flat_fused import (
    _act_fwd, _act_deriv, _bc_prologue, _ps_in, _ps_out)
from elektronn3_tpu.ops.flat_conv import _interpret as _fc_interpret

CC64 = 64
JG64 = 2
W_OFF64 = 2


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


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

def pad_width64(W: int) -> int:
    """Padded width (multiple of JG64) fitting w in [2, W+2) plus one
    zero column right; prefers G % 8 == 0 when cheap."""
    wp_min = -(-(W + W_OFF64 + 1) // JG64) * JG64
    wp_aligned = -(-wp_min // (8 * JG64)) * (8 * JG64)
    return wp_aligned if wp_aligned <= wp_min * 1.125 else wp_min


def flat_geometry64(H: int, W: int) -> Tuple[int, int, int]:
    """(G, R, P): row-groups per h row, rows per slab, row pad."""
    G = pad_width64(W) // JG64
    return G, H * G, G + 8


def conv64_vmem_bytes(nin: int, nout: int, kd: int, H: int, W: int,
                      *, esize: int = 2, want_stats: bool = True,
                      train: bool = True, tiled: bool = False,
                      zw: Optional[bool] = None,
                      ki_split: int = 1) -> int:
    """Estimated scoped-VMEM bytes of the worst conv3_bnact_flat64
    kernel at this geometry (forward; max with backward when train).

    Mirrors the BlockSpecs + scratch of _conv64_fwd_call/_conv64_bwd:
    grid-varying blocks are double-buffered by the Mosaic pipeline
    (x2), constant blocks (packed weights, mask, lane vectors) counted
    once. In d_halo (2D-tiled) mode the two side views per chunk are
    narrow pre-shifted strips (G rows) instead of full slabs. In
    z-window streaming mode (zw; default for kd=3 non-tiled — see
    _zwindow_enabled) each array has ONE lookahead view instead of kd,
    and the backward adds the raw-center delay ring (nin*2 R-row
    slots).

    Validated against three v5e measurements of the 3-view kernels
    (docs/design.md round-3; pass zw=False to reproduce):
      - C=128 decoder merge conv fwd at (44,44,44), nin=4 nout=2 kd=3:
        est 15.4 MB vs real 17.35 MB scoped-OOM (compile failure) —
        callers must add VMEM_SLOP to cover the forward underestimate;
      - planar C=64 decoder conv bwd at (88,88), nin=2 kd=1:
        est 17.8 MB vs real 16.65 MB OOM (declined);
      - headline L1 decoder conv bwd (44,44,44), nin=2 nout=1 kd=3:
        est 14.2 MB, compiles and runs (accepted).
    """
    if zw is None:
        zw = kd == 3 and not tiled and _zwindow_enabled()
    G, R, P = flat_geometry64(H, W)
    rows = R + 2 * P
    slab = rows * 128 * esize
    strip = G * 128 * esize
    wbytes = 2 * nin * nout * kd * 3 * 128 * 128 * esize  # w0 + wc
    views = (slab + 2 * strip) if tiled else \
        (slab if zw else kd * slab)
    fwd = (2 * nin * views          # input slab views, double-buffered
           + wbytes                 # packed weights (constant blocks)
           + 2 * nout * slab        # output chunks, double-buffered
           + nin * kd * slab)       # a' scratch
    est = fwd
    if train:
        nys = nout if want_stats else 0
        # ki_split: the merged backward runs as ceil(nin/ki_split)-
        # input-chunk groups per pallas_call (see _conv64_bwd) — every
        # nin-scaled resident (x views, sliced w0T/wcT, dx, m0/mc,
        # a' scratch, raw ring) shrinks; dy/y views and dy_tot scratch
        # are re-staged per group.
        nb = -(-nin // max(1, ki_split))
        wb = wbytes * nb // max(1, nin)   # nin=0: C<64 gate probes
        bwd = (2 * (nb + nout + nys) * views    # x, dy, y slab views
               + wb                             # w0T + wcT (ki slice)
               + 2 * nb * slab                  # dx outputs
               + 2 * wb                         # m0 + mc f32 outputs
               + (nb + nout) * kd * slab        # a', dy_tot scratch
               + (nb * 2 * R * 128 * esize if zw else 0))  # raw ring
        est = max(est, bwd)
    return est


# Scoped-VMEM budget for the gate: the v5e limit is 16 MB; the slop
# covers the measured forward underestimate (17.35 real vs 16.2 est on
# the C=128 merge conv — block alignment + pipeline staging the model
# does not count). Env-overridable for other TPU generations.
import os as _os
VMEM_LIMIT = int(_os.environ.get("E3TPU_VMEM_LIMIT",
                                 16 * 1024 * 1024))
VMEM_SLOP = int(_os.environ.get("E3TPU_VMEM_SLOP",
                                int(1.5 * 1024 * 1024)))


def bwd_ki_split(nin: int, nout: int, kd: int, H: int, W: int, *,
                 esize: int = 2, want_stats: bool = True,
                 tiled: bool = False, zw: Optional[bool] = None) -> int:
    """Smallest input-chunk split whose merged-backward scoped-VMEM
    estimate fits the gate (1 = unsplit); 0 when no split fits (the
    split only shrinks nin-scaled residents, so e.g. an oversized
    forward stays oversized).

    This is what lets the C=128 decoder merge conv TRAIN fused: its
    unsplit backward stages 4 input chunks' m0/mc f32 tap accumulators
    (9.4 MB) + slabs ≈ 28 MB; per-chunk groups of 1 fit in ~10 MB at
    the cost of re-reading the dy/y slabs per group (elementwise
    restage — the matmul work is partitioned, not repeated).
    Deterministic from geometry (backend-independent) so CPU-interpret
    parity tests exercise the exact split the chip runs.
    E3TPU_FORCE_KI_SPLIT=n forces n groups (testing)."""
    forced = int(_os.environ.get("E3TPU_FORCE_KI_SPLIT", "0"))
    if forced:
        return min(forced, nin)
    for s in range(1, nin + 1):
        est = conv64_vmem_bytes(nin, nout, kd, H, W, esize=esize,
                                want_stats=want_stats, train=True,
                                tiled=tiled, zw=zw, ki_split=s)
        if est + VMEM_SLOP <= VMEM_LIMIT:
            return s
    return 0


def width_mask64(W: int, dtype=jnp.float32) -> jnp.ndarray:
    """(G, 128) mask: 1 on valid w columns."""
    G = pad_width64(W) // JG64
    w_of_lane = (np.arange(128) // CC64)[None, :] \
        + JG64 * np.arange(G)[:, None]
    valid = (w_of_lane >= W_OFF64) & (w_of_lane < W_OFF64 + W)
    return jnp.asarray(valid, dtype)


def to_flat64(x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """(B, D, H, W, C) -> C//64 padded flat64 chunks (C < 64:
    zero-padded into one chunk)."""
    B, D, H, W, C = x.shape
    G, R, P = flat_geometry64(H, W)
    Wp = pad_width64(W)
    nin = max(1, C // CC64)
    cpad = nin * CC64 - C
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0),
                     (W_OFF64, Wp - W - W_OFF64), (0, cpad)))
    chunks = []
    for c0 in range(0, nin * CC64, CC64):
        xc = xp[..., c0:c0 + CC64].reshape(B, D, R, 128)
        chunks.append(jnp.pad(xc, ((0, 0), (0, 0), (P, P), (0, 0))))
    return tuple(chunks)


def from_flat64(chunks: Sequence[jnp.ndarray], H: int, W: int,
                C: Optional[int] = None) -> jnp.ndarray:
    """Inverse of to_flat64."""
    G, R, P = flat_geometry64(H, W)
    Wp = pad_width64(W)
    outs = []
    for xc in chunks:
        B, D, _, _ = xc.shape
        body = xc[:, :, P:P + R].reshape(B, D, H, Wp // JG64, 128)
        body = body.reshape(B, D, H, Wp, CC64)[:, :, :,
                                               W_OFF64:W_OFF64 + W, :]
        outs.append(body)
    out = jnp.concatenate(outs, axis=-1)
    return out[..., :C] if C is not None else out


def lane_vec64(v: jnp.ndarray) -> jnp.ndarray:
    """(n*64,) per-channel vector -> (n, 128) lane vectors."""
    return jnp.stack([jnp.tile(v[i * CC64:(i + 1) * CC64], JG64)
                      for i in range(v.shape[0] // CC64)])


def fold_lane_stats64(s: jnp.ndarray) -> jnp.ndarray:
    """(n, 128) per-lane sums -> (n*64,) per-channel sums, or the
    per-sample form (n, B, 128) -> (B, n*64) (group/instance norm)."""
    n = s.shape[0]
    if s.ndim == 3:
        B = s.shape[1]
        return jnp.concatenate(
            [s[i].reshape(B, JG64, CC64).sum(1) for i in range(n)],
            axis=1)
    return jnp.sum(s.reshape(n, JG64, CC64), axis=1).reshape(-1)


# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------

def pack_weights64(w: jnp.ndarray):
    """(kd, 3, 3, cin, cout) -> (w0, wc), each
    (nin, nout, kd, 3, 128, 128); kd in {1, 3} (3 = full 3D, 1 =
    planar levels — e.g. C=64 planar blocks and every 2D-model level).

    w0: within-row blocks [(j1, ci), (j2, co)] = w[z, t, 1 + j1 - j2].
    wc: combined corner — [0:64, 64:128] = w[z, t, 2] (row g+1 j1=0 ->
    j2=1), [64:128, 0:64] = w[z, t, 0] (row g-1 j1=1 -> j2=0)."""
    kd, kh, kw_, cin, cout = w.shape
    assert kd in (1, 3) and kh == 3 and kw_ == 3, w.shape
    nin, nout = cin // CC64, cout // CC64

    def blk(kw):
        b = w[:, :, kw].reshape(kd, 3, nin, CC64, nout, CC64)
        return jnp.transpose(b, (2, 4, 0, 1, 3, 5))

    w0 = jnp.zeros((nin, nout, kd, 3, 128, 128), w.dtype)
    w0 = w0.at[..., 0:64, 0:64].set(blk(1))
    w0 = w0.at[..., 64:128, 64:128].set(blk(1))
    w0 = w0.at[..., 64:128, 0:64].set(blk(2))
    w0 = w0.at[..., 0:64, 64:128].set(blk(0))
    wc = jnp.zeros((nin, nout, kd, 3, 128, 128), w.dtype)
    wc = wc.at[..., 0:64, 64:128].set(blk(2))
    wc = wc.at[..., 64:128, 0:64].set(blk(0))
    return w0, wc


def _unpack_wgrad64(m0, mc, nin, nout):
    """Tap accumulators -> dw (kd, 3, 3, cin, cout) f32."""
    cin, cout = nin * CC64, nout * CC64
    kd = m0.shape[2]

    def fold(acc):
        # (nin, nout, kd, 3, 64, 64) -> (kd, 3, cin, cout)
        return jnp.transpose(acc, (2, 3, 0, 4, 1, 5)).reshape(
            kd, 3, cin, cout)

    dw1 = fold(m0[..., 0:64, 0:64] + m0[..., 64:128, 64:128])
    dw2 = fold(m0[..., 64:128, 0:64] + mc[..., 0:64, 64:128])
    dw0 = fold(m0[..., 0:64, 64:128] + mc[..., 64:128, 0:64])
    return jnp.stack([dw0, dw1, dw2], axis=2)   # (3, 3, kw, cin, cout)


def _flip_transpose64(w: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))


def _lane_bias64(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.tile(b.reshape(-1, CC64), (1, JG64))


# ---------------------------------------------------------------------------
# Fused conv kernels
# ---------------------------------------------------------------------------

def _slab_valid(z) -> jnp.ndarray:
    """0.0 for the zero D-pad slabs (they must contribute conv zero-
    padding, NOT act(shift)), 1.0 otherwise."""
    pd = pl.program_id(1)
    if z == 0:
        return (pd > 0).astype(jnp.float32)
    if z == 2:
        return (pd < pl.num_programs(1) - 1).astype(jnp.float32)
    return jnp.float32(1.0)


def _load_raw64(ref, form, *, R, P):
    """Raw chunk slab -> (R, 128) rows in chunk64 lane layout.

    'flat64': padded flat chunk, body rows.
    'pool32': the L0 pool kernel's COMPACT output (32 real channels):
    lanes [w-even ci32 | w-odd ci32 | 0 | 0] -> chunk64 lanes
    [(j=0, ci32+pad) | (j=1, ci32+pad)] via a 32-lane roll + select.
    """
    if form == "pool32":
        c = ref[0, 0, :, :].astype(jnp.float32)
        rolled = jnp.concatenate([c[:, 96:], c[:, :96]], axis=-1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        a = jnp.where(lane < 64, c, rolled)
        return a * ((lane % 64) < CC64 // 2).astype(jnp.float32)
    return ref[0, 0, pl.ds(P, R), :].astype(jnp.float32)


def _build_scratch64(ref, z, dst, slot, *, G, R, P, Ps, H, inv_l,
                     shift_l, mask_ref, act, form="flat64"):
    """Load padded flat chunk slab view z, apply prologue, mask, store
    into scratch slot (pad rows pre-zeroed by caller)."""
    a = _load_raw64(ref, form, R=R, P=P)
    pre = a * inv_l[None, :] + shift_l[None, :]
    val = (_act_fwd(pre, act).reshape(H, G, 128)
           * mask_ref[...][None]).reshape(R, 128) * _slab_valid(z)
    dst[slot, pl.ds(Ps, R)] = val.astype(dst.dtype)


def _load_raw_strip64(ref, form, *, G):
    """One image-row halo strip block (1, 1, G, 128) in chunk64 lane
    layout (strip variant of _load_raw64). Strips are PRE-SHIFTED
    narrow arrays built by XLA glue (_halo_strips64) — full-slab halo
    views tripled per-step VMEM and HBM traffic and OOM'd the 16 MB
    scoped limit for decoder merge convs at production 2D widths."""
    c = ref[0, 0, :, :].astype(jnp.float32)
    if form == "pool32":
        rolled = jnp.concatenate([c[:, 96:], c[:, :96]], axis=-1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)
        a = jnp.where(lane < 64, c, rolled)
        return a * ((lane % 64) < CC64 // 2).astype(jnp.float32)
    return c


def _build_halo64(ref, side, dst, slot, *, G, R, P, Ps, inv_l,
                  shift_l, mask_ref, act, form="flat64"):
    """H-tiled (d_halo) mode: write ONE image-row halo strip from the
    adjacent H-slab into the scratch pad region, prologued like the
    body rows. side=0: previous slab's LAST row -> rows [Ps-G:Ps];
    side=2: next slab's FIRST row -> [Ps+R:Ps+R+G]. At the volume
    edges the pre-shifted strip is zero-padded AND zeroed in-kernel
    (_slab_valid; the prologue makes raw zeros nonzero) — conv zero
    padding, exactly as untiled."""
    a = _load_raw_strip64(ref, form, G=G)
    pre = a * inv_l[None, :] + shift_l[None, :]
    val = _act_fwd(pre, act) * mask_ref[...] * _slab_valid(side)
    dst[slot, pl.ds(Ps - G if side == 0 else Ps + R, G)] = \
        val.astype(dst.dtype)


def _halo_strips64(x, form, G: int, R: int, P: int):
    """Pre-shifted narrow halo strips for d_halo mode (see
    flat_fused._halo_strips): strip0[:, d] holds slab d-1's LAST image
    row, strip2[:, d] slab d+1's FIRST image row; (B, D, G, 128)."""
    off = 0 if form == "pool32" else P
    last = x[:, :, off + R - G:off + R, :]
    first = x[:, :, off:off + G, :]
    z = jnp.zeros_like(last[:, :1])
    strip0 = jnp.concatenate([z, last[:, :-1]], axis=1)
    strip2 = jnp.concatenate([first[:, 1:], z], axis=1)
    return strip0, strip2


def _strip_views64(x, form, G: int, R: int, P: int):
    """(strip0, center, strip2) operand triple for d_halo mode, in the
    kernel's expected [side0, center, side2] order."""
    s0, s2 = _halo_strips64(x, form, G, R, P)
    return s0, x, s2


def _conv64_fwd_kernel(*refs, nin: int, nout: int, G: int, R: int,
                       P: int, Ps: int, H: int, out_dtype, act: str,
                       want_stats: bool, forms, kd: int = 3,
                       d_halo: bool = False,
                       per_sample: bool = False):
    zv = 3 if d_halo else kd                   # views per chunk
    ins = refs[:nin * zv]                      # [i][z] slab views
    w0_ref, wc_ref, mask_ref, bias_ref, inv_ref, shift_ref = \
        refs[nin * zv:nin * zv + 6]
    outs = refs[nin * zv + 6:nin * zv + 6 + nout]
    idx = nin * zv + 6 + nout
    if want_stats:
        s_ref, q_ref = refs[idx:idx + 2]
        idx += 2
    a_s = refs[idx]

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
        if d_halo:
            # H-tiled 2D mode: ONE slot per chunk — center slab body
            # plus one prologued image-row halo strip from each
            # neighboring H-slab in the pad regions, so the ±G row
            # taps cross tile boundaries correctly.
            a_s[i, 0:Ps] = jnp.zeros((Ps, 128), a_s.dtype)
            a_s[i, Ps + R:2 * Ps + R] = jnp.zeros((Ps, 128), a_s.dtype)
            _build_scratch64(ins[i * 3 + 1], 1, a_s, i, G=G, R=R, P=P,
                             Ps=Ps, H=H, inv_l=inv_ref[i],
                             shift_l=shift_ref[i], mask_ref=mask_ref,
                             act=act, form=forms[i])
            for side, v in ((0, ins[i * 3]), (2, ins[i * 3 + 2])):
                _build_halo64(v, side, a_s, i, G=G, R=R, P=P, Ps=Ps,
                              inv_l=inv_ref[i], shift_l=shift_ref[i],
                              mask_ref=mask_ref, act=act,
                              form=forms[i])
            continue
        for z in range(kd):
            slot = i * kd + z
            a_s[slot, 0:Ps] = jnp.zeros((Ps, 128), a_s.dtype)
            a_s[slot, Ps + R:2 * Ps + R] = jnp.zeros((Ps, 128), a_s.dtype)
            _build_scratch64(ins[slot], z if kd == 3 else 1, a_s, slot,
                             G=G, R=R, P=P,
                             Ps=Ps, H=H, inv_l=inv_ref[i],
                             shift_l=shift_ref[i], mask_ref=mask_ref,
                             act=act, form=forms[i])

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    dims = (((1,), (0,)), ((), ()))
    for o in range(nout):
        y = jnp.zeros((R, 128), jnp.float32)
        for i in range(nin):
            for z in range(kd):
                slot = i * kd + z
                for t in range(3):
                    off = Ps + (t - 1) * G
                    a = a_s[slot, pl.ds(off, R), :]
                    y = y + _dot(
                        a, w0_ref[i, o, z, t], dimension_numbers=dims,
                        preferred_element_type=jnp.float32)
                    a_hi = a_s[slot, pl.ds(off + 1, R), :]
                    a_lo = a_s[slot, pl.ds(off - 1, R), :]
                    a_c = jnp.where(lane < CC64, a_hi, a_lo)
                    y = y + _dot(
                        a_c, wc_ref[i, o, z, t], dimension_numbers=dims,
                        preferred_element_type=jnp.float32)
        y = y + bias_ref[o][None, :]
        y = (y.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128)
        yc = y.astype(out_dtype)
        outs[o][0, 0, 0:P] = jnp.zeros((P, 128), out_dtype)
        outs[o][0, 0, pl.ds(P, R)] = yc
        outs[o][0, 0, P + R:2 * P + R] = jnp.zeros((P, 128), out_dtype)
        if want_stats:
            yf = yc.astype(jnp.float32)
            s_ref[o, :] += jnp.sum(yf, axis=0)
            q_ref[o, :] += jnp.sum(yf * yf, axis=0)


def _slab_index_map(z: int, D: int):
    """Index map for z-tap slab views WITHOUT materializing a D-padded
    copy (the old jnp.pad round trip cost ~1.5-2 ms/step at headline
    shapes): out-of-range slabs clamp to a real slab whose VALUES are
    zeroed by _slab_valid, so only the index needs to stay in range."""
    def imap(b_, d_):
        s = d_ + z - 1
        s = jnp.maximum(s, 0) if z == 0 else jnp.minimum(s, D - 1)
        return (b_, s, 0, 0)
    if z == 1:
        return lambda b_, d_: (b_, d_, 0, 0)
    return imap


# ---------------------------------------------------------------------------
# z-window streaming (kd=3): one HBM fetch per slab instead of three
#
# The three-BlockSpec-view form above fetches every chunk slab once per
# z-tap: Mosaic's pipeline refetches each (b, d±1) block because the
# views are distinct operands, so a kd=3 conv reads 3x its input bytes
# (and the backward 3x of x, dy AND y). The round-3 profile shows the
# kd=3 kernels at 273-441 GB/s with traffic within ~15% of 3x-their-
# logical bytes — i.e. HBM-bound on redundant fetches.
#
# Streaming form: grid (B, D+1) with ONE lookahead view per chunk
# (index map min(j, D-1)); a persistent VMEM scratch window keeps the
# last three prologued slabs, indexed by slab phase (slab mod 3 —
# dynamic leading-dim scratch indexing, validated on the v5e). Step j
# ingests slab j (prologue applied ONCE instead of 3x; value zeroed
# for j == D) and computes output slab d = j-1 from window phases
# (d-1..d+1) mod 3. The "slab -1" phase is zeroed at j == 0, giving
# exact conv zero-padding at both D edges. Output block index maps
# clamp j-1 to 0: the j == 0 step writes garbage to output slab 0 and
# j == 1 overwrites it (pipeline writes are ordered).
# ---------------------------------------------------------------------------

def _zwindow_enabled() -> bool:
    import os
    return os.environ.get("E3TPU_ZWINDOW", "1") != "0"


# Measured dead end (v5e, 2026-08-18): precomputing the combined-
# corner operand select(lane < 64, slab(r+1), slab(r-1)) into a
# per-slab scratch bank at ingest — so the 36 per-tap (R,128) selects
# per backward step become plain row slices — made the headline step
# SLOWER (51.7 vs 50.7 ms with a dgrad-only bank; the full bank OOM'd
# the 16 MB scoped VMEM by 5 KB on the L1 decoder merge). Mosaic
# already fuses the inline lane-select into the matmul operand feed;
# the bank's extra full-slot stores cost more than the selects save.


def _conv64_fwd_kernel_zw(*refs, nin: int, nout: int, G: int, R: int,
                          P: int, Ps: int, H: int, out_dtype, act: str,
                          want_stats: bool, forms, D: int,
                          per_sample: bool = False):
    ins = refs[:nin]                       # one lookahead view per chunk
    w0_ref, wc_ref, mask_ref, bias_ref, inv_ref, shift_ref = \
        refs[nin:nin + 6]
    outs = refs[nin + 6:nin + 6 + nout]
    idx = nin + 6 + nout
    if want_stats:
        s_ref, q_ref = refs[idx:idx + 2]
        idx += 2
    a_s = refs[idx]                        # (nin*3, R + 2*Ps, 128)

    j = pl.program_id(1)
    first = jnp.logical_and(pl.program_id(0) == 0, j == 0)

    if want_stats:
        # per_sample: b-indexed stat blocks reset at each b's first
        # window step (j == 0), accumulating over the z-window only.
        first_st = j == 0 if per_sample else first

        @pl.when(first_st)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)
            q_ref[...] = jnp.zeros_like(q_ref)

    @pl.when(first)
    def _():
        # Scratch pad rows: zeroed once; body writes never touch them.
        a_s[...] = jnp.zeros_like(a_s)

    @pl.when(j == 0)
    def _():
        # Phase 2 = "slab -1": conv zero padding at the leading edge.
        for i in range(nin):
            a_s[i * 3 + 2, pl.ds(Ps, R)] = jnp.zeros((R, 128), a_s.dtype)

    # Ingest slab j into phase j % 3 (prologue applied once per slab).
    # Guarded, not value-masked: the j == D lookahead step writes a
    # zero slab (conv zero padding at the trailing edge) so real-slab
    # values stay bitwise-identical to the 3-view kernel's.
    ph_in = jax.lax.rem(j, 3)

    @pl.when(j < D)
    def _():
        for i in range(nin):
            a = _load_raw64(ins[i], forms[i], R=R, P=P)
            pre = a * inv_ref[i][None, :] + shift_ref[i][None, :]
            val = (_act_fwd(pre, act).reshape(H, G, 128)
                   * mask_ref[...][None]).reshape(R, 128) \
                .astype(a_s.dtype)
            a_s[i * 3 + ph_in, pl.ds(Ps, R)] = val

    @pl.when(j == D)
    def _():
        for i in range(nin):
            a_s[i * 3 + ph_in, pl.ds(Ps, R)] = jnp.zeros((R, 128),
                                                         a_s.dtype)

    @pl.when(j >= 1)
    def _():
        d = j - 1
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        dims = (((1,), (0,)), ((), ()))
        for o in range(nout):
            y = jnp.zeros((R, 128), jnp.float32)
            for i in range(nin):
                for z in range(3):   # accumulation order matches the
                    ph = jax.lax.rem(d + z + 2, 3)   # 3-view kernel
                    slot = i * 3 + ph
                    for t in range(3):
                        off = Ps + (t - 1) * G
                        a = a_s[slot, pl.ds(off, R), :]
                        y = y + _dot(
                            a, w0_ref[i, o, z, t],
                            dimension_numbers=dims,
                            preferred_element_type=jnp.float32)
                        a_hi = a_s[slot, pl.ds(off + 1, R), :]
                        a_lo = a_s[slot, pl.ds(off - 1, R), :]
                        a_c = jnp.where(lane < CC64, a_hi, a_lo)
                        y = y + _dot(
                            a_c, wc_ref[i, o, z, t],
                            dimension_numbers=dims,
                            preferred_element_type=jnp.float32)
            y = y + bias_ref[o][None, :]
            y = (y.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128)
            yc = y.astype(out_dtype)
            outs[o][0, 0, 0:P] = jnp.zeros((P, 128), out_dtype)
            outs[o][0, 0, pl.ds(P, R)] = yc
            outs[o][0, 0, P + R:2 * P + R] = jnp.zeros((P, 128),
                                                       out_dtype)
            if want_stats:
                yf = yc.astype(jnp.float32)
                s_ref[o, :] += jnp.sum(yf, axis=0)
                q_ref[o, :] += jnp.sum(yf * yf, axis=0)


def _conv64_fwd_call(xs, inv, shift, wpk, bias_l, mask, *, H, W,
                     want_stats, act, nout, forms, d_halo=False):
    w0, wc = wpk
    kd = w0.shape[2]
    assert not d_halo or kd == 1, (d_halo, kd)
    nin = len(xs)
    G, R, P = flat_geometry64(H, W)
    Ps = G + 8
    B, D = xs[0].shape[0], xs[0].shape[1]
    dtype = xs[0].dtype

    # per-sample prologue/stats (group/instance norm): inv/shift are
    # (nin, B, 128) and stats (nout, B, 128); the batch dim rides as a
    # squeezed block dim indexed by grid b (_ps_in/_ps_out), so the
    # kernel body sees the same (n, 128) blocks as batch norm.
    per_sample = inv.ndim == 3
    zw = kd == 3 and not d_halo and _zwindow_enabled()
    if zw:
        kernel = functools.partial(
            _conv64_fwd_kernel_zw, nin=nin, nout=nout, G=G, R=R, P=P,
            Ps=Ps, H=H, out_dtype=dtype, act=act,
            want_stats=want_stats, forms=forms, D=D,
            per_sample=per_sample)
    else:
        kernel = functools.partial(
            _conv64_fwd_kernel, nin=nin, nout=nout, G=G, R=R, P=P,
            Ps=Ps, H=H, out_dtype=dtype, act=act,
            want_stats=want_stats, forms=forms, kd=kd, d_halo=d_halo,
            per_sample=per_sample)

    in_specs, operands = [], []
    bd4 = lambda b_, d_: (b_, d_, 0, 0)
    la4 = lambda b_, j_: (b_, jnp.minimum(j_, D - 1), 0, 0)
    for x, form in zip(xs, forms):
        rows = R if form == "pool32" else R + 2 * P
        if d_halo:
            for v in _strip_views64(x, form, G, R, P):
                in_specs.append(pl.BlockSpec(
                    (1, 1, v.shape[2], 128), bd4,
                    memory_space=pltpu.VMEM))
                operands.append(v)
            continue
        if zw:
            in_specs.append(pl.BlockSpec((1, 1, rows, 128), la4,
                                         memory_space=pltpu.VMEM))
            operands.append(x)
            continue
        for z in range(kd):
            in_specs.append(pl.BlockSpec(
                (1, 1, rows, 128),
                _slab_index_map(z, D) if kd == 3 else bd4,
                memory_space=pltpu.VMEM))
            operands.append(x)
    for warr in (w0, wc):
        in_specs.append(pl.BlockSpec(
            warr.shape, lambda b_, d_, nd=warr.ndim: (0,) * nd,
            memory_space=pltpu.VMEM))
        operands.append(warr.astype(dtype))
    in_specs.append(pl.BlockSpec((G, 128), lambda b_, d_: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(mask.astype(jnp.float32))
    for v in (bias_l, inv, shift):
        op, spec = _ps_in(v.astype(jnp.float32))
        in_specs.append(spec)
        operands.append(op)

    od4 = (lambda b_, j_: (b_, jnp.maximum(j_ - 1, 0), 0, 0)) if zw \
        else (lambda b_, d_: (b_, d_, 0, 0))
    out_specs = [pl.BlockSpec((1, 1, R + 2 * P, 128), od4,
                              memory_space=pltpu.VMEM)
                 for _ in range(nout)]
    out_shape = [jax.ShapeDtypeStruct((B, D, R + 2 * P, 128), dtype)
                 for _ in range(nout)]
    if want_stats:
        st_spec, st_shape = _ps_out(nout, B if per_sample else None)
        out_specs += [st_spec] * 2
        out_shape += [st_shape] * 2

    scratch = [pltpu.VMEM((nin * kd, R + 2 * Ps, 128), dtype)]
    res = pl.pallas_call(
        kernel,
        grid=(B, D + 1) if zw else (B, D),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * R * 128 * 256 * nin * nout * 3 * kd,
            bytes_accessed=((1 if zw else kd) * nin + nout)
            * B * D * (R + 2 * P) * 256,
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


def _conv64_bwd_kernel(*refs, nin: int, nout: int, G: int, R: int,
                       P: int, Ps: int, H: int, act: str,
                       want_stats: bool, x_dtype, forms, kd: int = 3,
                       d_halo: bool = False,
                       per_sample: bool = False):
    nv = 3 if d_halo else kd                   # views per chunk
    pos = 0
    ins = refs[pos:pos + nin * nv]; pos += nin * nv
    dys = refs[pos:pos + nout * nv]; pos += nout * nv
    ys = ()
    if want_stats:
        ys = refs[pos:pos + nout * nv]; pos += nout * nv
    w0T, wcT = refs[pos:pos + 2]; pos += 2
    mask_ref = refs[pos]; pos += 1
    inv_ref, shift_ref = refs[pos:pos + 2]; pos += 2
    if want_stats:
        ds_ref, dq_ref = refs[pos:pos + 2]; pos += 2
    dxs = refs[pos:pos + nin]; pos += nin
    dinv_ref, dshift_ref, m0, mc, db = refs[pos:pos + 5]; pos += 5
    a_s, dyt_s = refs[pos:pos + 2]

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    # per_sample: dinv/dshift blocks are b-indexed — reset at each b's
    # first grid step (the weight/bias accumulators stay global).
    first_b = pl.program_id(1) == 0 if per_sample else first

    @pl.when(first)
    def _():
        m0[...] = jnp.zeros_like(m0)
        mc[...] = jnp.zeros_like(mc)
        db[...] = jnp.zeros_like(db)

    @pl.when(first_b)
    def _():
        dinv_ref[...] = jnp.zeros_like(dinv_ref)
        dshift_ref[...] = jnp.zeros_like(dshift_ref)

    # Stage A: a' slabs into scratch
    for i in range(nin):
        if d_halo:
            a_s[i, 0:Ps] = jnp.zeros((Ps, 128), a_s.dtype)
            a_s[i, Ps + R:2 * Ps + R] = jnp.zeros((Ps, 128), a_s.dtype)
            _build_scratch64(ins[i * 3 + 1], 1, a_s, i, G=G, R=R, P=P,
                             Ps=Ps, H=H, inv_l=inv_ref[i],
                             shift_l=shift_ref[i], mask_ref=mask_ref,
                             act=act, form=forms[i])
            for side, v in ((0, ins[i * 3]), (2, ins[i * 3 + 2])):
                _build_halo64(v, side, a_s, i, G=G, R=R, P=P, Ps=Ps,
                              inv_l=inv_ref[i], shift_l=shift_ref[i],
                              mask_ref=mask_ref, act=act,
                              form=forms[i])
            continue
        for z in range(kd):
            slot = i * kd + z
            a_s[slot, 0:Ps] = jnp.zeros((Ps, 128), a_s.dtype)
            a_s[slot, Ps + R:2 * Ps + R] = jnp.zeros((Ps, 128), a_s.dtype)
            _build_scratch64(ins[slot], z if kd == 3 else 1, a_s, slot,
                             G=G, R=R, P=P,
                             Ps=Ps, H=H, inv_l=inv_ref[i],
                             shift_l=shift_ref[i], mask_ref=mask_ref,
                             act=act, form=forms[i])

    # Stage B: dy_tot slabs (stats cotangent folded, masked)
    def _dy_tot(o, dyv, yv, rows):
        dy = dyv[0, 0, rows, :].astype(jnp.float32)
        if want_stats:
            y = yv[0, 0, rows, :].astype(jnp.float32)
            dy = dy + ds_ref[o][None, :] + 2.0 * y * dq_ref[o][None, :]
        return dy

    for o in range(nout):
        if d_halo:
            dyt_s[o, 0:Ps] = jnp.zeros((Ps, 128), dyt_s.dtype)
            dyt_s[o, Ps + R:2 * Ps + R] = jnp.zeros((Ps, 128),
                                                    dyt_s.dtype)
            dy = _dy_tot(o, dys[o * 3 + 1],
                         ys[o * 3 + 1] if want_stats else None,
                         pl.ds(P, R))
            dy = (dy.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128)
            dyt_s[o, pl.ds(Ps, R)] = dy.astype(dyt_s.dtype)
            db[o, :] += jnp.sum(dy, axis=0)
            # Halo strips of dy_tot: dgrad of edge rows needs dy from
            # the adjacent H-slab (same layout as the a' halo). The
            # operands are pre-shifted narrow strips (_halo_strips64).
            for side, iv in ((0, 0), (2, 2)):
                dyh = _dy_tot(o, dys[o * 3 + iv],
                              ys[o * 3 + iv] if want_stats else None,
                              pl.ds(0, G))
                dyh = dyh * mask_ref[...] * _slab_valid(side)
                dst = Ps - G if side == 0 else Ps + R
                dyt_s[o, pl.ds(dst, G)] = dyh.astype(dyt_s.dtype)
            continue
        for z in range(kd):
            slot = o * kd + z
            dyt_s[slot, 0:Ps] = jnp.zeros((Ps, 128), dyt_s.dtype)
            dyt_s[slot, Ps + R:2 * Ps + R] = jnp.zeros((Ps, 128),
                                                      dyt_s.dtype)
            dy = _dy_tot(o, dys[slot],
                         ys[slot] if want_stats else None, pl.ds(P, R))
            dy = (dy.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128)
            if kd == 3:
                dy = dy * _slab_valid(z)
            dyt_s[slot, pl.ds(Ps, R)] = dy.astype(dyt_s.dtype)
            if z == kd // 2:
                db[o, :] += jnp.sum(dy, axis=0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    dims = (((1,), (0,)), ((), ()))
    cdims = (((0,), (0,)), ((), ()))
    for i in range(nin):
        # dgrad: conv of dy_tot with flipped/transposed weights (same
        # slab/tap structure as forward, roles of a and dy swapped)
        g = jnp.zeros((R, 128), jnp.float32)
        for o in range(nout):
            for z in range(kd):
                slot = o * kd + z
                for t in range(3):
                    off = Ps + (t - 1) * G
                    dyv = dyt_s[slot, pl.ds(off, R), :]
                    g = g + _dot(
                        dyv, w0T[o, i, z, t], dimension_numbers=dims,
                        preferred_element_type=jnp.float32)
                    d_hi = dyt_s[slot, pl.ds(off + 1, R), :]
                    d_lo = dyt_s[slot, pl.ds(off - 1, R), :]
                    d_c = jnp.where(lane < CC64, d_hi, d_lo)
                    g = g + _dot(
                        d_c, wcT[o, i, z, t], dimension_numbers=dims,
                        preferred_element_type=jnp.float32)
        # prologue epilogue (center slab)
        x = _load_raw64(ins[i * nv + nv // 2], forms[i], R=R, P=P)
        pre = x * inv_ref[i][None, :] + shift_ref[i][None, :]
        gm = (g.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128) \
            * _act_deriv(pre, act)
        dinv_ref[i, :] += jnp.sum(gm * x, axis=0)
        dshift_ref[i, :] += jnp.sum(gm, axis=0)
        dx = gm * inv_ref[i][None, :]
        if forms[i] == "pool32":
            # Inverse of the pool32 lane shuffle: compact lanes
            # [0:32] <- chunk64 [0:32], [32:64] <- chunk64 [64:96].
            rolledL = jnp.concatenate([dx[:, 32:], dx[:, :32]], axis=-1)
            dc = jnp.where(lane < CC64 // 2, dx, rolledL) \
                * (lane < CC64).astype(jnp.float32)
            dxs[i][0, 0, :, :] = dc.astype(x_dtype)
        else:
            dxs[i][0, 0, 0:P] = jnp.zeros((P, 128), x_dtype)
            dxs[i][0, 0, pl.ds(P, R)] = dx.astype(x_dtype)
            dxs[i][0, 0, P + R:2 * P + R] = jnp.zeros((P, 128), x_dtype)
        # wgrad: a'[z]^T @ dy_tot[center] per tap
        for o in range(nout):
            dyc = dyt_s[o * kd + kd // 2, pl.ds(Ps, R), :]
            for z in range(kd):
                slot = i * kd + z
                for t in range(3):
                    off = Ps + (t - 1) * G
                    a = a_s[slot, pl.ds(off, R), :]
                    m0[i, o, z, t] += _dot(
                        a, dyc, dimension_numbers=cdims,
                        preferred_element_type=jnp.float32)
                    a_hi = a_s[slot, pl.ds(off + 1, R), :]
                    a_lo = a_s[slot, pl.ds(off - 1, R), :]
                    a_c = jnp.where(lane < CC64, a_hi, a_lo)
                    mc[i, o, z, t] += _dot(
                        a_c, dyc, dimension_numbers=cdims,
                        preferred_element_type=jnp.float32)


def _conv64_bwd_kernel_zw(*refs, nin: int, nout: int, G: int, R: int,
                          P: int, Ps: int, H: int, act: str,
                          want_stats: bool, x_dtype, forms, D: int,
                          per_sample: bool = False):
    """z-window variant of _conv64_bwd_kernel (kd=3, non-d_halo): one
    lookahead view per array (x, dy, y) instead of three, rolling
    3-phase windows of a' and dy_tot in persistent scratch, plus a
    2-slot ring of the RAW center slab for the prologue epilogue.
    Accumulation orders match the 3-view kernel exactly (bitwise-equal
    grads in interpret parity)."""
    pos = 0
    ins = refs[pos:pos + nin]; pos += nin
    dys = refs[pos:pos + nout]; pos += nout
    ys = ()
    if want_stats:
        ys = refs[pos:pos + nout]; pos += nout
    w0T, wcT = refs[pos:pos + 2]; pos += 2
    mask_ref = refs[pos]; pos += 1
    inv_ref, shift_ref = refs[pos:pos + 2]; pos += 2
    if want_stats:
        ds_ref, dq_ref = refs[pos:pos + 2]; pos += 2
    dxs = refs[pos:pos + nin]; pos += nin
    dinv_ref, dshift_ref, m0, mc, db = refs[pos:pos + 5]; pos += 5
    a_s, dyt_s, xr = refs[pos:pos + 3]

    j = pl.program_id(1)
    first = jnp.logical_and(pl.program_id(0) == 0, j == 0)
    # per_sample: dinv/dshift blocks are b-indexed — reset at each b's
    # first window step (the weight/bias accumulators stay global).
    first_b = j == 0 if per_sample else first

    @pl.when(first)
    def _():
        m0[...] = jnp.zeros_like(m0)
        mc[...] = jnp.zeros_like(mc)
        db[...] = jnp.zeros_like(db)
        a_s[...] = jnp.zeros_like(a_s)      # pad rows stay zero
        dyt_s[...] = jnp.zeros_like(dyt_s)

    @pl.when(first_b)
    def _():
        dinv_ref[...] = jnp.zeros_like(dinv_ref)
        dshift_ref[...] = jnp.zeros_like(dshift_ref)

    @pl.when(j == 0)
    def _():
        # Phase 2 = "slab -1" (conv zero padding at the leading edge).
        for i in range(nin):
            a_s[i * 3 + 2, pl.ds(Ps, R)] = jnp.zeros((R, 128),
                                                     a_s.dtype)
        for o in range(nout):
            dyt_s[o * 3 + 2, pl.ds(Ps, R)] = jnp.zeros((R, 128),
                                                       dyt_s.dtype)

    # --- Ingest slab j (prologue + dy_tot built ONCE per slab) ---
    # Guarded (see _conv64_fwd_kernel_zw): j == D writes zero slabs so
    # real-slab values and the db accumulation stay bitwise-identical
    # to the 3-view kernel's.
    ph_in = jax.lax.rem(j, 3)

    @pl.when(j < D)
    def _():
        for i in range(nin):
            x = _load_raw64(ins[i], forms[i], R=R, P=P)
            xr[i * 2 + jax.lax.rem(j, 2), :, :] = x.astype(xr.dtype)
            pre = x * inv_ref[i][None, :] + shift_ref[i][None, :]
            val = (_act_fwd(pre, act).reshape(H, G, 128)
                   * mask_ref[...][None]).reshape(R, 128) \
                .astype(a_s.dtype)
            a_s[i * 3 + ph_in, pl.ds(Ps, R)] = val

        def _dy_tot(o, dyv, yv):
            dy = dyv[0, 0, pl.ds(P, R), :].astype(jnp.float32)
            if want_stats:
                y = yv[0, 0, pl.ds(P, R), :].astype(jnp.float32)
                dy = dy + ds_ref[o][None, :] \
                    + 2.0 * y * dq_ref[o][None, :]
            return dy

        for o in range(nout):
            dy = _dy_tot(o, dys[o], ys[o] if want_stats else None)
            dy = (dy.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128)
            dyt_s[o * 3 + ph_in, pl.ds(Ps, R)] = dy.astype(dyt_s.dtype)
            db[o, :] += jnp.sum(dy, axis=0)

    @pl.when(j == D)
    def _():
        for i in range(nin):
            a_s[i * 3 + ph_in, pl.ds(Ps, R)] = jnp.zeros((R, 128),
                                                         a_s.dtype)
        for o in range(nout):
            dyt_s[o * 3 + ph_in, pl.ds(Ps, R)] = jnp.zeros(
                (R, 128), dyt_s.dtype)

    # --- Compute output slab d = j - 1 ---
    @pl.when(j >= 1)
    def _():
        d = j - 1
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        dims = (((1,), (0,)), ((), ()))
        cdims = (((0,), (0,)), ((), ()))
        ph_c = jax.lax.rem(d, 3)            # center phase (slab d)
        for i in range(nin):
            g = jnp.zeros((R, 128), jnp.float32)
            for o in range(nout):
                for z in range(3):
                    ph = jax.lax.rem(d + z + 2, 3)   # (d-1+z) mod 3
                    slot = o * 3 + ph
                    for t in range(3):
                        off = Ps + (t - 1) * G
                        dyv = dyt_s[slot, pl.ds(off, R), :]
                        g = g + _dot(
                            dyv, w0T[o, i, z, t],
                            dimension_numbers=dims,
                            preferred_element_type=jnp.float32)
                        d_hi = dyt_s[slot, pl.ds(off + 1, R), :]
                        d_lo = dyt_s[slot, pl.ds(off - 1, R), :]
                        d_c = jnp.where(lane < CC64, d_hi, d_lo)
                        g = g + _dot(
                            d_c, wcT[o, i, z, t],
                            dimension_numbers=dims,
                            preferred_element_type=jnp.float32)
            # prologue epilogue (raw center slab from the delay ring)
            x = xr[i * 2 + jax.lax.rem(d, 2), :, :].astype(jnp.float32)
            pre = x * inv_ref[i][None, :] + shift_ref[i][None, :]
            gm = (g.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128) \
                * _act_deriv(pre, act)
            dinv_ref[i, :] += jnp.sum(gm * x, axis=0)
            dshift_ref[i, :] += jnp.sum(gm, axis=0)
            dx = gm * inv_ref[i][None, :]
            if forms[i] == "pool32":
                rolledL = jnp.concatenate([dx[:, 32:], dx[:, :32]],
                                          axis=-1)
                dc = jnp.where(lane < CC64 // 2, dx, rolledL) \
                    * (lane < CC64).astype(jnp.float32)
                dxs[i][0, 0, :, :] = dc.astype(x_dtype)
            else:
                dxs[i][0, 0, 0:P] = jnp.zeros((P, 128), x_dtype)
                dxs[i][0, 0, pl.ds(P, R)] = dx.astype(x_dtype)
                dxs[i][0, 0, P + R:2 * P + R] = jnp.zeros((P, 128),
                                                          x_dtype)
            # wgrad: a'[slab d-1+z]^T @ dy_tot[slab d] per tap
            for o in range(nout):
                dyc = dyt_s[o * 3 + ph_c, pl.ds(Ps, R), :]
                for z in range(3):
                    ph = jax.lax.rem(d + z + 2, 3)
                    slot = i * 3 + ph
                    for t in range(3):
                        off = Ps + (t - 1) * G
                        a = a_s[slot, pl.ds(off, R), :]
                        m0[i, o, z, t] += _dot(
                            a, dyc, dimension_numbers=cdims,
                            preferred_element_type=jnp.float32)
                        a_hi = a_s[slot, pl.ds(off + 1, R), :]
                        a_lo = a_s[slot, pl.ds(off - 1, R), :]
                        a_c = jnp.where(lane < CC64, a_hi, a_lo)
                        mc[i, o, z, t] += _dot(
                            a_c, dyc, dimension_numbers=cdims,
                            preferred_element_type=jnp.float32)


def conv3_bnact_flat64(xs, inv, shift, w, b, H: int, W: int,
                       want_stats: bool, act: str, forms=None,
                       d_halo: bool = False):
    """Public wrapper: always passes d_halo explicitly (custom_vjp
    nondiff args don't apply defaults). See _conv3_vjp64.

    The optimization_barrier on w isolates pack_weights64's
    at[].set block construction from its producers: XLA:TPU
    MISCOMPILES the fusion of a producer jnp.pad into the packing
    scatter chain (measured on v5e: packed weights come out wrong for
    traced w, correct for constants — benchmark/tpu_exactness_check.py
    caught it; barrier-before-pack fixes it, barrier-after-pack does
    not, proving the packed VALUE was wrong, not a kernel read)."""
    w = jax.lax.optimization_barrier(w)
    return _conv3_vjp64(xs, inv, shift, w, b, H, W, want_stats, act,
                        forms, d_halo)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _conv3_vjp64(xs, inv, shift, w, b, H: int, W: int,
                 want_stats: bool, act: str, forms=None,
                 d_halo: bool = False):
    """Fused prologue + 3x3x3 'same' conv + stats side outputs on
    flat64 chunks.

    Args:
        xs: tuple of padded flat64 chunks (B, D, R + 2P, 128).
        inv, shift: (nin, 128) f32 prologue lane vectors.
        w: (3, 3, 3, nin*64, cout) conv weights (zero-pad cin up to a
           multiple of 64 for narrower real inputs); b: (cout,).
    Returns:
        (ys, stats): cout//64 padded flat64 chunks + per-lane f32
        (sum, sumsq) or None.
    """
    forms = forms or ("flat64",) * len(xs)
    bias_l = _lane_bias64(b)
    ys, stats = _conv64_fwd_call(
        xs, inv, shift, pack_weights64(w), bias_l, width_mask64(W),
        H=H, W=W, want_stats=want_stats, act=act,
        nout=w.shape[-1] // CC64, forms=forms, d_halo=d_halo)
    return ys, stats


def _conv64_fwd(xs, inv, shift, w, b, H, W, want_stats, act,
                forms=None, d_halo=False):
    out = _conv3_vjp64(xs, inv, shift, w, b, H, W, want_stats,
                       act, forms, d_halo)
    ys, _ = out
    return out, (xs, inv, shift, w, ys)


def _conv64_bwd(H, W, want_stats, act, forms, d_halo, res, cts):
    forms = forms or ("flat64",) * len(res[0])
    xs, inv, shift, w, ys = res
    dys_in, dstats = cts
    nin, nout = len(xs), len(ys)
    G, R, P = flat_geometry64(H, W)
    Ps = G + 8
    B, D = xs[0].shape[0], xs[0].shape[1]
    dtype = xs[0].dtype
    mask = width_mask64(W)
    kd = w.shape[0]
    # barrier: see conv3_bnact_flat64 (XLA producer-fusion miscompile)
    w0T, wcT = pack_weights64(
        jax.lax.optimization_barrier(_flip_transpose64(w)))

    per_sample = inv.ndim == 3
    st_shape = (nout, B, 128) if per_sample else (nout, 128)
    dys = tuple(jnp.zeros((B, D, R + 2 * P, 128), dtype) if dy is None
                else dy.astype(dtype) for dy in dys_in)
    if want_stats:
        ds, dq = dstats
        ds = jnp.zeros(st_shape, jnp.float32) if ds is None else ds
        dq = jnp.zeros(st_shape, jnp.float32) if dq is None else dq

    zw = kd == 3 and not d_halo and _zwindow_enabled()

    def run_group(xs_g, forms_g, inv_g, shift_g, w0T_g, wcT_g):
        """One merged-backward pallas_call over a contiguous group of
        input chunks (all output chunks' dy/y are staged each call;
        the dgrad/wgrad matmul work is partitioned over groups)."""
        ng = len(xs_g)
        if zw:
            kernel = functools.partial(
                _conv64_bwd_kernel_zw, nin=ng, nout=nout, G=G, R=R,
                P=P, Ps=Ps, H=H, act=act, want_stats=want_stats,
                x_dtype=dtype, forms=forms_g, D=D,
                per_sample=per_sample)
        else:
            kernel = functools.partial(
                _conv64_bwd_kernel, nin=ng, nout=nout, G=G, R=R, P=P,
                Ps=Ps, H=H, act=act, want_stats=want_stats,
                x_dtype=dtype, forms=forms_g, kd=kd, d_halo=d_halo,
                per_sample=per_sample)

        in_specs, operands = [], []

        bd4 = lambda b_, d_: (b_, d_, 0, 0)
        la4 = lambda b_, j_: (b_, jnp.minimum(j_, D - 1), 0, 0)

        def addv(arr, rows=R + 2 * P, form="flat64"):
            """Add per-chunk operands: ONE lookahead view (z-window
            mode), kd clamped slab views (no D-padded copy; see
            _slab_index_map), or [strip0, center, strip2] with
            pre-shifted narrow halo strips in d_halo mode
            (_halo_strips64)."""
            if d_halo:
                for v in _strip_views64(arr, form, G, R, P):
                    in_specs.append(pl.BlockSpec(
                        (1, 1, v.shape[2], 128), bd4,
                        memory_space=pltpu.VMEM))
                    operands.append(v)
                return
            if zw:
                in_specs.append(pl.BlockSpec((1, 1, rows, 128), la4,
                                             memory_space=pltpu.VMEM))
                operands.append(arr)
                return
            for z in range(kd):
                in_specs.append(pl.BlockSpec(
                    (1, 1, rows, 128),
                    _slab_index_map(z, D) if kd == 3 else bd4,
                    memory_space=pltpu.VMEM))
                operands.append(arr)

        def addc(arr, shape):
            in_specs.append(pl.BlockSpec(
                shape, lambda b_, d_, nd=len(shape): (0,) * nd,
                memory_space=pltpu.VMEM))
            operands.append(arr)

        for x, form in zip(xs_g, forms_g):
            addv(x, rows=R if form == "pool32" else R + 2 * P,
                 form=form)
        for dy in dys:
            addv(dy)
        if want_stats:
            for y in ys:
                addv(y)
        addc(w0T_g.astype(dtype), w0T_g.shape)
        addc(wcT_g.astype(dtype), wcT_g.shape)
        addc(mask.astype(jnp.float32), (G, 128))
        for v in (inv_g.astype(jnp.float32),
                  shift_g.astype(jnp.float32)):
            op, spec = _ps_in(v)
            in_specs.append(spec)
            operands.append(op)
        if want_stats:
            for v in (ds, dq):
                op, spec = _ps_in(v)
                in_specs.append(spec)
                operands.append(op)

        bd = (lambda b_, j_: (b_, jnp.maximum(j_ - 1, 0), 0, 0)) \
            if zw else (lambda b_, d_: (b_, d_, 0, 0))
        c2 = lambda b_, d_: (0, 0)
        out_specs, out_shape = [], []
        for form in forms_g:
            rows = R if form == "pool32" else R + 2 * P
            out_specs.append(pl.BlockSpec((1, 1, rows, 128), bd,
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((B, D, rows, 128),
                                                  dtype))
        # per-sample prologues (group/instance norm) get b-indexed
        # dinv/dshift accumulator blocks (reset per b in the kernel).
        pro_spec, pro_shape = _ps_out(ng, B if per_sample else None)
        out_specs += [pro_spec, pro_spec]
        out_shape += [pro_shape, pro_shape]
        for shp in ((ng, nout, kd, 3, 128, 128),
                    (ng, nout, kd, 3, 128, 128)):
            out_specs.append(pl.BlockSpec(
                shp, lambda b_, d_, nd=len(shp): (0,) * nd,
                memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct(shp, jnp.float32))
        out_specs.append(pl.BlockSpec((nout, 128), c2,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nout, 128),
                                              jnp.float32))

        scratch = [pltpu.VMEM((ng * kd, R + 2 * Ps, 128), dtype),
                   pltpu.VMEM((nout * kd, R + 2 * Ps, 128), dtype)]
        if zw:
            scratch.append(pltpu.VMEM((ng * 2, R, 128), dtype))
        return pl.pallas_call(
            kernel,
            grid=(B, D + 1) if zw else (B, D),
            in_specs=tuple(in_specs),
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch,
            cost_estimate=pl.CostEstimate(
                # dgrad + wgrad, each the forward's FLOPs
                flops=2 * 2 * B * D * R * 128 * 256 * ng * nout
                * 3 * kd,
                bytes_accessed=((2 * ng
                                 + (3 if want_stats else 2) * nout)
                                if zw else
                                ((1 + kd) * ng
                                 + kd * (3 if want_stats else 2)
                                 * nout))
                * B * D * (R + 2 * P) * 256,
                transcendentals=0),
            interpret=_interpret(),
        )(*operands)

    # Input-chunk split: keep each call's nin-scaled VMEM residents
    # (m0/mc tap accumulators, x views, dx, a' scratch) under the
    # scoped limit — this is what admits 4-chunk decoder merge convs
    # to TRAINING (their unsplit backward needs ~28 MB). Deterministic
    # from geometry so interpret parity covers the chip's split.
    split = bwd_ki_split(
        nin, nout, kd, H, W,
        esize=jnp.dtype(dtype).itemsize, want_stats=want_stats,
        tiled=d_halo, zw=zw) or 1
    ng0 = -(-nin // split)
    bounds = list(range(0, nin, ng0)) + [nin]
    parts = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        parts.append(run_group(
            xs[lo:hi], forms[lo:hi], inv[lo:hi], shift[lo:hi],
            w0T[:, lo:hi], wcT[:, lo:hi]))
    if len(parts) == 1:
        res_ = parts[0]
        dxs = tuple(res_[:nin])
        dinv, dshift, m0, mc, db = res_[nin:nin + 5]
    else:
        dxs = tuple(dx for p, (lo, hi) in
                    zip(parts, zip(bounds[:-1], bounds[1:]))
                    for dx in p[:hi - lo])
        ki_ax = 1 if per_sample else 0   # (B, ng, 128) vs (ng, 128)
        tails = [p[hi - lo:] for p, (lo, hi) in
                 zip(parts, zip(bounds[:-1], bounds[1:]))]
        dinv = jnp.concatenate([t[0] for t in tails], axis=ki_ax)
        dshift = jnp.concatenate([t[1] for t in tails], axis=ki_ax)
        m0 = jnp.concatenate([t[2] for t in tails], axis=0)
        mc = jnp.concatenate([t[3] for t in tails], axis=0)
        db = tails[0][4]   # dy-only reduction: identical per group
    # barrier: see conv3_bnact_flat64 (scatter-fusion miscompile); the
    # wgrad unpack is the same at[].set/add chain in reverse.
    m0, mc = jax.lax.optimization_barrier((m0, mc))
    dw = _unpack_wgrad64(m0, mc, nin, nout).astype(w.dtype)
    dbc = fold_lane_stats64(db)
    if per_sample:
        # restore the canonical (nin, B, 128) prologue-grad layout
        dinv = dinv.transpose(1, 0, 2)
        dshift = dshift.transpose(1, 0, 2)
    return dxs, dinv, dshift, dw, dbc.astype(w.dtype)


_conv3_vjp64.defvjp(_conv64_fwd, _conv64_bwd)


# ---------------------------------------------------------------------------
# Fused (2,2,2) max pool: flat64 chunk + prologue -> dense 5D rows.
# ---------------------------------------------------------------------------

def _load_prologue64(ref, sl, *, G, R, P, H, inv_l, shift_l, mask_ref,
                     act):
    x = ref[0, sl, pl.ds(P, R), :].astype(jnp.float32).reshape(H, G, 128)
    pre = x * inv_l[None, None, :] + shift_l[None, None, :]
    return _act_fwd(pre, act) * mask_ref[...][None], pre, x


def _pool64_compact(a3, H, G):
    """a' (H, G, 128) -> (H//2, G, 128) with pooled values in lanes
    0:64 (w-pair max within the row, h-pair max across row blocks)."""
    m1 = jnp.maximum(a3[:, :, 0:CC64], a3[:, :, CC64:2 * CC64])
    V = jnp.concatenate([m1, jnp.zeros((H, G, CC64), m1.dtype)], axis=2)
    V2 = V.reshape(H // 2, 2 * G, 128)
    return jnp.maximum(V2[:, :G], V2[:, G:])


def _pool64_fwd_kernel(*refs, nin: int, G: int, R: int, P: int, H: int,
                       act: str, out_dtype):
    ins = refs[:nin]
    mask_ref, inv_ref, shift_ref = refs[nin:nin + 3]
    outs = refs[nin + 3:]
    H2 = H // 2
    for i in range(nin):
        Vs = []
        for sl in range(2):     # d-pair slabs
            a3, _, _ = _load_prologue64(
                ins[i], sl, G=G, R=R, P=P, H=H, inv_l=inv_ref[i],
                shift_l=shift_ref[i], mask_ref=mask_ref, act=act)
            Vs.append(_pool64_compact(a3, H, G))
        V = jnp.maximum(Vs[0], Vs[1])
        outs[i][0, 0, :, :] = V.reshape(H2 * G, 128).astype(out_dtype)


def _pool64_compose_xla(compacts, H, W, C):
    """Compact chunks (B, D2, H2*G, 128) -> dense (B, D2, H2, W2, C)."""
    G, R, P = flat_geometry64(H, W)
    H2, W2 = H // 2, W // 2
    outs = []
    for c in compacts:
        B, D2 = c.shape[0], c.shape[1]
        v = c.reshape(B, D2, H2, G, 128)[:, :, :, 1:1 + W2, 0:CC64]
        outs.append(v)
    out = jnp.concatenate(outs, axis=-1)
    return out[..., :C]


def _pool64_decompose_xla(dense5, G, nin):
    """dense (B, D2, H2, W2, C) -> compact chunks (pad to 64-multiples
    and re-insert the group offset)."""
    B, D2, H2, W2, C = dense5.shape
    cpad = nin * CC64 - C
    dp = jnp.pad(dense5, ((0, 0), (0, 0), (0, 0), (0, 0), (0, cpad)))
    outs = []
    for i in range(nin):
        v = dp[..., i * CC64:(i + 1) * CC64]
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (1, G - 1 - W2),
                        (0, CC64)))
        outs.append(v.reshape(B, D2, H2 * G, 128))
    return outs


def _pool64_expand(Sc, H, G):
    """Compact (H2*G, 128) -> (H, G, 128) pooled value per position."""
    H2 = H // 2
    Vh = Sc.reshape(H2, G, 128)
    E = jnp.concatenate([Vh[:, :, 0:CC64], Vh[:, :, 0:CC64]], axis=2)
    return jnp.concatenate([E[:, None], E[:, None]],
                           axis=1).reshape(H, G, 128)


def _pool64_bwd_kernel(*refs, nin: int, G: int, R: int, P: int, H: int,
                       act: str, x_dtype, with_skip: bool = False,
                       per_sample: bool = False):
    ins = refs[:nin]
    dy_refs = refs[nin:2 * nin]
    pos = 2 * nin
    # with_skip: the decoder-skip cotangent is summed into dx
    # in-kernel (see flat_fused._pool_bwd_kernel).
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
        # Pooled maxima recomputed from the two slabs' prologues in
        # f32 (the forward's exact formulation BEFORE its out_dtype
        # cast) instead of re-reading the stored y chunk: saves an HBM
        # read per chunk AND keeps the argmax routing exact for bf16
        # models — comparing f32 a' against the bf16-rounded stored
        # max dropped the selection wherever the max was not
        # bf16-representable (round-5 fix; see test_pool_bf16_routing).
        pros = [_load_prologue64(
            ins[i], sl, G=G, R=R, P=P, H=H, inv_l=inv_ref[i],
            shift_l=shift_ref[i], mask_ref=mask_ref, act=act)
            for sl in range(2)]
        V = jnp.maximum(_pool64_compact(pros[0][0], H, G),
                        _pool64_compact(pros[1][0], H, G))
        yb = _pool64_expand(V, H, G)
        dyb = _pool64_expand(dy_refs[i][0, 0, :, :].astype(jnp.float32),
                             H, G)
        for sl in range(2):
            a3, pre, x = pros[sl]
            sel = (a3 == yb).astype(jnp.float32) * mask_ref[...][None]
            dpre = dyb * sel * _act_deriv(pre, act)
            dinv_ref[i, :] += jnp.sum((dpre * x).reshape(R, 128), axis=0)
            dshift_ref[i, :] += jnp.sum(dpre.reshape(R, 128), axis=0)
            dx = (dpre * inv_ref[i][None, None, :]).reshape(R, 128)
            if with_skip:
                dx = dx + dsk[i][0, sl, pl.ds(P, R), :] \
                    .astype(jnp.float32)
            dxs[i][0, sl, 0:P] = jnp.zeros((P, 128), x_dtype)
            dxs[i][0, sl, pl.ds(P, R)] = dx.astype(x_dtype)
            dxs[i][0, sl, P + R:2 * P + R] = jnp.zeros((P, 128), x_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def pool222_bnact_flat64(xs, inv, shift, H: int, W: int, C: int,
                         act: str):
    """Prologue + (2,2,2) max pool from flat64 chunks to a dense
    channels-last (B, D/2, H/2, W/2, C) tensor."""
    nin = len(xs)
    G, R, P = flat_geometry64(H, W)
    H2 = H // 2
    B, D = xs[0].shape[0], xs[0].shape[1]
    assert D % 2 == 0 and H % 2 == 0 and W % 2 == 0, (D, H, W)
    dtype = xs[0].dtype

    kernel = functools.partial(_pool64_fwd_kernel, nin=nin, G=G, R=R,
                               P=P, H=H, act=act, out_dtype=dtype)
    in_specs, operands = [], []
    for x in xs:
        in_specs.append(pl.BlockSpec((1, 2, R + 2 * P, 128),
                                     lambda b_, d_: (b_, d_, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(x)
    in_specs.append(pl.BlockSpec((G, 128), lambda b_, d_: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(width_mask64(W).astype(jnp.float32))
    for v in (inv, shift):
        op, spec = _ps_in(v.astype(jnp.float32))
        in_specs.append(spec)
        operands.append(op)
    res = pl.pallas_call(
        kernel,
        grid=(B, D // 2),
        in_specs=tuple(in_specs),
        out_specs=tuple(
            pl.BlockSpec((1, 1, H2 * G, 128),
                         lambda b_, d_: (b_, d_, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(nin)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, D // 2, H2 * G, 128), dtype)
            for _ in range(nin)),
        interpret=_interpret(),
    )(*operands)
    res = res if isinstance(res, (tuple, list)) else (res,)
    return _pool64_compose_xla(res, H, W, C)


def _pool64_fwd(xs, inv, shift, H, W, C, act):
    out = pool222_bnact_flat64(xs, inv, shift, H, W, C, act)
    return out, (xs, inv, shift, out)


def _pool64_bwd_impl(H, W, C, act, res, dpool, dskips=None):
    xs, inv, shift, pooled = res
    nin = len(xs)
    G, R, P = flat_geometry64(H, W)
    H2 = H // 2
    B, D = xs[0].shape[0], xs[0].shape[1]
    dtype = xs[0].dtype
    with_skip = dskips is not None

    per_sample = inv.ndim == 3
    kernel = functools.partial(_pool64_bwd_kernel, nin=nin, G=G, R=R,
                               P=P, H=H, act=act, x_dtype=dtype,
                               with_skip=with_skip,
                               per_sample=per_sample)
    in_specs, operands = [], []
    for x in xs:
        in_specs.append(pl.BlockSpec((1, 2, R + 2 * P, 128),
                                     lambda b_, d_: (b_, d_, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(x)
    # Pooled maxima are recomputed in-kernel from the prologues (f32,
    # bf16-routing-exact) — only the cotangent ships (round 5).
    for arr in _pool64_decompose_xla(dpool.astype(dtype), G, nin):
        in_specs.append(pl.BlockSpec((1, 1, H2 * G, 128),
                                     lambda b_, d_: (b_, d_, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(arr.astype(dtype))
    if with_skip:
        for i, ds in enumerate(dskips):
            ds = (jnp.zeros_like(xs[i]) if ds is None
                  else ds.astype(dtype))
            in_specs.append(pl.BlockSpec((1, 2, R + 2 * P, 128),
                                         lambda b_, d_: (b_, d_, 0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(ds)
    in_specs.append(pl.BlockSpec((G, 128), lambda b_, d_: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(width_mask64(W).astype(jnp.float32))
    for v in (inv, shift):
        op, spec = _ps_in(v.astype(jnp.float32))
        in_specs.append(spec)
        operands.append(op)

    out_specs, out_shape = [], []
    for _ in range(nin):
        out_specs.append(pl.BlockSpec((1, 2, R + 2 * P, 128),
                                      lambda b_, d_: (b_, d_, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, D, R + 2 * P, 128),
                                              dtype))
    for _ in range(2):
        sp, sh = _ps_out(nin, B if per_sample else None)
        out_specs.append(sp)
        out_shape.append(sh)
    res_ = pl.pallas_call(
        kernel,
        grid=(B, D // 2),
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


def _pool64_bwd(H, W, C, act, res, dpool):
    return _pool64_bwd_impl(H, W, C, act, res, dpool)


pool222_bnact_flat64.defvjp(_pool64_fwd, _pool64_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def pool222_bnact_flat64_skip(xs, inv, shift, H: int, W: int, C: int,
                              act: str):
    """pool222_bnact_flat64 that also returns the raw input chunks
    (the decoder skip), so the skip cotangent is summed into dx
    in-kernel instead of a chunk-sized XLA add_any (see
    flat_fused.pool_bnact_flat_skip)."""
    return pool222_bnact_flat64(xs, inv, shift, H, W, C, act), xs


def _pool64_skip_fwd(xs, inv, shift, H, W, C, act):
    out = pool222_bnact_flat64(xs, inv, shift, H, W, C, act)
    return (out, xs), (xs, inv, shift, out)


def _pool64_skip_bwd(H, W, C, act, res, cts):
    dpool, dskips = cts
    return _pool64_bwd_impl(H, W, C, act, res, dpool, dskips=dskips)


pool222_bnact_flat64_skip.defvjp(_pool64_skip_fwd, _pool64_skip_bwd)


# ---------------------------------------------------------------------------
# Planar (1,2,2) max pool: flat64 chunk + prologue -> dense 5D rows.
# Used by planar C=64 levels (and every level of a 2D model, D == 1).
# ---------------------------------------------------------------------------

def _pool122_fwd_kernel(*refs, nin: int, G: int, R: int, P: int, H: int,
                        act: str, out_dtype):
    ins = refs[:nin]
    mask_ref, inv_ref, shift_ref = refs[nin:nin + 3]
    outs = refs[nin + 3:]
    H2 = H // 2
    for i in range(nin):
        a3, _, _ = _load_prologue64(
            ins[i], 0, G=G, R=R, P=P, H=H, inv_l=inv_ref[i],
            shift_l=shift_ref[i], mask_ref=mask_ref, act=act)
        V = _pool64_compact(a3, H, G)
        outs[i][0, 0, :, :] = V.reshape(H2 * G, 128).astype(out_dtype)


def _pool122_bwd_kernel(*refs, nin: int, G: int, R: int, P: int, H: int,
                        act: str, x_dtype, with_skip: bool = False,
                        per_sample: bool = False):
    ins = refs[:nin]
    dy_refs = refs[nin:2 * nin]
    pos = 2 * nin
    # with_skip: see flat_fused._pool_bwd_kernel.
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
        a3, pre, x = _load_prologue64(
            ins[i], 0, G=G, R=R, P=P, H=H, inv_l=inv_ref[i],
            shift_l=shift_ref[i], mask_ref=mask_ref, act=act)
        # Recomputed f32 pooled maxima (not the bf16-rounded stored
        # chunk) — see _pool64_bwd_kernel's note.
        yb = _pool64_expand(_pool64_compact(a3, H, G), H, G)
        dyb = _pool64_expand(dy_refs[i][0, 0, :, :].astype(jnp.float32),
                             H, G)
        sel = (a3 == yb).astype(jnp.float32) * mask_ref[...][None]
        dpre = dyb * sel * _act_deriv(pre, act)
        dinv_ref[i, :] += jnp.sum((dpre * x).reshape(R, 128), axis=0)
        dshift_ref[i, :] += jnp.sum(dpre.reshape(R, 128), axis=0)
        dx = (dpre * inv_ref[i][None, None, :]).reshape(R, 128)
        if with_skip:
            dx = dx + dsk[i][0, 0, pl.ds(P, R), :].astype(jnp.float32)
        dxs[i][0, 0, 0:P] = jnp.zeros((P, 128), x_dtype)
        dxs[i][0, 0, pl.ds(P, R)] = dx.astype(x_dtype)
        dxs[i][0, 0, P + R:2 * P + R] = jnp.zeros((P, 128), x_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def pool122_bnact_flat64(xs, inv, shift, H: int, W: int, C: int,
                         act: str):
    """Prologue + (1,2,2) max pool from flat64 chunks to a dense
    channels-last (B, D, H/2, W/2, C) tensor (planar levels; D stays).
    Reference models/unet.py:202-253 planar pooling."""
    nin = len(xs)
    G, R, P = flat_geometry64(H, W)
    H2 = H // 2
    B, D = xs[0].shape[0], xs[0].shape[1]
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    dtype = xs[0].dtype

    kernel = functools.partial(_pool122_fwd_kernel, nin=nin, G=G, R=R,
                               P=P, H=H, act=act, out_dtype=dtype)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    in_specs, operands = [], []
    for x in xs:
        in_specs.append(pl.BlockSpec((1, 1, R + 2 * P, 128), bd,
                                     memory_space=pltpu.VMEM))
        operands.append(x)
    in_specs.append(pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM))
    operands.append(width_mask64(W).astype(jnp.float32))
    for v in (inv, shift):
        op, spec = _ps_in(v.astype(jnp.float32))
        in_specs.append(spec)
        operands.append(op)
    res = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=tuple(in_specs),
        out_specs=tuple(
            pl.BlockSpec((1, 1, H2 * G, 128), bd,
                         memory_space=pltpu.VMEM)
            for _ in range(nin)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, D, H2 * G, 128), dtype)
            for _ in range(nin)),
        interpret=_interpret(),
    )(*operands)
    res = res if isinstance(res, (tuple, list)) else (res,)
    return _pool64_compose_xla(res, H, W, C)


def _pool122_fwd(xs, inv, shift, H, W, C, act):
    out = pool122_bnact_flat64(xs, inv, shift, H, W, C, act)
    return out, (xs, inv, shift, out)


def _pool122_bwd_impl(H, W, C, act, res, dpool, dskips=None):
    xs, inv, shift, pooled = res
    nin = len(xs)
    G, R, P = flat_geometry64(H, W)
    H2 = H // 2
    B, D = xs[0].shape[0], xs[0].shape[1]
    dtype = xs[0].dtype
    with_skip = dskips is not None

    per_sample = inv.ndim == 3
    kernel = functools.partial(_pool122_bwd_kernel, nin=nin, G=G, R=R,
                               P=P, H=H, act=act, x_dtype=dtype,
                               with_skip=with_skip,
                               per_sample=per_sample)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    in_specs, operands = [], []
    for x in xs:
        in_specs.append(pl.BlockSpec((1, 1, R + 2 * P, 128), bd,
                                     memory_space=pltpu.VMEM))
        operands.append(x)
    # Pooled maxima recomputed in-kernel (see _pool64_bwd_impl).
    for arr in _pool64_decompose_xla(dpool.astype(dtype), G, nin):
        in_specs.append(pl.BlockSpec((1, 1, H2 * G, 128), bd,
                                     memory_space=pltpu.VMEM))
        operands.append(arr.astype(dtype))
    if with_skip:
        for i, ds in enumerate(dskips):
            ds = (jnp.zeros_like(xs[i]) if ds is None
                  else ds.astype(dtype))
            in_specs.append(pl.BlockSpec((1, 1, R + 2 * P, 128), bd,
                                         memory_space=pltpu.VMEM))
            operands.append(ds)
    in_specs.append(pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM))
    operands.append(width_mask64(W).astype(jnp.float32))
    for v in (inv, shift):
        op, spec = _ps_in(v.astype(jnp.float32))
        in_specs.append(spec)
        operands.append(op)

    out_specs, out_shape = [], []
    for _ in range(nin):
        out_specs.append(pl.BlockSpec((1, 1, R + 2 * P, 128), bd,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, D, R + 2 * P, 128),
                                              dtype))
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


def _pool122_bwd(H, W, C, act, res, dpool):
    return _pool122_bwd_impl(H, W, C, act, res, dpool)


pool122_bnact_flat64.defvjp(_pool122_fwd, _pool122_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def pool122_bnact_flat64_skip(xs, inv, shift, H: int, W: int, C: int,
                              act: str):
    """pool122_bnact_flat64 that also returns the raw input chunks
    (the decoder skip) — skip cotangent summed into dx in-kernel; see
    flat_fused.pool_bnact_flat_skip."""
    return pool122_bnact_flat64(xs, inv, shift, H, W, C, act), xs


def _pool122_skip_fwd(xs, inv, shift, H, W, C, act):
    out = pool122_bnact_flat64(xs, inv, shift, H, W, C, act)
    return (out, xs), (xs, inv, shift, out)


def _pool122_skip_bwd(H, W, C, act, res, cts):
    dpool, dskips = cts
    return _pool122_bwd_impl(H, W, C, act, res, dpool, dskips=dskips)


pool122_bnact_flat64_skip.defvjp(_pool122_skip_fwd, _pool122_skip_bwd)


# ---------------------------------------------------------------------------
# Fused (2,2,2) stride-2 transposed conv: deeper-level dense 5D
# (cin = 128) -> one flat64 chunk (cout = 64) + stats side outputs.
# ---------------------------------------------------------------------------

def pack_upconv_weights64(w: jnp.ndarray):
    """(2, 2, 2, 128, 64) flax ConvTranspose kernel -> M[az][ah], each
    (128, 128): M[az][ah][k][o][ci, p*64 + co] =
    w[1-az, 1-ah, 1-p, k*128 + ci, o*64 + co]
    (flax places in[d1,h1,w1] * K[1-az, 1-ah, 1-p] at
    out[2*d1+az, 2*h1+ah, 2*w1+p]). cin may be 128 or 256 (nk = cin//128
    input lane-chunks), cout 64 or 128 (no = cout//64 output flat64
    chunks) — the C=128 decoder's 256 -> 128 upconv uses nk = no = 2."""
    assert w.shape[:3] == (2, 2, 2) and w.shape[3] % 128 == 0 \
        and w.shape[4] % CC64 == 0, w.shape
    nk, no = w.shape[3] // 128, w.shape[4] // CC64
    Ms = []
    for az in range(2):
        row = []
        for ah in range(2):
            kos = []
            for k in range(nk):
                os_ = []
                for o in range(no):
                    blk = w[1 - az, 1 - ah, :, k * 128:(k + 1) * 128,
                            o * CC64:(o + 1) * CC64]
                    os_.append(jnp.concatenate([blk[1], blk[0]],
                                               axis=-1))
                kos.append(os_)
            row.append(kos)
        Ms.append(row)
    return Ms


def _upconv64_fwd_kernel(*refs, nk: int, no: int, G: int,
                         R: int, P: int, H: int, W1: int, out_dtype,
                         want_stats):
    # refs: nk dec chunks, 4*nk*no mats (az, ah, k, o order), mask,
    # bias, then no out chunks (+ s, q).
    dec_refs = refs[:nk]
    mats = refs[nk:nk + 4 * nk * no]
    mask_ref, bias_ref = refs[nk + 4 * nk * no:nk + 4 * nk * no + 2]
    outs = refs[nk + 4 * nk * no + 2:nk + 4 * nk * no + 2 + no]
    if want_stats:
        s_ref, q_ref = refs[nk + 4 * nk * no + 2 + no:]
        # 'per_sample' (group/instance norm): b-indexed stat blocks
        # reset at each b's first grid step.
        first = (pl.program_id(1) == 0 if want_stats == "per_sample"
                 else jnp.logical_and(pl.program_id(0) == 0,
                                      pl.program_id(1) == 0))

        @pl.when(first)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)
            q_ref[...] = jnp.zeros_like(q_ref)

    H1 = H // 2
    Ss = [dec_refs[k][0, 0, :, :] for k in range(nk)]  # (H1*W1, 128)
    dims = (((1,), (0,)), ((), ()))

    def mat(az, ah, k, o):
        return mats[((az * 2 + ah) * nk + k) * no + o]

    for az in range(2):
        for o in range(no):
            Ys = []
            for ah in range(2):
                Y = jnp.zeros((H1 * W1, 128), jnp.float32)
                for k in range(nk):
                    Y = Y + _dot(Ss[k], mat(az, ah, k, o)[...],
                                 dimension_numbers=dims,
                                 preferred_element_type=jnp.float32)
                Ys.append(Y.reshape(H1, W1, 128))
            I = jnp.concatenate([Ys[0][:, None], Ys[1][:, None]],
                                axis=1).reshape(H, W1, 128)
            zl = jnp.zeros((H, 1, 128), jnp.float32)
            zr = jnp.zeros((H, G - W1 - 1, 128), jnp.float32)
            rows = jnp.concatenate([zl, I, zr], axis=1)
            y = rows + bias_ref[o][None, None, :]
            y = (y * mask_ref[...][None]).reshape(R, 128)
            yc = y.astype(out_dtype)
            outs[o][0, az, 0:P] = jnp.zeros((P, 128), out_dtype)
            outs[o][0, az, pl.ds(P, R)] = yc
            outs[o][0, az, P + R:2 * P + R] = jnp.zeros((P, 128),
                                                        out_dtype)
            if want_stats:
                yf = yc.astype(jnp.float32)
                s_ref[o, :] += jnp.sum(yf, axis=0)
                q_ref[o, :] += jnp.sum(yf * yf, axis=0)


def _upconv64_bwd_kernel(*refs, nk: int, no: int, G: int, R: int,
                         P: int, H: int, W1: int, want_stats: bool,
                         x_dtype):
    # refs: nk dec chunks, no dy chunks, no y chunks, 4*nk*no mats,
    # mask, ds, dq; outs: nk ddec, 4*nk*no dM, db.
    dec_refs = refs[:nk]
    dy_refs = refs[nk:nk + no]
    y_refs = refs[nk + no:nk + 2 * no]
    pos = nk + 2 * no
    mats = refs[pos:pos + 4 * nk * no]
    pos += 4 * nk * no
    mask_ref, ds_ref, dq_ref = refs[pos:pos + 3]
    pos += 3
    ddecs = refs[pos:pos + nk]
    dmats = refs[pos + nk:pos + nk + 4 * nk * no]
    db = refs[pos + nk + 4 * nk * no]

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        for dm in dmats:
            dm[...] = jnp.zeros_like(dm)
        db[...] = jnp.zeros_like(db)

    H1 = H // 2
    Ss = [dec_refs[k][0, 0, :, :] for k in range(nk)]
    dimsT = (((1,), (1,)), ((), ()))
    cdims = (((0,), (0,)), ((), ()))

    def mslot(az, ah, k, o):
        return ((az * 2 + ah) * nk + k) * no + o

    dds = [jnp.zeros((H1 * W1, 128), jnp.float32) for _ in range(nk)]
    for az in range(2):
        for o in range(no):
            dy = dy_refs[o][0, az, pl.ds(P, R), :].astype(jnp.float32)
            if want_stats:
                y = y_refs[o][0, az, pl.ds(P, R), :].astype(jnp.float32)
                dy = dy + ds_ref[o][None, :] \
                    + 2.0 * y * dq_ref[o][None, :]
            dyt = (dy.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128)
            db[o, :] += jnp.sum(dyt, axis=0)
            d3 = dyt.reshape(H1, 2 * G, 128)  # h-deinterleave: blocks
            for ah in range(2):
                blk = d3[:, ah * G:(ah + 1) * G, :][:, 1:1 + W1, :]
                Yg = blk.reshape(H1 * W1, 128).astype(Ss[0].dtype)
                for k in range(nk):
                    dds[k] = dds[k] + _dot(
                        Yg, mats[mslot(az, ah, k, o)][...],
                        dimension_numbers=dimsT,
                        preferred_element_type=jnp.float32)
                    dmats[mslot(az, ah, k, o)][...] += _dot(
                        Ss[k], Yg, dimension_numbers=cdims,
                        preferred_element_type=jnp.float32)
    for k in range(nk):
        ddecs[k][0, 0, :, :] = dds[k].astype(x_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def upconv222_bn_flat64(dec, w, b, H: int, W: int, want_stats: bool):
    """(2,2,2)-stride-2 transposed conv (flax ConvTranspose semantics,
    reference models/unet.py:328-409) from dec (B, D/2, H/2, W/2, cin)
    into cout//64 flat64 chunks at (H, W) (+ optional per-lane stats).
    cin in {128, 256}, cout in {64, 128} (the C=128 decoder's
    256 -> 128 upconv runs nk = no = 2)."""
    B, D1, H1, W1, cin = dec.shape
    assert cin % 128 == 0 and H1 * 2 == H and W1 * 2 == W, dec.shape
    nk, no = cin // 128, w.shape[4] // CC64
    G, R, P = flat_geometry64(H, W)
    dtype = dec.dtype
    Ms = pack_upconv_weights64(jax.lax.optimization_barrier(w))
    bias_l = _lane_bias64(b)

    kernel = functools.partial(_upconv64_fwd_kernel, nk=nk, no=no, G=G,
                               R=R, P=P, H=H, W1=W1, out_dtype=dtype,
                               want_stats=want_stats)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    in_specs, operands = [], []
    for k in range(nk):
        in_specs.append(pl.BlockSpec((1, 1, H1 * W1, 128), bd,
                                     memory_space=pltpu.VMEM))
        operands.append(dec[..., k * 128:(k + 1) * 128]
                        .reshape(B, D1, H1 * W1, 128))
    for az in range(2):
        for ah in range(2):
            for k in range(nk):
                for o in range(no):
                    in_specs.append(pl.BlockSpec(
                        (128, 128), c2, memory_space=pltpu.VMEM))
                    operands.append(Ms[az][ah][k][o].astype(dtype))
    in_specs.append(pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM))
    operands.append(width_mask64(W).astype(jnp.float32))
    in_specs.append(pl.BlockSpec((no, 128), c2,
                                 memory_space=pltpu.VMEM))
    operands.append(bias_l.astype(jnp.float32))

    out_specs = [pl.BlockSpec((1, 2, R + 2 * P, 128), bd,
                              memory_space=pltpu.VMEM)] * no
    out_shape = [jax.ShapeDtypeStruct((B, 2 * D1, R + 2 * P, 128),
                                      dtype) for _ in range(no)]
    st_spec, st_shape = _ps_out(
        no, B if want_stats == "per_sample" else None)
    out_specs += [st_spec, st_spec]
    out_shape += [st_shape, st_shape]
    res = pl.pallas_call(
        kernel,
        grid=(B, D1),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands)
    ys, (s, q) = res[:no], res[no:]
    if want_stats == "per_sample":
        s, q = s.transpose(1, 0, 2), q.transpose(1, 0, 2)
    stats = (s, q) if want_stats else None
    return tuple(ys), stats


def _upconv64_fwd(dec, w, b, H, W, want_stats):
    out = upconv222_bn_flat64(dec, w, b, H, W, want_stats)
    ys, _ = out
    return out, (dec, w, ys)


def _upconv64_bwd(H, W, want_stats, res, cts):
    dec, w, ys = res
    dys_in, dstats = cts
    B, D1, H1, W1, cin = dec.shape
    nk, no = cin // 128, w.shape[4] // CC64
    G, R, P = flat_geometry64(H, W)
    dtype = dec.dtype
    Ms = pack_upconv_weights64(jax.lax.optimization_barrier(w))
    dys = [(jnp.zeros((B, 2 * D1, R + 2 * P, 128), dtype)
            if dy_in is None else dy_in.astype(dtype))
           for dy_in in dys_in]
    ds, dq = (dstats if (want_stats and dstats is not None)
              else (None, None))
    st_shape = ((no, B, 128) if want_stats == "per_sample"
                else (no, 128))
    ds = jnp.zeros(st_shape, jnp.float32) if ds is None else ds
    dq = jnp.zeros(st_shape, jnp.float32) if dq is None else dq

    kernel = functools.partial(_upconv64_bwd_kernel, nk=nk, no=no, G=G,
                               R=R, P=P, H=H, W1=W1,
                               want_stats=want_stats, x_dtype=dtype)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    in_specs, operands = [], []
    for k in range(nk):
        in_specs.append(pl.BlockSpec((1, 1, H1 * W1, 128), bd,
                                     memory_space=pltpu.VMEM))
        operands.append(dec[..., k * 128:(k + 1) * 128]
                        .reshape(B, D1, H1 * W1, 128))
    for arrs in (dys, ys):
        for a in arrs:
            in_specs.append(pl.BlockSpec((1, 2, R + 2 * P, 128), bd,
                                         memory_space=pltpu.VMEM))
            operands.append(a)
    for az in range(2):
        for ah in range(2):
            for k in range(nk):
                for o in range(no):
                    in_specs.append(pl.BlockSpec(
                        (128, 128), c2, memory_space=pltpu.VMEM))
                    operands.append(Ms[az][ah][k][o].astype(dtype))
    in_specs.append(pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM))
    operands.append(width_mask64(W).astype(jnp.float32))
    for v in (ds, dq):
        op, spec = _ps_in(v)
        in_specs.append(spec)
        operands.append(op)

    out_specs = [pl.BlockSpec((1, 1, H1 * W1, 128), bd,
                              memory_space=pltpu.VMEM)] * nk
    out_shape = [jax.ShapeDtypeStruct((B, D1, H1 * W1, 128), dtype)
                 for _ in range(nk)]
    for _ in range(4 * nk * no):
        out_specs.append(pl.BlockSpec((128, 128), c2,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((128, 128), jnp.float32))
    out_specs.append(pl.BlockSpec((no, 128), c2,
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((no, 128), jnp.float32))

    res_ = pl.pallas_call(
        kernel,
        grid=(B, D1),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands)
    dd = jnp.concatenate(
        [r.reshape(B, D1, H1, W1, 128) for r in res_[:nk]], axis=-1)
    # barrier: scatter-fusion miscompile guard (see conv3_bnact_flat64)
    dM = jax.lax.optimization_barrier(tuple(res_[nk:nk + 4 * nk * no]))
    dbl = res_[nk + 4 * nk * no]
    # Adjoint of pack_upconv_weights64.
    dw = jnp.zeros((2, 2, 2, 128 * nk, CC64 * no), jnp.float32)
    i = 0
    for az in range(2):
        for ah in range(2):
            for k in range(nk):
                for o in range(no):
                    m = dM[i]; i += 1
                    dw = dw.at[1 - az, 1 - ah, 1,
                               k * 128:(k + 1) * 128,
                               o * CC64:(o + 1) * CC64].add(
                        m[:, 0:CC64])
                    dw = dw.at[1 - az, 1 - ah, 0,
                               k * 128:(k + 1) * 128,
                               o * CC64:(o + 1) * CC64].add(
                        m[:, CC64:128])
    dbc = fold_lane_stats64(dbl)
    return dd, dw.astype(w.dtype), dbc.astype(w.dtype)


upconv222_bn_flat64.defvjp(_upconv64_fwd, _upconv64_bwd)


# ---------------------------------------------------------------------------
# Planar (1,2,2) stride-2 transposed conv: deeper-level dense 5D
# (cin = 128) -> one flat64 chunk (cout = 64) + stats side outputs.
# The planar-level / 2D-model decoder analog of upconv222_bn_flat64.
# ---------------------------------------------------------------------------

def pack_upconv122_weights64(w: jnp.ndarray):
    """(1, 2, 2, cin, cout) flax ConvTranspose kernel -> M[ah][k][o],
    each (128, 128): M[ah][k][o][ci, p*64 + co] =
    w[0, 1-ah, 1-p, k*128 + ci, o*64 + co]. cin in {128, 256}, cout in
    {64, 128} (see pack_upconv_weights64)."""
    assert w.shape[:3] == (1, 2, 2) and w.shape[3] % 128 == 0 \
        and w.shape[4] % CC64 == 0, w.shape
    nk, no = w.shape[3] // 128, w.shape[4] // CC64
    Ms = []
    for ah in range(2):
        kos = []
        for k in range(nk):
            os_ = []
            for o in range(no):
                blk = w[0, 1 - ah, :, k * 128:(k + 1) * 128,
                        o * CC64:(o + 1) * CC64]
                os_.append(jnp.concatenate([blk[1], blk[0]], axis=-1))
            kos.append(os_)
        Ms.append(kos)
    return Ms


def _upconv122_64_fwd_kernel(*refs, nk: int, no: int, G: int, R: int,
                             P: int, H: int, W1: int, out_dtype,
                             want_stats: bool):
    # refs: nk dec chunks, 2*nk*no mats (ah, k, o order), mask, bias,
    # no out chunks (+ s, q).
    dec_refs = refs[:nk]
    mats = refs[nk:nk + 2 * nk * no]
    mask_ref, bias_ref = refs[nk + 2 * nk * no:nk + 2 * nk * no + 2]
    outs = refs[nk + 2 * nk * no + 2:nk + 2 * nk * no + 2 + no]
    if want_stats:
        s_ref, q_ref = refs[nk + 2 * nk * no + 2 + no:]
        # 'per_sample' (group/instance norm): b-indexed stat blocks
        # reset at each b's first grid step.
        first = (pl.program_id(1) == 0 if want_stats == "per_sample"
                 else jnp.logical_and(pl.program_id(0) == 0,
                                      pl.program_id(1) == 0))

        @pl.when(first)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)
            q_ref[...] = jnp.zeros_like(q_ref)

    H1 = H // 2
    Ss = [dec_refs[k][0, 0, :, :] for k in range(nk)]  # (H1*W1, 128)
    dims = (((1,), (0,)), ((), ()))

    def mat(ah, k, o):
        return mats[(ah * nk + k) * no + o]

    for o in range(no):
        Ys = []
        for ah in range(2):
            Y = jnp.zeros((H1 * W1, 128), jnp.float32)
            for k in range(nk):
                Y = Y + _dot(Ss[k], mat(ah, k, o)[...],
                             dimension_numbers=dims,
                             preferred_element_type=jnp.float32)
            Ys.append(Y.reshape(H1, W1, 128))
        I = jnp.concatenate([Ys[0][:, None], Ys[1][:, None]],
                            axis=1).reshape(H, W1, 128)
        zl = jnp.zeros((H, 1, 128), jnp.float32)
        zr = jnp.zeros((H, G - W1 - 1, 128), jnp.float32)
        rows = jnp.concatenate([zl, I, zr], axis=1)
        y = rows + bias_ref[o][None, None, :]
        y = (y * mask_ref[...][None]).reshape(R, 128)
        yc = y.astype(out_dtype)
        outs[o][0, 0, 0:P] = jnp.zeros((P, 128), out_dtype)
        outs[o][0, 0, pl.ds(P, R)] = yc
        outs[o][0, 0, P + R:2 * P + R] = jnp.zeros((P, 128), out_dtype)
        if want_stats:
            yf = yc.astype(jnp.float32)
            s_ref[o, :] += jnp.sum(yf, axis=0)
            q_ref[o, :] += jnp.sum(yf * yf, axis=0)


def _upconv122_64_bwd_kernel(*refs, nk: int, no: int, G: int, R: int,
                             P: int, H: int, W1: int,
                             want_stats: bool, x_dtype):
    # refs: nk dec chunks, no dy, no y, 2*nk*no mats, mask, ds, dq;
    # outs: nk ddec, 2*nk*no dM, db.
    dec_refs = refs[:nk]
    dy_refs = refs[nk:nk + no]
    y_refs = refs[nk + no:nk + 2 * no]
    pos = nk + 2 * no
    mats = refs[pos:pos + 2 * nk * no]
    pos += 2 * nk * no
    mask_ref, ds_ref, dq_ref = refs[pos:pos + 3]
    pos += 3
    ddecs = refs[pos:pos + nk]
    dmats = refs[pos + nk:pos + nk + 2 * nk * no]
    db = refs[pos + nk + 2 * nk * no]

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        for dm in dmats:
            dm[...] = jnp.zeros_like(dm)
        db[...] = jnp.zeros_like(db)

    H1 = H // 2
    Ss = [dec_refs[k][0, 0, :, :] for k in range(nk)]
    dimsT = (((1,), (1,)), ((), ()))
    cdims = (((0,), (0,)), ((), ()))

    def mslot(ah, k, o):
        return (ah * nk + k) * no + o

    dds = [jnp.zeros((H1 * W1, 128), jnp.float32) for _ in range(nk)]
    for o in range(no):
        dy = dy_refs[o][0, 0, pl.ds(P, R), :].astype(jnp.float32)
        if want_stats:
            y = y_refs[o][0, 0, pl.ds(P, R), :].astype(jnp.float32)
            dy = dy + ds_ref[o][None, :] + 2.0 * y * dq_ref[o][None, :]
        dyt = (dy.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128)
        db[o, :] += jnp.sum(dyt, axis=0)
        d3 = dyt.reshape(H1, 2 * G, 128)
        for ah in range(2):
            blk = d3[:, ah * G:(ah + 1) * G, :][:, 1:1 + W1, :]
            Yg = blk.reshape(H1 * W1, 128).astype(Ss[0].dtype)
            for k in range(nk):
                dds[k] = dds[k] + _dot(
                    Yg, mats[mslot(ah, k, o)][...],
                    dimension_numbers=dimsT,
                    preferred_element_type=jnp.float32)
                dmats[mslot(ah, k, o)][...] += _dot(
                    Ss[k], Yg, dimension_numbers=cdims,
                    preferred_element_type=jnp.float32)
    for k in range(nk):
        ddecs[k][0, 0, :, :] = dds[k].astype(x_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def upconv122_bn_flat64(dec, w, b, H: int, W: int, want_stats: bool):
    """(1,2,2)-stride-2 transposed conv (flax ConvTranspose semantics)
    from dec (B, D, H/2, W/2, cin) into cout//64 flat64 chunks at
    (H, W) (+ optional per-lane stats). Planar-level variant of
    upconv222_bn_flat64 (cin in {128, 256}, cout in {64, 128});
    reference models/unet.py:328-409."""
    B, D, H1, W1, cin = dec.shape
    assert cin % 128 == 0 and H1 * 2 == H and W1 * 2 == W, dec.shape
    nk, no = cin // 128, w.shape[4] // CC64
    G, R, P = flat_geometry64(H, W)
    dtype = dec.dtype
    Ms = pack_upconv122_weights64(jax.lax.optimization_barrier(w))
    bias_l = _lane_bias64(b)

    kernel = functools.partial(_upconv122_64_fwd_kernel, nk=nk, no=no,
                               G=G, R=R, P=P, H=H, W1=W1,
                               out_dtype=dtype, want_stats=want_stats)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    in_specs, operands = [], []
    for k in range(nk):
        in_specs.append(pl.BlockSpec((1, 1, H1 * W1, 128), bd,
                                     memory_space=pltpu.VMEM))
        operands.append(dec[..., k * 128:(k + 1) * 128]
                        .reshape(B, D, H1 * W1, 128))
    for ah in range(2):
        for k in range(nk):
            for o in range(no):
                in_specs.append(pl.BlockSpec((128, 128), c2,
                                             memory_space=pltpu.VMEM))
                operands.append(Ms[ah][k][o].astype(dtype))
    in_specs.append(pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM))
    operands.append(width_mask64(W).astype(jnp.float32))
    in_specs.append(pl.BlockSpec((no, 128), c2,
                                 memory_space=pltpu.VMEM))
    operands.append(bias_l.astype(jnp.float32))

    out_specs = [pl.BlockSpec((1, 1, R + 2 * P, 128), bd,
                              memory_space=pltpu.VMEM)] * no
    out_shape = [jax.ShapeDtypeStruct((B, D, R + 2 * P, 128), dtype)
                 for _ in range(no)]
    st_spec, st_shape = _ps_out(
        no, B if want_stats == "per_sample" else None)
    out_specs += [st_spec, st_spec]
    out_shape += [st_shape, st_shape]
    res = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands)
    ys, (s, q) = res[:no], res[no:]
    if want_stats == "per_sample":
        s, q = s.transpose(1, 0, 2), q.transpose(1, 0, 2)
    stats = (s, q) if want_stats else None
    return tuple(ys), stats


def _upconv122_64_fwd(dec, w, b, H, W, want_stats):
    out = upconv122_bn_flat64(dec, w, b, H, W, want_stats)
    ys, _ = out
    return out, (dec, w, ys)


def _upconv122_64_bwd(H, W, want_stats, res, cts):
    dec, w, ys = res
    dys_in, dstats = cts
    B, D, H1, W1, cin = dec.shape
    nk, no = cin // 128, w.shape[4] // CC64
    G, R, P = flat_geometry64(H, W)
    dtype = dec.dtype
    Ms = pack_upconv122_weights64(jax.lax.optimization_barrier(w))
    dys = [(jnp.zeros((B, D, R + 2 * P, 128), dtype) if dy_in is None
            else dy_in.astype(dtype)) for dy_in in dys_in]
    ds, dq = (dstats if (want_stats and dstats is not None)
              else (None, None))
    st_shape = ((no, B, 128) if want_stats == "per_sample"
                else (no, 128))
    ds = jnp.zeros(st_shape, jnp.float32) if ds is None else ds
    dq = jnp.zeros(st_shape, jnp.float32) if dq is None else dq

    kernel = functools.partial(_upconv122_64_bwd_kernel, nk=nk, no=no,
                               G=G, R=R, P=P, H=H, W1=W1,
                               want_stats=want_stats, x_dtype=dtype)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    in_specs, operands = [], []
    for k in range(nk):
        in_specs.append(pl.BlockSpec((1, 1, H1 * W1, 128), bd,
                                     memory_space=pltpu.VMEM))
        operands.append(dec[..., k * 128:(k + 1) * 128]
                        .reshape(B, D, H1 * W1, 128))
    for arrs in (dys, ys):
        for a in arrs:
            in_specs.append(pl.BlockSpec((1, 1, R + 2 * P, 128), bd,
                                         memory_space=pltpu.VMEM))
            operands.append(a)
    for ah in range(2):
        for k in range(nk):
            for o in range(no):
                in_specs.append(pl.BlockSpec((128, 128), c2,
                                             memory_space=pltpu.VMEM))
                operands.append(Ms[ah][k][o].astype(dtype))
    in_specs.append(pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM))
    operands.append(width_mask64(W).astype(jnp.float32))
    for v in (ds, dq):
        op, spec = _ps_in(v)
        in_specs.append(spec)
        operands.append(op)

    out_specs = [pl.BlockSpec((1, 1, H1 * W1, 128), bd,
                              memory_space=pltpu.VMEM)] * nk
    out_shape = [jax.ShapeDtypeStruct((B, D, H1 * W1, 128), dtype)
                 for _ in range(nk)]
    for _ in range(2 * nk * no):
        out_specs.append(pl.BlockSpec((128, 128), c2,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((128, 128), jnp.float32))
    out_specs.append(pl.BlockSpec((no, 128), c2,
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((no, 128), jnp.float32))

    res_ = pl.pallas_call(
        kernel,
        grid=(B, D),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands)
    dd = jnp.concatenate(
        [r.reshape(B, D, H1, W1, 128) for r in res_[:nk]], axis=-1)
    # barrier: scatter-fusion miscompile guard (see conv3_bnact_flat64)
    dM = jax.lax.optimization_barrier(tuple(res_[nk:nk + 2 * nk * no]))
    dbl = res_[nk + 2 * nk * no]
    dw = jnp.zeros((1, 2, 2, 128 * nk, CC64 * no), jnp.float32)
    i = 0
    for ah in range(2):
        for k in range(nk):
            for o in range(no):
                m = dM[i]; i += 1
                dw = dw.at[0, 1 - ah, 1, k * 128:(k + 1) * 128,
                           o * CC64:(o + 1) * CC64].add(m[:, 0:CC64])
                dw = dw.at[0, 1 - ah, 0, k * 128:(k + 1) * 128,
                           o * CC64:(o + 1) * CC64].add(m[:, CC64:128])
    dbc = fold_lane_stats64(dbl)
    return dd, dw.astype(w.dtype), dbc.astype(w.dtype)


upconv122_bn_flat64.defvjp(_upconv122_64_fwd, _upconv122_64_bwd)


# ---------------------------------------------------------------------------
# Pytree carriers + XLA seams
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class PoolCompact32:
    """A pooled level's input held in the L0 pool kernel's compact
    form (see flat_fused.pool_bnact_flat out_form='compact32'), with
    the pooled level's (H, W) as static metadata. Consumed by
    conv3_bnact_flat64 with forms=('pool32',)."""

    def __init__(self, chunks, H: int, W: int):
        self.chunks = tuple(chunks)
        self.H = int(H)
        self.W = int(W)

    def tree_flatten(self):
        return (self.chunks,), (self.H, self.W)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (chunks,) = children
        return cls(chunks, aux[0], aux[1])


@jax.tree_util.register_pytree_node_class
class FlatActs64:
    """A C=64 level's activations in fused-flat form (raw conv output
    chunks + consumer prologue vectors)."""

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


def materialize_flat_acts64(chunks, inv, shift, H: int, W: int,
                            C: int, act: str):
    """XLA seam: apply prologue + act, convert to dense channels-last."""
    G, R, P = flat_geometry64(H, W)
    rowmask = jnp.pad(jnp.tile(width_mask64(W), (H, 1)), ((P, P), (0, 0)))
    outs = []
    for i, xc in enumerate(chunks):
        pre = xc.astype(jnp.float32) * _bc_prologue(inv[i]) \
            + _bc_prologue(shift[i])
        outs.append((_act_fwd(pre, act) * rowmask[None, None]
                     ).astype(xc.dtype))
    return from_flat64(outs, H, W, C)


# ---------------------------------------------------------------------------
# (1,2,2)-stride-2 transposed conv (64 -> 32, the L0 decoder upconv)
# consuming a flat64 chunk DIRECTLY (prologue + valid-row slice in
# kernel) instead of a materialized dense 5D tensor. Output follows
# flat_fused.upconv_bn_flat's convention: one CC=32 padded flat chunk
# at (H, W) = (2*H1, 2*W1) plus optional stats. Removes the
# materialize_flat_acts64 XLA seam between a fused64 decoder level and
# the fused planar level above it. Reference models/unet.py:328-409.
# ---------------------------------------------------------------------------

def _upconv_dblk(D: int, cap: int, rows: int, row_budget: int) -> int:
    """D-slabs per grid step for the upconv kernels: the MFU ledger
    measured the (1,2,2) upconv at 7-11%% of its packing ceiling with
    per-grid-step DMA/dispatch overhead dominating its small math, so
    slabs are batched — largest divisor of D within ``cap`` whose
    combined output rows (nd * rows) stay within ``row_budget``, which
    bounds the VMEM block footprint (2D H-tiled slabs are much taller
    than 3D headline slabs and must not regain the whole-image
    working set the tiling removed). E3TPU_UPCONV_DBLK=1 reverts to
    per-slab grid steps."""
    env = _os.environ.get("E3TPU_UPCONV_DBLK")
    if env is not None:
        cap = max(1, int(env))
    cap = min(cap, max(1, row_budget // max(rows, 1)))
    for nd in range(min(cap, D), 0, -1):
        if D % nd == 0:
            return nd
    return 1


def _upconv122_f64_load(chunk_ref, inv_ref, shift_ref, *, G1, R1, P1,
                        H1, W1, act, nd):
    """nd chunk slabs -> (a' (nd*H1*WRd, 128), pre, x)."""
    x = chunk_ref[0, :, P1:P1 + R1, :].astype(jnp.float32)  # (nd,R1,128)
    pre = x * inv_ref[0][None, None, :] + shift_ref[0][None, None, :]
    a = _act_fwd(pre, act).reshape(nd * H1, G1, 128)[
        :, 1:1 + W1 // JG64, :]
    return a.reshape(nd * H1 * (W1 // JG64), 128), pre, x


def _upconv122_f64_y(chunk_ref, inv_ref, shift_ref, m0_ref, m1_ref,
                     mask_ref, bias_ref, *, G, R, P, H, G1, R1, P1, H1,
                     W1, WRd, out_dtype, act, nd):
    """Compute the (1,2,2) upconv output slab from the carry chunk:
    (yc (nd, R, 128) out_dtype, Sc, pre, x), with yc bitwise equal to
    the rows the materializing kernel stores (same op order). Shared
    by the materializing forward, the stats-only pass, and the
    stats-cotangent backward / vup recompute paths."""
    S, pre, x = _upconv122_f64_load(chunk_ref, inv_ref, shift_ref, G1=G1,
                                    R1=R1, P1=P1, H1=H1, W1=W1, act=act,
                                    nd=nd)
    Sc = S.astype(out_dtype)
    dims = (((1,), (0,)), ((), ()))
    outE = _dot(Sc, m0_ref[...], dimension_numbers=dims,
                                preferred_element_type=jnp.float32)
    outO = _dot(Sc, m1_ref[...], dimension_numbers=dims,
                                preferred_element_type=jnp.float32)
    z1 = jnp.zeros((nd * H1, 1, 128), jnp.float32)
    z2 = jnp.zeros((nd * H1, G - WRd - 1, 128), jnp.float32)
    rows = jnp.concatenate(
        [z1, outE.reshape(nd * H1, WRd, 128), z2,
         z1, outO.reshape(nd * H1, WRd, 128), z2], axis=1)
    y = rows.reshape(nd, H, G, 128) + bias_ref[0][None, None, None, :]
    y = (y * mask_ref[...][None, None]).reshape(nd, R, 128)
    return y.astype(out_dtype), Sc, pre, x


def _upconv122_f64_fwd_kernel(chunk_ref, inv_ref, shift_ref, m0_ref,
                              m1_ref, mask_ref, bias_ref, out_ref,
                              s_ref, q_ref, *, G: int, R: int, P: int,
                              H: int, G1: int, R1: int, P1: int,
                              H1: int, W1: int, WRd: int, out_dtype,
                              act: str, want_stats: bool, nd: int):
    if want_stats:
        # 'per_sample': b-indexed stat blocks reset at each b's first
        # grid step (group/instance norm).
        first = (pl.program_id(1) == 0 if want_stats == "per_sample"
                 else jnp.logical_and(pl.program_id(0) == 0,
                                      pl.program_id(1) == 0))

        @pl.when(first)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)
            q_ref[...] = jnp.zeros_like(q_ref)

    yc, _, _, _ = _upconv122_f64_y(
        chunk_ref, inv_ref, shift_ref, m0_ref, m1_ref, mask_ref,
        bias_ref, G=G, R=R, P=P, H=H, G1=G1, R1=R1, P1=P1, H1=H1,
        W1=W1, WRd=WRd, out_dtype=out_dtype, act=act, nd=nd)
    out_ref[0, :, 0:P] = jnp.zeros((nd, P, 128), out_dtype)
    out_ref[0, :, P:P + R] = yc
    out_ref[0, :, P + R:2 * P + R] = jnp.zeros((nd, P, 128), out_dtype)
    if want_stats:
        yf = yc.astype(jnp.float32)
        s_ref[0, :] += jnp.sum(yf, axis=(0, 1))
        q_ref[0, :] += jnp.sum(yf * yf, axis=(0, 1))


def _upconv122_f64_bwd_kernel(chunk_ref, dy_ref, y_ref, inv_ref,
                              shift_ref, m0_ref, m1_ref, mask_ref,
                              ds_ref, dq_ref, dchunk, dM0, dM1, db,
                              dinv_ref, dshift_ref, *, G: int, R: int,
                              P: int, H: int, G1: int, R1: int,
                              P1: int, H1: int, W1: int, WRd: int,
                              want_stats: bool, x_dtype, act: str,
                              nd: int, per_sample: bool = False):
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    # per_sample: dinv/dshift blocks are b-indexed — reset at each b's
    # first grid step; the weight/bias accumulators stay global.
    first_b = pl.program_id(1) == 0 if per_sample else first

    @pl.when(first)
    def _():
        dM0[...] = jnp.zeros_like(dM0)
        dM1[...] = jnp.zeros_like(dM1)
        db[...] = jnp.zeros_like(db)

    @pl.when(first_b)
    def _():
        dinv_ref[...] = jnp.zeros_like(dinv_ref)
        dshift_ref[...] = jnp.zeros_like(dshift_ref)

    S, pre, x = _upconv122_f64_load(chunk_ref, inv_ref, shift_ref,
                                    G1=G1, R1=R1, P1=P1, H1=H1, W1=W1,
                                    act=act, nd=nd)
    Sc = S.astype(x_dtype)
    dy = dy_ref[0, :, P:P + R, :].astype(jnp.float32)     # (nd, R, 128)
    if want_stats:
        y = y_ref[0, :, P:P + R, :].astype(jnp.float32)
        dy = dy + ds_ref[0][None, None, :] \
            + 2.0 * y * dq_ref[0][None, None, :]
    dyt = (dy.reshape(nd, H, G, 128) * mask_ref[...][None, None]
           ).reshape(nd, R, 128)
    db[0, :] += jnp.sum(dyt, axis=(0, 1))
    d3 = dyt.reshape(nd * H1, 2 * G, 128)
    E = d3[:, 1:1 + WRd, :].reshape(nd * H1 * WRd, 128).astype(x_dtype)
    O = d3[:, G + 1:G + 1 + WRd, :].reshape(
        nd * H1 * WRd, 128).astype(x_dtype)
    dimsT = (((1,), (1,)), ((), ()))
    cdims = (((0,), (0,)), ((), ()))
    dS = _dot(E, m0_ref[...], dimension_numbers=dimsT,
                             preferred_element_type=jnp.float32) \
        + _dot(O, m1_ref[...], dimension_numbers=dimsT,
                              preferred_element_type=jnp.float32)
    dM0[...] += _dot(Sc, E, dimension_numbers=cdims,
                                    preferred_element_type=jnp.float32)
    dM1[...] += _dot(Sc, O, dimension_numbers=cdims,
                                    preferred_element_type=jnp.float32)
    # prologue backward: embed dS into the chunk's group layout
    z1 = jnp.zeros((nd * H1, 1, 128), jnp.float32)
    z2 = jnp.zeros((nd * H1, G1 - W1 // JG64 - 1, 128), jnp.float32)
    demb = jnp.concatenate(
        [z1, dS.reshape(nd * H1, W1 // JG64, 128), z2],
        axis=1).reshape(nd, R1, 128)
    dpre = demb * _act_deriv(pre, act)
    dinv_ref[0, :] += jnp.sum(dpre * x, axis=(0, 1))
    dshift_ref[0, :] += jnp.sum(dpre, axis=(0, 1))
    dx = dpre * inv_ref[0][None, None, :]
    dchunk[0, :, 0:P1] = jnp.zeros((nd, P1, 128), x_dtype)
    dchunk[0, :, P1:P1 + R1] = dx.astype(x_dtype)
    dchunk[0, :, P1 + R1:2 * P1 + R1] = jnp.zeros((nd, P1, 128), x_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def upconv122_from_flat64(chunk, inv, shift, w, b, H: int, W: int,
                          want_stats: bool, act: str):
    """(1,2,2)-stride-2 transposed conv (cin 64 -> cout 32) consuming
    ONE flat64 chunk (+ its BN prologue) and emitting one CC=32 padded
    flat chunk at (H, W) (flat_fused.upconv_bn_flat convention).

    Args:
        chunk: (B, D, R1 + 2*P1, 128) flat64 chunk at (H/2, W/2).
        inv, shift: (1, 128) prologue lane vectors.
        w: (1, 2, 2, 64, 32) flax ConvTranspose kernel; b: (32,).
    """
    from elektronn3_tpu.ops.flat_fused import (
        pack_upconv_weights, flat_geometry, width_mask)
    assert want_stats in (False, True, "per_sample"), want_stats
    H1, W1 = H // 2, W // 2
    assert W1 % 2 == 0, W1
    G, R, P = flat_geometry(H, W)
    G1, R1, P1 = flat_geometry64(H1, W1)
    WRd = W1 * CC64 // 128
    B, D = chunk.shape[0], chunk.shape[1]
    dtype = chunk.dtype
    M0, M1 = pack_upconv_weights(
        jax.lax.optimization_barrier(w))
    bias_l = jnp.tile(b.reshape(-1, 32), (1, 4))

    nd = _upconv_dblk(D, 4, R + 2 * P, 9216)
    kernel = functools.partial(
        _upconv122_f64_fwd_kernel, G=G, R=R, P=P, H=H, G1=G1, R1=R1,
        P1=P1, H1=H1, W1=W1, WRd=WRd, out_dtype=dtype, act=act,
        want_stats=want_stats, nd=nd)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    inv_op, inv_spec = _ps_in(inv.astype(jnp.float32))
    shift_op, shift_spec = _ps_in(shift.astype(jnp.float32))
    in_specs = [
        pl.BlockSpec((1, nd, R1 + 2 * P1, 128), bd,
                     memory_space=pltpu.VMEM),
        inv_spec,
        shift_spec,
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), c2, memory_space=pltpu.VMEM),
    ]
    operands = [chunk, inv_op, shift_op, M0.astype(dtype),
                M1.astype(dtype), width_mask(W).astype(jnp.float32),
                bias_l.astype(jnp.float32)]
    st_spec, st_shape = _ps_out(
        1, B if want_stats == "per_sample" else None)
    out_specs = [pl.BlockSpec((1, nd, R + 2 * P, 128), bd,
                              memory_space=pltpu.VMEM),
                 st_spec, st_spec]
    out_shape = [jax.ShapeDtypeStruct((B, D, R + 2 * P, 128), dtype),
                 st_shape, st_shape]
    y, sst, qst = pl.pallas_call(
        kernel,
        grid=(B, D // nd),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands)
    if want_stats == "per_sample":
        sst, qst = sst.transpose(1, 0, 2), qst.transpose(1, 0, 2)
    stats = (sst, qst) if want_stats else None
    return (y,), stats


def _upconv122_f64_fwd(chunk, inv, shift, w, b, H, W, want_stats, act):
    out = upconv122_from_flat64(chunk, inv, shift, w, b, H, W,
                                want_stats, act)
    (y,), _ = out
    return out, (chunk, inv, shift, w, y)


def _upconv122_f64_bwd(H, W, want_stats, act, res, cts):
    from elektronn3_tpu.ops.flat_fused import (
        pack_upconv_weights, flat_geometry, width_mask)
    chunk, inv, shift, w, y = res
    (dy_in,), dstats = cts
    H1, W1 = H // 2, W // 2
    G, R, P = flat_geometry(H, W)
    G1, R1, P1 = flat_geometry64(H1, W1)
    WRd = W1 * CC64 // 128
    B, D = chunk.shape[0], chunk.shape[1]
    dtype = chunk.dtype
    M0, M1 = pack_upconv_weights(
        jax.lax.optimization_barrier(w))
    dy = (jnp.zeros((B, D, R + 2 * P, 128), dtype) if dy_in is None
          else dy_in.astype(dtype))
    per_sample = inv.ndim == 3
    ds, dq = (dstats if (want_stats and dstats is not None)
              else (None, None))
    st_shape = ((1, B, 128) if want_stats == "per_sample"
                else (1, 128))
    ds = jnp.zeros(st_shape, jnp.float32) if ds is None else ds
    dq = jnp.zeros(st_shape, jnp.float32) if dq is None else dq

    nd = _upconv_dblk(D, 2, R + 2 * P, 4608)
    kernel = functools.partial(
        _upconv122_f64_bwd_kernel, G=G, R=R, P=P, H=H, G1=G1, R1=R1,
        P1=P1, H1=H1, W1=W1, WRd=WRd, want_stats=want_stats,
        x_dtype=dtype, act=act, nd=nd, per_sample=per_sample)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    inv_op, inv_spec = _ps_in(inv.astype(jnp.float32))
    shift_op, shift_spec = _ps_in(shift.astype(jnp.float32))
    ds_op, ds_spec = _ps_in(ds)
    dq_op, dq_spec = _ps_in(dq)
    in_specs = [
        pl.BlockSpec((1, nd, R1 + 2 * P1, 128), bd,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nd, R + 2 * P, 128), bd,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nd, R + 2 * P, 128), bd,
                     memory_space=pltpu.VMEM),
        inv_spec,
        shift_spec,
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM),
        ds_spec,
        dq_spec,
    ]
    operands = [chunk, dy, y, inv_op, shift_op, M0.astype(dtype),
                M1.astype(dtype), width_mask(W).astype(jnp.float32),
                ds_op, dq_op]
    pro_spec, pro_shape = _ps_out(1, B if per_sample else None)
    out_specs = [
        pl.BlockSpec((1, nd, R1 + 2 * P1, 128), bd,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), c2, memory_space=pltpu.VMEM),
        pro_spec,
        pro_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, D, R1 + 2 * P1, 128), dtype),
        jax.ShapeDtypeStruct((128, 128), jnp.float32),
        jax.ShapeDtypeStruct((128, 128), jnp.float32),
        jax.ShapeDtypeStruct((1, 128), jnp.float32),
        pro_shape,
        pro_shape,
    ]
    dchunk, dM0, dM1, dbl, dinv, dshift = pl.pallas_call(
        kernel,
        grid=(B, D // nd),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands)
    # barrier: scatter-fusion miscompile guard (see conv3_bnact_flat64)
    dM0, dM1 = jax.lax.optimization_barrier((dM0, dM1))
    # Adjoint of pack_upconv_weights (flat_fused convention).
    dw = jnp.zeros((1, 2, 2, 64, 32), jnp.float32)
    for a_, dM in ((0, dM0), (1, dM1)):
        for j in range(4):
            m_, p_ = j // 2, j % 2
            dw = dw.at[0, 1 - a_, 1 - p_].add(
                dM[m_ * 64:(m_ + 1) * 64, j * 32:(j + 1) * 32])
    dbc = jnp.sum(dbl.reshape(4, 32), axis=0)
    if per_sample:
        # restore the canonical (1, B, 128) prologue-grad layout
        dinv = dinv.transpose(1, 0, 2)
        dshift = dshift.transpose(1, 0, 2)
    return (dchunk, dinv, dshift, dw.astype(w.dtype),
            dbc.astype(w.dtype))


upconv122_from_flat64.defvjp(_upconv122_f64_fwd, _upconv122_f64_bwd)


# ---------------------------------------------------------------------------
# Stats-only (1,2,2) upconv pass: the vup fast path (see
# flat_fused.conv_bnact_flat_vup) computes the upconv output chunk
# INSIDE the CC=32 merge conv's prologue, so the materialized chunk —
# 2x the carry bytes, written and immediately re-read across the
# L1->L0 executor seam — never exists in HBM. Its batch statistics are
# still needed BEFORE the merge conv runs (they feed the prologue), so
# this op computes exactly the stats the materializing kernel would
# have emitted (of the bf16-rounded rows, via the shared
# _upconv122_f64_y recompute) while writing only the (1, 128) stat
# vectors. Backward: the stats cotangent (ds, dq) is folded against
# the recomputed output in-kernel — one carry-sized pass, no
# full-resolution dy.
# ---------------------------------------------------------------------------

def _upconv122_stats_fwd_kernel(chunk_ref, inv_ref, shift_ref, m0_ref,
                                m1_ref, mask_ref, bias_ref, s_ref,
                                q_ref, *, G: int, R: int, P: int,
                                H: int, G1: int, R1: int, P1: int,
                                H1: int, W1: int, WRd: int, out_dtype,
                                act: str, want_stats, nd: int):
    first = (pl.program_id(1) == 0 if want_stats == "per_sample"
             else jnp.logical_and(pl.program_id(0) == 0,
                                  pl.program_id(1) == 0))

    @pl.when(first)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        q_ref[...] = jnp.zeros_like(q_ref)

    yc, _, _, _ = _upconv122_f64_y(
        chunk_ref, inv_ref, shift_ref, m0_ref, m1_ref, mask_ref,
        bias_ref, G=G, R=R, P=P, H=H, G1=G1, R1=R1, P1=P1, H1=H1,
        W1=W1, WRd=WRd, out_dtype=out_dtype, act=act, nd=nd)
    yf = yc.astype(jnp.float32)
    s_ref[0, :] += jnp.sum(yf, axis=(0, 1))
    q_ref[0, :] += jnp.sum(yf * yf, axis=(0, 1))


def _upconv122_stats_bwd_kernel(chunk_ref, inv_ref, shift_ref, m0_ref,
                                m1_ref, mask_ref, bias_ref, ds_ref,
                                dq_ref, dchunk, dM0, dM1, db, dinv_ref,
                                dshift_ref, *, G: int, R: int, P: int,
                                H: int, G1: int, R1: int, P1: int,
                                H1: int, W1: int, WRd: int,
                                x_dtype, act: str, nd: int,
                                per_sample: bool = False):
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    first_b = pl.program_id(1) == 0 if per_sample else first

    @pl.when(first)
    def _():
        dM0[...] = jnp.zeros_like(dM0)
        dM1[...] = jnp.zeros_like(dM1)
        db[...] = jnp.zeros_like(db)

    @pl.when(first_b)
    def _():
        dinv_ref[...] = jnp.zeros_like(dinv_ref)
        dshift_ref[...] = jnp.zeros_like(dshift_ref)

    yc, Sc, pre, x = _upconv122_f64_y(
        chunk_ref, inv_ref, shift_ref, m0_ref, m1_ref, mask_ref,
        bias_ref, G=G, R=R, P=P, H=H, G1=G1, R1=R1, P1=P1, H1=H1,
        W1=W1, WRd=WRd, out_dtype=x_dtype, act=act, nd=nd)
    y = yc.astype(jnp.float32)                          # (nd, R, 128)
    dy = ds_ref[0][None, None, :] + 2.0 * y * dq_ref[0][None, None, :]
    dyt = (dy.reshape(nd, H, G, 128) * mask_ref[...][None, None]
           ).reshape(nd, R, 128)
    db[0, :] += jnp.sum(dyt, axis=(0, 1))
    d3 = dyt.reshape(nd * H1, 2 * G, 128)
    E = d3[:, 1:1 + WRd, :].reshape(nd * H1 * WRd, 128).astype(x_dtype)
    O = d3[:, G + 1:G + 1 + WRd, :].reshape(
        nd * H1 * WRd, 128).astype(x_dtype)
    dimsT = (((1,), (1,)), ((), ()))
    cdims = (((0,), (0,)), ((), ()))
    dS = _dot(E, m0_ref[...], dimension_numbers=dimsT,
                             preferred_element_type=jnp.float32) \
        + _dot(O, m1_ref[...], dimension_numbers=dimsT,
                              preferred_element_type=jnp.float32)
    dM0[...] += _dot(Sc, E, dimension_numbers=cdims,
                                    preferred_element_type=jnp.float32)
    dM1[...] += _dot(Sc, O, dimension_numbers=cdims,
                                    preferred_element_type=jnp.float32)
    z1 = jnp.zeros((nd * H1, 1, 128), jnp.float32)
    z2 = jnp.zeros((nd * H1, G1 - W1 // JG64 - 1, 128), jnp.float32)
    demb = jnp.concatenate(
        [z1, dS.reshape(nd * H1, W1 // JG64, 128), z2],
        axis=1).reshape(nd, R1, 128)
    dpre = demb * _act_deriv(pre, act)
    dinv_ref[0, :] += jnp.sum(dpre * x, axis=(0, 1))
    dshift_ref[0, :] += jnp.sum(dpre, axis=(0, 1))
    dx = dpre * inv_ref[0][None, None, :]
    dchunk[0, :, 0:P1] = jnp.zeros((nd, P1, 128), x_dtype)
    dchunk[0, :, P1:P1 + R1] = dx.astype(x_dtype)
    dchunk[0, :, P1 + R1:2 * P1 + R1] = jnp.zeros((nd, P1, 128), x_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def upconv122_stats_from_flat64(chunk, inv, shift, w, b, H: int,
                                W: int, want_stats, act: str):
    """Batch statistics of the (1,2,2) upconv output WITHOUT
    materializing it — bitwise equal to the (sum, sumsq) the
    materializing upconv122_from_flat64 emits (stats of the rounded
    rows). Pairs with flat_fused.conv_bnact_flat_vup, which recomputes
    the rows inside the merge conv's prologue. Args as
    upconv122_from_flat64; returns only the stats pair."""
    from elektronn3_tpu.ops.flat_fused import (
        pack_upconv_weights, flat_geometry, width_mask)
    assert want_stats in (True, "per_sample"), want_stats
    H1, W1 = H // 2, W // 2
    assert W1 % 2 == 0, W1
    G, R, P = flat_geometry(H, W)
    G1, R1, P1 = flat_geometry64(H1, W1)
    WRd = W1 * CC64 // 128
    B, D = chunk.shape[0], chunk.shape[1]
    dtype = chunk.dtype
    M0, M1 = pack_upconv_weights(
        jax.lax.optimization_barrier(w))
    bias_l = jnp.tile(b.reshape(-1, 32), (1, 4))

    nd = _upconv_dblk(D, 4, R + 2 * P, 9216)
    kernel = functools.partial(
        _upconv122_stats_fwd_kernel, G=G, R=R, P=P, H=H, G1=G1, R1=R1,
        P1=P1, H1=H1, W1=W1, WRd=WRd, out_dtype=dtype, act=act,
        want_stats=want_stats, nd=nd)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    inv_op, inv_spec = _ps_in(inv.astype(jnp.float32))
    shift_op, shift_spec = _ps_in(shift.astype(jnp.float32))
    in_specs = [
        pl.BlockSpec((1, nd, R1 + 2 * P1, 128), bd,
                     memory_space=pltpu.VMEM),
        inv_spec,
        shift_spec,
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), c2, memory_space=pltpu.VMEM),
    ]
    operands = [chunk, inv_op, shift_op, M0.astype(dtype),
                M1.astype(dtype), width_mask(W).astype(jnp.float32),
                bias_l.astype(jnp.float32)]
    st_spec, st_shape = _ps_out(
        1, B if want_stats == "per_sample" else None)
    sst, qst = pl.pallas_call(
        kernel,
        grid=(B, D // nd),
        in_specs=tuple(in_specs),
        out_specs=(st_spec, st_spec),
        out_shape=(st_shape, st_shape),
        interpret=_interpret(),
    )(*operands)
    if want_stats == "per_sample":
        sst, qst = sst.transpose(1, 0, 2), qst.transpose(1, 0, 2)
    return (sst, qst)


def _upconv122_stats_fwd(chunk, inv, shift, w, b, H, W, want_stats,
                         act):
    out = upconv122_stats_from_flat64(chunk, inv, shift, w, b, H, W,
                                      want_stats, act)
    return out, (chunk, inv, shift, w, b)


def _upconv122_stats_bwd(H, W, want_stats, act, res, cts):
    from elektronn3_tpu.ops.flat_fused import (
        pack_upconv_weights, flat_geometry, width_mask)
    chunk, inv, shift, w, b = res
    ds, dq = cts
    H1, W1 = H // 2, W // 2
    G, R, P = flat_geometry(H, W)
    G1, R1, P1 = flat_geometry64(H1, W1)
    WRd = W1 * CC64 // 128
    B, D = chunk.shape[0], chunk.shape[1]
    dtype = chunk.dtype
    M0, M1 = pack_upconv_weights(
        jax.lax.optimization_barrier(w))
    bias_l = jnp.tile(b.reshape(-1, 32), (1, 4))
    per_sample = want_stats == "per_sample"
    st_shape = (1, B, 128) if per_sample else (1, 128)
    ds = jnp.zeros(st_shape, jnp.float32) if ds is None else ds
    dq = jnp.zeros(st_shape, jnp.float32) if dq is None else dq

    nd = _upconv_dblk(D, 2, R + 2 * P, 4608)
    kernel = functools.partial(
        _upconv122_stats_bwd_kernel, G=G, R=R, P=P, H=H, G1=G1, R1=R1,
        P1=P1, H1=H1, W1=W1, WRd=WRd, x_dtype=dtype, act=act, nd=nd,
        per_sample=per_sample)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    inv_op, inv_spec = _ps_in(inv.astype(jnp.float32))
    shift_op, shift_spec = _ps_in(shift.astype(jnp.float32))
    ds_op, ds_spec = _ps_in(ds)
    dq_op, dq_spec = _ps_in(dq)
    in_specs = [
        pl.BlockSpec((1, nd, R1 + 2 * P1, 128), bd,
                     memory_space=pltpu.VMEM),
        inv_spec,
        shift_spec,
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), c2, memory_space=pltpu.VMEM),
        ds_spec,
        dq_spec,
    ]
    operands = [chunk, inv_op, shift_op, M0.astype(dtype),
                M1.astype(dtype), width_mask(W).astype(jnp.float32),
                bias_l.astype(jnp.float32), ds_op, dq_op]
    pro_spec, pro_shape = _ps_out(1, B if per_sample else None)
    out_specs = [
        pl.BlockSpec((1, nd, R1 + 2 * P1, 128), bd,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), c2, memory_space=pltpu.VMEM),
        pro_spec,
        pro_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, D, R1 + 2 * P1, 128), dtype),
        jax.ShapeDtypeStruct((128, 128), jnp.float32),
        jax.ShapeDtypeStruct((128, 128), jnp.float32),
        jax.ShapeDtypeStruct((1, 128), jnp.float32),
        pro_shape,
        pro_shape,
    ]
    dchunk, dM0, dM1, dbl, dinv, dshift = pl.pallas_call(
        kernel,
        grid=(B, D // nd),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands)
    # barrier: scatter-fusion miscompile guard (see conv3_bnact_flat64)
    dM0, dM1 = jax.lax.optimization_barrier((dM0, dM1))
    dw = jnp.zeros((1, 2, 2, 64, 32), jnp.float32)
    for a_, dM in ((0, dM0), (1, dM1)):
        for j in range(4):
            m_, p_ = j // 2, j % 2
            dw = dw.at[0, 1 - a_, 1 - p_].add(
                dM[m_ * 64:(m_ + 1) * 64, j * 32:(j + 1) * 32])
    dbc = jnp.sum(dbl.reshape(4, 32), axis=0)
    if per_sample:
        dinv = dinv.transpose(1, 0, 2)
        dshift = dshift.transpose(1, 0, 2)
    return (dchunk, dinv, dshift, dw.astype(w.dtype),
            dbc.astype(w.dtype))


upconv122_stats_from_flat64.defvjp(_upconv122_stats_fwd,
                                   _upconv122_stats_bwd)

# ---------------------------------------------------------------------------
# Stride-2 transposed conv consuming FlatActs64 chunks and emitting
# flat64 chunks: the decoder upconv of a fused64 level whose deeper
# carry is ALSO a fused64 level (e.g. the C=128 -> C=64 chain of a
# start_filts=64 model). (2,2,2) for 3D levels (azs=2), (1,2,2) for
# planar levels / 2D models (azs=1). Removes the
# materialize_flat_acts64 XLA seam in fused64 -> fused64 decoder
# chains. Reference models/unet.py:328-409.
#
# Routing: an input row group g1 holds w1 = 2*g1 + j1 (lane j1), so
# out group g_out = 2*g1 + j1 - 1 and j_out = p — j1=0 lanes land in
# odd output groups, j1=1 lanes in even ones. Each (az, ah, k, o)
# therefore uses TWO half-packed 128x128 matmuls (A: j1=0 rows,
# B: j1=1 rows) whose results interleave along the group axis.
# ---------------------------------------------------------------------------

def pack_upconv_f64in_weights(w: jnp.ndarray, azs: int):
    """(kz, 2, 2, nk*64, no*64) flax ConvTranspose kernel ->
    Ms[az][ah][k][o] = (M_A, M_B), each (128, 128):
    M_A[ci, p*64 + co] = w[z, 1-ah, 1-p, k*64 + ci, o*64 + co] on rows
    0:64 (j1 = 0), zero elsewhere; M_B carries the same values on rows
    64:128 (j1 = 1). z = 1-az for azs == 2, else 0."""
    kz = w.shape[0]
    assert kz == (2 if azs == 2 else 1) and w.shape[1:3] == (2, 2) \
        and w.shape[3] % CC64 == 0 and w.shape[4] % CC64 == 0, w.shape
    nk, no = w.shape[3] // CC64, w.shape[4] // CC64
    zpad = jnp.zeros((CC64, 128), w.dtype)
    Ms = []
    for az in range(azs):
        z = (1 - az) if azs == 2 else 0
        row = []
        for ah in range(2):
            kos = []
            for k in range(nk):
                os_ = []
                for o in range(no):
                    blk = w[z, 1 - ah, :, k * CC64:(k + 1) * CC64,
                            o * CC64:(o + 1) * CC64]
                    m64 = jnp.concatenate([blk[1], blk[0]], axis=-1)
                    os_.append((jnp.concatenate([m64, zpad], axis=0),
                                jnp.concatenate([zpad, m64], axis=0)))
                kos.append(os_)
            row.append(kos)
        Ms.append(row)
    return Ms


def _upconv_f64in_fwd_kernel(*refs, nk: int, no: int, azs: int,
                             G: int, R: int, P: int, H: int, G1: int,
                             R1: int, P1: int, H1: int, W1: int,
                             out_dtype, act: str, want_stats: bool):
    # refs: nk chunks, inv, shift, azs*2*nk*no*2 mats, mask, bias,
    # then no out chunks (+ s, q).
    chunk_refs = refs[:nk]
    inv_ref, shift_ref = refs[nk:nk + 2]
    nmat = azs * 2 * nk * no * 2
    mats = refs[nk + 2:nk + 2 + nmat]
    mask_ref, bias_ref = refs[nk + 2 + nmat:nk + 2 + nmat + 2]
    outs = refs[nk + 2 + nmat + 2:nk + 2 + nmat + 2 + no]
    if want_stats:
        s_ref, q_ref = refs[nk + 2 + nmat + 2 + no:]
        # 'per_sample': b-indexed stat blocks reset at each b's first
        # grid step (group/instance norm).
        first = (pl.program_id(1) == 0 if want_stats == "per_sample"
                 else jnp.logical_and(pl.program_id(0) == 0,
                                      pl.program_id(1) == 0))

        @pl.when(first)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)
            q_ref[...] = jnp.zeros_like(q_ref)

    Wh = W1 // 2
    Ss = []
    for k in range(nk):
        x = chunk_refs[k][0, 0, pl.ds(P1, R1), :].astype(jnp.float32)
        pre = x * inv_ref[k][None, :] + shift_ref[k][None, :]
        a = _act_fwd(pre, act).reshape(H1, G1, 128)[:, 1:1 + Wh, :]
        Ss.append(a.reshape(H1 * Wh, 128).astype(out_dtype))

    def mat(az, ah, k, o, abi):
        return mats[(((az * 2 + ah) * nk + k) * no + o) * 2 + abi]

    dims = (((1,), (0,)), ((), ()))
    for az in range(azs):
        for o in range(no):
            rows_ah = []
            for ah in range(2):
                YA = jnp.zeros((H1 * Wh, 128), jnp.float32)
                YB = jnp.zeros((H1 * Wh, 128), jnp.float32)
                for k in range(nk):
                    YA = YA + _dot(Ss[k], mat(az, ah, k, o, 0)[...],
                                   dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)
                    YB = YB + _dot(Ss[k], mat(az, ah, k, o, 1)[...],
                                   dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)
                I = jnp.concatenate(
                    [YA.reshape(H1, Wh, 1, 128),
                     YB.reshape(H1, Wh, 1, 128)],
                    axis=2).reshape(H1, W1, 128)
                zl = jnp.zeros((H1, 1, 128), jnp.float32)
                zr = jnp.zeros((H1, G - W1 - 1, 128), jnp.float32)
                rows_ah.append(jnp.concatenate([zl, I, zr], axis=1))
            rowsH = jnp.concatenate(
                [rows_ah[0][:, None], rows_ah[1][:, None]],
                axis=1).reshape(H, G, 128)
            y = rowsH + bias_ref[o][None, None, :]
            y = (y * mask_ref[...][None]).reshape(R, 128)
            yc = y.astype(out_dtype)
            sl = az if azs == 2 else 0
            outs[o][0, sl, 0:P] = jnp.zeros((P, 128), out_dtype)
            outs[o][0, sl, pl.ds(P, R)] = yc
            outs[o][0, sl, P + R:2 * P + R] = jnp.zeros((P, 128),
                                                        out_dtype)
            if want_stats:
                yf = yc.astype(jnp.float32)
                s_ref[o, :] += jnp.sum(yf, axis=0)
                q_ref[o, :] += jnp.sum(yf * yf, axis=0)


def _upconv_f64in_bwd_kernel(*refs, nk: int, no: int, azs: int,
                             G: int, R: int, P: int, H: int, G1: int,
                             R1: int, P1: int, H1: int, W1: int,
                             want_stats: bool, x_dtype, act: str,
                             per_sample: bool = False):
    # refs: nk chunks, no dy, no y, inv, shift, nmat mats, mask, ds,
    # dq; outs: nk dchunk, nmat dM, db, dinv, dshift.
    chunk_refs = refs[:nk]
    dy_refs = refs[nk:nk + no]
    y_refs = refs[nk + no:nk + 2 * no]
    inv_ref, shift_ref = refs[nk + 2 * no:nk + 2 * no + 2]
    nmat = azs * 2 * nk * no * 2
    pos = nk + 2 * no + 2
    mats = refs[pos:pos + nmat]
    pos += nmat
    mask_ref, ds_ref, dq_ref = refs[pos:pos + 3]
    pos += 3
    dchunks = refs[pos:pos + nk]
    dmats = refs[pos + nk:pos + nk + nmat]
    db, dinv_ref, dshift_ref = refs[pos + nk + nmat:]

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    # per_sample: dinv/dshift blocks are b-indexed — reset at each b's
    # first grid step; the weight/bias accumulators stay global.
    first_b = pl.program_id(1) == 0 if per_sample else first

    @pl.when(first)
    def _():
        for dm in dmats:
            dm[...] = jnp.zeros_like(dm)
        db[...] = jnp.zeros_like(db)

    @pl.when(first_b)
    def _():
        dinv_ref[...] = jnp.zeros_like(dinv_ref)
        dshift_ref[...] = jnp.zeros_like(dshift_ref)

    Wh = W1 // 2
    Ss, pres, xs_ = [], [], []
    for k in range(nk):
        x = chunk_refs[k][0, 0, pl.ds(P1, R1), :].astype(jnp.float32)
        pre = x * inv_ref[k][None, :] + shift_ref[k][None, :]
        a = _act_fwd(pre, act).reshape(H1, G1, 128)[:, 1:1 + Wh, :]
        Ss.append(a.reshape(H1 * Wh, 128).astype(x_dtype))
        pres.append(pre)
        xs_.append(x)

    def mslot(az, ah, k, o, abi):
        return (((az * 2 + ah) * nk + k) * no + o) * 2 + abi

    dimsT = (((1,), (1,)), ((), ()))
    cdims = (((0,), (0,)), ((), ()))
    dSs = [jnp.zeros((H1 * Wh, 128), jnp.float32) for _ in range(nk)]
    for az in range(azs):
        sl = az if azs == 2 else 0
        for o in range(no):
            dy = dy_refs[o][0, sl, pl.ds(P, R), :].astype(jnp.float32)
            if want_stats:
                y = y_refs[o][0, sl, pl.ds(P, R), :].astype(jnp.float32)
                dy = dy + ds_ref[o][None, :] \
                    + 2.0 * y * dq_ref[o][None, :]
            dyt = (dy.reshape(H, G, 128) * mask_ref[...]).reshape(R, 128)
            db[o, :] += jnp.sum(dyt, axis=0)
            d3 = dyt.reshape(H1, 2 * G, 128)
            for ah in range(2):
                blk = d3[:, ah * G:(ah + 1) * G, :][:, 1:1 + W1, :]
                b4 = blk.reshape(H1, Wh, 2, 128)
                YgA = b4[:, :, 0, :].reshape(H1 * Wh, 128).astype(x_dtype)
                YgB = b4[:, :, 1, :].reshape(H1 * Wh, 128).astype(x_dtype)
                for k in range(nk):
                    dSs[k] = dSs[k] + _dot(
                        YgA, mats[mslot(az, ah, k, o, 0)][...],
                        dimension_numbers=dimsT,
                        preferred_element_type=jnp.float32)
                    dSs[k] = dSs[k] + _dot(
                        YgB, mats[mslot(az, ah, k, o, 1)][...],
                        dimension_numbers=dimsT,
                        preferred_element_type=jnp.float32)
                    dmats[mslot(az, ah, k, o, 0)][...] += _dot(
                        Ss[k], YgA, dimension_numbers=cdims,
                        preferred_element_type=jnp.float32)
                    dmats[mslot(az, ah, k, o, 1)][...] += _dot(
                        Ss[k], YgB, dimension_numbers=cdims,
                        preferred_element_type=jnp.float32)
    for k in range(nk):
        z1 = jnp.zeros((H1, 1, 128), jnp.float32)
        z2 = jnp.zeros((H1, G1 - Wh - 1, 128), jnp.float32)
        demb = jnp.concatenate(
            [z1, dSs[k].reshape(H1, Wh, 128), z2],
            axis=1).reshape(R1, 128)
        dpre = demb * _act_deriv(pres[k], act)
        dinv_ref[k, :] += jnp.sum(dpre * xs_[k], axis=0)
        dshift_ref[k, :] += jnp.sum(dpre, axis=0)
        dx = dpre * inv_ref[k][None, :]
        dchunks[k][0, 0, 0:P1] = jnp.zeros((P1, 128), x_dtype)
        dchunks[k][0, 0, pl.ds(P1, R1)] = dx.astype(x_dtype)
        dchunks[k][0, 0, P1 + R1:2 * P1 + R1] = jnp.zeros((P1, 128),
                                                          x_dtype)


def _upconv_f64in_call(chunks, inv, shift, w, b, H, W, want_stats,
                       act, azs):
    nk = len(chunks)
    no = w.shape[4] // CC64
    H1, W1 = H // 2, W // 2
    assert W1 % 2 == 0, W1
    G, R, P = flat_geometry64(H, W)
    G1, R1, P1 = flat_geometry64(H1, W1)
    B, D1 = chunks[0].shape[0], chunks[0].shape[1]
    dtype = chunks[0].dtype
    Ms = pack_upconv_f64in_weights(jax.lax.optimization_barrier(w), azs)
    bias_l = _lane_bias64(b)
    Dout = 2 * D1 if azs == 2 else D1

    kernel = functools.partial(
        _upconv_f64in_fwd_kernel, nk=nk, no=no, azs=azs, G=G, R=R, P=P,
        H=H, G1=G1, R1=R1, P1=P1, H1=H1, W1=W1, out_dtype=dtype,
        act=act, want_stats=want_stats)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    in_specs, operands = [], []
    for c in chunks:
        in_specs.append(pl.BlockSpec((1, 1, R1 + 2 * P1, 128), bd,
                                     memory_space=pltpu.VMEM))
        operands.append(c)
    for v in (inv, shift):
        op, spec = _ps_in(v.astype(jnp.float32))
        in_specs.append(spec)
        operands.append(op)
    for az in range(azs):
        for ah in range(2):
            for k in range(nk):
                for o in range(no):
                    for m in Ms[az][ah][k][o]:
                        in_specs.append(pl.BlockSpec(
                            (128, 128), c2, memory_space=pltpu.VMEM))
                        operands.append(m.astype(dtype))
    in_specs.append(pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM))
    operands.append(width_mask64(W).astype(jnp.float32))
    in_specs.append(pl.BlockSpec((no, 128), c2,
                                 memory_space=pltpu.VMEM))
    operands.append(bias_l.astype(jnp.float32))

    oblk = (1, 2, R + 2 * P, 128) if azs == 2 else (1, 1, R + 2 * P, 128)
    out_specs = [pl.BlockSpec(oblk, bd, memory_space=pltpu.VMEM)] * no
    out_shape = [jax.ShapeDtypeStruct((B, Dout, R + 2 * P, 128), dtype)
                 for _ in range(no)]
    st_spec, st_shape = _ps_out(
        no, B if want_stats == "per_sample" else None)
    out_specs += [st_spec, st_spec]
    out_shape += [st_shape, st_shape]
    res = pl.pallas_call(
        kernel,
        grid=(B, D1),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands)
    ys, (s, q) = res[:no], res[no:]
    if want_stats == "per_sample":
        s, q = s.transpose(1, 0, 2), q.transpose(1, 0, 2)
    stats = (s, q) if want_stats else None
    return tuple(ys), stats


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def upconv222_f64in(chunks, inv, shift, w, b, H: int, W: int,
                    want_stats: bool, act: str):
    """(2,2,2)-stride-2 transposed conv consuming nk FlatActs64 chunks
    (+ prologue) at (H/2, W/2) and emitting cout//64 flat64 chunks at
    (H, W) (+ optional stats). w: (2, 2, 2, nk*64, cout) flax
    ConvTranspose kernel."""
    return _upconv_f64in_call(tuple(chunks), inv, shift, w, b, H, W,
                              want_stats, act, azs=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def upconv122_f64in(chunks, inv, shift, w, b, H: int, W: int,
                    want_stats: bool, act: str):
    """(1,2,2) planar variant of upconv222_f64in (w: (1, 2, 2, nk*64,
    cout))."""
    return _upconv_f64in_call(tuple(chunks), inv, shift, w, b, H, W,
                              want_stats, act, azs=1)


def _upconv_f64in_bwd_call(H, W, want_stats, act, azs, res, cts):
    chunks, inv, shift, w, ys = res
    dys_in, dstats = cts
    nk = len(chunks)
    no = w.shape[4] // CC64
    H1, W1 = H // 2, W // 2
    G, R, P = flat_geometry64(H, W)
    G1, R1, P1 = flat_geometry64(H1, W1)
    B, D1 = chunks[0].shape[0], chunks[0].shape[1]
    dtype = chunks[0].dtype
    Ms = pack_upconv_f64in_weights(jax.lax.optimization_barrier(w), azs)
    Dout = 2 * D1 if azs == 2 else D1
    nmat = azs * 2 * nk * no * 2
    dys = [(jnp.zeros((B, Dout, R + 2 * P, 128), dtype) if d is None
            else d.astype(dtype)) for d in dys_in]
    per_sample = inv.ndim == 3
    ds, dq = (dstats if (want_stats and dstats is not None)
              else (None, None))
    st_shape = ((no, B, 128) if want_stats == "per_sample"
                else (no, 128))
    ds = jnp.zeros(st_shape, jnp.float32) if ds is None else ds
    dq = jnp.zeros(st_shape, jnp.float32) if dq is None else dq

    kernel = functools.partial(
        _upconv_f64in_bwd_kernel, nk=nk, no=no, azs=azs, G=G, R=R, P=P,
        H=H, G1=G1, R1=R1, P1=P1, H1=H1, W1=W1, want_stats=want_stats,
        x_dtype=dtype, act=act, per_sample=per_sample)
    bd = lambda b_, d_: (b_, d_, 0, 0)
    c2 = lambda b_, d_: (0, 0)
    yblk = (1, 2, R + 2 * P, 128) if azs == 2 else (1, 1, R + 2 * P, 128)
    in_specs, operands = [], []
    for c in chunks:
        in_specs.append(pl.BlockSpec((1, 1, R1 + 2 * P1, 128), bd,
                                     memory_space=pltpu.VMEM))
        operands.append(c)
    for arrs in (dys, ys):
        for a in arrs:
            in_specs.append(pl.BlockSpec(yblk, bd,
                                         memory_space=pltpu.VMEM))
            operands.append(a)
    for v in (inv, shift):
        op, spec = _ps_in(v.astype(jnp.float32))
        in_specs.append(spec)
        operands.append(op)
    for az in range(azs):
        for ah in range(2):
            for k in range(nk):
                for o in range(no):
                    for m in Ms[az][ah][k][o]:
                        in_specs.append(pl.BlockSpec(
                            (128, 128), c2, memory_space=pltpu.VMEM))
                        operands.append(m.astype(dtype))
    in_specs.append(pl.BlockSpec((G, 128), c2, memory_space=pltpu.VMEM))
    operands.append(width_mask64(W).astype(jnp.float32))
    for v in (ds, dq):
        op, spec = _ps_in(v)
        in_specs.append(spec)
        operands.append(op)

    out_specs = [pl.BlockSpec((1, 1, R1 + 2 * P1, 128), bd,
                              memory_space=pltpu.VMEM)] * nk
    out_shape = [jax.ShapeDtypeStruct((B, D1, R1 + 2 * P1, 128), dtype)
                 for _ in range(nk)]
    for _ in range(nmat):
        out_specs.append(pl.BlockSpec((128, 128), c2,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((128, 128), jnp.float32))
    out_specs.append(pl.BlockSpec((no, 128), c2,
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((no, 128), jnp.float32))
    pro_spec, pro_shape = _ps_out(nk, B if per_sample else None)
    out_specs += [pro_spec, pro_spec]
    out_shape += [pro_shape, pro_shape]
    res_ = pl.pallas_call(
        kernel,
        grid=(B, D1),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands)
    dchunks = tuple(res_[:nk])
    # barrier: scatter-fusion miscompile guard (see conv3_bnact_flat64)
    dM = jax.lax.optimization_barrier(tuple(res_[nk:nk + nmat]))
    dbl, dinv, dshift = res_[nk + nmat:]
    kz = 2 if azs == 2 else 1
    dw = jnp.zeros((kz, 2, 2, CC64 * nk, CC64 * no), jnp.float32)
    i = 0
    for az in range(azs):
        z = (1 - az) if azs == 2 else 0
        for ah in range(2):
            for k in range(nk):
                for o in range(no):
                    mA, mB = dM[i], dM[i + 1]; i += 2
                    m64 = mA[0:CC64, :] + mB[CC64:128, :]
                    dw = dw.at[z, 1 - ah, 1, k * CC64:(k + 1) * CC64,
                               o * CC64:(o + 1) * CC64].add(
                        m64[:, 0:CC64])
                    dw = dw.at[z, 1 - ah, 0, k * CC64:(k + 1) * CC64,
                               o * CC64:(o + 1) * CC64].add(
                        m64[:, CC64:128])
    dbc = fold_lane_stats64(dbl)
    if per_sample:
        # restore the canonical (nk, B, 128) prologue-grad layout
        dinv = dinv.transpose(1, 0, 2)
        dshift = dshift.transpose(1, 0, 2)
    return (dchunks, dinv, dshift, dw.astype(w.dtype),
            dbc.astype(w.dtype))


def _upconv222_f64in_fwd(chunks, inv, shift, w, b, H, W, want_stats,
                         act):
    out = upconv222_f64in(chunks, inv, shift, w, b, H, W, want_stats,
                          act)
    ys, _ = out
    return out, (tuple(chunks), inv, shift, w, ys)


def _upconv222_f64in_bwd(H, W, want_stats, act, res, cts):
    return _upconv_f64in_bwd_call(H, W, want_stats, act, 2, res, cts)


upconv222_f64in.defvjp(_upconv222_f64in_fwd, _upconv222_f64in_bwd)


def _upconv122_f64in_fwd(chunks, inv, shift, w, b, H, W, want_stats,
                         act):
    out = upconv122_f64in(chunks, inv, shift, w, b, H, W, want_stats,
                          act)
    ys, _ = out
    return out, (tuple(chunks), inv, shift, w, ys)


def _upconv122_f64in_bwd(H, W, want_stats, act, res, cts):
    return _upconv_f64in_bwd_call(H, W, want_stats, act, 1, res, cts)


upconv122_f64in.defvjp(_upconv122_f64in_fwd, _upconv122_f64in_bwd)

def _head64_impl(xs, inv, shift, w, b, H: int, W: int, act: str):
    from elektronn3_tpu.ops.flat_fused import _head_wbig
    G, R, P = flat_geometry64(H, W)
    Wp = pad_width64(W)
    cout = w.shape[-1]
    w2 = w.reshape(-1, cout).astype(jnp.float32)
    ys = []
    for i, xc in enumerate(xs):
        B, D, _, _ = xc.shape
        v = xc[:, :, P:P + R].astype(jnp.float32)
        pre = v * _bc_prologue(inv[i]) + _bc_prologue(shift[i])
        a = _act_fwd(pre, act)
        wbig = _head_wbig(w2, i, cout, CC64, JG64)
        # Memory-bound head GEMM: _dot pins HIGHEST for f32 operands
        # and DEFAULT for bf16 (see flat_fused.head_bnact_from_flat).
        ys.append(_dot(
            a, wbig, dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))     # (B, D, R, 2*cout)
    y = sum(ys) + jnp.tile(b.astype(jnp.float32), JG64)
    return y.reshape(B, D, H, Wp, cout)[:, :, :, W_OFF64:W_OFF64 + W, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _head64_bnact(xs, inv, shift, w, b, H: int, W: int, act: str):
    return _head64_impl(xs, inv, shift, w, b, H, W, act)


def _head64_fwd(xs, inv, shift, w, b, H, W, act):
    return (_head64_impl(xs, inv, shift, w, b, H, W, act),
            (xs, inv, shift, w, b))


def _head64_bwd(H, W, act, res, dy):
    """Row-padded-dy head backward (dx written once at full chunk
    size, no slice-adjoint pad) — flat64 analog of
    flat_fused._head_bwd; see its docstring for the rationale."""
    from elektronn3_tpu.ops.flat_fused import _head_wbig
    xs, inv, shift, w, b = res
    G, R, P = flat_geometry64(H, W)
    Wp = pad_width64(W)
    cout = w.shape[-1]
    w2 = w.reshape(-1, cout).astype(jnp.float32)
    B, D = dy.shape[:2]
    dy = dy.astype(jnp.float32)
    dyp = jnp.pad(dy, ((0, 0), (0, 0), (0, 0),
                       (W_OFF64, Wp - W_OFF64 - W), (0, 0)))
    dy_rows = dyp.reshape(B, D, R, JG64 * cout)
    db = jnp.sum(dy_rows, axis=(0, 1, 2)).reshape(JG64, cout).sum(axis=0)
    dxs, dinvs, dshifts, dwblks = [], [], [], []
    for i, xc in enumerate(xs):
        Rp = xc.shape[2]
        dy_full = jnp.pad(dy_rows,
                          ((0, 0), (0, 0), (P, Rp - P - R), (0, 0)))
        wbig = _head_wbig(w2, i, cout, CC64, JG64)
        vf = xc.astype(jnp.float32)
        pref = vf * _bc_prologue(inv[i]) + _bc_prologue(shift[i])
        da = _dot(dy_full, wbig,
                  dimension_numbers=(((3,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32)  # (B, D, Rp, 128)
        dpre = da * _act_deriv(pref, act)
        dxs.append((dpre * _bc_prologue(inv[i])).astype(xc.dtype))
        # per-sample (B, 128) prologues keep the batch axis in their
        # gradients (group/instance norm; see flat_fused._head_bwd).
        rax = (1, 2) if inv[i].ndim == 2 else (0, 1, 2)
        dinvs.append(jnp.sum(dpre * vf, axis=rax).astype(inv[i].dtype))
        dshifts.append(jnp.sum(dpre, axis=rax).astype(shift[i].dtype))
        a = _act_fwd(pref, act)
        dwbig = _dot(a.reshape(-1, 128), dy_full.reshape(-1, JG64 * cout),
                     dimension_numbers=(((0,), (0,)), ((), ())),
                     preferred_element_type=jnp.float32)  # (128, 2*cout)
        dwblks.append(sum(dwbig[j * CC64:(j + 1) * CC64,
                                j * cout:(j + 1) * cout]
                          for j in range(JG64)))
    dw = jnp.concatenate(dwblks, axis=0).reshape(w.shape).astype(w.dtype)
    return (dxs, dinvs, dshifts, dw, db.astype(b.dtype))


_head64_bnact.defvjp(_head64_fwd, _head64_bwd)


def head_bnact_from_flat64(xs, inv, shift, w, b, H: int, W: int,
                           act: str, out_dtype=jnp.float32):
    """1x1 conv head consuming flat64 chunks with a BN-apply +
    activation prologue, emitting (B, D, H, W, cout) logits — the
    flat64 analog of flat_fused.head_bnact_from_flat, used when the
    decoder ends at a C=64/128 level (start_filts=64 models). Removes
    the full-resolution materialize seam before the head.

    ONE lane-contraction GEMM per chunk with block-diagonal weights
    Wbig[(j, ci), (j', co)] = w[ci, co] iff j == j'; hand-written
    row-padded-dy backward (_head64_bwd)."""
    return _head64_bnact(list(xs), list(inv), list(shift), w, b,
                         H, W, act).astype(out_dtype)
