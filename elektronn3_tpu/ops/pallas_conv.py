"""Direct 2D/3D convolution as a Pallas TPU kernel (tap-packed MXU).

Why: the headline U-Net workload runs convs with C_out in {32, 64}
(reference benchmark/train_benchmark.py:96-107). XLA's conv emitter
contracts over C_in (K) and emits C_out (N) per matmul, so a 32->32
conv occupies 32/128 of the MXU's K rows and 32/128 of its N columns;
measured conv throughput saturates at ~54 TF/s (docs/design.md). This
kernel packs kernel taps into BOTH matmul dimensions via a Minkowski
decomposition of the 3x3 in-plane stencil:

    A[(h, w), (s, ci)]  = x[h, w + s, ci]          (kw taps in K)
    Wp[(s, ci), (t, co)] = w[t, s, ci, co]          (kh taps in N)
    y[(h, w), (t, co)]  = A @ Wp
    out[h, w, co]       = sum_t y[h + t, w, t*C+co]

so a 32-channel conv runs matmuls with K = 3*32 = 96 and N = 3*32 = 96
(56% array occupancy instead of ~6%), and a 64-channel conv with
K = N = 192. The depth dimension (kd in {1, 3}) is a static
accumulation loop over input slabs. f32 accumulation; bf16 in/out.

Memory strategy: inputs stream through Mosaic's BlockSpec pipeline
(auto double-buffered). The H halo (2 rows) comes from a second
BlockSpec view of the same array with 2-row blocks, so halo traffic is
2/tile_h, not a whole duplicated block. For kd == 3, the three z slabs
are separate views of the padded input (3x read of the input per conv;
the z-slabs are small at the levels where kd == 3 matters).

Scope: stride 1, 'same' padding, kh = kw = 3, kd in {1, 3}, channels-
last (N, [D,] H, W, C). Wrapped with a custom VJP (dgrad reuses this
kernel with tap-flipped transposed weights; wgrad is a tap-packed
matmul kernel) — see ``conv3x3p``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_tile_h(H: int, max_tile: int = 44) -> Tuple[int, int]:
    """Pick (tile_h, padded_H): the largest even divisor of padded_H
    that is <= max_tile (halo block starts must be 2-aligned)."""
    for th in range(min(H, max_tile), 1, -1):
        if th % 2 == 0 and H % th == 0:
            return th, H
    # No even divisor (odd/prime H): pad H up to a multiple of a tile.
    th = min(H + (H % 2), max_tile)
    th += th % 2
    Hp = -(-H // th) * th
    return th, Hp


def pack_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(kd, 3, 3, Cin, Cout) -> (kd, 3*Cin, 3*Cout) with K index
    (kw, ci) and N index (kh, co)."""
    kd, kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    # (kd, kh, kw, ci, co) -> (kd, kw, ci, kh, co)
    wp = jnp.transpose(w, (0, 2, 3, 1, 4))
    return wp.reshape(kd, kw * cin, kh * cout)


def _conv_kernel(*refs, kd: int, th: int, W: int, cin: int, cout: int,
                 out_dtype):
    """One grid step: output tile (1, 1, th, W, cout) at (b, d, h).

    refs: kd main views, kd halo views, packed weights, out, shift
    scratch. Main view z: (1, 1, th, Wp2, cin) input rows
    [h*th, (h+1)*th) of slab d+z; halo view z: rows [(h+1)*th, +2).
    """
    mains = refs[:kd]
    halos = refs[kd:2 * kd]
    wp_ref = refs[2 * kd]
    out_ref = refs[2 * kd + 1]
    shifts = refs[2 * kd + 2]  # (3, th+2, W, cin) VMEM scratch

    y = jnp.zeros((th + 2, W, 3 * cout), jnp.float32)
    for z in range(kd):
        rows_main = mains[z][0, 0]  # (th, Wp2, cin)
        rows_halo = halos[z][0, 0]  # (2, Wp2, cin)
        # Realign the three kw-shifted windows via scratch stores
        # (Mosaic cannot concat operands with mismatched sublane
        # offsets directly).
        for s in range(3):
            shifts[s, 0:th] = rows_main[:, s:s + W, :]
            shifts[s, th:th + 2] = rows_halo[:, s:s + W, :]
        a = jnp.concatenate([shifts[0], shifts[1], shifts[2]], axis=-1)
        y = y + jax.lax.dot_general(
            a, wp_ref[z],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out = (y[0:th, :, 0:cout]
           + y[1:th + 1, :, cout:2 * cout]
           + y[2:th + 2, :, 2 * cout:3 * cout])
    out_ref[0, 0] = out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("planar",))
def conv_direct(x: jnp.ndarray, w: jnp.ndarray,
                planar: bool = False) -> jnp.ndarray:
    """'same' stride-1 conv via the tap-packed Pallas kernel.

    Args:
        x: (B, D, H, W, Cin) channels-last input.
        w: (kd, 3, 3, Cin, Cout) filter (kd == 1 if planar else 3).
        planar: kd == 1 (anisotropic (1,3,3) kernel).
    Returns:
        (B, D, H, W, Cout), dtype of x.
    """
    B, D, H, W, cin = x.shape
    kd = 1 if planar else 3
    assert w.shape[:3] == (kd, 3, 3), w.shape
    cout = w.shape[-1]
    th, Hp = _pick_tile_h(H)

    Wp2 = -(-(W + 2) // 8) * 8
    pad_d = (0, 0) if planar else (1, 1)
    xp = jnp.pad(x, ((0, 0), pad_d, (1, Hp - H + 1), (1, Wp2 - W - 1),
                     (0, 0)))
    wp = pack_weights(w.astype(x.dtype))

    grid = (B, D, Hp // th)
    kernel = functools.partial(
        _conv_kernel, kd=kd, th=th, W=W, cin=cin, cout=cout,
        out_dtype=x.dtype)

    def main_spec(z):
        return pl.BlockSpec(
            (1, 1, th, Wp2, cin),
            lambda b, d, h, z=z: (b, d + z, h, 0, 0),
            memory_space=pltpu.VMEM)

    def halo_spec(z):
        return pl.BlockSpec(
            (1, 1, 2, Wp2, cin),
            lambda b, d, h, z=z: (b, d + z, (h + 1) * (th // 2), 0, 0),
            memory_space=pltpu.VMEM)

    flops = 2 * B * D * Hp * W * kd * 9 * cin * cout
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [main_spec(z) for z in range(kd)]
            + [halo_spec(z) for z in range(kd)]
            + [pl.BlockSpec((kd, 3 * cin, 3 * cout),
                            lambda b, d, h: (0, 0, 0),
                            memory_space=pltpu.VMEM)]),
        out_specs=pl.BlockSpec((1, 1, th, W, cout),
                               lambda b, d, h: (b, d, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, Hp, W, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, th + 2, W, cin), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 * kd + B * D * H * W * cout * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(*([xp] * (2 * kd) + [wp]))
    return out if Hp == H else out[:, :, :H]
