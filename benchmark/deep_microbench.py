"""Microbenchmark: deeper U-Net levels (C >= 64, 3x3x3) — XLA conv vs
candidate reformulations, at the TRUE headline shapes.

Headline model (reference benchmark/train_benchmark.py:96-107):
n_blocks=4, planar_blocks=(0,), start_filts=32, patch (44,88,88),
batch 8. Planar pooling is (1,2,2), so:
  L1: (8, 44, 44, 44)  convs 32->64, 64->64; dec 128->64, 64->64
  L2: (8, 22, 22, 22)  convs 64->128, 128->128; dec 256->128, 128->128
  L3: (8, 11, 11, 11)  convs 128->256, 256->256
Times fwd and fwd+bwd via scan-chained dependent iterations with one
final host sync (relay RTT amortizes; see CLAUDE.md).
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

DTYPE = jnp.bfloat16
REPS = 20

CASES = [
    # (name, (B, D, H, W), cin, cout)
    ("L1 enc 32->64   (44,44,44)", (8, 44, 44, 44), 32, 64),
    ("L1 enc 64->64   (44,44,44)", (8, 44, 44, 44), 64, 64),
    ("L1 dec 128->64  (44,44,44)", (8, 44, 44, 44), 128, 64),
    ("L2 enc 64->128  (22,22,22)", (8, 22, 22, 22), 64, 128),
    ("L2 enc 128->128 (22,22,22)", (8, 22, 22, 22), 128, 128),
    ("L2 dec 256->128 (22,22,22)", (8, 22, 22, 22), 256, 128),
    ("L3 enc 128->256 (11,11,11)", (8, 11, 11, 11), 128, 256),
    ("L3 enc 256->256 (11,11,11)", (8, 11, 11, 11), 256, 256),
]


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv_zloop(x, w):
    """kd-loop: 3 planar (1,3,3) convs over z-shifted inputs, summed.
    Tests whether XLA's 2D emitter beats its 3D one."""
    B, D, H, W, C = x.shape
    acc = None
    for dz in range(3):
        wz = w[dz:dz + 1]                       # (1, 3, 3, cin, cout)
        lo, hi = 1 - dz, D + 1 - dz
        xs = x[:, max(lo, 0):min(hi, D)]
        pad = ((0, 0), (max(-lo, 0), max(hi - D, 0)), (0, 0), (0, 0),
               (0, 0))
        xs = jnp.pad(xs, pad)
        y = jax.lax.conv_general_dilated(
            xs, wz, window_strides=(1, 1, 1), padding=((0, 0), (1, 1),
                                                       (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        acc = y if acc is None else acc + y
    return acc


def conv_im2col(x, w):
    """Full im2col: 27 shifted views -> one GEMM with K = 27*cin."""
    B, D, H, W, C = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    cols = []
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                cols.append(xp[:, dz:dz + D, dy:dy + H, dx:dx + W, :])
    a = jnp.concatenate(cols, axis=-1)          # (B,D,H,W, 27*C)
    wf = w.reshape(27 * C, cout)
    return jax.lax.dot_general(a, wf.astype(a.dtype),
                               (((4,), (0,)), ((), ())))


def make_loop(conv, cin, cout):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def fwd_loop(x, w, reps):
        def body(c, _):
            o = conv(c, w)
            o = o[..., :cin] if cout >= cin else jnp.tile(
                o, (1, 1, 1, 1, cin // cout))
            return o, ()
        c, _ = jax.lax.scan(body, x, None, length=reps)
        return c

    @functools.partial(jax.jit, static_argnames=("reps",))
    def fb_loop(x, w, reps):
        # Nonlinear loss so the output cotangent is data-dependent
        # (a constant cotangent lets XLA fold dgrad to a constant),
        # and grad over BOTH operands so dgrad AND wgrad run.
        def body(c, _):
            def f(xx, ww):
                o = conv(xx, ww).astype(jnp.float32)
                return jnp.sum(o * o)
            gx, gw = jax.grad(f, argnums=(0, 1))(c, w)
            return c + gx.astype(c.dtype) * jnp.mean(
                gw.astype(jnp.float32)).astype(c.dtype) * 1e-9, ()
        c, _ = jax.lax.scan(body, x, None, length=reps)
        return c

    return fwd_loop, fb_loop


def bench(fn, x, w):
    c = fn(x, w, REPS)
    float(jnp.sum(c.astype(jnp.float32)))
    t0 = time.perf_counter()
    c = fn(x, w, REPS)
    float(jnp.sum(c.astype(jnp.float32)))
    return (time.perf_counter() - t0 - 0.035) / REPS


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="xla,zloop,im2col")
    p.add_argument("--cases", default="")
    args = p.parse_args()
    variants = args.variants.split(",")
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    convs = {"xla": conv_xla, "zloop": conv_zloop, "im2col": conv_im2col}
    for name, (B, D, H, W), cin, cout in CASES:
        if args.cases and args.cases not in name:
            continue
        x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), DTYPE)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.05,
                        DTYPE)
        gf = B * D * H * W * 27 * cin * cout * 2 / 1e9
        line = f"{name}  {gf:7.1f} GFLOP |"
        for v in variants:
            fwd_loop, fb_loop = make_loop(convs[v], cin, cout)
            tf = bench(fwd_loop, x, w)
            tb = bench(fb_loop, x, w)
            line += (f"  {v}: fwd {tf*1e3:6.2f} ms ({gf/tf/1e3:5.1f} TF/s)"
                     f" f+b {tb*1e3:6.2f} ms")
        print(line)


if __name__ == "__main__":
    main()
