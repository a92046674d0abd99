"""Microbenchmark: fused flat-executor ops (ops/flat_fused.py) at the
headline train_benchmark shapes (reference benchmark/train_benchmark.py
:96-107,184,293 — 3D U-Net L0: batch 8, D 44, H/W 88, C 32, bf16).

Times fwd and fwd+bwd per op with scan-chained dependent iterations
(loop-carried perturbation prevents hoisting; one final host sync so
the axon relay RTT amortizes — see CLAUDE.md measurement notes).
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from elektronn3_tpu.ops import flat_conv as fc
from elektronn3_tpu.ops import flat_fused as ff

B, D, H, W = 8, 44, 88, 88
DTYPE = jnp.bfloat16
REPS = 20


def _chain(x, out_scalar):
    """Perturb carried input by a scalar of the output (anti-hoist)."""
    return jax.tree_util.tree_map(
        lambda a: (a * (1.0 + 1e-12 * out_scalar).astype(a.dtype)), x)


def bench(step, carry):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(carry, reps):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, carry, None, length=reps)
        return c

    c = loop(carry, REPS)
    jax.tree_util.tree_map(
        lambda a: float(jnp.sum(a.astype(jnp.float32))),
        jax.tree_util.tree_leaves(c)[0])
    t0 = time.perf_counter()
    c = loop(carry, REPS)
    float(jnp.sum(jax.tree_util.tree_leaves(c)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0 - 0.035) / REPS  # relay RTT bias
    return dt


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}")
    G, R, P = fc.flat_geometry(H, W)
    lane1 = jnp.ones((1, 128), jnp.float32)
    lane0 = jnp.zeros((1, 128), jnp.float32)
    lane2_1 = jnp.ones((2, 128), jnp.float32)
    lane2_0 = jnp.zeros((2, 128), jnp.float32)

    x5 = jnp.asarray(rng.normal(size=(B, D, H, W, 32)), DTYPE)
    chunk = fc.to_flat(x5)[0]
    w11 = jnp.asarray(rng.normal(size=(1, 3, 3, 32, 32)) * 0.1, DTYPE)
    w21 = jnp.asarray(rng.normal(size=(1, 3, 3, 64, 32)) * 0.1, DTYPE)
    b32 = jnp.zeros((32,), DTYPE)
    dec = jnp.asarray(rng.normal(size=(B, D, 44, 44, 64)), DTYPE)
    wu = jnp.asarray(rng.normal(size=(1, 2, 2, 64, 32)) * 0.1, DTYPE)
    wh = jnp.asarray(rng.normal(size=(1, 1, 1, 32, 2)) * 0.1, DTYPE)
    bh = jnp.zeros((2,), DTYPE)

    gflop_c11 = 2 * B * D * H * W * 9 * 32 * 32 / 1e9
    gflop_c21 = 2 * gflop_c11

    # conv 32->32 fwd
    def c11(c):
        ys, (s, q) = ff.conv_bnact_flat((c,), lane1, lane0, w11, b32,
                                        H, W, (0,), True, "relu")
        return ys[0]
    t = bench(c11, chunk)
    print(f"conv32->32 fwd       {t*1e3:7.2f} ms  {gflop_c11/t/1e3:6.1f} TF/s")

    # conv 32->32 fwd+bwd
    def c11g(c):
        def f(c, w):
            ys, (s, q) = ff.conv_bnact_flat((c,), lane1, lane0, w, b32,
                                            H, W, (0,), True, "relu")
            return jnp.sum(ys[0].astype(jnp.float32)) \
                + jnp.sum(s) * 1e-6 + jnp.sum(q) * 1e-7
        val, g = jax.value_and_grad(f)(c, w11)
        return _chain(g, val)
    t = bench(c11g, chunk)
    print(f"conv32->32 fwd+bwd   {t*1e3:7.2f} ms  {3*gflop_c11/t/1e3:6.1f} TF/s")

    # conv 64->32 (decoder conv1) fwd+bwd
    def c21g(cs):
        def f(cs, w):
            ys, (s, q) = ff.conv_bnact_flat(cs, lane2_1, lane2_0, w, b32,
                                            H, W, (0, 0), True, "relu")
            return jnp.sum(ys[0].astype(jnp.float32)) + jnp.sum(s) * 1e-6
        val, g = jax.value_and_grad(f)(cs, w21)
        return (_chain(g[0], val), _chain(g[1], val))
    t = bench(c21g, (chunk, chunk))
    print(f"conv64->32 fwd+bwd   {t*1e3:7.2f} ms  {3*gflop_c21/t/1e3:6.1f} TF/s")

    # dense-adapter conv 32->32 fwd+bwd (conv1 -> conv2 seamless feed)
    xr = ff.as_dense_rows(x5)
    def cdg(xr_):
        def f(xr_, w):
            ys, (s, q) = ff.conv_bnact_flat((xr_,), lane1, lane0, w, b32,
                                            H, W, (W * 32 // 128,), True,
                                            "relu")
            return jnp.sum(ys[0].astype(jnp.float32)) + jnp.sum(s) * 1e-6
        val, g = jax.value_and_grad(f)(xr_, w11)
        return _chain(g, val)
    t = bench(cdg, xr)
    print(f"convDense->32 f+b    {t*1e3:7.2f} ms  {3*gflop_c11/t/1e3:6.1f} TF/s")

    # pool fwd+bwd
    def poolg(c):
        def f(c):
            p = ff.pool_bnact_flat((c,), lane1, lane0, H, W, (0,), "relu")
            return jnp.sum(p.astype(jnp.float32))
        val, g = jax.value_and_grad(f)(c)
        return _chain(g, val)
    t = bench(poolg, chunk)
    gb = (B * D * (R + 2 * P) * 128 * 2 * 3) / 1e9
    print(f"pool fwd+bwd         {t*1e3:7.2f} ms  {gb/t:6.0f} GB/s eff")

    # upconv fwd+bwd
    def upg(d):
        def f(d, w):
            (yc,), (s, q) = ff.upconv_bn_flat(d, w, b32, H, W, True)
            return jnp.sum(yc.astype(jnp.float32)) + jnp.sum(s) * 1e-6
        val, g = jax.value_and_grad(f)(d)
        return _chain(g, val)
    t = bench(upg, dec)
    print(f"upconv fwd+bwd       {t*1e3:7.2f} ms")

    # head fwd+bwd (XLA)
    def headg(c):
        def f(c, w):
            y = ff.head_bnact_from_flat((c,), lane1, lane0, w, bh, H, W,
                                        "relu")
            return jnp.sum(y)
        val, g = jax.value_and_grad(f)(c, wh)
        return _chain(g, val)
    t = bench(headg, chunk)
    print(f"head fwd+bwd         {t*1e3:7.2f} ms")

    # XLA reference convs for context
    def xla11g(x):
        def f(x, w):
            a = jnp.maximum(x, 0)
            y = jax.lax.conv_general_dilated(
                a, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)
            return jnp.sum(y)
        val, g = jax.value_and_grad(f)(x, w11)
        return _chain(g, val)
    t = bench(xla11g, x5)
    print(f"XLA conv32 fwd+bwd   {t*1e3:7.2f} ms  {3*gflop_c11/t/1e3:6.1f} TF/s")


if __name__ == "__main__":
    main()
