#!/usr/bin/env python3
"""On-TPU fused-vs-XLA exactness check (VERDICT r2 item 7).

tests/test_flat_conv.py / test_flat64.py verify the fused executors'
math in INTERPRET mode on CPU; this script closes the remaining gap —
that the Mosaic-COMPILED kernels on the real chip compute the same
function — by comparing the fused executor (pallas_flat=True) against
the pure-XLA executor on tiny shapes: train/eval outputs, every BN
running statistic, and every parameter gradient, with pinned
tolerances per dtype.

Run on the TPU host (driver-runnable):  python benchmark/tpu_exactness_check.py
Exits non-zero on any mismatch; prints one summary line per dtype.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from elektronn3_tpu.models.unet import UNet, init_unet

# Pin HIGHEST matmul/conv precision for BOTH sides: under TPU DEFAULT
# precision XLA lowers f32 convs to single-pass bf16, which would make
# the XLA *reference* side the less exact one (the fused kernels pin
# HIGHEST internally; their bf16 dots pin DEFAULT explicitly so this
# context can't leak fp32 contract precision into Mosaic). First run
# without this showed the identical ~5e-2 eval diff in both dtype
# configs — the signature of a bf16 baseline, not a kernel bug.

# Tolerances: f32 kernels use HIGHEST-precision matmuls and must agree
# tightly; bf16 differs only by accumulation order (both sides do exact
# bf16 MACs with f32 accumulation), so modest relative slack suffices.
TOLS = {"float32": 1e-4, "bfloat16": 2e-2}


def items(tree):
    return sorted(((jax.tree_util.keystr(k), np.asarray(a)) for k, a in
                   jax.tree_util.tree_leaves_with_path(tree)),
                  key=lambda t: t[0])


def check(dtype_name, dtype):
    with jax.default_matmul_precision("highest"):
        return _check(dtype_name, dtype)


def _check(dtype_name, dtype):
    atol = TOLS[dtype_name]
    rng = np.random.default_rng(0)
    # Shapes engage BOTH fused executors: planar CC=32 L0 + C=64 kd=3 L1
    shape = (1, 4, 8, 16, 1)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    kw = dict(in_channels=1, out_channels=2, n_blocks=2, start_filts=32,
              planar_blocks=(0,), dim=3, normalization="batch",
              dtype=dtype)
    m_xla = UNet(pallas_flat=False, **kw)
    m_fused = UNet(pallas_flat=True, **kw)
    v = init_unet(m_xla, shape)

    worst = 0.0
    fails = []

    def compare(tag, a, b, scale_tol=True):
        nonlocal worst
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, float(np.max(np.abs(b)))) if scale_tol else 1.0
        d = float(np.max(np.abs(a - b))) / scale
        worst = max(worst, d)
        if d > atol:
            fails.append(f"{tag}: rel-max-diff {d:.2e}")

    o_x, mut_x = jax.jit(lambda v, x: m_xla.apply(
        v, x, train=True, mutable=["batch_stats"]))(v, x)
    o_f, mut_f = jax.jit(lambda v, x: m_fused.apply(
        v, x, train=True, mutable=["batch_stats"]))(v, x)
    compare("train_out", o_f, o_x)
    for (k1, a), (k2, b) in zip(items(mut_f["batch_stats"]),
                                items(mut_x["batch_stats"])):
        compare(f"batch_stats{k1}", a, b)
    compare("eval_out",
            jax.jit(lambda v, x: m_fused.apply(v, x, train=False))(v, x),
            jax.jit(lambda v, x: m_xla.apply(v, x, train=False))(v, x))

    def loss(params, model):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_x = jax.jit(jax.grad(loss), static_argnums=1)(v["params"], m_xla)
    g_f = jax.jit(jax.grad(loss), static_argnums=1)(v["params"], m_fused)
    for (k1, a), (k2, b) in zip(items(g_f), items(g_x)):
        compare(f"grad{k1}", a, b)

    status = "PASS" if not fails else "FAIL"
    print(f"[{status}] {dtype_name}: fused-vs-XLA on "
          f"{jax.default_backend()} — worst rel diff {worst:.2e} "
          f"(tol {atol:.0e}), {len(list(items(g_x)))} grads checked")
    for f in fails:
        print("   " + f)
    return not fails


def main():
    ok = True
    for name, dt in [("bfloat16", jnp.bfloat16), ("float32", jnp.float32)]:
        ok &= check(name, dt)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
