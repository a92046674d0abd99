#!/usr/bin/env python3
"""Fused-vs-XLA training equivalence A/B with statistics (round-2
review item 4): >=3 seeds per arm, SAME device-side sample stream and
SAME init per seed, 300 steps of the headline workload, reporting
final train loss (mean of last 30 steps), val loss, and val DSC per
run plus mean +- spread per arm.

Data is generated ON DEVICE inside the scanned step (multi-scale
smoothed noise -> thresholded 'membrane' labels, the synthetic
neuro_data stand-in of benchmark/make_synthetic_neurodata.py, but
jit-resident) keyed by fold_in(seed, step) — bitwise identical across
executors, zero host I/O, so the ONLY difference between arms is the
executor. Run on the TPU host: python benchmark/ab_seeds.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from elektronn3_tpu.models.unet import UNet, init_unet
from elektronn3_tpu.modules.loss import CEDiceLoss

p = argparse.ArgumentParser(description=__doc__)
p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
p.add_argument("--steps", type=int, default=300)
p.add_argument("--batch", type=int, default=8)
p.add_argument("--patch", type=int, nargs=3, default=(44, 88, 88))
p.add_argument("--val-batches", type=int, default=16)
args = p.parse_args()

BATCH = args.batch
PATCH = tuple(args.patch)
crit = CEDiceLoss(1.0, 1.0)


def make_batch(key):
    """Device-side synthetic neuro-like batch: smoothed multi-scale
    noise; labels = ridge threshold; input = noisy raw."""
    D, H, W = PATCH
    k1, k2 = jax.random.split(key)
    small = jax.random.normal(k1, (BATCH, D // 4, H // 8, W // 8))
    vol = jnp.repeat(jnp.repeat(jnp.repeat(small, 4, 1), 8, 2), 8, 3)
    for ax in (1, 2, 3):
        vol = (vol + jnp.roll(vol, 1, ax) + jnp.roll(vol, -1, ax)) / 3.0
    target = (jnp.abs(vol) < 0.25).astype(jnp.int32)
    raw = vol + 0.12 * jax.random.normal(k2, vol.shape)
    return raw[..., None].astype(jnp.float32), target


def run_arm(pallas_flat, seed):
    model = UNet(in_channels=1, out_channels=2, n_blocks=4,
                 start_filts=32, planar_blocks=(0,), dim=3,
                 normalization="batch", dtype=jnp.bfloat16,
                 pallas_flat=pallas_flat)
    v = init_unet(model, (BATCH,) + PATCH + (1,),
                  rng=jax.random.PRNGKey(seed))
    tx = optax.adam(2e-3)

    def step(carry, i):
        params, bs, opt = carry
        x, y = make_batch(jax.random.fold_in(jax.random.PRNGKey(seed), i))

        def loss_fn(p):
            out, mut = model.apply({"params": p, "batch_stats": bs}, x,
                                   train=True, mutable=["batch_stats"])
            return crit(out, y), mut["batch_stats"]

        (l, bs2), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt2 = tx.update(g, opt, params)
        return (optax.apply_updates(params, u), bs2, opt2), l

    @jax.jit
    def train(params, bs, opt):
        (params, bs, opt), losses = jax.lax.scan(
            step, (params, bs, opt), jnp.arange(args.steps))
        return params, bs, losses

    @jax.jit
    def validate(params, bs):
        def vstep(_, i):
            x, y = make_batch(
                jax.random.fold_in(jax.random.PRNGKey(10_000 + seed), i))
            out = model.apply({"params": params, "batch_stats": bs}, x,
                              train=False)
            l = crit(out, y)
            pred = jnp.argmax(out, axis=-1)
            inter = jnp.sum((pred == 1) & (y == 1))
            dsc = 2.0 * inter / (jnp.sum(pred == 1) + jnp.sum(y == 1))
            return None, (l, dsc)

        _, (ls, ds) = jax.lax.scan(vstep, None,
                                   jnp.arange(args.val_batches))
        return jnp.mean(ls), jnp.mean(ds)

    t0 = time.perf_counter()
    params, bs, losses = train(v["params"], v["batch_stats"],
                               tx.init(v["params"]))
    losses = np.asarray(losses)            # host sync
    vl, vd = validate(params, bs)
    vl, vd = float(vl), float(vd)
    dt = time.perf_counter() - t0
    tr = float(losses[-30:].mean())
    name = "fused" if pallas_flat else "xla"
    print(f"{name:5s} seed {seed}: tr_loss(last30) {tr:.4f}  "
          f"val_loss {vl:.4f}  val_DSC {vd:.4f}  "
          f"(first {losses[0]:.3f}, {dt:.0f}s)", flush=True)
    assert np.isfinite(losses).all()
    return tr, vl, vd


results = {}
for pf in ("auto", False):
    arm = []
    for seed in args.seeds:
        arm.append(run_arm(pf, seed))
    results["fused" if pf else "xla"] = np.array(arm)

print()
for name, arr in results.items():
    for j, metric in enumerate(["tr_loss", "val_loss", "val_DSC"]):
        m, s = arr[:, j].mean(), arr[:, j].std()
        lo, hi = arr[:, j].min(), arr[:, j].max()
        print(f"{name:5s} {metric:9s} mean {m:.4f} +- {s:.4f} "
              f"(range {lo:.4f}..{hi:.4f})")
