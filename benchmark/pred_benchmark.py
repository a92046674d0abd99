#!/usr/bin/env python3
"""Raw forward-pass throughput benchmark.

Port of reference benchmark/pred_benchmark.py:42-109: 2D (8,1,640,640)
and 3D (8,1,80,80,80) inputs x {fp32, bf16}, timed reps after warmup,
prints average MVox/s. (bf16 replaces the reference's fp16 — the TPU's
native half precision.)

Timing methodology (CLAUDE.md): two numbers are printed per config.
The 'device-only' number scan-chains the reps inside one jit program
with a loop-carried perturbation (prevents hoisting), one host sync at
the end, minus the MEASURED drain-read overhead — true device time per
forward. The 'per-call' number times separate dispatched forwards like
the reference harness (reference pred_benchmark.py:93-99) and is the
apples-to-apples figure (through the axon relay it includes relay
round trips a real host would not pay).
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--reps", type=int, default=20)
args = parser.parse_args()

from elektronn3_tpu.models.unet import UNet, init_unet
from elektronn3_tpu.utils.timing import sync_overhead_s

CONFIGS = [
    ("2d", (8, 640, 640, 1), dict(dim=2)),
    ("3d", (8, 80, 80, 80, 1), dict(dim=3, planar_blocks=(0,))),
]

RTT = sync_overhead_s()  # measured drain-read overhead (~0 off-relay)
print(f"(measured sync overhead: {RTT * 1e3:.1f} ms)")

for name, shape, mkw in CONFIGS:
    for dtype_name, dtype in [("fp32", jnp.float32), ("bf16", jnp.bfloat16)]:
        model = UNet(in_channels=1, out_channels=2, n_blocks=4,
                     start_filts=32, normalization="batch", dtype=dtype,
                     **mkw)
        variables = init_unet(model, shape)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def loop(v, x, reps):
            def body(c, _):
                out = model.apply(v, c, train=False)
                scale = 1.0 + 1e-12 * jnp.sum(out)
                return c * scale.astype(c.dtype), ()
            c, _ = jax.lax.scan(body, x, None, length=reps)
            return c

        x = jnp.asarray(np.random.default_rng(0).normal(size=shape),
                        jnp.float32)
        out = loop(variables, x, args.reps)
        float(jnp.sum(out))  # compile + sync
        t0 = time.perf_counter()
        out = loop(variables, x, args.reps)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0 - RTT) / args.reps
        mvx = np.prod(shape) / dt / 1e6

        # Reference-style per-call timing: separate dispatched forwards
        # with a sync each (reference pred_benchmark.py:93-99).
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        float(jnp.sum(fwd(variables, x)))  # compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            float(jnp.sum(fwd(variables, x)))
        dt_call = (time.perf_counter() - t0) / args.reps
        mvx_call = np.prod(shape) / dt_call / 1e6
        print(f"UNet {name} {dtype_name}: {mvx:.2f} MVox/s device-only "
              f"({dt * 1e3:.2f} ms / batch); "
              f"{mvx_call:.2f} MVox/s per-call ({dt_call * 1e3:.2f} ms)")
