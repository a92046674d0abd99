#!/usr/bin/env python3
"""Raw forward-pass throughput benchmark.

Port of reference benchmark/pred_benchmark.py:42-109: 2D (8,1,640,640)
and 3D (8,1,80,80,80) inputs x {fp32, bf16}, timed reps after warmup,
prints average MVox/s. (bf16 replaces the reference's fp16 — the TPU's
native half precision.)

Timing methodology (CLAUDE.md): reps are scan-chained inside one jit
program with a loop-carried perturbation (prevents hoisting), one host
sync at the end, and the axon relay's ~35 ms D2H RTT subtracted — so
the number is true device time per forward.
"""

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

CONFIGS = [
    ("2d", (8, 640, 640, 1), dict(dim=2)),
    ("3d", (8, 80, 80, 80, 1), dict(dim=3, planar_blocks=(0,))),
]

RTT = 0.035  # axon relay D2H round trip (calibrated, docs/design.md)

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
        print(f"UNet {name} {dtype_name}: {mvx:.2f} MVox/s "
              f"({dt * 1e3:.2f} ms / batch)")
