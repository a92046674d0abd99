#!/usr/bin/env python3
"""Raw forward-pass throughput benchmark.

Port of reference benchmark/pred_benchmark.py:42-109: 2D (8,1,640,640)
and 3D (8,1,80,80,80) inputs x {fp32, bf16}, 10 timed reps after warmup,
prints average MVox/s. (bf16 replaces the reference's fp16 — the TPU's
native half precision.)
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--reps", type=int, default=10)
args = parser.parse_args()

from elektronn3_tpu.models.unet import UNet, init_unet

CONFIGS = [
    ("2d", (8, 640, 640, 1), dict(dim=2)),
    ("3d", (8, 80, 80, 80, 1), dict(dim=3, planar_blocks=(0,))),
]

for name, shape, mkw in CONFIGS:
    for dtype_name, dtype in [("fp32", jnp.float32), ("bf16", jnp.bfloat16)]:
        model = UNet(in_channels=1, out_channels=2, n_blocks=4,
                     start_filts=32, normalization="batch", dtype=dtype,
                     **mkw)
        variables = init_unet(model, shape)

        @jax.jit
        def fwd(v, x):
            return model.apply(v, x, train=False)

        x = jnp.asarray(np.random.default_rng(0).normal(size=shape),
                        jnp.float32)
        out = fwd(variables, x)
        float(out.sum())  # sync after compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fwd(variables, x)
        float(out.sum())  # sync
        dt = (time.perf_counter() - t0) / args.reps
        mvx = np.prod(shape) / dt / 1e6
        print(f"UNet {name} {dtype_name}: {mvx:.2f} MVox/s "
              f"({dt * 1e3:.2f} ms / batch)")
