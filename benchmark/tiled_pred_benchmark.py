#!/usr/bin/env python3
"""Tiled-Predictor END-TO-END throughput benchmark.

Measures the one reference headline metric BASELINE.md had not yet
covered: valid-region-corrected MVox/s of tiled inference over a large
volume (reference elektronn3/inference/inference.py:636-641 logs this
per predict() call). Workload mirrors examples/inference_h5.py: tile
(64,128,128), overlap (32,64,64), bf16 model, synthetic multi-hundred-MB
volume.

Phases are timed separately so the gap between raw-forward MVox/s
(pred_benchmark.py) and e2e tiled MVox/s is attributable (host tile
assembly? H2D? compute? D2H scatter?). On the axon relay host, H2D is
capped at ~0.4 GB/s and every device call carries an RTT — production
TPU-VM numbers will sit between the compute-only and e2e numbers here.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import time

import numpy as np

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--vol", type=int, nargs=3, default=(128, 512, 512),
                    help="synthetic volume (D, H, W)")
parser.add_argument("--tile", type=int, nargs=3, default=(64, 128, 128))
parser.add_argument("--overlap", type=int, nargs=3, default=(32, 64, 64))
parser.add_argument("--reps", type=int, default=3,
                    help="timed predict() repetitions (first is warmup)")
parser.add_argument("--f32", action="store_true",
                    help="fp32 model instead of bf16")
parser.add_argument("--batch", type=int, default=None,
                    help="tile batch size override")
parser.add_argument("--no-softmax", action="store_true")
parser.add_argument("--argmax", action="store_true",
                    help="argmax head (out_dtype defaults to uint8 ids)")
parser.add_argument("--out-dtype", default=None,
                    help="explicit out_dtype (e.g. float32, bfloat16, "
                         "uint8); default follows reference semantics")
args = parser.parse_args()

import jax
import jax.numpy as jnp

from elektronn3_tpu.inference import Predictor
from elektronn3_tpu.models.unet import UNet, init_unet

dtype = jnp.float32 if args.f32 else jnp.bfloat16
model = UNet(in_channels=1, out_channels=2, n_blocks=4, start_filts=32,
             planar_blocks=(0,), activation="relu", normalization="batch",
             dim=3, dtype=dtype)
tile_in = tuple(t + 2 * o for t, o in zip(args.tile, args.overlap))
variables = init_unet(model, (1,) + tile_in + (1,))

vol_shape = tuple(args.vol)
rng = np.random.default_rng(0)
print(f"volume {vol_shape} = {np.prod(vol_shape) / 1e6:.1f} MVox "
      f"({np.prod(vol_shape) * 4 / 2**20:.0f} MB f32), tile {args.tile}, "
      f"overlap {args.overlap}, dtype {dtype.__name__}", flush=True)
inp = rng.normal(size=(1, 1) + vol_shape).astype(np.float32)

pred = Predictor(
    model=model, state=variables,
    tile_shape=tuple(args.tile), overlap_shape=tuple(args.overlap),
    float16=not args.f32, apply_softmax=not args.no_softmax,
    argmax_with_threshold=True if args.argmax else None,
    out_dtype=args.out_dtype,
    batch_size=args.batch, verbose=True, collect_phase_times=True,
)
print(f"out_dtype {pred.out_dtype}, argmax {args.argmax}", flush=True)

for rep in range(args.reps):
    t0 = time.time()
    out = pred.predict(inp)
    dt = time.time() - t0
    vox = np.prod(out.shape[2:]) * out.shape[0]
    # Valid-region correction (reference inference.py:636-641): when
    # out_shape == in_shape the border 2*overlap region is padding-fed.
    valid = np.prod(np.array(out.shape[2:]) - 2 * np.array(args.overlap))
    tag = "warmup" if rep == 0 else f"rep {rep}"
    pt = {k: round(v, 2) for k, v in (pred.last_phase_times or {}).items()}
    print(f"[{tag}] e2e {dt:.2f} s  {vox / dt / 1e6:.1f} MVox/s "
          f"(valid-corrected {valid / dt / 1e6:.1f} MVox/s)  "
          f"phases {pt}", flush=True)

assert np.all(np.isfinite(out))
