#!/usr/bin/env python3
"""Tiled inference on an HDF5 volume with a trained model.

Port of the reference template examples/inference_h5.py:55-133:
normalize, tile (64,128,128) / overlap (32,64,64), uint8 export.
"""

import argparse
import os

import numpy as np

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("model_path", help="model*.e3tpu file")
parser.add_argument("input_path", help="input HDF5 file")
parser.add_argument("-k", "--key", default="raw")
parser.add_argument("-o", "--output", default=None)
parser.add_argument("--tile", type=int, nargs=3, default=(64, 128, 128))
parser.add_argument("--overlap", type=int, nargs=3, default=(32, 64, 64))
args = parser.parse_args()

import h5py

from elektronn3_tpu.data.transforms import Normalize
from elektronn3_tpu.data.utils import save_to_h5
from elektronn3_tpu.inference import Predictor

with h5py.File(os.path.expanduser(args.input_path), "r") as f:
    inp = f[args.key][()].astype(np.float32)
if inp.ndim == 3:
    inp = inp[None]  # (C, D, H, W)
inp = inp[None]  # (N, C, D, H, W)

transform = Normalize(mean=155.291411, std=41.812504)

predictor = Predictor(
    model=os.path.expanduser(args.model_path),
    tile_shape=tuple(args.tile),
    overlap_shape=tuple(args.overlap),
    transform=transform,
    apply_softmax=True,
    verbose=True,
)
out = predictor.predict(inp)

# uint8 export of the foreground probability map (reference :124-133)
probmap = (out[0, 1] * 255).astype(np.uint8)
out_path = args.output or (
    os.path.splitext(os.path.expanduser(args.input_path))[0] + "_pred.h5")
save_to_h5(probmap, out_path, hdf5_names=["pred"], overwrite=True)
print(f"Saved prediction to {out_path}")
