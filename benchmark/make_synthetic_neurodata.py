"""Generate a synthetic stand-in for the neuro_data_cdhw benchmark
dataset (reference examples/train_unet_neurodata.py data layout:
raw_{i}.h5 key 'raw' float32, barrier_int16_{i}.h5 key 'lab' int16).

The real dataset is not redistributable / downloadable in this
environment; this produces structured volumes (smoothed noise with
thresholded 'barrier' labels) with the same file/key layout and
realistic value ranges so the FULL data pipeline (HDF5 windows +
coordinate warping + augmentation) does representative work.
"""

import argparse
import os

import h5py
import numpy as np


def make_cube(rng, shape=(160, 448, 448), uint8=False):
    # Smooth multi-scale noise -> membrane-ish structures
    small = rng.normal(size=(shape[0] // 8, shape[1] // 16,
                             shape[2] // 16)).astype(np.float32)
    # cheap trilinear-ish upsample by repetition + box smoothing
    vol = np.repeat(np.repeat(np.repeat(small, 8, 0), 16, 1), 16, 2)
    for ax in range(3):
        vol = (vol + np.roll(vol, 1, ax) + np.roll(vol, -1, ax)) / 3.0
    lab = (np.abs(vol) < 0.25).astype(np.int16)  # 'barrier' where ridge
    raw = (155.0 + 41.0 * vol + 5.0 * rng.normal(size=shape)
           ).astype(np.float32)
    if uint8:
        # EM-realistic storage (KNOSSOS/real acquisitions ship uint8):
        # exercises the device pipeline's native-dtype H2D path
        # (1 byte/voxel instead of 4).
        raw = np.clip(np.rint(raw), 0, 255).astype(np.uint8)
    return raw, lab


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--out", default="~/neuro_data_cdhw")
    p.add_argument("-n", "--n-cubes", type=int, default=2)
    p.add_argument("--shape", type=int, nargs=3, default=(160, 448, 448))
    p.add_argument("--uint8", action="store_true",
                   help="store raw as uint8 (EM-realistic; enables the "
                        "device pipeline's 1-byte/voxel H2D path)")
    args = p.parse_args()
    out = os.path.expanduser(args.out)
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(args.n_cubes):
        raw, lab = make_cube(rng, tuple(args.shape), uint8=args.uint8)
        with h5py.File(os.path.join(out, f"raw_{i}.h5"), "w") as f:
            f.create_dataset("raw", data=raw)
        with h5py.File(os.path.join(out, f"barrier_int16_{i}.h5"),
                       "w") as f:
            f.create_dataset("lab", data=lab)
        print(f"cube {i}: raw {raw.shape} lab fg "
              f"{lab.mean():.3f}")


if __name__ == "__main__":
    main()
