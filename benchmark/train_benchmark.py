#!/usr/bin/env python3
"""Full-stack training benchmark: 2000 steps of the canonical 3D U-Net
workload including the real data pipeline (PatchCreator + warping).

Port of reference benchmark/train_benchmark.py:30-333 (fixed 2000 steps,
model n_blocks=4/planar=(0,)/start_filts=32, patch (44,88,88), batch 8,
CE+Dice, prints wall-clock minutes). ``--bf16`` replaces the reference's
``--amp``; there is no DataParallel flag — multi-chip runs shard the
batch over a Mesh instead (pass --n-devices with a multi-chip runtime).
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import os
import time

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("-d", "--data-root", default="~/neuro_data_cdhw")
parser.add_argument("-m", "--max-steps", type=int, default=2000)
parser.add_argument("--bf16", action="store_true")
parser.add_argument("-j", "--num-workers", type=int, default=4)
parser.add_argument("--synthetic", action="store_true",
                    help="use synthetic data (no neuro_data download)")
parser.add_argument("--device-pipeline", action="store_true",
                    help="use DeviceWarpPatchLoader: warp interpolation "
                         "runs on the TPU; the host only streams HDF5 "
                         "windows (for host-bound machines)")
parser.add_argument("--patch", type=int, nargs=3, default=(44, 88, 88),
                    help="patch shape (smoke tests can shrink this)")
parser.add_argument("--batch", type=int, default=8)
args = parser.parse_args()

import jax.numpy as jnp
import numpy as np

from elektronn3_tpu.data import PatchCreator, transforms
from elektronn3_tpu.models.unet import UNet
from elektronn3_tpu.modules import CombinedLoss, CrossEntropyLoss, DiceLoss
from elektronn3_tpu.training import Trainer

patch_shape = tuple(args.patch)

if args.synthetic:
    from elektronn3_tpu.data.cnndata import Dataset

    class Synthetic3d(Dataset):
        def __init__(self, n=100):
            rng = np.random.default_rng(0)
            self.n = n
            self.vol = rng.normal(size=(1,) + patch_shape).astype(
                np.float32)

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            inp = rng.normal(size=(1,) + patch_shape).astype(np.float32)
            target = (inp[0] > 0).astype(np.int64)
            return {"inp": inp, "target": target}

        def __len__(self):
            return self.n

    train_dataset = Synthetic3d(100)
else:
    data_root = os.path.expanduser(args.data_root)
    input_h5data = [(os.path.join(data_root, f"raw_{i}.h5"), "raw")
                    for i in range(2)]
    target_h5data = [(os.path.join(data_root, f"barrier_int16_{i}.h5"),
                      "lab") for i in range(2)]
    if args.device_pipeline:
        from elektronn3_tpu.data.device_pipeline import DeviceWarpPatchLoader
        from elektronn3_tpu.data.sources import HDF5DataSource

        train_dataset = DeviceWarpPatchLoader(
            inputs=[HDF5DataSource(f, k, in_memory=True)
                    for f, k in input_h5data],
            targets=[HDF5DataSource(f, k, in_memory=True)
                     for f, k in target_h5data],
            patch_shape=patch_shape,
            batch_size=args.batch,
            warp_prob=0.2,
            warp_kwargs=dict(sample_aniso=True, warp_amount=1.0),
            aniso_factor=2,
            epoch_size=200 // args.batch,
            normalize=(155.291411, 41.812504),
        )
    else:
        train_dataset = PatchCreator(
            input_sources=input_h5data,
            target_sources=target_h5data,
            patch_shape=patch_shape,
            aniso_factor=2,
            train=True,
            epoch_size=200,
            target_dtype=np.uint8,
            warp_prob=0.2,
            warp_kwargs=dict(sample_aniso=True, warp_amount=1.0),
            transform=transforms.Compose([
                transforms.SqueezeTarget(dim=0),
                transforms.Normalize(mean=155.291411, std=41.812504),
            ]))

model = UNet(in_channels=1, out_channels=2, n_blocks=4, start_filts=32,
             planar_blocks=(0,), activation="relu", normalization="batch",
             dim=3, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

trainer = Trainer(
    model=model,
    criterion=CombinedLoss([CrossEntropyLoss(), DiceLoss()],
                           weight=[0.5, 0.5]),
    lr=1e-3,
    train_dataset=train_dataset,
    example_input=np.zeros((1,) + patch_shape + (1,), np.float32),
    batch_size=args.batch,
    num_workers=args.num_workers,
    exp_name=f"train_benchmark_{time.strftime('%y%m%d_%H%M%S')}",
    save_root=os.path.expanduser("~/e3tpu_benchmarks"),
    enable_tensorboard=False,
)

start = time.time()
trainer.run(max_steps=args.max_steps)
dt = time.time() - start
vox = args.max_steps * args.batch * int(np.prod(patch_shape))
print(f"Benchmark completed in {dt / 60:.2f} min "
      f"({args.max_steps} steps, {vox / dt / 1e6:.2f} MVx/s)")
