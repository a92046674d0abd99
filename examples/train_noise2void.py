#!/usr/bin/env python3
"""Noise2Void self-supervised 3D denoising training.

Port of the reference driver examples/train_noise2void.py:94-315
(PatchCreator raw-only data + Noise2VoidTrainer).
"""

import argparse
import os

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("-n", "--exp-name", default=None)
parser.add_argument("-m", "--max-steps", type=int, default=100_000)
parser.add_argument("-s", "--seed", type=int, default=0)
parser.add_argument("-d", "--data-root", default="~/neuro_data_cdhw")
parser.add_argument("--lr", type=float, default=4e-4)
parser.add_argument("-j", "--num-workers", type=int, default=2)
args = parser.parse_args()

from elektronn3_tpu.data import PatchCreator, transforms
from elektronn3_tpu.models.unet import UNet
from elektronn3_tpu.training import StepLR
from elektronn3_tpu.training.noise2void import Noise2VoidTrainer

data_root = os.path.expanduser(args.data_root)
input_h5data = [(os.path.join(data_root, f"raw_{i}.h5"), "raw")
                for i in range(3)]

norm = transforms.Normalize(mean=155.291411, std=41.812504)
train_dataset = PatchCreator(
    input_sources=input_h5data[:2],
    patch_shape=(32, 64, 64),
    aniso_factor=2,
    train=True,
    epoch_size=100,
    transform=norm)
valid_dataset = PatchCreator(
    input_sources=input_h5data[2:],
    patch_shape=(32, 64, 64),
    aniso_factor=2,
    train=False,
    epoch_size=10,
    transform=norm)

model = UNet(in_channels=1, out_channels=1, n_blocks=3, start_filts=32,
             planar_blocks=(0,), activation="relu",
             normalization="batch", dim=3)

trainer = Noise2VoidTrainer(
    model=model,
    criterion=None,  # replaced internally by masked MSE
    lr=args.lr,
    schedulers={"lr": StepLR(args.lr, step_size=2000, gamma=0.99)},
    train_dataset=train_dataset,
    valid_dataset=valid_dataset,
    batch_size=4,
    num_workers=args.num_workers,
    exp_name=args.exp_name,
    n2v_ratio=0.002,
    seed=args.seed,
)
trainer.run(max_steps=args.max_steps)
