#!/usr/bin/env python3
"""Standalone offline validation of a trained model over a PatchCreator
dataset with a metric dict.

Port of the reference examples/validate.py:27-117.
"""

import argparse
import os

import numpy as np

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("model_path", help="model*.e3tpu file")
parser.add_argument("-d", "--data-root", default="~/neuro_data_cdhw")
parser.add_argument("-i", "--valid-indices", type=int, nargs="+",
                    default=[2])
parser.add_argument("-n", "--num-batches", type=int, default=10)
parser.add_argument("-b", "--batch-size", type=int, default=4)
args = parser.parse_args()

import jax.numpy as jnp

from elektronn3_tpu.data import DataLoader, PatchCreator, transforms
from elektronn3_tpu.training import load_model, metrics

data_root = os.path.expanduser(args.data_root)
input_h5data = [(os.path.join(data_root, f"raw_{i}.h5"), "raw")
                for i in args.valid_indices]
target_h5data = [(os.path.join(data_root, f"barrier_int16_{i}.h5"), "lab")
                 for i in args.valid_indices]

dataset = PatchCreator(
    input_sources=input_h5data,
    target_sources=target_h5data,
    patch_shape=(44, 88, 88),
    aniso_factor=2,
    train=False,
    epoch_size=args.num_batches * args.batch_size,
    transform=transforms.Compose([
        transforms.SqueezeTarget(dim=0),
        transforms.Normalize(mean=155.291411, std=41.812504),
    ]),
)

model, variables, info = load_model(os.path.expanduser(args.model_path))
valid_metrics = {
    "val_accuracy": metrics.Accuracy(),
    "val_precision": metrics.Precision(),
    "val_recall": metrics.Recall(),
    "val_DSC": metrics.DSC(),
    "val_IoU": metrics.IoU(),
}

loader = DataLoader(dataset, batch_size=args.batch_size, num_workers=2,
                    shuffle=False, seed=0)
outs, targets = [], []
for batch in loader:
    out = model.apply(variables, jnp.asarray(batch["inp"]), train=False)
    outs.append(np.asarray(out))
    targets.append(np.asarray(batch["target"]))
out_full = np.concatenate(outs)
target_full = np.concatenate(targets)
print(f"Validated on {out_full.shape[0]} patches:")
for name, ev in valid_metrics.items():
    print(f"  {name}: {float(ev(target_full, out_full)):.2f}")
