"""Noise2Void / Triplet / TrainerMulti / recalibration tests."""

import numpy as np
import pytest

from elektronn3_tpu.data.cnndata import Dataset
from elektronn3_tpu.models.unet import UNet


class RawOnly2d(Dataset):
    def __init__(self, n=8, size=16, seed=0):
        rng = np.random.default_rng(seed)
        self.inps = rng.normal(size=(n, 1, size, size)).astype(np.float32)

    def __getitem__(self, i):
        return {"inp": self.inps[i]}

    def __len__(self):
        return len(self.inps)


class Triplets2d(Dataset):
    def __init__(self, n=8, size=16, seed=0):
        rng = np.random.default_rng(seed)
        self.data = rng.normal(size=(n, 3, 1, size, size)).astype(
            np.float32)

    def __getitem__(self, i):
        a, p, n_ = self.data[i]
        return {"anchor": a, "pos": p, "neg": n_}

    def __len__(self):
        return len(self.data)


class Seg2dWithMeta(Dataset):
    def __init__(self, n=8, size=16, seed=0):
        rng = np.random.default_rng(seed)
        self.inps = rng.normal(size=(n, 1, size, size)).astype(np.float32)
        self.targets = (self.inps[:, 0] > 0).astype(np.int64)

    def __getitem__(self, i):
        return {"inp": self.inps[i], "target": self.targets[i],
                "cube_meta": np.array(1.0, np.float32)}

    def __len__(self):
        return len(self.inps)


def test_n2v_mask_generation(rng):
    from elektronn3_tpu.training.noise2void import (
        get_stratified_coords,
        prepare_sample,
    )
    coords = get_stratified_coords(0.01, (64, 64),
                                   rng=np.random.default_rng(0))
    assert len(coords) == 2 and len(coords[0]) > 10
    inp = rng.normal(size=(1, 32, 32)).astype(np.float32)
    masked, target, mask = prepare_sample(inp, ratio=0.01)
    assert np.allclose(target, inp)
    assert mask.sum() > 0
    # masked differs from input exactly where mask can be set
    diff = (masked != inp)
    assert np.all(mask[diff] == 1.0)


def test_noise2void_trainer(tmp_path):
    from elektronn3_tpu.training.noise2void import Noise2VoidTrainer
    model = UNet(in_channels=1, out_channels=1, n_blocks=2, start_filts=4,
                 dim=2, normalization="none")
    tr = Noise2VoidTrainer(
        model=model, criterion=None, train_dataset=RawOnly2d(),
        valid_dataset=RawOnly2d(n=4, seed=1), batch_size=4,
        n2v_ratio=0.01, save_root=str(tmp_path), exp_name="n2v",
        enable_tensorboard=False)
    tr.run(max_steps=4)
    assert tr.step >= 4


def test_triplet_trainer(tmp_path):
    from elektronn3_tpu.training.triplettrainer import TripletTrainer
    model = UNet(in_channels=1, out_channels=4, n_blocks=2, start_filts=4,
                 dim=2, normalization="none")
    tr = TripletTrainer(
        model=model, criterion=None, train_dataset=Triplets2d(),
        valid_dataset=Triplets2d(n=4, seed=1), batch_size=4,
        save_root=str(tmp_path), exp_name="triplet",
        enable_tensorboard=False,
        example_input=np.zeros((1, 16, 16, 1), np.float32))
    tr.run(max_steps=4)
    assert tr.step >= 4


def test_trainer_multi_grad_accum(tmp_path):
    from elektronn3_tpu.modules import CrossEntropyLoss
    from elektronn3_tpu.training._trainer_multi import TrainerMulti
    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
                 dim=2, normalization="none")
    tr = TrainerMulti(
        model=model, criterion=CrossEntropyLoss(),
        train_dataset=Seg2dWithMeta(), batch_size=2,
        optimizer_iterations=2, save_root=str(tmp_path), exp_name="multi",
        enable_tensorboard=False)
    tr.run(max_steps=2)
    # 2 optimizer steps from 4 micro-batches
    assert tr.step >= 2


def test_recalibrate_bn(tmp_path, rng):
    import jax.numpy as jnp
    from elektronn3_tpu.data.pipeline import DataLoader
    from elektronn3_tpu.models.unet import init_unet
    from elektronn3_tpu.training.recalibration import recalibrate_bn

    model = UNet(in_channels=1, out_channels=2, n_blocks=1, start_filts=4,
                 dim=2, normalization="batch")
    variables = init_unet(model, (2, 16, 16, 1))
    ds = Seg2dWithMeta(n=8)
    loader = DataLoader(ds, batch_size=4, num_workers=0, seed=0)
    new_vars = recalibrate_bn(model, dict(variables), loader,
                              max_batches=2)
    # Stats changed and stayed finite
    import jax
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_vars["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))
    assert all(np.all(np.isfinite(b)) for b in new)


def test_trainer_with_device_pipeline(tmp_path, rng):
    """Trainer accepts a loader-style dataset (DeviceWarpPatchLoader)."""
    import numpy as np
    from elektronn3_tpu.data.device_pipeline import DeviceWarpPatchLoader
    from elektronn3_tpu.data.sources import ArrayDataSource
    from elektronn3_tpu.modules import CrossEntropyLoss
    from elektronn3_tpu.training import Trainer

    vol = rng.normal(size=(48, 64, 64)).astype(np.float32)
    lab = (vol > 0).astype(np.float32)
    loader = DeviceWarpPatchLoader(
        inputs=[ArrayDataSource(vol)], targets=[ArrayDataSource(lab)],
        patch_shape=(8, 16, 16), batch_size=2, epoch_size=3,
        warp_prob=0.3, seed=0)
    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
                 dim=3, normalization="none")
    tr = Trainer(
        model=model, criterion=CrossEntropyLoss(),
        train_dataset=loader, batch_size=2,
        example_input=np.zeros((1, 8, 16, 16, 1), np.float32),
        save_root=str(tmp_path), exp_name="devpipe",
        enable_tensorboard=False)
    tr.run(max_steps=3)
    assert tr.step >= 3
