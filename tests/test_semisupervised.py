"""Semi-supervised (FixMatch) training path test."""

import numpy as np

from elektronn3_tpu.data.cnndata import Dataset
from elektronn3_tpu.models.unet import UNet
from elektronn3_tpu.modules import CrossEntropyLoss, FixMatchSegLoss
from elektronn3_tpu.training import Trainer


class Labeled2d(Dataset):
    def __init__(self, n=8, size=16, seed=0):
        rng = np.random.default_rng(seed)
        self.inps = rng.normal(size=(n, 1, size, size)).astype(np.float32)
        self.targets = (self.inps[:, 0] > 0).astype(np.int64)

    def __getitem__(self, i):
        return {"inp": self.inps[i], "target": self.targets[i]}

    def __len__(self):
        return len(self.inps)


class Unlabeled2d(Dataset):
    def __init__(self, n=8, size=16, seed=5):
        rng = np.random.default_rng(seed)
        self.inps = rng.normal(size=(n, 1, size, size)).astype(np.float32)

    def __getitem__(self, i):
        return {"inp": self.inps[i]}

    def __len__(self):
        return len(self.inps)


def test_fixmatch_semisupervised_training(tmp_path):
    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
                 dim=2, normalization="none")
    tr = Trainer(
        model=model,
        criterion=CrossEntropyLoss(),
        ss_criterion=FixMatchSegLoss(confidence_threshold=0.6),
        train_dataset=Labeled2d(),
        unlabeled_dataset=Unlabeled2d(),
        batch_size=4,
        save_root=str(tmp_path), exp_name="fixmatch",
        enable_tensorboard=False)
    tr.run(max_steps=4)
    assert tr.step >= 4
    assert np.isfinite(tr.history.loss.ema or 0.0)
