"""Handlers, plotting, train utils, debug utils tests."""

import numpy as np


def test_accumulation_array_and_history():
    from elektronn3_tpu.training.train_utils import (
        AccumulationArray, HistoryTracker, Timer, pretty_string_time)
    acc = AccumulationArray(n_init=2)
    for i in range(10):
        acc.append(float(i))
    assert len(acc) == 10
    assert acc.mean() == 4.5
    assert acc.max() == 9
    h = HistoryTracker()
    h.update_timeline([0.0, 1.0, 2.0])
    assert len(h.loss) == 1
    assert pretty_string_time(10) == "10 s"
    assert pretty_string_time(5000).endswith("h")
    t = Timer()
    assert t.t_passed >= 0


def test_sma():
    from elektronn3_tpu.training.plotting import sma
    x = np.arange(10, dtype=float)
    s = sma(x, 3)
    assert len(s) == 10
    assert np.isclose(s[-1], (7 + 8 + 9) / 3)


def test_plot_hist(tmp_path):
    from elektronn3_tpu.training.plotting import plot_hist
    timeline = np.stack([np.arange(100),
                         np.random.default_rng(0).random(100),
                         np.ones(100)], 1)
    out = str(tmp_path / "hist.png")
    plot_hist(timeline, save_name=out)
    import os
    assert os.path.isfile(out)


def test_plot_image():
    from elektronn3_tpu.training.handlers import (
        plot_image, _get_batch2img_function)
    img = np.random.default_rng(0).random((16, 16))
    fig = plot_image(img, overlay=(img > 0.5).astype(int))
    assert fig is not None
    b5 = np.zeros((2, 3, 4, 8, 8))
    f = _get_batch2img_function(b5)
    assert f(b5).shape == (3, 8, 8)
    b4 = np.zeros((2, 3, 8, 8))
    f = _get_batch2img_function(b4)
    assert f(b4).shape == (3, 8, 8)


def test_debug_utils():
    import jax.numpy as jnp
    from elektronn3_tpu.utils import device_memory_stats, find_live_arrays
    keep = jnp.ones((128, 128))
    arrays = find_live_arrays(min_bytes=1)
    assert any(a[0] == (128, 128) for a in arrays)
    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1


def test_backup(tmp_path):
    from elektronn3_tpu.training import Backup
    import os
    b = Backup(__file__, str(tmp_path))
    b.archive_backup()
    files = os.listdir(tmp_path)
    assert any(f.endswith(".tar.gz") for f in files)
    assert any(f.endswith(".backup") for f in files)


def test_calculate_offset():
    from elektronn3_tpu.data.utils import calculate_offset

    def fake_model(x):
        return x[:, 2:-2, 3:-3, :]

    off = calculate_offset(fake_model, (1, 16, 16, 1))
    assert tuple(off) == (2, 3)


def test_squash01_and_class_weights(rng):
    from elektronn3_tpu.data.utils import (
        calculate_class_weights, get_class_counts, squash01)
    x = rng.normal(size=(8, 8)) * 7
    s = squash01(x)
    assert s.min() == 0 and s.max() == 1
    targets = [np.array([0, 0, 0, 1])]
    counts, summary = get_class_counts(targets)
    assert counts.tolist() == [3, 1]
    w = calculate_class_weights(targets, mode="inverse")
    assert w[1] > w[0]
    w2 = calculate_class_weights(targets, mode="binmean")
    assert len(w2) == 2


def test_training_config_roundtrip_and_build(tmp_path):
    """Dataclass config layer (SURVEY §5 rebuild note): JSON roundtrip
    + model/optimizer/scheduler/trainer reconstruction."""
    import numpy as np
    from elektronn3_tpu.config import (
        ModelConfig, OptimizerConfig, SchedulerConfig, TrainingConfig)
    from elektronn3_tpu.modules import CrossEntropyLoss

    cfg = TrainingConfig(
        model=ModelConfig("UNet", dict(
            in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
            planar_blocks=(0,), dim=3)),
        optimizer=OptimizerConfig("adamw", lr=5e-4),
        scheduler=SchedulerConfig("step", dict(step_size=10, gamma=0.5)),
        batch_size=2, num_workers=0, max_steps=3, seed=1,
        save_root=str(tmp_path), exp_name="cfg_test",
        trainer_kwargs=dict(enable_tensorboard=False))

    cfg2 = TrainingConfig.from_json(cfg.to_json())
    assert cfg2 == cfg

    model = cfg2.build_model()
    assert model.n_blocks == 2 and model.planar_blocks == (0,)

    class DS:
        def __getitem__(self, i):
            r = np.random.default_rng(i)
            inp = r.normal(size=(1, 4, 8, 8)).astype(np.float32)
            return {"inp": inp, "target": (inp[0] > 0).astype(np.int64)}

        def __len__(self):
            return 4

    trainer = cfg2.build_trainer(criterion=CrossEntropyLoss(),
                                 train_dataset=DS())
    import os
    assert os.path.exists(os.path.join(trainer.save_path, "config.json"))
    loaded = TrainingConfig.load(
        os.path.join(trainer.save_path, "config.json"))
    assert loaded.optimizer.lr == 5e-4
    trainer.run(max_steps=2)  # one tiny smoke step through the config
