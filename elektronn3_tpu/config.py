"""Serializable run configuration (dataclass layer).

The reference's "config system" is argparse + inline Python in each
driver script (SURVEY.md §5: no config files). This layer keeps
"config is Python" but makes runs serializable and reproducible: a
``TrainingConfig`` round-trips through JSON, is archived into the run
directory by the Trainer's Backup, and can rebuild the model/optimizer/
scheduler/trainer it describes.

Example::

    cfg = TrainingConfig(
        model=ModelConfig("UNet", dict(in_channels=1, out_channels=2,
                                       n_blocks=4, planar_blocks=(0,),
                                       dim=3)),
        optimizer=OptimizerConfig("adamw", lr=1e-3),
        batch_size=8, max_steps=2000)
    cfg.save("run.json")
    trainer = TrainingConfig.load("run.json").build_trainer(
        train_dataset=ds, criterion=crit)
    trainer.run(cfg.max_steps)
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Tuple

MODEL_REGISTRY = {}


def _models():
    """Lazy model registry (name -> constructor)."""
    if not MODEL_REGISTRY:
        from elektronn3_tpu.models import (
            fcn, fcn_2d, msdnet, resunet, simple, tiramisu, unet,
            unet3d_lite, vnet)
        MODEL_REGISTRY.update({
            "UNet": unet.UNet,
            "ResUNet": resunet.ResUNet,
            "VNet": vnet.VNet,
            "FCN32s3d": fcn.fcn32s,
            "FCN16s3d": fcn.fcn16s,
            "FCN8s3d": fcn.fcn8s,
            "FCN32s": fcn_2d.FCN32s,
            "FCN16s": fcn_2d.FCN16s,
            "FCN8s": fcn_2d.FCN8s,
            "FCDenseNet": tiramisu.FCDenseNet,
            "MSDNet": msdnet.MSDNet,
            "UNet3dLite": unet3d_lite.UNet3dLite,
            "Simple3DNet": simple.Simple3DNet,
            "Extended3DNet": simple.Extended3DNet,
            "N3DNet": simple.N3DNet,
            "StackedConv2Scalar": simple.StackedConv2Scalar,
        })
    return MODEL_REGISTRY


OPTIMIZERS = ("adam", "adamw", "sgd", "padam")


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if hasattr(obj, "item") and getattr(obj, "ndim", 1) == 0:
        return obj.item()
    return obj


def _canonical(obj):
    """JSON has no tuples: canonicalize all sequences to tuples so
    configs compare equal across serialization roundtrips."""
    if isinstance(obj, dict):
        return {k: _canonical(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return tuple(_canonical(v) for v in obj)
    return obj


@dataclasses.dataclass
class ModelConfig:
    name: str = "UNet"
    kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    dtype: str = "float32"  # 'float32' | 'bfloat16'

    def __post_init__(self):
        self.kwargs = _canonical(self.kwargs)

    def build(self):
        import jax.numpy as jnp
        cls = _models()[self.name]
        kw = dict(self.kwargs)
        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        try:
            return cls(dtype=dt, **kw)
        except TypeError:
            return cls(**kw)


@dataclasses.dataclass
class OptimizerConfig:
    name: str = "adamw"
    lr: float = 1e-3
    kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def build(self):
        import optax
        from elektronn3_tpu.training.optim import padam
        if self.name not in OPTIMIZERS:
            raise ValueError(f"Unknown optimizer {self.name!r}; "
                             f"choose from {OPTIMIZERS}")
        base = {"adam": optax.adam, "adamw": optax.adamw,
                "sgd": optax.sgd, "padam": padam}[self.name]
        return optax.inject_hyperparams(base)(
            learning_rate=self.lr, **self.kwargs)


@dataclasses.dataclass
class SchedulerConfig:
    name: str = "constant"  # constant | step | exp | cyclic | cosine
    kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def build(self, lr: float):
        from elektronn3_tpu.training import schedulers as S
        table = {
            "constant": S.ConstantLR,
            "step": S.StepLR,
            "exp": S.ExponentialLR,
            "cyclic": S.CyclicLR,
            "cosine": getattr(S, "CosineAnnealingLR", S.ConstantLR),
        }
        if self.name not in table:
            raise ValueError(f"Unknown scheduler {self.name!r}")
        cls = table[self.name]
        kw = {k: v for k, v in self.kwargs.items()
              if k not in ("lr", "base_lr")}
        return cls(self.kwargs.get("base_lr", self.kwargs.get("lr", lr)),
                   **kw)


@dataclasses.dataclass
class TrainingConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optimizer: OptimizerConfig = dataclasses.field(
        default_factory=OptimizerConfig)
    scheduler: Optional[SchedulerConfig] = None
    batch_size: int = 1
    num_workers: int = 0
    worker_type: str = "thread"
    max_steps: int = 500_000
    max_runtime: int = 3600 * 24 * 4
    save_root: Optional[str] = None
    exp_name: Optional[str] = None
    seed: int = 0
    trainer_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)

    # -- serialization --------------------------------------------------

    def to_dict(self) -> Dict[str, Any]:
        return _jsonable(dataclasses.asdict(self))

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainingConfig":
        d = dict(d)
        d["model"] = ModelConfig(**d.get("model", {}))
        d["optimizer"] = OptimizerConfig(**d.get("optimizer", {}))
        sched = d.get("scheduler")
        d["scheduler"] = SchedulerConfig(**sched) if sched else None
        return cls(**d)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "TrainingConfig":
        return cls.from_dict(json.loads(s))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "TrainingConfig":
        with open(path) as f:
            return cls.from_json(f.read())

    # -- builders --------------------------------------------------------

    def build_model(self):
        return self.model.build()

    def build_trainer(self, criterion, train_dataset=None,
                      valid_dataset=None, **overrides):
        from elektronn3_tpu.training import Trainer
        model = self.build_model()
        schedulers = None
        if self.scheduler is not None:
            schedulers = {"lr": self.scheduler.build(self.optimizer.lr)}
        kw = dict(
            model=model,
            criterion=criterion,
            optimizer=self.optimizer.build(),
            train_dataset=train_dataset,
            valid_dataset=valid_dataset,
            batch_size=self.batch_size,
            num_workers=self.num_workers,
            worker_type=self.worker_type,
            lr=self.optimizer.lr,
            schedulers=schedulers,
            save_root=self.save_root,
            exp_name=self.exp_name,
            seed=self.seed,
            hparams=self._hparams(),
        )
        kw.update(self.trainer_kwargs)
        kw.update(overrides)
        trainer = Trainer(**kw)
        # Archive the config into the run dir for exact reproduction.
        try:
            self.save(f"{trainer.save_path}/config.json")
        except OSError:
            pass
        return trainer

    def _hparams(self) -> Dict[str, Any]:
        """Flat scalar view for tensorboard add_hparams."""
        flat = {
            "model": self.model.name,
            "optimizer": self.optimizer.name,
            "lr": self.optimizer.lr,
            "batch_size": self.batch_size,
            "seed": self.seed,
        }
        for k, v in self.model.kwargs.items():
            if isinstance(v, (int, float, str, bool)):
                flat[f"model/{k}"] = v
        return flat
