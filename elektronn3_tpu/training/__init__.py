"""Training (L5). Public interface parity with reference
elektronn3/training/__init__.py:1-3."""

from elektronn3_tpu.training.trainer import (
    export_stablehlo,
    load_stablehlo,
    Backup,
    NaNException,
    Trainer,
    TrainState,
    load_model,
    save_model,
)
from elektronn3_tpu.training.optim import SWA, bn_update, padam, scale_by_padam
from elektronn3_tpu.training.noise2void import Noise2VoidTrainer
from elektronn3_tpu.training.triplettrainer import TripletTrainer
from elektronn3_tpu.training._trainer_multi import TrainerMulti
from elektronn3_tpu.training.recalibration import recalibrate_bn
from elektronn3_tpu.training import metrics
from elektronn3_tpu.training import schedulers
from elektronn3_tpu.training.schedulers import (
    ConstantLR,
    CosineAnnealingLR,
    CyclicLR,
    ExponentialLR,
    ReduceLROnPlateau,
    SGDR,
    StepLR,
)
