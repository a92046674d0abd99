"""Inference engine (L4). Deliberately self-contained (reference
elektronn3/inference/__init__.py:4-5)."""

from elektronn3_tpu.inference.inference import (
    DEFAULT_AUGMENTATIONS_2D,
    DEFAULT_AUGMENTATIONS_3D,
    Predictor,
    tiled_apply,
)
