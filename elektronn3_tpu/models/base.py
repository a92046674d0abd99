"""Legacy deployment path: InferenceModel.

Reference: elektronn3/models/base.py:16-158 — thin wrapper that loads a
saved model and provides a batched ``predict_proba``. Superseded by
``elektronn3_tpu.inference.Predictor`` (like the reference's own
docstring advises); kept for interface parity.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from elektronn3_tpu import logger


class InferenceModel:
    """Thin inference wrapper around a trained model.

    Args (reference base.py:16-60):
        src: a ``.e3tpu`` model path or a (model, variables) tuple.
        multi_gpu: accepted for API parity; multi-chip inference is done
            with Predictor + mesh sharding instead.
    """

    def __init__(self, src, disable_cuda: bool = False,
                 multi_gpu: bool = True, normalize_func=None):
        import jax
        from elektronn3_tpu.inference import Predictor
        self.normalize_func = normalize_func
        if isinstance(src, tuple):
            model, variables = src
            self.predictor = Predictor(model=model, state=variables,
                                       apply_softmax=True)
        else:
            self.predictor = Predictor(model=src, apply_softmax=True)
        logger.info(f"Inference device: {jax.devices()[0]}")

    def predict_proba(self, inp: np.ndarray, bs: int = 10,
                      verbose: bool = False) -> np.ndarray:
        """Batched softmax prediction (reference base.py:62-116)."""
        self.predictor.batch_size = bs
        self.predictor.verbose = verbose
        if self.normalize_func is not None:
            inp = self.normalize_func(inp)
        return self.predictor.predict(inp)


def load_model(src: str) -> InferenceModel:
    """Load a trained model for inference (reference base.py:118-158)."""
    return InferenceModel(src)
