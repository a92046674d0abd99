"""Random parameter samplers for augmentations.

Reference: elektronn3/data/transforms/random.py:9-72 (scipy.stats
wrappers). Rebuilt on numpy Generators for seedability.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np


class RandomSampler:
    """Base class: wraps a distribution; ``__call__`` draws a sample."""

    def __init__(self, rng: Optional[np.random.Generator] = None):
        self.rng = rng or np.random.default_rng()

    def __call__(self, shape=None):
        raise NotImplementedError


class Normal(RandomSampler):
    def __init__(self, mean: float = 0.0, sigma: float = 1.0,
                 bounds: Optional[Sequence[float]] = None, rng=None):
        super().__init__(rng)
        self.mean, self.sigma, self.bounds = mean, sigma, bounds

    def __call__(self, shape=None):
        x = self.rng.normal(self.mean, self.sigma, shape)
        if self.bounds is not None:
            x = np.clip(x, *self.bounds)
        return x


class HalfNormal(RandomSampler):
    def __init__(self, sigma: float = 1.0,
                 bounds: Optional[Sequence[float]] = None, rng=None):
        super().__init__(rng)
        self.sigma, self.bounds = sigma, bounds

    def __call__(self, shape=None):
        x = np.abs(self.rng.normal(0.0, self.sigma, shape))
        if self.bounds is not None:
            x = np.clip(x, *self.bounds)
        return x


class RandInt(RandomSampler):
    def __init__(self, low: int = 0, high: int = 2, rng=None):
        super().__init__(rng)
        self.low, self.high = low, high

    def __call__(self, shape=None):
        return self.rng.integers(self.low, self.high, shape)


class Uniform(RandomSampler):
    def __init__(self, low: float = 0.0, high: float = 1.0, rng=None):
        super().__init__(rng)
        self.low, self.high = low, high

    def __call__(self, shape=None):
        return self.rng.uniform(self.low, self.high, shape)
