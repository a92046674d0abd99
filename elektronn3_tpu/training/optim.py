"""Optimizers: optax builders, Padam, and Stochastic Weight Averaging.

Reference counterparts:
- Padam: elektronn3/training/padam.py:12-96 (partially adaptive Adam,
  arXiv:1806.06763) — here as an optax gradient transformation.
- SWA: elektronn3/training/swa.py:12-341 (vendored torchcontrib) — here
  as a functional parameter-average state + BN re-estimation that is
  exact CMA over the data (not EMA).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# Padam
# ---------------------------------------------------------------------------

class ScaleByPadamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_padam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                   partial: float = 0.125) -> optax.GradientTransformation:
    """Partially adaptive Adam with the exact reference update rule
    (padam.py:79-94):

    ``p -= lr * sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v) + eps)^(2*partial)``

    partial in (0, 0.5]; partial=0.5 == Adam, partial→0 == SGD+momentum.
    """

    def init_fn(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return ScaleByPadamState(jnp.zeros([], jnp.int32), mu, nu)

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * (g * g), state.nu, updates)
        count = state.count + 1
        bc1 = 1 - b1 ** count
        bc2 = 1 - b2 ** count
        step_scale = jnp.sqrt(bc2) / bc1
        updates = jax.tree_util.tree_map(
            lambda m, v: step_scale * m / jnp.power(
                jnp.sqrt(jnp.maximum(v, 0.0)) + eps, 2 * partial),
            mu, nu)
        return updates, ScaleByPadamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def padam(learning_rate, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, partial: float = 0.125,
          weight_decay: float = 0.0) -> optax.GradientTransformation:
    txs = [scale_by_padam(b1, b2, eps, partial)]
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*txs)


# ---------------------------------------------------------------------------
# SWA
# ---------------------------------------------------------------------------

class SWA:
    """Stochastic Weight Averaging over a params pytree.

    Manual mode (parity with reference swa.py auto/manual split — the
    reference examples use manual mode): call :meth:`update_swa` at the
    points you want to average (e.g. LR minima), then
    :meth:`swap_swa_sgd` to exchange current and averaged params.
    """

    def __init__(self):
        self.n_avg = 0
        self.avg_params = None
        self._swapped = False
        self._stash = None

    def update_swa(self, params):
        """Incorporate ``params`` into the running average
        (reference swa.py:176-180, CMA update swa.py:252-258)."""
        if self.avg_params is None:
            # Force a copy: jnp.asarray on a same-dtype array aliases the
            # input buffer, which may be donated (deleted) by the next
            # jitted train step.
            self.avg_params = jax.tree_util.tree_map(
                lambda p: jnp.array(p, jnp.float32, copy=True), params)
            self.n_avg = 1
            return
        n = self.n_avg
        self.avg_params = jax.tree_util.tree_map(
            lambda a, p: (a * n + p.astype(jnp.float32)) / (n + 1),
            self.avg_params, params)
        self.n_avg += 1

    def swap_swa_sgd(self, params):
        """Return the averaged params (and remember the given params so a
        second call swaps back). Reference swa.py:182-203."""
        if self.avg_params is None:
            return params
        if not self._swapped:
            self._stash = params
            self._swapped = True
            return self.avg_params
        self._swapped = False
        out = self._stash
        self._stash = None
        return out


def bn_update(loader, apply_fn: Callable, params, batch_stats,
              max_batches: Optional[int] = None):
    """Re-estimate BatchNorm running statistics with a true cumulative
    moving average over the loader's batches.

    Reference swa.py:269-313 (torchcontrib bn_update). Because flax
    BatchNorm applies a fixed EMA momentum m
    (new = m*old + (1-m)*batch), we recover each batch's raw statistics
    from the EMA update and CMA-average them exactly:
    ``batch_stat = (new - m*old) / (1-m)``.

    Args:
        loader: iterable of batches with 'inp' channels-last arrays.
        apply_fn: ``apply_fn({'params', 'batch_stats'}, inp, train=True,
            mutable=['batch_stats'])``.
        params: model params.
        batch_stats: current batch stats pytree.
        max_batches: optional cap on number of batches used.

    Returns:
        Updated batch_stats pytree.
    """
    momentum = 0.9  # must match get_normalization's BatchNorm momentum
    cma = None
    n = 0
    for i, batch in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        inp = batch["inp"] if isinstance(batch, dict) else batch
        _, mut = apply_fn({"params": params, "batch_stats": batch_stats},
                          inp, train=True, mutable=["batch_stats"])
        new_stats = mut["batch_stats"]
        raw = jax.tree_util.tree_map(
            lambda new, old: (new - momentum * old) / (1 - momentum),
            new_stats, batch_stats)
        if cma is None:
            cma = raw
        else:
            cma = jax.tree_util.tree_map(
                lambda c, r: (c * n + r) / (n + 1), cma, raw)
        n += 1
    return batch_stats if cma is None else cma
