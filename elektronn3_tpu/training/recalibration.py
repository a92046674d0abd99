"""Post-hoc BatchNorm recalibration on a data loader.

Reference: elektronn3/training/recalibration.py:16-73 — recompute BN
running statistics from data (useful after SWA or domain shift).
Returns updated variables (the JAX analog of "a copy of the model").
"""

from __future__ import annotations

from typing import Optional

from elektronn3_tpu.training.optim import bn_update


def recalibrate_bn(model, variables, loader,
                   max_batches: Optional[int] = 100):
    """Recalculate BatchNorm statistics with a cumulative moving average
    over ``loader``'s batches ('inp' channels-last).

    Returns a new variables dict with updated 'batch_stats'
    (params untouched). Reference recalibration.py:16-50 + _set_bn_cma
    :70 (the CMA trick is exact here; see optim.bn_update).
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    if not batch_stats:
        return dict(variables)
    new_stats = bn_update(loader, model.apply, params, batch_stats,
                          max_batches=max_batches)
    out = dict(variables)
    out["batch_stats"] = new_stats
    return out
