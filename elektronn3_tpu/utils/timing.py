"""Timing helpers for honest device benchmarks.

The axon relay used in this environment adds a ~35 ms round trip to
every device->host fetch; a timing loop with one final drain read
therefore carries that RTT as bias. Instead of hardcoding the
environment-specific constant, `sync_overhead_s` MEASURES the fetch
overhead at runtime, so benchmarks stay correct on a direct-attached
TPU host (overhead ~= 0) and through the relay alike.
"""

from __future__ import annotations

import time

import jax.numpy as jnp


def sync_overhead_s(probe_reps: int = 5) -> float:
    """Measured device->host drain-read overhead (seconds).

    Times a tiny dispatch + host read `probe_reps` times and returns
    the minimum — exactly the cost a benchmark's final `float(loss)`
    sync pays on top of device time. A fresh scalar is produced per
    rep so no host-side value cache can short-circuit the fetch.
    """
    float(jnp.zeros((), jnp.float32) + 1.0)  # warm dispatch/fetch path
    ts = []
    for i in range(probe_reps):
        t0 = time.perf_counter()
        float(jnp.full((), float(i), jnp.float32) + 1.0)
        ts.append(time.perf_counter() - t0)
    return min(ts)
