"""Headline benchmark: 3D U-Net training throughput (voxels/sec/chip).

Replicates the reference's train_benchmark workload
(/root/reference/benchmark/train_benchmark.py:30-31,96-107,184,293:
3D U-Net n_blocks=4, planar_blocks=(0,), start_filts=32, patch
(44, 88, 88), batch 8, CE+Dice loss) as a steady-state measurement of
the jit-compiled training step on one TPU chip, bf16 compute.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline note: the reference publishes no numbers (BASELINE.md). The
``vs_baseline`` denominator is a documented estimate of the reference's
throughput on its target GPU (V100-class, AMP): ~3.2 it/s * 2.72 MVx =
8.7 MVx/s. See BASELINE.md for the metric definition
(running_vx_size / elapsed, trainer.py:587,607).
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from elektronn3_tpu.models.unet import UNet
from elektronn3_tpu.modules import CEDiceLoss
from elektronn3_tpu.utils.timing import sync_overhead_s

REFERENCE_GPU_BASELINE_VOX_S = 8.7e6  # documented estimate, see docstring

BATCH = 8
PATCH = (44, 88, 88)
WARMUP = 3
STEPS = 50
N_BATCHES = 5  # distinct pre-staged (x, y) pairs cycled through the run


def main():
    model = UNet(in_channels=1, out_channels=2, n_blocks=4, start_filts=32,
                 planar_blocks=(0,), dim=3, normalization="batch",
                 dtype=jnp.bfloat16)
    crit = CEDiceLoss(1.0, 1.0)
    shape = (BATCH,) + PATCH + (1,)

    # Varying inputs (round-3 review): the step's compute is
    # data-independent, but cycling distinct device-resident batches
    # removes any fixed-input asterisk at zero H2D cost in the loop.
    rng = np.random.default_rng(0)
    batches = [
        (jnp.asarray(rng.normal(size=shape), jnp.float32),
         jnp.asarray(rng.integers(0, 2, size=shape[:-1])))
        for _ in range(N_BATCHES)]
    x, y = batches[0]

    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros(shape, jnp.float32), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            return crit(out, y).astype(jnp.float32), mut["batch_stats"]

        (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    # Warmup (compile + stabilize). Sync via an actual host read of the
    # loss — on the experimental axon platform block_until_ready may not
    # block reliably, but a D2H transfer always does.
    for _ in range(WARMUP):
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x, y)
    float(loss)

    # Measure the drain-read (device->host fetch) overhead at runtime
    # instead of hardcoding the relay's RTT — ~0 on a real TPU host,
    # ~35 ms through the axon relay (docs/design.md "Measurement
    # calibration"). It is host-link cost, not device time.
    rtt = sync_overhead_s()

    t0 = time.perf_counter()
    for i in range(STEPS):
        x, y = batches[i % N_BATCHES]
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x, y)
    final_loss = float(loss)  # full pipeline drain
    dt_raw = time.perf_counter() - t0
    dt = dt_raw - rtt
    assert np.isfinite(final_loss)

    vox_per_step = int(np.prod(shape))
    vox_s = vox_per_step * STEPS / dt
    print(json.dumps({
        "metric": "unet3d_train_voxels_per_sec_chip",
        "value": round(vox_s, 1),
        "unit": "vox/s",
        "vs_baseline": round(vox_s / REFERENCE_GPU_BASELINE_VOX_S, 3),
        "raw_value": round(vox_per_step * STEPS / dt_raw, 1),
        "sync_overhead_ms": round(rtt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
