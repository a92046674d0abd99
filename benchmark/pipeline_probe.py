#!/usr/bin/env python3
"""Phase-attributed probe of the device-pipeline training path.

The e2e number (train_benchmark.py --device-pipeline) is far below the
device step rate; this probe times each per-batch phase separately so
the gap is attributable (host window sampling? H2D bytes? the warp
device call? the train step? per-call relay RTT?). Mirrors the loader
internals of data/device_pipeline.py and the benchmark's workload.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import time

import numpy as np

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("-d", "--data-root", default="~/neuro_data_u8")
parser.add_argument("--batches", type=int, default=12)
parser.add_argument("--batch", type=int, default=8)
parser.add_argument("--patch", type=int, nargs=3, default=(44, 88, 88))
args = parser.parse_args()

import jax
import jax.numpy as jnp
import optax

from elektronn3_tpu.data.device_pipeline import DeviceWarpPatchLoader
from elektronn3_tpu.data.sources import HDF5DataSource
from elektronn3_tpu.models.unet import UNet
from elektronn3_tpu.modules import CEDiceLoss

root = _os.path.expanduser(args.data_root)
loader = DeviceWarpPatchLoader(
    inputs=[HDF5DataSource(_os.path.join(root, f"raw_{i}.h5"), "raw",
                           in_memory=True) for i in range(2)],
    targets=[HDF5DataSource(_os.path.join(root, f"barrier_int16_{i}.h5"),
                            "lab", in_memory=True) for i in range(2)],
    patch_shape=tuple(args.patch), batch_size=args.batch,
    warp_prob=0.2, warp_kwargs=dict(sample_aniso=True, warp_amount=1.0),
    aniso_factor=2, epoch_size=args.batches,
    normalize=(155.291411, 41.812504),
)

model = UNet(in_channels=1, out_channels=2, n_blocks=4, start_filts=32,
             planar_blocks=(0,), dim=3, normalization="batch",
             dtype=jnp.bfloat16)
shape = (args.batch,) + tuple(args.patch) + (1,)
key = jax.random.PRNGKey(0)
variables = model.init({"params": key}, jnp.zeros(shape, jnp.float32),
                       train=False)
params, batch_stats = variables["params"], variables["batch_stats"]
crit = CEDiceLoss(1.0, 1.0)
tx = optax.adam(1e-3)
opt_state = tx.init(params)

from functools import partial


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


# phase-instrumented replica of DeviceWarpPatchLoader.__iter__
ph = {"host_sample": 0.0, "h2d": 0.0, "warp_call": 0.0,
      "train_call": 0.0, "drain": 0.0}
h2d_bytes = 0
n = 0
first = True
for _ in range(args.batches + 1):  # +1: first batch is compile warmup
    t0 = time.perf_counter()
    ws, tws, ms, los = [], [], [], []
    for _ in range(loader.batch_size):
        w, tw, m, lo = loader._sample_one()
        ws.append(w); ms.append(m); los.append(lo)
        if tw is not None:
            tws.append(tw)
    wsn, twsn = np.stack(ws), np.stack(tws)
    msn, losn = np.stack(ms), np.stack(los)
    t1 = time.perf_counter()
    dws = jax.device_put(wsn)
    dtws = jax.device_put(twsn)
    dms = jax.device_put(msn)
    dlos = jax.device_put(losn)
    jax.block_until_ready((dws, dtws))
    _ = float(dws.ravel()[0].astype(np.float32))  # true sync (axon)
    t2 = time.perf_counter()
    loader._jax_key, k = jax.random.split(loader._jax_key)
    out = loader._device_process(dws, dtws, dms, dlos, k)
    _ = float(out["inp"].ravel()[0].astype(np.float32))
    t3 = time.perf_counter()
    params, batch_stats, opt_state, loss = train_step(
        params, batch_stats, opt_state, out["inp"], out["target"])
    t4 = time.perf_counter()
    lf = float(loss)
    t5 = time.perf_counter()
    if first:
        first = False   # compile warmup excluded from totals
        print(f"warmup batch (compile): {t5 - t0:.1f} s; window "
              f"{wsn.shape} {wsn.dtype} + {twsn.shape} {twsn.dtype} = "
              f"{(wsn.nbytes + twsn.nbytes) / 2**20:.1f} MB/batch",
              flush=True)
        continue
    ph["host_sample"] += t1 - t0
    ph["h2d"] += t2 - t1
    ph["warp_call"] += t3 - t2
    ph["train_call"] += t4 - t3
    ph["drain"] += t5 - t4
    h2d_bytes += wsn.nbytes + twsn.nbytes
    n += 1

tot = sum(ph.values())
vox = n * args.batch * int(np.prod(args.patch))
print(f"{n} batches, {tot:.2f} s total = {tot / n * 1e3:.0f} ms/batch "
      f"({vox / tot / 1e6:.2f} MVx/s e2e serialized)", flush=True)
for k, v in ph.items():
    print(f"  {k:12s} {v / n * 1e3:7.1f} ms/batch", flush=True)
print(f"  h2d rate: {h2d_bytes / ph['h2d'] / 2**20:.0f} MB/s "
      f"({h2d_bytes / n / 2**20:.1f} MB/batch)", flush=True)
print("NOTE: warp_call and train_call here are SERIALIZED with a full "
      "sync each (true per-phase cost incl. relay RTT); the real "
      "loader pipelines them without intermediate syncs.", flush=True)
