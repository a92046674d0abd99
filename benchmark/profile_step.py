"""Capture a jax profiler trace of the headline train step (fused
executor) and print a per-op time breakdown from the trace protos.

Usage: PYTHONPATH=... python benchmark/profile_step.py [--out DIR]
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import glob
import gzip
import time
from collections import defaultdict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from elektronn3_tpu.models.unet import UNet
from elektronn3_tpu.modules import CEDiceLoss

p = argparse.ArgumentParser()
p.add_argument("--out", default="/tmp/e3tpu_trace")
p.add_argument("--pallas_flat", default="auto")
args = p.parse_args()

BATCH, PATCH = 8, (44, 88, 88)
pf = {"auto": "auto", "true": True, "false": False}[
    str(args.pallas_flat).lower()]

model = UNet(in_channels=1, out_channels=2, n_blocks=4, start_filts=32,
             planar_blocks=(0,), dim=3, normalization="batch",
             dtype=jnp.bfloat16, pallas_flat=pf)
crit = CEDiceLoss(1.0, 1.0)
shape = (BATCH,) + PATCH + (1,)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=shape), jnp.float32)
y = jnp.asarray(rng.integers(0, 2, size=shape[:-1]))
key = jax.random.PRNGKey(0)
variables = model.init({"params": key, "dropout": key},
                       jnp.zeros(shape, jnp.float32), train=False)
params, batch_stats = variables["params"], variables["batch_stats"]
tx = optax.adam(1e-3)
opt_state = tx.init(params)


@partial(jax.jit, donate_argnums=(0, 1, 2))
def train_step(params, batch_stats, opt_state, x, y):
    def loss_fn(pp):
        out, mut = model.apply(
            {"params": pp, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"])
        return crit(out, y).astype(jnp.float32), mut["batch_stats"]
    (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(g, opt_state)
    params = optax.apply_updates(params, updates)
    return params, new_bs, opt_state, loss


for _ in range(3):
    params, batch_stats, opt_state, loss = train_step(
        params, batch_stats, opt_state, x, y)
print("warm loss", float(loss))

jax.profiler.start_trace(args.out)
for _ in range(5):
    params, batch_stats, opt_state, loss = train_step(
        params, batch_stats, opt_state, x, y)
print("traced loss", float(loss))
jax.profiler.stop_trace()

# Parse the xplane proto for per-op durations.
time.sleep(1)
planes = glob.glob(args.out + "/**/*.xplane.pb", recursive=True)
print("xplane files:", planes)
try:
    from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa
except Exception:
    _pywrap_profiler = None

try:
    from xprof.convert import raw_to_tool_data  # noqa
    have_xprof = True
except Exception:
    have_xprof = False
print("xprof available:", have_xprof)
