#!/usr/bin/env python3
"""Coverage-matrix step benchmark: measures the steady-state train-step
wall time of non-headline UNet/ResUNet configurations on the real chip,
so every fused-planning decline row in docs/design.md traces to a
MEASURED number instead of a "pending" note (round-4 review items 3/4).

Rows this feeds (docs/design.md "Fused executor coverage"):
  --conv-mode valid           the reference's first-class valid mode
                              (reference unet.py:774-814) on the XLA
                              executor
  --model resunet --res-blocks 1   residual stacks (reference
                              resunet.py:257) on the XLA executor
  --sf 64                     start_filts=64 models: C=128 decoder
                              merge conv under the VMEM gate
  --norm group                group norm via per-sample fused stats

Method matches bench.py: jit train step with donated state, cycling
device-resident batches, warmup, runtime-measured sync overhead
subtracted. Prints one JSON line.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import time
from functools import partial

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--model", choices=["unet", "resunet"],
                    default="unet")
parser.add_argument("--conv-mode", choices=["same", "valid"],
                    default="same")
parser.add_argument("--res-blocks", type=int, default=0)
parser.add_argument("--sf", type=int, default=32)
parser.add_argument("--norm", default="batch")
parser.add_argument("--pallas", choices=["auto", "off", "force"],
                    default="auto")
parser.add_argument("--batch", type=int, default=8)
parser.add_argument("--patch", type=int, nargs=3, default=(44, 88, 88))
parser.add_argument("--steps", type=int, default=30)
parser.add_argument("--f32", action="store_true")
args = parser.parse_args()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from elektronn3_tpu.modules import CEDiceLoss
from elektronn3_tpu.utils.timing import sync_overhead_s

pallas_flat = {"auto": "auto", "off": False, "force": True}[args.pallas]
dtype = jnp.float32 if args.f32 else jnp.bfloat16
kw = dict(in_channels=1, out_channels=2, n_blocks=4,
          start_filts=args.sf, planar_blocks=(0,), dim=3,
          normalization=args.norm, conv_mode=args.conv_mode,
          dtype=dtype, pallas_flat=pallas_flat)
if args.model == "resunet":
    from elektronn3_tpu.models.resunet import ResUNet
    model = ResUNet(enc_res_blocks=args.res_blocks,
                    dec_res_blocks=args.res_blocks, **kw)
else:
    from elektronn3_tpu.models.unet import UNet
    model = UNet(**kw)

shape = (args.batch,) + tuple(args.patch) + (1,)
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
variables = model.init({"params": key, "dropout": key},
                       jnp.zeros(shape, jnp.float32), train=False)
params = variables["params"]
batch_stats = variables.get("batch_stats", {})
out_shape = jax.eval_shape(
    lambda v, x: model.apply(v, x, train=False), variables,
    jnp.zeros(shape, jnp.float32)).shape
print(f"in {shape} -> out {out_shape}", flush=True)

crit = CEDiceLoss(1.0, 1.0)
tx = optax.adam(1e-3)
opt_state = tx.init(params)

tgt_shape = out_shape[:-1]
batches = [
    (jnp.asarray(rng.normal(size=shape), jnp.float32),
     jnp.asarray(rng.integers(0, 2, size=tgt_shape)))
    for _ in range(3)]
x, y = batches[0]


@partial(jax.jit, donate_argnums=(0, 1, 2))
def train_step(params, batch_stats, opt_state, x, y):
    def loss_fn(p):
        out, mut = model.apply(
            {"params": p, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"])
        return crit(out, y).astype(jnp.float32), \
            mut.get("batch_stats", {})

    (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(g, opt_state)
    params = optax.apply_updates(params, updates)
    return params, new_bs, opt_state, loss


for _ in range(3):
    params, batch_stats, opt_state, loss = train_step(
        params, batch_stats, opt_state, x, y)
float(loss)
rtt = sync_overhead_s()

t0 = time.perf_counter()
for i in range(args.steps):
    x, y = batches[i % len(batches)]
    params, batch_stats, opt_state, loss = train_step(
        params, batch_stats, opt_state, x, y)
final_loss = float(loss)
dt = time.perf_counter() - t0 - rtt
assert np.isfinite(final_loss), final_loss

step_ms = dt / args.steps * 1e3
in_vox = int(np.prod(shape))
out_vox = int(np.prod(tgt_shape))
print(json.dumps({
    "config": {"model": args.model, "conv_mode": args.conv_mode,
               "res_blocks": args.res_blocks, "sf": args.sf,
               "norm": args.norm, "pallas": args.pallas,
               "dtype": "f32" if args.f32 else "bf16",
               "patch": list(args.patch), "batch": args.batch},
    "step_ms": round(step_ms, 2),
    "in_mvox_s": round(in_vox / (step_ms / 1e3) / 1e6, 2),
    "out_mvox_s": round(out_vox / (step_ms / 1e3) / 1e6, 2),
    "out_shape": list(out_shape),
    "sync_overhead_ms": round(rtt * 1e3, 2),
}))
