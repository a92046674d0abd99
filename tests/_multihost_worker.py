"""Worker process for the 2-process multi-host rehearsal test.

Each process owns 4 virtual CPU devices (8 global). Rehearses the
documented deployment recipe (parallel/distributed.py module docstring):
init_distributed -> make_global_mesh -> host_local_batch -> jitted
train step with dp sharding. Prints per-step losses and a final param
checksum; the parent asserts both processes agree (the gradient
all-reduce crossed the process boundary).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

process_id = int(sys.argv[1])
port = sys.argv[2]

from elektronn3_tpu.parallel.distributed import (  # noqa: E402
    init_distributed, make_global_mesh, host_local_batch, num_processes)

ok = init_distributed(coordinator_address=f"127.0.0.1:{port}",
                      num_processes=2, process_id=process_id)
assert ok and num_processes() == 2, (ok, num_processes())
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from elektronn3_tpu.models.unet import UNet  # noqa: E402
from elektronn3_tpu.modules import CrossEntropyLoss  # noqa: E402

mesh = make_global_mesh()
assert mesh.devices.size == 8

model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
             planar_blocks=(0,), dim=3, normalization="batch")
crit = CrossEntropyLoss()
GLOBAL_BATCH = 8
LOCAL_BATCH = GLOBAL_BATCH // 2
shape = (GLOBAL_BATCH, 2, 8, 8, 1)

key = jax.random.PRNGKey(0)
variables = model.init({"params": key}, jnp.zeros(shape, jnp.float32),
                       train=False)
replicated = NamedSharding(mesh, P())
params = jax.device_put(variables["params"], replicated)
batch_stats = jax.device_put(variables["batch_stats"], replicated)
tx = optax.sgd(1e-2)
opt_state = jax.device_put(tx.init(params), replicated)

@jax.jit
def train_step(params, batch_stats, opt_state, x, y):
    def loss_fn(p):
        out, mut = model.apply({"params": p, "batch_stats": batch_stats},
                               x, train=True, mutable=["batch_stats"])
        return crit(out, y).astype(jnp.float32), mut["batch_stats"]
    (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(g, opt_state)
    params = optax.apply_updates(params, updates)
    return params, new_bs, opt_state, loss

rng = np.random.default_rng(7)  # same stream on both hosts; each host
losses = []
with mesh:
    for step in range(2):
        x_global = rng.normal(size=shape).astype(np.float32)
        y_global = rng.integers(0, 2, size=shape[:-1])
        lo = process_id * LOCAL_BATCH
        # ... feeds ONLY its local shard of the global batch:
        x = host_local_batch(shape, x_global[lo:lo + LOCAL_BATCH], mesh)
        y = host_local_batch(shape[:-1], y_global[lo:lo + LOCAL_BATCH],
                             mesh)
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x, y)
        losses.append(float(loss))

checksum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                     for l in jax.tree_util.tree_leaves(params)))
print(f"RESULT {process_id} losses={losses[0]:.6f},{losses[1]:.6f} "
      f"checksum={checksum:.6f}", flush=True)
