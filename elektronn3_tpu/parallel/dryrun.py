"""Multi-chip dry run: jit the full training step over an n-device mesh.

This is the body behind ``__graft_entry__.dryrun_multichip``. It
validates that the framework's multi-chip shardings compile and execute
on an ``n_devices`` mesh without requiring real TPU chips (the caller
bootstraps a virtual CPU mesh; see ``__graft_entry__``).

Covered shardings (the parallelism axes that exist for this model
family — SURVEY.md §2.2: the reference's only multi-device path is
``nn.DataParallel``; TP/PP/EP are structurally absent for <=100M-param
U-Nets):

- **dp**: batch sharded over the 'data' mesh axis; XLA inserts the
  gradient all-reduce (psum) over ICI.
- **fsdp-style param sharding**: large conv kernels sharded over 'data'
  on the output-channel axis; XLA inserts all-gathers on use and
  reduce-scatters on the gradient.
- **sp (spatial)**: the volume's H axis sharded over a 'space' axis
  with explicit ppermute halo exchange (elektronn3_tpu.parallel.halo) —
  the spatial analog of sequence parallelism (SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np


def _fsdp_spec(value, n_shards: int, axis: str = "data",
               min_size: int = 512):
    """PartitionSpec for one param leaf: shard the out-channel (last)
    axis of large kernels over ``axis``; replicate everything else.
    Only shards axes evenly divisible by the mesh axis size."""
    from jax.sharding import PartitionSpec as P

    if (value.ndim >= 2 and value.size >= min_size
            and value.shape[-1] % n_shards == 0):
        return P(*((None,) * (value.ndim - 1) + (axis,)))
    return P()


def run_dryrun(n_devices: int) -> None:
    """Run one training step (dp + fsdp sharding) and one spatially
    sharded forward pass on an ``n_devices`` mesh. Raises on failure."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from elektronn3_tpu.models.unet import UNet
    from elektronn3_tpu.modules import (
        CombinedLoss,
        CrossEntropyLoss,
        DiceLoss,
    )
    from elektronn3_tpu.parallel import make_mesh, sharded_spatial_apply

    devices_avail = jax.devices()
    if len(devices_avail) < n_devices:
        raise RuntimeError(
            f"run_dryrun({n_devices}) needs {n_devices} devices but only "
            f"{len(devices_avail)} are visible")
    devices = np.array(devices_avail[:n_devices])
    mesh = Mesh(devices, axis_names=("data",))
    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
                 planar_blocks=(0,), dim=3, normalization="batch")
    crit = CombinedLoss([CrossEntropyLoss(), DiceLoss()])
    batch = n_devices * 2
    shape = (batch, 4, 16, 16, 1)

    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros(shape, jnp.float32), train=False)

    # FSDP-style sharding for large kernels, replication for the rest.
    param_shardings = jax.tree_util.tree_map(
        lambda v: NamedSharding(mesh, _fsdp_spec(v, n_devices)),
        variables["params"])
    params = jax.tree_util.tree_map(
        jax.device_put, variables["params"], param_shardings)
    batch_stats = jax.device_put(variables["batch_stats"], replicated)
    tx = optax.adam(1e-3)
    # Optimizer moments mirror the param shardings (param-shaped leaves
    # inherit the param sharding; scalars/counters replicate).
    opt_shardings = _broadcast_opt_shardings(
        tx, variables["params"], param_shardings, replicated)
    opt_state = jax.tree_util.tree_map(
        jax.device_put, tx.init(params), opt_shardings)

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.normal(size=shape), jnp.float32), data_sharding)
    y = jax.device_put(
        jnp.asarray(rng.integers(0, 2, size=shape[:-1])), data_sharding)

    @jax.jit
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

    with mesh:
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x, y)
        jax.block_until_ready(loss)
    assert np.isfinite(float(loss)), "multichip dry run produced NaN loss"

    # Spatial sharding path (the SP analog, SURVEY.md §5): shard the H
    # axis over a 'space' mesh with ppermute halo exchange and run the
    # model forward on the sharded volume.
    n_space = min(4, n_devices)
    space_mesh = make_mesh({"space": n_space},
                           devices=list(devices_avail[:n_space]))
    params_local = jax.device_put(
        jax.tree_util.tree_map(np.asarray, params))
    bs_local = jax.device_put(jax.tree_util.tree_map(np.asarray,
                                                     batch_stats))
    variables_eval = {"params": params_local, "batch_stats": bs_local}

    def fwd(t):
        return model.apply(variables_eval, t, train=False)

    sharded_fwd = sharded_spatial_apply(
        fwd, space_mesh, halo=4, spatial_axis=2, axis_name="space")
    xs = jnp.asarray(rng.normal(size=(1, 4, 16 * n_space, 16, 1)),
                     jnp.float32)
    out = jax.jit(sharded_fwd)(xs)
    jax.block_until_ready(out)
    assert np.all(np.isfinite(np.asarray(out))), \
        "spatial-sharded forward produced non-finite values"

    # Tile-grid-parallel inference (SURVEY.md §7 step 6): the Predictor
    # shards the batched tile grid over the 'data' mesh axis — the
    # TPU-native replacement for DataParallel batched inference.
    from elektronn3_tpu.inference import Predictor

    pred = Predictor(
        model=model, state=variables_eval, tile_shape=(4, 16, 16),
        overlap_shape=(2, 4, 4), mesh=mesh, shard_mode="tiles")
    tin = np.asarray(rng.normal(size=(1, 1, 8, 32, 32)), np.float32)
    tout = pred.predict(tin)
    assert np.all(np.isfinite(tout)), \
        "tile-sharded inference produced non-finite values"


def _broadcast_opt_shardings(tx, params, param_shardings, replicated):
    """Shardings for the optimizer state: param-shaped leaves inherit
    the param sharding, everything else replicates."""
    import jax

    flat_params, _ = jax.tree_util.tree_flatten(params)
    flat_shard, _ = jax.tree_util.tree_flatten(param_shardings)
    shape_to_shard = {}
    for p, s in zip(flat_params, flat_shard):
        shape_to_shard.setdefault(np.shape(p), s)

    opt_state = tx.init(jax.tree_util.tree_map(np.asarray, params))
    return jax.tree_util.tree_map(
        lambda v: shape_to_shard.get(np.shape(v), replicated), opt_state)
