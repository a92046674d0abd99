"""Multi-host (DCN) training setup: jax.distributed + process-aware
meshes.

The reference has no multi-node support at all (SURVEY.md §2.2: its only
multi-device path is single-process nn.DataParallel; Slurm scripts
launch single tasks). The TPU-native story for pod slices and
multi-host CPU/GPU clusters:

1. Every host calls :func:`init_distributed` once before any other jax
   use. On TPU pods the coordinator/process count/process id are
   auto-detected from the TPU metadata; elsewhere pass them explicitly
   (or via Slurm env vars, which jax.distributed also auto-detects).
2. Build a process-aware mesh with :func:`make_global_mesh` — it spans
   jax.devices() across ALL processes, placing the 'data' axis across
   hosts (gradient all-reduce crosses DCN once per step; everything
   else stays on ICI).
3. Feed each host its local batch shard and assemble global arrays with
   :func:`host_local_batch` (jax.make_array_from_process_local_data) —
   each host's DataLoader produces only its share of the global batch.
4. The Trainer is unchanged: pass the global mesh as ``Trainer(mesh=)``.
   XLA partitions the jitted step; collectives ride ICI within a host's
   chips and DCN across hosts.

Deployment sketch (one command per host, e.g. under Slurm)::

    srun python train.py  # each task:
        init_distributed()                       # auto-detect
        mesh = make_global_mesh()                # all chips, 'data' axis
        trainer = Trainer(..., mesh=mesh,
                          batch_size=global_batch // num_processes())

Single-process fallbacks keep everything importable and testable
without a cluster (init is a no-op when world size is 1).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

import jax

from elektronn3_tpu.parallel.mesh import make_mesh


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed (multi-host). Returns True if a
    multi-process runtime was initialized, False for single-process.

    Must run before the backend initializes. Auto-detects cluster
    environment (TPU pod metadata, Slurm, Open MPI) when arguments are
    omitted — see jax.distributed.initialize.
    """
    explicit = coordinator_address is not None
    auto = any(k in os.environ for k in (
        "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE", "TPU_WORKER_HOSTNAMES",
        "MEGASCALE_COORDINATOR_ADDRESS"))
    if not explicit and not auto:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError) as e:
        if explicit:
            raise
        # Cluster-ish env vars present but no usable coordinator (e.g.
        # a single-task Slurm allocation): stay single-process.
        import logging
        logging.getLogger("elektronn3_tpu").info(
            "jax.distributed auto-init unavailable (%s); running "
            "single-process.", e)
        return False
    return jax.process_count() > 1


def num_processes() -> int:
    return jax.process_count()


def make_global_mesh(axes: Optional[Dict[str, int]] = None):
    """Mesh over ALL processes' devices. With ``axes=None``, a 1-D
    'data' mesh over every chip in the job; the device order groups
    each host's chips contiguously, so batch sharding keeps each host's
    shard on its own chips and only the gradient psum crosses DCN."""
    devices = jax.devices()  # global list, process-major order
    return make_mesh(axes, devices=devices)


def host_local_batch(global_shape: Sequence[int], local_np: np.ndarray,
                     mesh, pspec=None):
    """Assemble a globally-sharded array from this process's local
    shard (the per-host DataLoader output).

    Args:
        global_shape: the global batch shape (leading dim = global
            batch size = sum of per-host batch sizes).
        local_np: this host's shard, shape[0] = local batch size.
        mesh: the global mesh.
        pspec: PartitionSpec (default: shard dim 0 over 'data').
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    if pspec is None:
        pspec = P("data")
    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_np), tuple(global_shape))
