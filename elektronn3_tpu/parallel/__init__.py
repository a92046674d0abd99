"""Device meshes, shardings and halo exchange (multi-chip scaling)."""

from elektronn3_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_mesh,
    make_mesh,
    replicated,
)
from elektronn3_tpu.parallel.halo import (
    exchange_halo,
    sharded_spatial_apply,
)
from elektronn3_tpu.parallel.distributed import (
    host_local_batch,
    init_distributed,
    make_global_mesh,
)
