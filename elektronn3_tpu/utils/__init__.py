from elektronn3_tpu.utils.debug import (
    device_memory_stats,
    find_live_arrays,
)
