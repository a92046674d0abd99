"""Device-memory debugging utilities.

The TPU-native analog of the reference's ``findcudatensors()``
(trainer.py:1048-1071: enumerate live CUDA tensors for leak hunting).
"""

from __future__ import annotations

import gc
from typing import List, Tuple

import numpy as np

from elektronn3_tpu import logger


def find_live_arrays(min_bytes: int = 0) -> List[Tuple[Tuple, str, int]]:
    """Enumerate live jax.Array objects (shape, dtype, nbytes), largest
    first — for device-memory leak hunting. Reference parity:
    trainer.findcudatensors (trainer.py:1048-1071)."""
    import jax
    found = []
    total = 0
    for obj in gc.get_objects():
        try:
            if isinstance(obj, jax.Array) and not obj.is_deleted():
                nbytes = int(np.prod(obj.shape)) * obj.dtype.itemsize
                if nbytes >= min_bytes:
                    found.append((tuple(obj.shape), str(obj.dtype), nbytes))
                    total += nbytes
        except Exception:
            continue
    found.sort(key=lambda t: -t[2])
    logger.info(f"Found {len(found)} live arrays, "
                f"{total / 1e6:.1f} MB total")
    return found


def device_memory_stats() -> dict:
    """Per-device memory statistics (bytes in use / limit) where the
    backend exposes them."""
    import jax
    stats = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": ms.get("bytes_in_use"),
                "peak_bytes_in_use": ms.get("peak_bytes_in_use"),
                "bytes_limit": ms.get("bytes_limit"),
            }
        except Exception:
            stats[str(d)] = {}
    return stats
