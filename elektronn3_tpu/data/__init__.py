"""Data pipeline (L4').

Public interface parity with reference elektronn3/data/__init__.py:1-3.
"""

from elektronn3_tpu.data.cnndata import (
    PatchCreator,
    Reconstruction2d,
    Segmentation2d,
    SimpleNeuroData2d,
    TripletData2d,
    calculate_class_weights,
    get_preview_batch,
)
from elektronn3_tpu.data.device_pipeline import DeviceWarpPatchLoader
from elektronn3_tpu.data.pipeline import (
    DataLoader,
    default_collate,
    prefetch_to_device,
    to_channels_last,
)
from elektronn3_tpu.data.sources import (
    ArrayDataSource,
    DataSource,
    HDF5DataSource,
    slice_3d,
)
