"""Model zoo (L3). Flagship: ``elektronn3_tpu.models.unet.UNet``.

Like the reference (elektronn3/models/__init__.py is empty, import by
full path), models are imported from their modules; the most common ones
are also re-exported here for convenience.
"""

from elektronn3_tpu.models.unet import UNet, init_unet
