"""Model zoo (L3). Flagship: ``elektronn3_tpu.models.unet.UNet``.

Like the reference (elektronn3/models/__init__.py is empty, import by
full path), models are imported from their modules; common ones are
re-exported here for convenience.
"""

from elektronn3_tpu.models.unet import UNet, init_unet
from elektronn3_tpu.models.resunet import ResUNet
from elektronn3_tpu.models.vnet import VNet
from elektronn3_tpu.models.fcn import fcn8s, fcn16s, fcn32s
from elektronn3_tpu.models.fcn_2d import FCN8s, FCN16s, FCN32s, FCNs, VGGNet
from elektronn3_tpu.models.msdnet import MSDNet
from elektronn3_tpu.models.tiramisu import (
    FCDenseNet,
    FCDenseNet57,
    FCDenseNet67,
    FCDenseNet103,
)
from elektronn3_tpu.models.unet3d_lite import UNet3dLite
from elektronn3_tpu.models.simple import (
    Extended3DNet,
    N3DNet,
    Simple3DNet,
    StackedConv2Scalar,
    StackedConv2ScalarWithLatentAdd,
)
from elektronn3_tpu.models import model_utils
