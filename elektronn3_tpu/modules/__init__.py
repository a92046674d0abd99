"""NN building blocks and losses (L2).

Public interface parity with the reference
(elektronn3/modules/__init__.py:1-5).
"""

from elektronn3_tpu.modules.loss import (
    CEDiceLoss,
    ACLoss,
    CombinedLoss,
    CrossEntropyLoss,
    DiceLoss,
    FixMatchSegLoss,
    FocalLoss,
    GAPTripletMarginLoss,
    LovaszLoss,
    MaskedMSELoss,
    MixedCombinedLoss,
    NorpfDiceLoss,
    SoftmaxBCELoss,
    DistanceWeightedMSELoss,
    cross_entropy,
    dice_loss,
    focal_loss,
)
from elektronn3_tpu.modules import layers
from elektronn3_tpu.modules import lovasz
from elektronn3_tpu.modules.layers import (
    GatherExcite,
    GridAttention,
    PReLU,
    RReLU,
    get_activation,
    get_normalization,
)
from elektronn3_tpu.modules.wsconv import WSConv, WSConvTranspose
from elektronn3_tpu.modules.evonorm import EvoNorm
from elektronn3_tpu.modules.l1batchnorm import L1BatchNorm, L1GroupNorm
from elektronn3_tpu.modules.axial_attention import (
    AxialAttention,
    AxialImageTransformer,
    AxialPositionalEmbedding,
    ReversibleSequence,
    SelfAttention,
)
