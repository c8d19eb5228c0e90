from .layers import (
    TorchConv,
    TorchConvTranspose,
    MaskedConv,
    GDN,
    BitEstimator,
    torch_conv_default_init,
    xavier_normal_gain,
)
from .blocks import (
    ResidualBlock,
    ResidualBlock11,
    ResidualBlock33,
    ResidualBlockWithStride,
    ResidualBlockUpsample,
    AttentionBlock,
    SubpelConv,
)

__all__ = [
    "TorchConv",
    "TorchConvTranspose",
    "MaskedConv",
    "GDN",
    "BitEstimator",
    "torch_conv_default_init",
    "xavier_normal_gain",
    "ResidualBlock",
    "ResidualBlock11",
    "ResidualBlock33",
    "ResidualBlockWithStride",
    "ResidualBlockUpsample",
    "AttentionBlock",
    "SubpelConv",
]
