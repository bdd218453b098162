from .functional import (
    depthwise_xcorr,
    downsample_nearest,
    max_pool,
    resize_linear,
    upsample_nearest,
)
from .blocks import (
    AttentionBlock,
    ConvBlock,
    ConvTranspose,
    FirstVGGBlock,
    TorchBatchNorm,
    VGGBlock,
)
from .stitch import stitch_mean_device

__all__ = [
    "stitch_mean_device",
    "max_pool",
    "depthwise_xcorr",
    "upsample_nearest",
    "downsample_nearest",
    "resize_linear",
    "TorchBatchNorm",
    "ConvBlock",
    "ConvTranspose",
    "AttentionBlock",
    "VGGBlock",
    "FirstVGGBlock",
]
