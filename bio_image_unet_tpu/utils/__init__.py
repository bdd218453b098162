from .metrics import dice_coefficient, iou, pixel_accuracy
from .synth import blob_sample
from .utils import (
    enable_compilation_cache,
    get_device,
    init_weights,
    png_to_grayscale_tiff,
    save_as_tif,
)

__all__ = [
    "save_as_tif",
    "png_to_grayscale_tiff",
    "get_device",
    "init_weights",
    "enable_compilation_cache",
    "iou",
    "dice_coefficient",
    "pixel_accuracy",
    "blob_sample",
]
