from .utils import get_device, init_weights, png_to_grayscale_tiff, save_as_tif

__all__ = ["save_as_tif", "png_to_grayscale_tiff", "get_device", "init_weights"]
