"""I/O and device utilities (reference surface: bio_image_unet/utils/utils.py).

``get_device`` selects a JAX device (TPU → GPU → CPU) instead of the
reference's cuda→mps→cpu torch device (utils/utils.py:56-73); ``init_weights``
returns the He-normal initializer matching the reference's
``nn.init.kaiming_normal_(..., nonlinearity='leaky_relu')`` (utils/utils.py:76-78).
"""

from __future__ import annotations

import numpy as np

from ..data import tiff


def save_as_tif(imgs, filename, normalize: bool = False) -> None:
    """Save a numpy array as a float16 TIFF (reference: utils/utils.py:8-22).

    Unlike the reference — which accepts ``normalize`` but ignores it — setting
    ``normalize=True`` here actually rescales the data to [0, 255].
    """
    imgs = np.asarray(imgs)
    if normalize:
        lo, hi = float(np.nanmin(imgs)), float(np.nanmax(imgs))
        scale = 255.0 / (hi - lo) if hi > lo else 0.0
        imgs = (imgs - lo) * scale
    tiff.imwrite(filename, imgs.astype("float16"))


def png_to_grayscale_tiff(png_filename, tiff_filename) -> None:
    """Read a PNG, convert to grayscale, normalize by its max to [0, 255]
    uint8, save as TIFF (reference: utils/utils.py:25-53)."""
    from PIL import Image

    image = Image.open(png_filename).convert("L")
    arr = np.array(image).astype(np.float64)
    peak = arr.max()
    if peak > 0:
        arr = arr / peak * 255
    tiff.imwrite(tiff_filename, arr.astype(np.uint8))


def enable_compilation_cache(path: str = "/tmp/bio_image_unet_tpu_jax_cache") -> None:
    """Enable XLA's persistent compilation cache: compiled programs survive
    process restarts, which matters enormously on remote/tunneled TPUs where
    a cold U-Net compile costs minutes (production deployments should point
    this at durable storage)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


class no_compilation_cache:
    """Context manager that bypasses the persistent compile cache.

    XLA:CPU AOT cache entries record the build host's CPU features; loading
    one on a different microarchitecture risks SIGILL (observed on this
    heterogeneous fleet).  The cache is enabled for TPU programs, but the
    host-CPU side compiles we do alongside them (parameter init, small
    utility programs) must not read or write it."""

    def __enter__(self):
        import jax

        self._prev = jax.config.jax_compilation_cache_dir
        if self._prev is not None:
            jax.config.update("jax_compilation_cache_dir", None)
        return self

    def __exit__(self, *exc):
        import jax

        if self._prev is not None:
            jax.config.update("jax_compilation_cache_dir", self._prev)
        return False


def get_device(print_device: bool = False):
    """Pick the most capable JAX device: TPU → GPU → CPU (with a warning),
    mirroring the reference's cuda→mps→cpu policy (utils/utils.py:56-73)."""
    import jax

    device = None
    for platform in ("tpu", "gpu"):
        try:
            device = jax.devices(platform)[0]
            break
        except RuntimeError:
            continue
    if device is None:
        device = jax.devices("cpu")[0]
        print(
            "Warning: No TPU or GPU device found. Calculations will run on the CPU, "
            "which might be slower."
        )
    if print_device:
        print(f"Using device: {device}")
    return device


def init_weights(key, shape, dtype=np.float32):
    """He (Kaiming) normal conv-kernel initializer for leaky_relu nonlinearity,
    matching torch ``kaiming_normal_(w, nonlinearity='leaky_relu')`` with its
    default negative_slope 0.01 and fan_in mode (reference: utils/utils.py:76-78).

    Alias of :func:`..ops.blocks.he_normal_leaky` — ONE definition of the
    gain/fan rule so the model blocks and this public utility cannot drift.
    ``shape`` is an HWIO (or DHWIO) kernel shape; fan_in = prod(spatial) * I.
    """
    from ..ops.blocks import he_normal_leaky

    return he_normal_leaky(key, shape, dtype)
