"""Device-side stitch (XLA fallback path on CPU; the Pallas path compiles on
TPU only) must equal the host stitcher exactly."""

import numpy as np

from bio_image_unet_tpu.ops.stitch import stitch_mean_device
from bio_image_unet_tpu.predict.tiling import grid_starts, stitch_mean


def test_stitch_mean_device_matches_host(rng):
    xs, ys = grid_starts(96, 64), grid_starts(80, 64)
    patches = rng.integers(0, 255, (len(xs) * len(ys), 64, 64, 1)).astype(np.float32)
    host = stitch_mean(patches, (xs, ys), (96, 80))
    dev = np.asarray(stitch_mean_device(patches, (xs, ys), (96, 80)))
    np.testing.assert_allclose(dev, host, rtol=1e-6)


def test_stitch_mean_device_multichannel(rng):
    xs, ys = grid_starts(64, 32, 1), grid_starts(64, 32, 1)
    patches = rng.standard_normal((len(xs) * len(ys), 32, 32, 3)).astype(np.float32)
    host = stitch_mean(patches, (xs, ys), (64, 64))
    dev = np.asarray(stitch_mean_device(patches, (xs, ys), (64, 64)))
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)
