"""Histogram percentiles must be bit-exact vs numpy on uint8 data."""

import numpy as np
import pytest

from bio_image_unet_tpu.ops.histogram import u8_clip_bounds, u8_counts, u8_percentile

pytestmark = pytest.mark.quick


def test_u8_counts_matches_bincount(rng):
    x = rng.integers(0, 256, (3, 4096 * 2), dtype=np.uint8)
    ours = np.asarray(u8_counts(x))
    for i in range(3):
        np.testing.assert_array_equal(ours[i], np.bincount(x[i], minlength=256))
    # non-divisible fallback path
    y = rng.integers(0, 256, (2, 1000), dtype=np.uint8)
    ours = np.asarray(u8_counts(y))
    for i in range(2):
        np.testing.assert_array_equal(ours[i], np.bincount(y[i], minlength=256))


@pytest.mark.parametrize("qs", [(0.0, 99.8), (0.2, 99.98), (50.0,), (0.0, 100.0)])
def test_u8_percentile_exact(rng, qs):
    frames = rng.integers(0, 256, (4, 37, 53), dtype=np.uint8)
    ours = u8_percentile(frames, qs)
    for j, q in enumerate(qs):
        ref = np.percentile(frames.reshape(4, -1).astype(np.float64), q, axis=1)
        np.testing.assert_allclose(np.asarray(ours[j]), ref, atol=1e-4)


def test_u8_clip_bounds_semantics(rng):
    frames = np.clip(rng.integers(20, 200, (3, 64, 64)), 0, 255).astype(np.uint8)
    lo, hi, fmin, fmax = (np.asarray(v) for v in u8_clip_bounds(frames, 0.2, 99.8))
    for i in range(3):
        f = frames[i].astype(np.float64)
        rlo = np.percentile(f, 0.2)
        rhi = np.percentile(f, 99.8)
        clipped = np.clip(f, rlo, rhi)
        np.testing.assert_allclose(lo[i], rlo, atol=1e-4)
        np.testing.assert_allclose(hi[i], rhi, atol=1e-4)
        np.testing.assert_allclose(fmin[i], clipped.min(), atol=1e-4)
        np.testing.assert_allclose(fmax[i], clipped.max(), atol=1e-4)


def test_int_clip_bounds_u16_matches_numpy(rng):
    """uint16 bit-search percentiles follow numpy's 'linear' rule exactly and
    the post-clip extremes equal numpy's clipped min/max."""
    import numpy as np
    from bio_image_unet_tpu.ops.histogram import int_clip_bounds

    frames = rng.integers(0, 65535, (3, 41, 37), dtype=np.uint16)
    frames[0, :5] = 0          # heavy ties at the bottom
    frames[1, :, :4] = 65535   # and at the top
    lo, hi, fmin, fmax = (np.asarray(v) for v in
                          int_clip_bounds(frames, 0.3, 99.7, n_bits=16))
    for i, f in enumerate(frames):
        want_lo = np.percentile(f.astype(np.float64), 0.3)
        want_hi = np.percentile(f.astype(np.float64), 99.7)
        # order stats are exact ints; the linear-rule blend runs in float32,
        # whose eps at 65k magnitude is ~8e-3
        assert abs(lo[i] - want_lo) < 0.02, (i, lo[i], want_lo)
        assert abs(hi[i] - want_hi) < 0.02, (i, hi[i], want_hi)
        clipped = np.clip(f.astype(np.float64), want_lo, want_hi)
        assert abs(fmin[i] - clipped.min()) < 0.02
        assert abs(fmax[i] - clipped.max()) < 0.02


def test_int_clip_bounds_u8_agrees_with_u8_path(rng):
    """The generic bit-search agrees with the dedicated 256-bin uint8 path."""
    import numpy as np
    from bio_image_unet_tpu.ops.histogram import int_clip_bounds, u8_clip_bounds

    frames = rng.integers(0, 255, (4, 33, 29), dtype=np.uint8)
    a = [np.asarray(v) for v in u8_clip_bounds(frames, 0.0, 99.8)]
    b = [np.asarray(v) for v in int_clip_bounds(frames, 0.0, 99.8, n_bits=8)]
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-5)


def test_float_clip_bounds_matches_numpy(rng):
    """The sortable-bits float search must reproduce numpy's float64
    percentiles (selection is exact; only the final linear-rule blend runs
    in float32) across signs, magnitudes, duplicates and constants."""
    import numpy as np

    from bio_image_unet_tpu.ops.histogram import float_clip_bounds

    cases = [
        ("positive", rng.random((3, 41, 37)).astype(np.float32) * 1000),
        ("mixed-sign", (rng.standard_normal((2, 53, 29)) * 50).astype(np.float32)),
        ("tiny", rng.random((1, 7, 5)).astype(np.float32) * 1e-6),
        ("constant", np.full((2, 16, 16), 3.25, np.float32)),
        ("duplicates", rng.integers(0, 5, (2, 32, 32)).astype(np.float32)),
        ("signed-zero", np.where(rng.random((1, 16, 16)) > 0.5, 0.0,
                                 -0.0).astype(np.float32)),
    ]
    for name, frames in cases:
        lo, hi, fmin, fmax = (np.asarray(v)
                              for v in float_clip_bounds(frames, 0.2, 99.8))
        want_lo = np.percentile(frames.astype(np.float64), 0.2, axis=(1, 2))
        want_hi = np.percentile(frames.astype(np.float64), 99.8, axis=(1, 2))
        scale = max(float(np.abs(want_hi).max()), 1e-9)
        assert np.abs(lo - want_lo).max() <= 1e-6 * scale, name
        assert np.abs(hi - want_hi).max() <= 1e-6 * scale, name
        for i, f in enumerate(frames):
            clipped = np.clip(f.astype(np.float64), want_lo[i], want_hi[i])
            assert abs(fmin[i] - clipped.min()) <= 1e-6 * scale, name
            assert abs(fmax[i] - clipped.max()) <= 1e-6 * scale, name


def test_f32_sortable_transform_roundtrip_and_order(rng):
    """The IEEE-754 sortable transform is a bijection whose uint32 order
    equals float order — the property the float bit search stands on."""
    import numpy as np

    from bio_image_unet_tpu.ops.histogram import _f32_sortable, _f32_unsortable

    vals = np.array([-np.inf, -1e30, -1.5, -1e-40, -0.0, 0.0, 1e-40, 0.5,
                     1.5, 1e30, np.inf], np.float32)
    vals = np.concatenate([vals, (rng.standard_normal(100) * 1e3).astype(np.float32)])
    u = np.asarray(_f32_sortable(vals))
    back = np.asarray(_f32_unsortable(u))
    # bijection (−0.0 and +0.0 map to distinct codes but equal floats)
    np.testing.assert_array_equal(back, vals)
    # order isomorphism: sorting the codes sorts the floats
    order_f = np.sort(vals)
    order_u = back[np.argsort(u, kind="stable")]
    np.testing.assert_array_equal(np.sort(order_u), order_f)
    assert np.all(np.diff(order_u.astype(np.float64)) >= 0)
