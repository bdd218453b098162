"""Predict family tests: stitcher semantics vs independent NaN-stack
implementations, end-to-end parity against the torch reference model with
imported weights, and the streaming siam movie path."""

import importlib.util
import os

import numpy as np
import pytest

from bio_image_unet_tpu import checkpoint
from bio_image_unet_tpu.data import tiff
from bio_image_unet_tpu.predict import (
    Predict,
    Predict3D,
    PredictMultiOutput,
    PredictMultiOutput3D,
    PredictSiam,
    grid_starts,
    overlap_starts,
    stitch_blend3d,
    stitch_margin,
    stitch_mean,
)


# --- grids -------------------------------------------------------------------


def test_grid_starts_matches_reference():
    # unet/predict.py:154-172: N = ceil(extent/tile) + add_tile, linspace
    np.testing.assert_array_equal(grid_starts(96, 64, 0), [0, 32])
    np.testing.assert_array_equal(grid_starts(96, 64, 1), [0, 16, 32])
    np.testing.assert_array_equal(grid_starts(64, 64, 0), [0])


def test_overlap_starts_matches_reference():
    # multi_output_unet3d/predict.py:134-148
    assert overlap_starts(100, 32, 0.1) == [0, 28, 56, 68]
    assert overlap_starts(32, 32, 0.5) == [0]


# --- stitchers vs independent NaN-stack implementations -----------------------


def _nanmean_stitch(patches, xs, ys, out_shape):
    """The reference's stitch (unet/predict.py:204-229), literally."""
    stack = np.full((len(patches),) + tuple(out_shape), np.nan, dtype=np.float64)
    n = 0
    for x0 in xs:
        for y0 in ys:
            stack[n, x0 : x0 + patches.shape[1], y0 : y0 + patches.shape[2]] = patches[n, ..., 0]
            n += 1
    return np.nanmean(stack, axis=0)


def test_stitch_mean_equals_nanmean(rng):
    xs, ys = grid_starts(96, 64), grid_starts(80, 64)
    patches = rng.integers(0, 255, (len(xs) * len(ys), 64, 64, 1)).astype(np.float32)
    got = stitch_mean(patches, (xs, ys), (96, 80))[..., 0]
    expected = _nanmean_stitch(patches, xs, ys, (96, 80))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_stitch_margin_constant_patches(rng):
    xs, ys = grid_starts(96, 64), grid_starts(96, 64)
    patches = np.full((len(xs) * len(ys), 64, 64, 1), 7.0, dtype=np.float32)
    out = stitch_margin(patches, (xs, ys), (96, 96), safe_margin=20)
    np.testing.assert_allclose(out, 7.0)


def test_stitch_blend3d_constant(rng):
    zs, xs, ys = [0], overlap_starts(48, 32, 0.25), overlap_starts(48, 32, 0.25)
    n = len(zs) * len(xs) * len(ys)
    patches = np.full((n, 8, 32, 32, 1), 3.0, dtype=np.float32)
    out = stitch_blend3d(patches, (zs, xs, ys), (8, 48, 48), blend_margin=8)
    np.testing.assert_allclose(out, 3.0, rtol=1e-6)


# --- end-to-end parity with the torch reference ------------------------------


def _ref_module(rel):
    spec = importlib.util.spec_from_file_location(
        rel.replace("/", "_"), f"/root/reference/bio_image_unet/{rel}"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch_unet_ckpt(tmp_path_factory):
    import torch

    torch.manual_seed(0)
    mod = _ref_module("unet/unet.py")
    net = mod.Unet(in_channels=1, out_channels=1, n_filter=8)
    net.train()
    with torch.no_grad():
        for _ in range(3):
            net(torch.randn(2, 1, 64, 64))
    net.eval()
    path = str(tmp_path_factory.mktemp("ckpt") / "model.pt")
    torch.save({"state_dict": net.state_dict(), "epoch": 0, "best_loss": 1.0,
                "model_name": "Unet", "n_filter": 8, "in_channels": 1,
                "out_channels": 1}, path)
    return path, net


def test_predict_parity_with_reference(tmp_path, rng, torch_unet_ckpt):
    import torch

    ckpt_path, net = torch_unet_ckpt
    movie = rng.integers(0, 255, (2, 96, 96), dtype=np.uint8)
    out_path = str(tmp_path / "result.tif")
    # pin the host-staged path: this test's <=1 tolerance is the host
    # float64 normalize contract (the auto-enabled fused default is covered
    # by test_device_pipeline_* and test_default_device_pipeline_is_fused)
    pred = Predict(movie, out_path, ckpt_path, resize_dim=(64, 64),
                   show_progress=False, batch_size=4, device_pipeline=False)

    # independent reference computation: normalize per frame, uint8 patches,
    # torch forward per patch, nanmean stitch, uint8 quantization
    from bio_image_unet_tpu.predict.predictor import _normalize_stack

    imgs = _normalize_stack(movie.astype(np.float32), "single", (0.0, 99.8))
    xs, ys = grid_starts(96, 64), grid_starts(96, 64)
    expected = []
    with torch.no_grad():
        for img in imgs:
            patches = []
            for x0 in xs:
                for y0 in ys:
                    p = img[x0 : x0 + 64, y0 : y0 + 64].astype(np.uint8)
                    t = torch.from_numpy(p.astype(np.float32) / 255)[None, None]
                    res = net(t)[0].numpy()[0, 0]
                    patches.append((res * 255).astype(np.uint8)[..., None])
            expected.append(
                _nanmean_stitch(np.stack(patches).astype(np.float32), xs, ys, (96, 96))
            )
    expected = np.stack(expected).astype(np.uint8)
    # allow off-by-one from uint8 rounding of float32-vs-float64 sigmoid tails
    diff = np.abs(pred.result.astype(int) - expected.astype(int))
    assert diff.max() <= 1, diff.max()
    # saved as float16 tif
    saved = tiff.imread(out_path)
    assert saved.dtype == np.float16 and saved.shape == (2, 96, 96)


def test_predict_single_image_and_small_input(tmp_path, rng, torch_unet_ckpt):
    ckpt_path, _ = torch_unet_ckpt
    img = rng.integers(0, 255, (48, 48), dtype=np.uint8)  # smaller than tile
    pred = Predict(img, None, ckpt_path, resize_dim=(64, 64), show_progress=False)
    assert pred.result.shape == (48, 48)


def test_predict_siam_streaming(tmp_path, rng):
    import torch

    torch.manual_seed(0)
    mod = _ref_module("siam_unet/siam_unet.py")
    net = mod.Siam_UNet(n_filter=4, mode="max")
    net.eval()
    ckpt = str(tmp_path / "siam.pt")
    torch.save({"state_dict": net.state_dict(), "model_name": "Siam_UNet",
                "n_filter": 4, "mode": "max"}, ckpt)

    movie_path = str(tmp_path / "movie.tif")
    tiff.imwrite(movie_path, rng.integers(0, 255, (4, 48, 48), dtype=np.uint8))
    out = str(tmp_path / "out.tif")
    PredictSiam(movie_path, out, ckpt, resize_dim=(48, 48), show_progress=False)
    result = tiff.imread(out)
    assert result.shape == (4, 48, 48)

    # single-frame movie pairs frame 0 with itself (siam_unet/predict.py:109-112)
    single_path = str(tmp_path / "single.tif")
    tiff.imwrite(single_path, rng.integers(0, 255, (48, 48), dtype=np.uint8))
    out1 = str(tmp_path / "out1.tif")
    PredictSiam(single_path, out1, ckpt, resize_dim=(48, 48), show_progress=False)
    assert tiff.imread(out1).shape == (48, 48)


def test_predict_3d(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu.models import UNet3D

    model = UNet3D(n_filter=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 1)))
    ckpt = str(tmp_path / "u3d.ckpt")
    checkpoint.save(ckpt, variables, {"model_name": "UNet3D", "n_filter": 4})

    vol = rng.integers(0, 255, (12, 24, 24), dtype=np.uint8)
    pred = Predict3D(vol, str(tmp_path / "r.tif"), ckpt, resize_dim=(8, 16, 16),
                     show_progress=False, batch_size=2)
    assert pred.result.shape == (12, 24, 24)
    assert pred.result.dtype == np.uint8


def test_predict_multi_output(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu.models import MultiOutputUnet

    heads = {"mask": {"channels": 1, "activation": "sigmoid"},
             "orientation": {"channels": 2, "activation": None}}
    model = MultiOutputUnet(n_filter=4, output_heads=heads)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    ckpt = str(tmp_path / "mo.ckpt")
    checkpoint.save(ckpt, variables, {"model_name": "MultiOutputUnet",
                                      "n_filter": 4, "in_channels": 1,
                                      "output_heads": heads})

    imgs = rng.integers(0, 255, (2, 48, 48), dtype=np.uint8)
    pred = PredictMultiOutput(imgs, ckpt, result_path=str(tmp_path / "res"),
                              max_patch_size=(32, 32), show_progress=False,
                              batch_size=4, safe_margin=4)
    assert pred.result["mask"].shape == (2, 48, 48)
    assert pred.result["orientation"].shape == (2, 2, 48, 48)
    assert np.isfinite(pred.result["mask"]).all()
    assert os.path.exists(str(tmp_path / "res" / "mask.tif"))


def test_predict_multi_output_3d(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu.models import MultiOutputUnet3D

    heads = {"mask": {"channels": 1, "activation": "sigmoid"}}
    model = MultiOutputUnet3D(n_filter=4, output_heads=heads)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 1)))
    ckpt = str(tmp_path / "mo3d.ckpt")
    checkpoint.save(ckpt, variables, {"model_name": "MultiOutputUnet3D",
                                      "n_filter": 4, "output_heads": heads})

    vol = rng.integers(0, 255, (12, 24, 24), dtype=np.uint8)
    pred = PredictMultiOutput3D(vol, ckpt, result_path=str(tmp_path / "res"),
                                max_patch_size=(8, 16, 16), overlap_factor=0.25,
                                show_progress=False, batch_size=2, blend_margin=4)
    assert pred.result["mask"].shape == (12, 24, 24)
    assert np.isfinite(pred.result["mask"]).all()


def test_device_pipeline_matches_host_path(tmp_path, rng, torch_unet_ckpt):
    """The fully-fused single-dispatch path equals the host-staged path
    within one uint8 quantization step."""
    ckpt_path, _ = torch_unet_ckpt
    movie = rng.integers(0, 255, (2, 96, 96), dtype=np.uint8)
    host = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                   show_progress=False, batch_size=4, device_pipeline=False)
    fused = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                    show_progress=False, batch_size=4, device_pipeline=True)
    diff = np.abs(host.result.astype(int) - fused.result.astype(int))
    # normalization in f32 (device) vs f64 (host) can shift a clip bound by
    # one code point for a few pixels
    assert np.mean(diff > 1) < 0.01, (diff.max(), np.mean(diff > 1))
    assert diff.max() <= 16


def test_fused_pipeline_compile_count_independent_of_movie_length(
        tmp_path, rng, torch_unet_ckpt):
    """One compiled program serves movies of ANY length ≥ the chunk size:
    the fused pipeline chunks frames at FUSED_CHUNK_FRAMES and pads the tail
    chunk on host, so its cache key (and HLO size) excludes n_frames."""
    from bio_image_unet_tpu.predict.predictor import _Engine

    ckpt_path, _ = torch_unet_ckpt
    chunk = _Engine.FUSED_CHUNK_FRAMES
    kwargs = dict(resize_dim=(64, 64), show_progress=False, batch_size=4,
                  device_pipeline=True)

    movie_a = rng.integers(0, 255, (chunk + 3, 96, 96), dtype=np.uint8)
    n_before = len(_Engine._FUSED_CACHE)
    pred_a = Predict(movie_a, None, ckpt_path, **kwargs)
    n_after_a = len(_Engine._FUSED_CACHE)
    assert n_after_a == n_before + 1

    movie_b = rng.integers(0, 255, (3 * chunk + 7, 96, 96), dtype=np.uint8)
    pred_b = Predict(movie_b, None, ckpt_path, **kwargs)
    assert len(_Engine._FUSED_CACHE) == n_after_a  # no new program

    # the padded tail chunk must not leak pad frames into real results
    host_b = Predict(movie_b, None, ckpt_path, resize_dim=(64, 64), device_pipeline=False,
                     show_progress=False, batch_size=4)
    assert pred_b.result.shape == host_b.result.shape
    diff = np.abs(host_b.result.astype(int) - pred_b.result.astype(int))
    assert np.mean(diff > 1) < 0.01, (diff.max(), np.mean(diff > 1))
    assert pred_a.result.shape[0] == chunk + 3


def test_fused_runner_returns_the_dispatched_program(rng, torch_unet_ckpt):
    """``fused_runner`` (the supported device-resident bench accessor) must
    hand back the SAME compiled program the end-to-end path dispatches —
    bf16 and int8 engines each their own — so benches never time the wrong
    program (round-3 weak spot: benches dug it out of ``_FUSED_CACHE`` with
    a substring heuristic)."""
    import jax.numpy as jnp

    from bio_image_unet_tpu.predict.predictor import _Engine
    from bio_image_unet_tpu.predict.tiling import grid_starts

    ckpt_path, _ = torch_unet_ckpt
    movie = rng.integers(0, 255, (4, 96, 96), dtype=np.uint8)
    xs, ys = grid_starts(96, 64, 0), grid_starts(96, 64, 0)
    args = (xs, ys, (64, 64), (0.0, 99.8))

    eng = _Engine(ckpt_path, None, batch_size=4, half_precision=False)
    fn, chunk = eng.fused_runner(movie, *args)
    assert chunk == 4
    # identity: the e2e path compiles NOTHING new — the runner warmed the
    # exact program it dispatches — and produces the same masks
    n_cache = len(_Engine._FUSED_CACHE)
    out_e2e = eng.fused_predict_frames(movie, *args, False)
    assert len(_Engine._FUSED_CACHE) == n_cache
    out_runner = np.asarray(fn(eng.variables, jnp.asarray(movie)))
    np.testing.assert_array_equal(out_runner, out_e2e)

    eng_q = _Engine(ckpt_path, None, batch_size=4, half_precision=False,
                    quantized=True)
    fn_q, chunk_q = eng_q.fused_runner(movie, *args)
    assert chunk_q == 4
    assert eng_q._quant_ready  # the runner ran int8 calibration
    assert fn_q is not fn      # right program per engine: int8 ≠ bf16
    n_cache = len(_Engine._FUSED_CACHE)
    out_e2e_q = eng_q.fused_predict_frames(movie, *args, False)
    assert len(_Engine._FUSED_CACHE) == n_cache
    out_runner_q = np.asarray(fn_q(eng_q.variables, jnp.asarray(movie)))
    np.testing.assert_array_equal(out_runner_q, out_e2e_q)
    # and int8 really is a different numeric path than bf16 on this input
    assert out_e2e_q.shape == out_e2e.shape


def test_fused_runner_refuses_nan_float_samples(rng, torch_unet_ckpt):
    """The bench accessor has no host-nanpercentile fallback (unlike the
    Predict entry points, which gate the fused float path on a NaN-free
    scan), so NaN float samples — which the device bit search would sort
    above +inf, corrupting the clip bound and any int8 calibration — must
    be refused loudly, not silently mis-measured."""
    from bio_image_unet_tpu.predict.predictor import _Engine
    from bio_image_unet_tpu.predict.tiling import grid_starts

    ckpt_path, _ = torch_unet_ckpt
    movie = rng.random((2, 96, 96)).astype(np.float32)
    movie[1, 10, 10] = np.nan
    xs, ys = grid_starts(96, 64, 0), grid_starts(96, 64, 0)
    eng = _Engine(ckpt_path, None, batch_size=2, half_precision=False)
    with pytest.raises(ValueError, match="NaN"):
        eng.fused_runner(movie, xs, ys, (64, 64), (0.0, 99.8))


def test_device_pipeline_float32_matches_host_path(rng, torch_unet_ckpt):
    """float32 movies (pre-processed microscopy) take the fused device
    pipeline too — per-frame percentiles via the IEEE-754 sortable-bits
    binary search (ops/histogram.float_clip_bounds) — and must match the
    host-staged nanpercentile path within the same one-level contract as the
    integer dtypes (reference normalizes all dtypes uniformly,
    unet/predict.py:122-150)."""
    ckpt_path, _ = torch_unet_ckpt
    base = rng.random((3, 96, 96)).astype(np.float32)
    movie = base * 731.0 - 500.0  # negative values, non-unit range
    kw = dict(resize_dim=(64, 64), show_progress=False, batch_size=4)
    for mode in ("single", "first", "all"):
        host = Predict(movie, None, ckpt_path, device_pipeline=False,
                       normalization_mode=mode, **kw)
        fused = Predict(movie, None, ckpt_path, device_pipeline=True,
                        normalization_mode=mode, **kw)
        diff = np.abs(host.result.astype(int) - fused.result.astype(int))
        assert np.mean(diff > 1) < 0.01, (mode, diff.max())
        assert diff.max() <= 16, mode
    # auto (None) also takes the fused path for float32: bit-identical
    auto = Predict(movie, None, ckpt_path, **kw)
    forced = Predict(movie, None, ckpt_path, device_pipeline=True, **kw)
    np.testing.assert_array_equal(auto.result, forced.result)
    # float64 input is normalized in float32 on device — same contract
    host64 = Predict(movie.astype(np.float64), None, ckpt_path,
                     device_pipeline=False, **kw)
    fused64 = Predict(movie.astype(np.float64), None, ckpt_path,
                      device_pipeline=True, **kw)
    diff = np.abs(host64.result.astype(int) - fused64.result.astype(int))
    assert np.mean(diff > 1) < 0.01


def test_device_pipeline_float_nan_falls_back(rng, torch_unet_ckpt):
    """A float movie carrying NaNs must NOT enter the fused program (NaNs
    sort above +inf in the bit search): auto falls back silently, an
    explicit device_pipeline=True warns naming NaNs, and the host path's
    nanpercentile result is returned either way."""
    ckpt_path, _ = torch_unet_ckpt
    movie = (rng.random((2, 96, 96)) * 200).astype(np.float32)
    movie[1, 10, 10] = np.nan
    auto = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                   show_progress=False, batch_size=4)
    with pytest.warns(UserWarning, match="NaN"):
        forced = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                         show_progress=False, batch_size=4,
                         device_pipeline=True)
    host = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                   show_progress=False, batch_size=4, device_pipeline=False)
    np.testing.assert_array_equal(auto.result, host.result)
    np.testing.assert_array_equal(forced.result, host.result)


def test_int_percentile_matches_numpy(rng):
    """Exact bincount percentiles for integer frames must equal numpy's
    sort-based result (same 'linear' interpolation rule)."""
    from bio_image_unet_tpu.predict.predictor import _int_percentile

    for dtype, lo, hi in ((np.uint8, 0, 256), (np.uint16, 0, 60000),
                          (np.int16, -500, 500)):
        img = rng.integers(lo, hi, (123, 77)).astype(dtype)
        for q in (0.0, 0.2, 50.0, 99.8, 100.0):
            np.testing.assert_allclose(
                _int_percentile(img, q),
                np.percentile(img.astype(np.float64), q), atol=1e-6,
                err_msg=f"{dtype} q={q}")


def test_device_pipeline_exact_grid(tmp_path, rng, torch_unet_ckpt):
    """Frame size an exact multiple of the tile (no overlap): the fused path
    takes the reshape-only tiling/stitch branch and must still match the
    host-staged path."""
    ckpt_path, _ = torch_unet_ckpt
    movie = rng.integers(0, 255, (3, 128, 128), dtype=np.uint8)
    host = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                   show_progress=False, batch_size=4, device_pipeline=False)
    fused = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                    show_progress=False, batch_size=4, device_pipeline=True)
    diff = np.abs(host.result.astype(int) - fused.result.astype(int))
    assert np.mean(diff > 1) < 0.01, (diff.max(), np.mean(diff > 1))
    assert diff.max() <= 16


def test_normalize_stack_modes_and_invert(rng):
    """'single'/'first'/'all' + invert semantics vs a direct numpy oracle
    (reference unet/predict.py:122-150)."""
    from bio_image_unet_tpu.predict.predictor import _normalize_stack

    imgs = rng.integers(0, 200, (3, 40, 40), dtype=np.uint8)

    # single: frame 1 normalized from its own histogram
    out = _normalize_stack(imgs, "single", (2.0, 98.0))
    f = imgs[1].astype(np.float64)
    c = np.clip(f, np.percentile(f, 2.0), np.percentile(f, 98.0))
    ref = (c - c.min()) / (c.max() - c.min()) * 255.0
    np.testing.assert_allclose(out[1], ref, atol=1e-3)

    # first: clip bounds from frame 0, min/max over the whole stack
    out = _normalize_stack(imgs, "first", (2.0, 98.0))
    lo = np.percentile(imgs[0].astype(np.float64), 2.0)
    hi = np.percentile(imgs[0].astype(np.float64), 98.0)
    c = np.clip(imgs.astype(np.float64), lo, hi)
    ref = (c - c.min()) / (c.max() - c.min()) * 255.0
    np.testing.assert_allclose(out, ref, atol=1e-3)

    # all: bounds from the whole stack; invert flips around the scale
    out = _normalize_stack(imgs, "all", (2.0, 98.0), invert=True)
    lo = np.percentile(imgs.astype(np.float64), 2.0)
    hi = np.percentile(imgs.astype(np.float64), 98.0)
    c = np.clip(imgs.astype(np.float64), lo, hi)
    ref = 255.0 - (c - c.min()) / (c.max() - c.min()) * 255.0
    np.testing.assert_allclose(out, ref, atol=1e-3)

    with pytest.raises(ValueError, match="not valid"):
        _normalize_stack(imgs, "bogus", (0, 100))


def test_device_pipeline_invert_matches_host(tmp_path, rng, torch_unet_ckpt):
    ckpt_path, _ = torch_unet_ckpt
    movie = rng.integers(0, 255, (2, 96, 96), dtype=np.uint8)
    host = Predict(movie, None, ckpt_path, resize_dim=(64, 64), invert=True,
                   show_progress=False, batch_size=4, device_pipeline=False)
    fused = Predict(movie, None, ckpt_path, resize_dim=(64, 64), invert=True,
                    show_progress=False, batch_size=4, device_pipeline=True)
    diff = np.abs(host.result.astype(int) - fused.result.astype(int))
    assert np.mean(diff > 1) < 0.01, (diff.max(), np.mean(diff > 1))


def test_int_percentile_signed_wide_range():
    """int8/int16 frames spanning more than the dtype's positive range must
    not wrap in the bincount shift (offset-subtracted cameras emit these)."""
    from bio_image_unet_tpu.predict.predictor import _percentile

    arr16 = np.array([[-30000, 0, 32000, 100, -5, 7]], dtype=np.int16)
    arr8 = np.arange(-128, 128, dtype=np.int8).reshape(16, 16)
    for arr in (arr16, arr8):
        for q in (0.2, 50.0, 99.8):
            got = _percentile(arr, q)
            want = float(np.percentile(arr.astype(np.float64), q))
            assert abs(got - want) < 1e-9, (arr.dtype, q, got, want)


def test_fused_pipeline_bounded_pending_window(tmp_path, rng, torch_unet_ckpt,
                                               monkeypatch):
    """Device-resident chunk outputs are capped at FUSED_PENDING_CHUNKS: with
    the window squeezed to 1 a long movie still returns identical results
    (old chunks are fetched and released mid-loop)."""
    from bio_image_unet_tpu.predict.predictor import _Engine

    ckpt_path, _ = torch_unet_ckpt
    kwargs = dict(resize_dim=(64, 64), show_progress=False, batch_size=4,
                  device_pipeline=True)
    movie = rng.integers(0, 255, (3 * _Engine.FUSED_CHUNK_FRAMES + 5, 96, 96),
                         dtype=np.uint8)
    wide = Predict(movie, None, ckpt_path, **kwargs).result
    monkeypatch.setattr(_Engine, "FUSED_PENDING_CHUNKS", 1)
    narrow = Predict(movie, None, ckpt_path, **kwargs).result
    np.testing.assert_array_equal(wide, narrow)


def test_engine_cache_lru_not_fifo():
    """Alternating CAP+1 configs must not evict the steadily-reused program:
    _cache_get re-inserts hits at the back (LRU), so the hot key survives
    while the one-shot keys rotate out."""
    from bio_image_unet_tpu.predict.predictor import _Engine

    cache = {}
    for i in range(_Engine.CACHE_CAP):
        _Engine._cache_put(cache, ("cfg", i), i)
    hot = ("cfg", 0)
    for i in range(_Engine.CACHE_CAP, _Engine.CACHE_CAP + 10):
        assert _Engine._cache_get(cache, hot) == 0  # hit moves it to the back
        _Engine._cache_put(cache, ("cfg", i), i)    # evicts the true LRU entry
        assert hot in cache, f"hot program evicted after inserting cfg {i}"
    assert len(cache) == _Engine.CACHE_CAP


def test_default_device_pipeline_is_fused(rng, torch_unet_ckpt):
    """device_pipeline defaults to None = auto: an eligible uint8 movie takes
    the fused program and the result is bit-identical to an explicit True."""
    ckpt_path, _ = torch_unet_ckpt
    movie = rng.integers(0, 255, (2, 96, 96), dtype=np.uint8)
    auto = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                   show_progress=False, batch_size=4)
    forced = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                     show_progress=False, batch_size=4, device_pipeline=True)
    np.testing.assert_array_equal(auto.result, forced.result)


def test_device_pipeline_uint16_matches_host(rng, torch_unet_ckpt):
    """uint16 movies run the fused program (bit-search percentiles on device)
    and match the host-staged path within one uint8 quantization step."""
    ckpt_path, _ = torch_unet_ckpt
    movie = rng.integers(0, 60000, (2, 96, 96), dtype=np.uint16)
    movie[0, :8] = 0  # exercise ties and a wide dynamic range
    host = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                   show_progress=False, batch_size=4, device_pipeline=False)
    fused = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                    show_progress=False, batch_size=4, device_pipeline=True)
    diff = np.abs(host.result.astype(int) - fused.result.astype(int))
    assert np.mean(diff > 1) < 0.01, (diff.max(), np.mean(diff > 1))


@pytest.mark.parametrize("mode", ["first", "all"])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_device_pipeline_first_all_modes(rng, torch_unet_ckpt, mode, dtype):
    """'first'/'all' normalization fuses too: stack-global bounds are computed
    once on host and threaded into the chunk program as traced scalars."""
    ckpt_path, _ = torch_unet_ckpt
    hi = 255 if dtype == np.uint8 else 50000
    movie = rng.integers(0, hi, (3, 96, 96), dtype=dtype)
    host = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                   normalization_mode=mode, show_progress=False,
                   batch_size=4, device_pipeline=False)
    fused = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                    normalization_mode=mode, show_progress=False,
                    batch_size=4, device_pipeline=True)
    diff = np.abs(host.result.astype(int) - fused.result.astype(int))
    assert np.mean(diff > 1) < 0.01, (diff.max(), np.mean(diff > 1))


def test_device_pipeline_warns_on_ineligible(rng, torch_unet_ckpt):
    """An explicit device_pipeline=True that cannot be honored (int32 input —
    float32 became fused-eligible in round 4) warns with the reason and
    falls back to the host path; the default auto mode falls back
    silently."""
    import warnings

    ckpt_path, _ = torch_unet_ckpt
    movie = (rng.random((2, 96, 96)) * 255).astype(np.int32)
    with pytest.warns(UserWarning, match="device_pipeline=True cannot"):
        loud = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                       show_progress=False, batch_size=4, device_pipeline=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        quiet = Predict(movie, None, ckpt_path, resize_dim=(64, 64),
                        show_progress=False, batch_size=4)
    np.testing.assert_array_equal(loud.result, quiet.result)


@pytest.fixture(scope="module")
def siam_ckpt(tmp_path_factory):
    import torch

    torch.manual_seed(0)
    mod = _ref_module("siam_unet/siam_unet.py")
    net = mod.Siam_UNet(n_filter=4, mode="max")
    net.eval()
    path = str(tmp_path_factory.mktemp("siam_ckpt") / "siam.pt")
    torch.save({"state_dict": net.state_dict(), "model_name": "Siam_UNet",
                "n_filter": 4, "mode": "max"}, path)
    return path


@pytest.mark.parametrize("mode", ["single", "first", "all"])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
def test_predict_siam_fused_matches_host(tmp_path, rng, siam_ckpt, mode, dtype):
    """The fused Siam chunk program (per-pair normalize + twin tiling +
    forward + stitch in one dispatch) matches the host-staged path within one
    uint8 quantization step — for all three per-PAIR normalization modes,
    integer and float32 dtypes, across a chunk boundary and an odd tail."""
    movie_path = str(tmp_path / "movie.tif")
    if dtype == np.float32:
        movie = (rng.random((7, 48, 48)) * 600 - 100).astype(np.float32)
    else:
        hi = 255 if dtype == np.uint8 else 50000
        movie = rng.integers(0, hi, (7, 48, 48), dtype=dtype)
    tiff.imwrite(movie_path, movie)
    out_f = str(tmp_path / "fused.tif")
    out_h = str(tmp_path / "host.tif")
    kwargs = dict(resize_dim=(32, 32), normalization_mode=mode,
                  show_progress=False, frames_per_chunk=3)
    PredictSiam(movie_path, out_f, siam_ckpt, device_pipeline=True, **kwargs)
    PredictSiam(movie_path, out_h, siam_ckpt, device_pipeline=False, **kwargs)
    fused = tiff.imread(out_f).astype(int)
    host = tiff.imread(out_h).astype(int)
    assert fused.shape == host.shape == (7, 48, 48)
    diff = np.abs(fused - host)
    assert np.mean(diff > 1) < 0.01, (mode, dtype, diff.max(), np.mean(diff > 1))


def test_predict_siam_default_is_fused_and_float_contract(tmp_path, rng, siam_ckpt):
    """Default device_pipeline=None auto-enables the fused Siam path (equals
    explicit True bit-for-bit).  Float movies: auto stays on the host path
    (the streaming reader cannot pre-screen later pages for NaNs), explicit
    True opts into the fused float program and matches the host result; a
    NaN page raises mid-stream with a clear message."""
    movie_path = str(tmp_path / "movie.tif")
    tiff.imwrite(movie_path, rng.integers(0, 255, (4, 48, 48), dtype=np.uint8))
    out_a = str(tmp_path / "auto.tif")
    out_b = str(tmp_path / "forced.tif")
    kwargs = dict(resize_dim=(48, 48), show_progress=False)
    PredictSiam(movie_path, out_a, siam_ckpt, **kwargs)
    PredictSiam(movie_path, out_b, siam_ckpt, device_pipeline=True, **kwargs)
    np.testing.assert_array_equal(tiff.imread(out_a), tiff.imread(out_b))

    float_path = str(tmp_path / "floats.tif")
    tiff.imwrite(float_path,
                 (rng.random((3, 48, 48), dtype=np.float32) * 255 - 40))
    out_fh = str(tmp_path / "f_host.tif")
    out_ff = str(tmp_path / "f_fused.tif")
    PredictSiam(float_path, out_fh, siam_ckpt, device_pipeline=False, **kwargs)
    PredictSiam(float_path, out_ff, siam_ckpt, device_pipeline=True, **kwargs)
    diff = np.abs(tiff.imread(out_fh).astype(int)
                  - tiff.imread(out_ff).astype(int))
    assert np.mean(diff > 1) < 0.01, (diff.max(), np.mean(diff > 1))

    nan_movie = rng.random((3, 48, 48), dtype=np.float32) * 10
    nan_movie[2, 5, 5] = np.nan
    nan_path = str(tmp_path / "nan.tif")
    tiff.imwrite(nan_path, nan_movie)
    # frames_per_chunk=1 so the flush-before-raise contract is observable:
    # the NaN hits the chunk for page 2, pages 0-1 must already be on disk
    # and the message must say exactly that (review finding: the raise used
    # to drop the pending chunk and leak the reader)
    nan_out = str(tmp_path / "n.tif")
    with pytest.raises(ValueError, match=r"page\(s\) 2.*first 2 result pages"):
        PredictSiam(nan_path, nan_out, siam_ckpt, device_pipeline=True,
                    frames_per_chunk=1, **kwargs)
    assert tiff.imread(nan_out).shape[0] == 2

    # NaN ONLY in page 1: the first chunk's block is [prev0=page 1, page 0]
    # (frame-0 pairing), so the raise must blame page 1 — not page 0
    # (review finding: the message used to say 'pages 0..0')
    nan_movie1 = nan_movie.copy()
    nan_movie1[2, 5, 5] = 0.0
    nan_movie1[1, 7, 7] = np.nan
    nan1_path = str(tmp_path / "nan1.tif")
    tiff.imwrite(nan1_path, nan_movie1)
    with pytest.raises(ValueError, match=r"page\(s\) 1:"):
        PredictSiam(nan1_path, str(tmp_path / "n1.tif"), siam_ckpt,
                    device_pipeline=True, frames_per_chunk=1, **kwargs)

    # an invalid normalization_mode must raise on the fused float path too,
    # not silently run as 'all' (review finding)
    with pytest.raises(ValueError, match="not valid"):
        PredictSiam(float_path, str(tmp_path / "bad.tif"), siam_ckpt,
                    device_pipeline=True, normalization_mode="frist",
                    **kwargs)
    # NaN already in page 0 is caught up front: warn + host fallback
    nan_movie0 = nan_movie.copy()
    nan_movie0[0, 1, 1] = np.nan
    nan_movie0[2, 5, 5] = 0.0
    nan0_path = str(tmp_path / "nan0.tif")
    tiff.imwrite(nan0_path, nan_movie0)
    with pytest.warns(UserWarning, match="NaN"):
        PredictSiam(nan0_path, str(tmp_path / "n0.tif"), siam_ckpt,
                    device_pipeline=True, **kwargs)


@pytest.fixture(scope="module")
def mo_ckpt(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu.models import MultiOutputUnet

    heads = {"mask": {"channels": 1, "activation": "sigmoid"},
             "orientation": {"channels": 2, "activation": None}}
    model = MultiOutputUnet(n_filter=4, output_heads=heads)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    path = str(tmp_path_factory.mktemp("mo_ckpt") / "mo.ckpt")
    checkpoint.save(path, variables, {"model_name": "MultiOutputUnet",
                                      "n_filter": 4, "in_channels": 1,
                                      "output_heads": heads})
    return path


@pytest.mark.parametrize("mode", ["single", "first", "all"])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
def test_predict_multi_output_fused_matches_host(rng, mo_ckpt, mode, dtype):
    """The fused multi-head program (raw upload, device normalize to
    [0, 1], tile, forward, margin stitch) matches the round-2 host-staged
    float32 path to float tolerance for every head — float32 inputs
    included (device percentiles via the sortable-bits search)."""
    if dtype == np.float32:
        imgs = (rng.random((2, 48, 48)) * 800 - 250).astype(np.float32)
    else:
        hi = 255 if dtype == np.uint8 else 50000
        imgs = rng.integers(0, hi, (2, 48, 48), dtype=dtype)
    kwargs = dict(max_patch_size=(32, 32), show_progress=False, batch_size=4,
                  safe_margin=4, normalization_mode=mode)
    fused = PredictMultiOutput(imgs, mo_ckpt, device_pipeline=True, **kwargs)
    host = PredictMultiOutput(imgs, mo_ckpt, device_pipeline=False, **kwargs)
    for key in fused.result:
        a, b = fused.result[key], host.result[key]
        assert a.shape == b.shape, key
        # device f32 normalize vs host f64 + f16 head quantization
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=0,
                                   err_msg=f"{key} {mode} {dtype}")


def test_predict_multi_output_default_fused_and_fallback(rng, mo_ckpt):
    imgs = rng.integers(0, 255, (1, 48, 48), dtype=np.uint8)
    kwargs = dict(max_patch_size=(32, 32), show_progress=False, batch_size=4,
                  safe_margin=4)
    auto = PredictMultiOutput(imgs, mo_ckpt, **kwargs)
    forced = PredictMultiOutput(imgs, mo_ckpt, device_pipeline=True, **kwargs)
    for key in auto.result:
        np.testing.assert_array_equal(auto.result[key], forced.result[key])

    # float32 is fused-eligible since round 4; int32 still is not
    with pytest.warns(UserWarning, match="device_pipeline=True cannot"):
        PredictMultiOutput((rng.random((1, 48, 48)) * 99).astype(np.int32),
                           mo_ckpt, device_pipeline=True, **kwargs)


def test_margin_blend_factors_reproduce_dense_weights(rng):
    """The per-axis factor tables outer-MIN to exactly the dense weight
    stacks the host path uses (the fused stitch rebuilds weights from them)."""
    from bio_image_unet_tpu.predict.tiling import (
        _blend_factors, _blend_weights, _margin_factors, _margin_weights)

    for grid, tile, margin in [((2, 3), (16, 24), 4), ((1, 2), (8, 8), 3),
                               ((3, 1), (8, 16), 10),
                               # margin=0: the reference's slice(-0, None)
                               # quirk zeroes ENTIRE overlapping-side patches
                               ((2, 2), (8, 8), 0)]:
        dense = _margin_weights(grid, tile, margin)
        facs = _margin_factors(grid, tile, margin)
        rebuilt = np.stack([
            np.minimum(facs[0][i][:, None], facs[1][j][None, :])[..., None]
            for i in range(grid[0]) for j in range(grid[1])])
        np.testing.assert_array_equal(dense, rebuilt)

    for grid, tile, margin in [((2, 2, 3), (4, 8, 8), 3), ((1, 2, 2), (4, 6, 6), 8)]:
        dense = _blend_weights(grid, tile, margin)
        facs = _blend_factors(grid, tile, margin)
        rebuilt = np.stack([
            np.minimum(np.minimum(facs[0][i][:, None, None],
                                  facs[1][j][None, :, None]),
                       facs[2][k][None, None, :])[..., None]
            for i in range(grid[0]) for j in range(grid[1])
            for k in range(grid[2])])
        np.testing.assert_allclose(dense, rebuilt, atol=1e-7)


@pytest.fixture(scope="module")
def unet3d_ckpt(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu.models import UNet3D

    model = UNet3D(n_filter=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 1)))
    path = str(tmp_path_factory.mktemp("u3d_ckpt") / "u3d.ckpt")
    checkpoint.save(path, variables, {"model_name": "UNet3D", "n_filter": 4})
    return path


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
def test_predict_3d_fused_matches_host(tmp_path, rng, unet3d_ckpt, dtype):
    """The fused 3D program (raw volume upload, device whole-volume
    normalize, 3-axis tiling, forward, mean stitch) matches the host-staged
    path within one uint8 quantization step — overlapping grid included,
    float32 volumes too (sortable-bits device percentiles)."""
    if dtype == np.float32:
        vol = (rng.random((12, 24, 24)) * 900 - 300).astype(np.float32)
    else:
        hi = 255 if dtype == np.uint8 else 50000
        vol = rng.integers(0, hi, (12, 24, 24), dtype=dtype)
    kwargs = dict(resize_dim=(8, 16, 16), show_progress=False, batch_size=2)
    host = Predict3D(vol, None, unet3d_ckpt, device_pipeline=False, **kwargs)
    fused = Predict3D(vol, None, unet3d_ckpt, device_pipeline=True, **kwargs)
    assert fused.result.shape == host.result.shape == (12, 24, 24)
    assert fused.result.dtype == np.uint8
    diff = np.abs(host.result.astype(int) - fused.result.astype(int))
    assert np.mean(diff > 1) < 0.01, (dtype, diff.max(), np.mean(diff > 1))


def test_predict_3d_fused_exact_grid_and_invert(tmp_path, rng, unet3d_ckpt):
    """Exact (transpose-only) 3D grid + invert: fused equals host."""
    vol = rng.integers(0, 255, (16, 32, 32), dtype=np.uint8)
    kwargs = dict(resize_dim=(8, 16, 16), invert=True, show_progress=False,
                  batch_size=2)
    host = Predict3D(vol, None, unet3d_ckpt, device_pipeline=False, **kwargs)
    fused = Predict3D(vol, None, unet3d_ckpt, device_pipeline=True, **kwargs)
    diff = np.abs(host.result.astype(int) - fused.result.astype(int))
    assert np.mean(diff > 1) < 0.01, (diff.max(), np.mean(diff > 1))


@pytest.fixture(scope="module")
def mo3d_ckpt(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu.models import MultiOutputUnet3D

    heads = {"mask": {"channels": 1, "activation": "sigmoid"},
             "flow": {"channels": 2, "activation": None}}
    model = MultiOutputUnet3D(n_filter=4, output_heads=heads)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 1)))
    path = str(tmp_path_factory.mktemp("mo3d_ckpt") / "mo3d.ckpt")
    checkpoint.save(path, variables, {"model_name": "MultiOutputUnet3D",
                                      "n_filter": 4, "output_heads": heads})
    return path


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
def test_predict_multi_output_3d_fused_matches_host(rng, mo3d_ckpt, dtype):
    """Fused multi-head 3D (factored blend stitch) matches the host-staged
    float path to float tolerance on an overlap-stride grid — float32
    volumes included."""
    if dtype == np.float32:
        vol = (rng.random((12, 24, 24)) * 700 - 200).astype(np.float32)
    else:
        hi = 255 if dtype == np.uint8 else 50000
        vol = rng.integers(0, hi, (12, 24, 24), dtype=dtype)
    kwargs = dict(max_patch_size=(8, 16, 16), overlap_factor=0.25,
                  show_progress=False, batch_size=2, blend_margin=4)
    fused = PredictMultiOutput3D(vol, mo3d_ckpt, device_pipeline=True, **kwargs)
    host = PredictMultiOutput3D(vol, mo3d_ckpt, device_pipeline=False, **kwargs)
    for key in fused.result:
        a, b = fused.result[key], host.result[key]
        assert a.shape == b.shape, key
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=0,
                                   err_msg=f"{key} {dtype}")


def test_fused_paths_tick_progress_notifier(rng, mo_ckpt, unet3d_ckpt):
    """Notifier-driven callers (GUIs) must still see progress on the fused
    default paths: the single-dispatch multi-head/3D programs tick their
    notifier once (start→complete) instead of silently dropping it."""
    from bio_image_unet_tpu.progress import ProgressNotifier

    for build in (
        lambda n: PredictMultiOutput(
            rng.integers(0, 255, (1, 48, 48), dtype=np.uint8), mo_ckpt,
            max_patch_size=(32, 32), show_progress=True, batch_size=4,
            safe_margin=4, progress_notifier=n),
        lambda n: Predict3D(
            rng.integers(0, 255, (12, 24, 24), dtype=np.uint8), None,
            unet3d_ckpt, resize_dim=(8, 16, 16), show_progress=True,
            batch_size=2, progress_notifier=n),
    ):
        ticks = []
        notifier = ProgressNotifier()
        notifier.set_progress_report(ticks.append)
        build(notifier)
        assert ticks and ticks[-1] >= 1.0, ticks


def test_fused_host_parity_randomized_shapes(rng, torch_unet_ckpt):
    """Seeded odd-shape sweep: prime-ish frame dims, movies shorter than the
    batch, add_tile, both integer dtypes — the fused device program and the
    host-staged path must agree exactly on every combination (same uint8
    quantization ≙ unet/predict.py:200)."""
    ckpt_path, _ = torch_unet_ckpt
    cases = [
        # (frames, h, w, dtype, mode, batch_size, add_tile)
        (1, 41, 127, np.uint8, "single", 8, 0),
        (2, 97, 67, np.uint16, "all", 3, 1),
        (7, 103, 53, np.uint8, "first", 4, 0),
        (3, 64, 89, np.uint16, "single", 8, 2),
    ]
    for f, h, w, dtype, mode, bs, add_tile in cases:
        hi = 255 if dtype == np.uint8 else 61234
        movie = rng.integers(0, hi, (f, h, w), dtype=dtype)
        kw = dict(resize_dim=(32, 32), normalization_mode=mode,
                  add_tile=add_tile, show_progress=False, batch_size=bs)
        host = Predict(movie, None, ckpt_path, device_pipeline=False, **kw)
        fused = Predict(movie, None, ckpt_path, device_pipeline=True, **kw)
        np.testing.assert_array_equal(
            fused.result, host.result,
            err_msg=f"case f={f} h={h} w={w} {np.dtype(dtype).name} {mode}")


def test_multi_output_fused_host_parity_odd_shapes(rng, mo_ckpt):
    """Margin-stitch odd shapes: images smaller than the /16-rounded patch in
    one axis, safe_margin larger than the overlap — the fused factored stitch
    must track the host path to the usual f32-vs-f64 normalize tolerance."""
    for shape, margin in [((2, 45, 71), 4), ((1, 29, 83), 12)]:
        imgs = rng.integers(0, 255, shape, dtype=np.uint8)
        kw = dict(max_patch_size=(32, 32), show_progress=False, batch_size=8,
                  safe_margin=margin)
        host = PredictMultiOutput(imgs, mo_ckpt, device_pipeline=False, **kw)
        fused = PredictMultiOutput(imgs, mo_ckpt, device_pipeline=True, **kw)
        for key in fused.result:
            np.testing.assert_allclose(
                fused.result[key], host.result[key], atol=2e-3, rtol=0,
                err_msg=f"head={key} shape={shape} margin={margin}")


def test_fused_heads_accepts_device_resident_input(rng, mo_ckpt):
    """The benches pre-stage their input on device (jnp.asarray) so the
    timed region excludes the host->device transfer; pin that as a
    supported _Engine input contract: an already-on-device movie must give
    bitwise the same heads as the numpy movie."""
    import jax.numpy as jnp

    from bio_image_unet_tpu.predict.predictor import _Engine
    from bio_image_unet_tpu.predict.tiling import _margin_factors, grid_starts

    imgs = rng.integers(0, 255, (2, 48, 48), dtype=np.uint8)
    xs, ys = grid_starts(48, 32, 0), grid_starts(48, 32, 0)
    factors = _margin_factors((len(xs), len(ys)), (32, 32), 4)
    eng = _Engine(mo_ckpt, None, batch_size=4)
    a = eng.fused_predict_heads(imgs, xs, ys, (32, 32), (0.2, 99.8), factors)
    b = eng.fused_predict_heads(jnp.asarray(imgs), xs, ys, (32, 32),
                                (0.2, 99.8), factors)
    assert set(a) == {"mask", "orientation"}
    for key in a:
        np.testing.assert_array_equal(np.asarray(a[key]), np.asarray(b[key]),
                                      err_msg=key)


def test_is_oom_error_classification():
    from bio_image_unet_tpu.predict.predictor import _is_oom_error

    assert _is_oom_error(RuntimeError(
        "INTERNAL: ... XLA:TPU compile permanent error. Ran out of memory "
        "in memory space hbm. Used 16.02G of 15.75G hbm."))
    assert _is_oom_error(RuntimeError("RESOURCE_EXHAUSTED: allocation"))
    assert not _is_oom_error(ValueError("shape mismatch"))
    assert not _is_oom_error(RuntimeError("UNAVAILABLE: backend down"))


def _boom_once_cache_get(monkeypatch, msg):
    """Patch _Engine._cache_get so the FIRST fetched program raises ``msg``
    and later fetches are genuine — simulating a compile/run OOM the
    backoff must recover from."""
    from bio_image_unet_tpu.predict import predictor

    orig = predictor._Engine._cache_get  # bound classmethod
    state = {"armed": True}

    def fake(cache, key):
        fn = orig(cache, key)
        if state["armed"]:
            state["armed"] = False

            def boom(*a, **k):
                raise RuntimeError(msg)

            return boom
        return fn

    monkeypatch.setattr(predictor._Engine, "_cache_get", staticmethod(fake))
    return state


def test_fused_heads_oom_backoff_halves_batch(rng, mo_ckpt, monkeypatch):
    """A device OOM (compile- or run-time) on the fused heads program must
    degrade to a halved map batch with a warning — not fail — and produce
    the same heads (map batching never changes per-patch math)."""
    from bio_image_unet_tpu.predict.predictor import _Engine
    from bio_image_unet_tpu.predict.tiling import _margin_factors, grid_starts

    imgs = rng.integers(0, 255, (2, 48, 48), dtype=np.uint8)
    xs, ys = grid_starts(48, 32, 0), grid_starts(48, 32, 0)
    factors = _margin_factors((len(xs), len(ys)), (32, 32), 4)
    want = _Engine(mo_ckpt, None, batch_size=4).fused_predict_heads(
        imgs, xs, ys, (32, 32), (0.2, 99.8), factors)

    _boom_once_cache_get(
        monkeypatch, "RESOURCE_EXHAUSTED: Ran out of memory in memory "
        "space hbm. Used 16.02G of 15.75G hbm.")
    with pytest.warns(UserWarning, match="out of device memory"):
        got = _Engine(mo_ckpt, None, batch_size=4).fused_predict_heads(
            imgs, xs, ys, (32, 32), (0.2, 99.8), factors)
    for key in want:
        np.testing.assert_array_equal(np.asarray(want[key]),
                                      np.asarray(got[key]), err_msg=key)


def test_fused_heads_non_oom_error_propagates(rng, mo_ckpt, monkeypatch):
    from bio_image_unet_tpu.predict.predictor import _Engine
    from bio_image_unet_tpu.predict.tiling import _margin_factors, grid_starts

    imgs = rng.integers(0, 255, (1, 32, 32), dtype=np.uint8)
    xs = ys = grid_starts(32, 32, 0)
    factors = _margin_factors((1, 1), (32, 32), 4)
    _boom_once_cache_get(monkeypatch, "UNAVAILABLE: backend went away")
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        _Engine(mo_ckpt, None, batch_size=4).fused_predict_heads(
            imgs, xs, ys, (32, 32), (0.2, 99.8), factors)


def test_fused_heads_3d_oom_backoff(rng, mo3d_ckpt, monkeypatch):
    """Same backoff contract on the 3D heads path (separate retry wiring)."""
    from bio_image_unet_tpu.predict.predictor import _Engine
    from bio_image_unet_tpu.predict.tiling import _blend_factors, grid_starts

    vols = rng.integers(0, 255, (1, 8, 16, 16), dtype=np.uint8)[None][0]
    vols = vols.reshape(1, 8, 16, 16)
    zs = grid_starts(8, 8, 0)
    xs, ys = grid_starts(16, 8, 0), grid_starts(16, 8, 0)
    factors = _blend_factors((len(zs), len(xs), len(ys)), (8, 8, 8), 2)
    want = _Engine(mo3d_ckpt, None, batch_size=4).fused_predict_heads_3d(
        vols, zs, xs, ys, (8, 8, 8), (0.0, 99.8), factors)

    _boom_once_cache_get(monkeypatch,
                         "RESOURCE_EXHAUSTED: out of memory: hbm")
    with pytest.warns(UserWarning, match="out of device memory"):
        got = _Engine(mo3d_ckpt, None, batch_size=4).fused_predict_heads_3d(
            vols, zs, xs, ys, (8, 8, 8), (0.0, 99.8), factors)
    for key in want:
        np.testing.assert_array_equal(np.asarray(want[key]),
                                      np.asarray(got[key]), err_msg=key)


# ----------------------------------------------------------------------
# round-4 review findings: multi-volume 3D normalization modes, Predict3D
# signature/grid parity, streaming page decode economy
# ----------------------------------------------------------------------


def test_predict_multi_output_3d_stack_global_modes(rng, mo3d_ckpt):
    """'first'/'all' on a multi-volume stack must use STACK-GLOBAL bounds
    (reference multi_output_unet3d/predict.py:114-121), not per-volume ones
    (the round-4 review found both paths silently ran 'single' for every
    mode).  Signature: volume 1 = affine(volume 0), so 'single' normalizes
    both volumes to the IDENTICAL tensor (min-max normalization is
    affine-invariant) while 'first' clips volume 1 with volume 0's bounds —
    equal results under 'first' would mean the mode is still per-volume."""
    v0 = rng.integers(5, 100, (8, 16, 16), dtype=np.uint8)
    v1 = (v0.astype(np.int32) * 2 + 10).astype(np.uint8)  # affine, in range
    stack = np.stack([v0, v1])
    kw = dict(max_patch_size=(8, 16, 16), overlap_factor=0.0,
              show_progress=False, batch_size=2, blend_margin=2,
              device_pipeline=False)
    single = PredictMultiOutput3D(stack, mo3d_ckpt,
                                  normalization_mode="single", **kw).result
    first = PredictMultiOutput3D(stack, mo3d_ckpt,
                                 normalization_mode="first", **kw).result
    for key in single:
        # affine invariance: identical normalized volumes → identical heads
        np.testing.assert_allclose(single[key][0], single[key][1], atol=1e-4,
                                   rtol=0, err_msg=f"single affine {key}")
        # volume 0 is its own reference → 'first' == 'single' for volume 0
        np.testing.assert_allclose(first[key][0], single[key][0], atol=1e-4,
                                   rtol=0, err_msg=f"first vol0 {key}")
    # volume 1 under volume-0 bounds is heavily clipped → materially
    # different input, materially different head output
    assert max(float(np.abs(first[k][1].astype(np.float32)
                            - single[k][1].astype(np.float32)).max())
               for k in single) > 1e-3


@pytest.mark.parametrize("mode", ["first", "all"])
@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_predict_multi_output_3d_stack_modes_fused_matches_host(
        rng, mo3d_ckpt, mode, dtype):
    """The fused 3D heads program with stack-global fixed bounds (traced
    scalars) matches the host-staged reference-semantics path on a
    2-volume stack with different brightness per volume."""
    if dtype == np.float32:
        v0 = (rng.random((12, 24, 24)) * 80 + 5).astype(np.float32)
        v1 = (rng.random((12, 24, 24)) * 500 - 100).astype(np.float32)
    else:
        v0 = rng.integers(5, 90, (12, 24, 24), dtype=np.uint8)
        v1 = rng.integers(40, 250, (12, 24, 24), dtype=np.uint8)
    stack = np.stack([v0, v1])
    kw = dict(max_patch_size=(8, 16, 16), overlap_factor=0.25,
              show_progress=False, batch_size=2, blend_margin=4,
              normalization_mode=mode)
    fused = PredictMultiOutput3D(stack, mo3d_ckpt, device_pipeline=True, **kw)
    host = PredictMultiOutput3D(stack, mo3d_ckpt, device_pipeline=False, **kw)
    for key in fused.result:
        a, b = fused.result[key], host.result[key]
        assert a.shape == b.shape, key
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=0,
                                   err_msg=f"{key} {mode} {dtype}")


def test_predict3d_accepts_normalization_mode(rng, unet3d_ckpt):
    """Drop-in signature parity: the reference Predict3D takes
    normalization_mode between invert and clip_threshold
    (unet3d/predict.py:53) and ignores it in __preprocess (:110-117 uses
    whole-volume percentiles regardless); ours must accept it in the same
    position with the same no-op semantics."""
    vol = rng.integers(0, 255, (12, 24, 24), dtype=np.uint8)
    base = Predict3D(vol, None, unet3d_ckpt, resize_dim=(8, 16, 16),
                     show_progress=False).result
    # keyword form, every mode → identical output
    for mode in ("single", "first", "all", "anything-goes-like-the-ref"):
        got = Predict3D(vol, None, unet3d_ckpt, resize_dim=(8, 16, 16),
                        normalization_mode=mode, show_progress=False).result
        np.testing.assert_array_equal(got, base, err_msg=mode)
    # positional form in the reference's order:
    # (vol, result, params, network, resize_dim, invert, normalization_mode,
    #  clip_threshold, add_patch)
    got = Predict3D(vol, None, unet3d_ckpt, "UNet3D", (8, 16, 16), False,
                    "all", (0.0, 99.8), 0, show_progress=False).result
    np.testing.assert_array_equal(got, base)


def test_predict3d_add_patch_extends_every_axis(rng, unet3d_ckpt, monkeypatch):
    """add_patch adds one grid row per axis INCLUDING z (the reference
    intends N_z = ceil + add_patch, unet3d/predict.py:121; the round-4
    review found ours passed 0 for z) — and the fused path still matches
    the host-staged stitch on the denser grid."""
    from bio_image_unet_tpu.predict import predictor

    calls = []
    orig = predictor.grid_starts

    def spy(extent, tile, add=0):
        calls.append((extent, tile, add))
        return orig(extent, tile, add)

    monkeypatch.setattr(predictor, "grid_starts", spy)
    vol = rng.integers(0, 255, (12, 24, 24), dtype=np.uint8)
    kw = dict(resize_dim=(8, 16, 16), add_patch=1, show_progress=False)
    fused = Predict3D(vol, None, unet3d_ckpt, device_pipeline=True, **kw)
    assert (12, 8, 1) in calls, calls  # the z axis got add_patch
    host = Predict3D(vol, None, unet3d_ckpt, device_pipeline=False, **kw)
    diff = np.abs(fused.result.astype(int) - host.result.astype(int))
    assert np.mean(diff > 1) < 0.01, (diff.max(), np.mean(diff > 1))


def test_siam_host_path_decodes_each_page_once(tmp_path, rng, siam_ckpt,
                                               monkeypatch):
    """The host-staged streaming path must decode every TIFF page exactly
    once (the per-frame host decode is this path's dominant cost; the
    round-4 review found page 1 decoded twice — once as frame 0's prev,
    once as frame 1's current)."""
    from collections import Counter

    movie_path = str(tmp_path / "movie.tif")
    movie = rng.integers(0, 255, (5, 48, 48), dtype=np.uint8)
    tiff.imwrite(movie_path, movie)

    counts = Counter()
    orig = tiff.TiffReader.read_page

    def counting(self, i):
        counts[i] += 1
        return orig(self, i)

    monkeypatch.setattr(tiff.TiffReader, "read_page", counting)
    out = str(tmp_path / "out.tif")
    PredictSiam(movie_path, out, siam_ckpt, resize_dim=(32, 32),
                device_pipeline=False, show_progress=False,
                frames_per_chunk=2)
    assert counts and max(counts.values()) == 1, dict(counts)
