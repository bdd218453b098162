#!/usr/bin/env python
"""Per-family benchmarks for BASELINE.json configs 3-5 — the perf evidence
round 2 lacked (VERDICT r2, Missing #1): Siam twin-frame inference+training
(config 3 ≙ siam_unet/predict.py:102-123, siam_unet/train.py:104-110),
multi-head 2D training + margin-stitch inference (config 4 ≙
multi_output_unet/train.py, predict.py:186-232), and 3D train + tile-stitch
inference (config 5 ≙ unet3d/train.py, unet3d/predict.py:119-195).

Each measurement pairs OUR number with the PyTorch reference run in place on
this host's CPU at the SAME model/patch/batch configuration (the reference
publishes no numbers — BASELINE.md).  Baselines are measured once and cached
in FAMILY_BASELINE.json; results land in FAMILY_r05.json (the round-4
record stays pinned in FAMILY_r04.json) and are printed as one JSON line
per config.

Like bench.py, inference reports BOTH a device-resident number (movie/volume
already in HBM, one-element sync — the chip's steady-state framework
throughput, apples-to-apples with the in-memory torch loop) and an
end-to-end number that additionally crosses this dev host's tunneled TPU
link (~15-30 MB/s shared, ~1 s/transfer — a production PCIe host tracks the
compute number).

Run: python benchmarks/family_bench.py [siam|multi_output|unet3d ...]
NEVER run concurrently with the test suite on this 1-core host.
"""

import importlib.util
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASELINE_CACHE = os.path.join(ROOT, "benchmarks", "FAMILY_BASELINE.json")
RESULTS = os.path.join(ROOT, "benchmarks", "FAMILY_r05.json")

NF = 32  # all families at n_filter=32 (the reference's GPU-sizing guidance)

MO_HEADS = {
    "mask": {"channels": 1, "activation": "sigmoid", "loss": "BCEDiceLoss",
             "weight": 1.0},
    "orientation": {"channels": 2, "activation": None, "loss": "MSELoss",
                    "weight": 1.0},
}


def _ref_module(rel):
    spec = importlib.util.spec_from_file_location(
        rel.replace("/", "_"), f"/root/reference/bio_image_unet/{rel}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sync(x):
    """Force completion on the tunneled runtime (block_until_ready does not
    reliably block there — fetch one element instead)."""
    import jax
    import jax.numpy as jnp

    leaves = x if isinstance(x, (list, tuple)) else [x]
    jax.device_get(jnp.ravel(leaves[-1])[:1])


# --------------------------------------------------------------------------
# torch-CPU baselines (reference models loaded in place, never copied)
# --------------------------------------------------------------------------

def baseline_siam():
    import torch

    torch.manual_seed(0)
    net = _ref_module("siam_unet/siam_unet.py").Siam_UNet(
        n_filter=NF, mode="max").eval()
    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.random((8, 1, 256, 256), np.float32))
    xp = torch.from_numpy(rng.random((8, 1, 256, 256), np.float32))
    with torch.no_grad():
        net(x[:1], xp[:1])  # warm
        t0 = time.perf_counter()
        for i in range(8):  # batch-1 ≙ siam_unet/predict.py:195-204
            net(x[i : i + 1], xp[i : i + 1])
        infer_mpix = 8 * 256 * 256 / 1e6 / (time.perf_counter() - t0)

    net = _ref_module("siam_unet/siam_unet.py").Siam_UNet(
        n_filter=NF, mode="max").train()
    losses = _ref_module("siam_unet/losses.py")
    crit = losses.BCEDiceLoss(1, 1)
    opt = torch.optim.Adam(net.parameters(), lr=1e-4)
    bs = 12
    x = torch.from_numpy(rng.random((bs, 1, 256, 256), np.float32))
    xp = torch.from_numpy(rng.random((bs, 1, 256, 256), np.float32))
    y = (torch.rand(bs, 1, 256, 256) > 0.5).float()
    opt.zero_grad(); crit(net(x, xp)[1], y).backward(); opt.step()  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        opt.zero_grad(); crit(net(x, xp)[1], y).backward(); opt.step()
    train_pps = 3 * bs / (time.perf_counter() - t0)
    return {"infer_mpix_per_s": infer_mpix, "train_patches_per_s": train_pps,
            "config": f"Siam_UNet nf{NF} 256^2; infer batch-1 twin fwd; "
                      "train bs12 BCEDice fwd+bwd+adam"}


def baseline_multi_output():
    import torch

    torch.manual_seed(0)
    mod = _ref_module("multi_output_unet/multi_output_nested_unet.py")
    net = mod.MultiOutputNestedUNet(n_filter=NF, in_channels=1,
                                    output_heads=MO_HEADS).eval()
    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.random((4, 1, 512, 512), np.float32))
    with torch.no_grad():
        net(x[:1])  # warm
        t0 = time.perf_counter()
        for i in range(4):  # batch-1 ≙ multi_output_unet/predict.py:186 default
            net(x[i : i + 1])
        infer_mpix = 4 * 512 * 512 / 1e6 / (time.perf_counter() - t0)

    net = mod.MultiOutputNestedUNet(n_filter=NF, in_channels=1,
                                    output_heads=MO_HEADS).train()
    losses = _ref_module("multi_output_unet/losses.py")
    crits = {"mask": losses.BCEDiceLoss(), "orientation": torch.nn.MSELoss()}
    opt = torch.optim.Adam(net.parameters(), lr=1e-4)
    bs = 4
    x = torch.from_numpy(rng.random((bs, 1, 256, 256), np.float32))
    tgts = {"mask": (torch.rand(bs, 1, 256, 256) > 0.5).float(),
            "orientation": torch.randn(bs, 2, 256, 256)}

    def step():
        opt.zero_grad()
        out = net(x)
        loss = sum(crits[k](out[k], tgts[k]) for k in tgts)
        loss.backward()
        opt.step()

    step()  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        step()
    train_pps = 3 * bs / (time.perf_counter() - t0)
    return {"infer_mpix_per_s": infer_mpix, "train_patches_per_s": train_pps,
            "config": f"MultiOutputNestedUNet nf{NF} 2 heads; infer 512^2 "
                      "batch-1; train bs4 256^2 BCEDice+MSE fwd+bwd+adam"}


def baseline_unet3d():
    import torch

    torch.manual_seed(0)
    net = _ref_module("unet3d/unet3d.py").UNet3D(n_filter=NF).eval()
    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.random((2, 1, 32, 128, 128), np.float32))
    with torch.no_grad():
        net(x[:1])  # warm
        t0 = time.perf_counter()
        for i in range(2):  # batch-1 ≙ unet3d/predict.py:150-160
            net(x[i : i + 1])
        infer_mvox = 2 * 32 * 128 * 128 / 1e6 / (time.perf_counter() - t0)

    net = _ref_module("unet3d/unet3d.py").UNet3D(n_filter=NF).train()
    losses = _ref_module("unet3d/losses.py")
    crit = losses.BCEDiceLoss(0.5, 0.5)
    sl1 = torch.nn.SmoothL1Loss()
    opt = torch.optim.Adam(net.parameters(), lr=1e-4)
    bs = 4
    x = torch.from_numpy(rng.random((bs, 1, 16, 64, 64), np.float32))
    y = (torch.rand(bs, 1, 16, 64, 64) > 0.5).float()

    def step():  # BCEDice + 0.1 * temporal SmoothL1 ≙ unet3d/train.py:142-145
        opt.zero_grad()
        _, logits = net(x)
        loss = crit(logits, y) + 0.1 * sl1(logits[:, :, 1:], logits[:, :, :-1])
        loss.backward()
        opt.step()

    step()  # warm
    t0 = time.perf_counter()
    for _ in range(2):
        step()
    train_vps = 2 * bs / (time.perf_counter() - t0)
    return {"infer_mvox_per_s": infer_mvox, "train_volumes_per_s": train_vps,
            "config": f"UNet3D nf{NF}; infer (32,128,128) batch-1; train bs4 "
                      "(16,64,64) BCEDice+0.1·SmoothL1 fwd+bwd+adam"}


# --------------------------------------------------------------------------
# ours (TPU)
# --------------------------------------------------------------------------

def _ckpt(tmp, name, model, init_shapes, extra):
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu import checkpoint
    from bio_image_unet_tpu.utils.utils import no_compilation_cache

    with no_compilation_cache(), jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0),
                               *[jnp.zeros(s) for s in init_shapes])
    path = os.path.join(tmp, f"{name}.ckpt")
    checkpoint.save(path, variables, extra)
    return path


def ours_siam():
    import jax

    from bio_image_unet_tpu.data import tiff
    from bio_image_unet_tpu.models import Siam_UNet
    from bio_image_unet_tpu.predict import PredictSiam
    from bio_image_unet_tpu.predict.predictor import _Engine
    from bio_image_unet_tpu.predict.tiling import grid_starts

    tmp = "/tmp/family_bench"
    os.makedirs(tmp, exist_ok=True)
    ckpt = _ckpt(tmp, "siam", Siam_UNet(n_filter=NF),
                 [(1, 256, 256, 1), (1, 256, 256, 1)],
                 {"model_name": "Siam_UNet", "n_filter": NF, "mode": "max"})
    rng = np.random.default_rng(0)
    frames, h, w = 32, 1024, 1024
    movie = rng.integers(0, 255, (frames, h, w), dtype=np.uint8)

    # device-resident: the fused pair program with the block already in HBM
    eng = _Engine(ckpt, "Siam_UNet", batch_size=8, half_precision=True)
    xs, ys = grid_starts(h, 256, 0), grid_starts(w, 256, 0)
    k = 16
    block = movie[: k + 1]
    out = eng.fused_predict_pairs(block, xs, ys, (256, 256), (0.0, 99.98),
                                  False, "single")  # warm/compile
    _sync(out)
    import jax.numpy as jnp

    block_dev = jnp.asarray(block)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [eng.fused_predict_pairs(block_dev, xs, ys, (256, 256),
                                        (0.0, 99.98), False, "single")
                for _ in range(2)]
        _sync(outs)
        best = min(best, time.perf_counter() - t0)
    device_mpix = 2 * k * h * w / 1e6 / best

    # end-to-end: public streaming predictor over a real TIFF (our codec)
    movie_path = os.path.join(tmp, "siam_movie.tif")
    tiff.imwrite(movie_path, movie)
    out_path = os.path.join(tmp, "siam_out.tif")
    PredictSiam(movie_path, out_path, ckpt, resize_dim=(256, 256),
                show_progress=False, half_precision=True)  # warm
    t0 = time.perf_counter()
    PredictSiam(movie_path, out_path, ckpt, resize_dim=(256, 256),
                show_progress=False, half_precision=True)
    e2e_mpix = frames * h * w / 1e6 / (time.perf_counter() - t0)

    # training: siam Trainer, fused on-device epoch, HBM-resident dataset
    from bio_image_unet_tpu import siam_unet

    n, dim, bs = 120, 256, 12
    imgs = rng.random((n, dim, dim, 1)).astype(np.float32)
    prevs = rng.random((n, dim, dim, 1)).astype(np.float32)
    masks = (rng.random((n, dim, dim, 1)) > 0.5).astype(np.float32)

    class SynthSiam:
        dim_out = (dim, dim)

        def __len__(self):
            return n

        def __getitem__(self, i):
            return {"image": imgs[i], "prev_image": prevs[i],
                    "mask": masks[i]}

    tr = siam_unet.Trainer(SynthSiam(), num_epochs=1, batch_size=bs,
                           n_filter=NF, lr=1e-4, val_split=0.0,
                           device_cache=True, half_precision=True,
                           save_dir=os.path.join(tmp, "siam_train"), seed=0)
    tr._iterate_train(0)  # compile
    best = float("inf")
    for e in range(3):
        t0 = time.perf_counter()
        tr._iterate_train(1 + e)
        best = min(best, time.perf_counter() - t0)
    train_pps = (tr._n_train // bs) * bs / best
    return {"infer_mpix_per_s": device_mpix, "e2e_mpix_per_s": e2e_mpix,
            "train_patches_per_s": train_pps}


def ours_multi_output():
    import jax.numpy as jnp

    from bio_image_unet_tpu.models import get_model
    from bio_image_unet_tpu.predict import PredictMultiOutput
    from bio_image_unet_tpu.predict.predictor import _Engine
    from bio_image_unet_tpu.predict.tiling import _margin_factors, grid_starts

    tmp = "/tmp/family_bench"
    os.makedirs(tmp, exist_ok=True)
    model = get_model("MultiOutputNestedUNet", n_filter=NF, in_channels=1,
                      output_heads=MO_HEADS)
    ckpt = _ckpt(tmp, "mo", model, [(1, 256, 256, 1)],
                 {"model_name": "MultiOutputNestedUNet", "n_filter": NF,
                  "in_channels": 1, "output_heads": MO_HEADS})
    rng = np.random.default_rng(0)
    frames, h, w = 8, 1024, 1024
    imgs = rng.integers(0, 255, (frames, h, w), dtype=np.uint8)

    eng = _Engine(ckpt, None, batch_size=8, half_precision=True)
    xs, ys = grid_starts(h, 512, 0), grid_starts(w, 512, 0)
    factors = _margin_factors((len(xs), len(ys)), (512, 512), 20)
    out = eng.fused_predict_heads(imgs, xs, ys, (512, 512), (0.0, 99.98),
                                  factors)  # warm/compile
    _sync(list(out.values()))
    imgs_dev = jnp.asarray(imgs)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = eng.fused_predict_heads(imgs_dev, xs, ys, (512, 512),
                                      (0.0, 99.98), factors)
        _sync(list(out.values()))
        best = min(best, time.perf_counter() - t0)
    device_mpix = frames * h * w / 1e6 / best

    PredictMultiOutput(imgs, ckpt, max_patch_size=(512, 512),
                       show_progress=False, half_precision=True)  # warm
    t0 = time.perf_counter()
    PredictMultiOutput(imgs, ckpt, max_patch_size=(512, 512),
                       show_progress=False, half_precision=True)
    e2e_mpix = frames * h * w / 1e6 / (time.perf_counter() - t0)

    from bio_image_unet_tpu import multi_output_unet as mo

    n, dim, bs = 60, 256, 4
    rng = np.random.default_rng(0)
    timgs = rng.random((n, dim, dim, 1)).astype(np.float32)
    tmask = (rng.random((n, dim, dim, 1)) > 0.5).astype(np.float32)
    torient = rng.standard_normal((n, dim, dim, 2)).astype(np.float32)

    class SynthMO:
        dim_out = (dim, dim)

        def __len__(self):
            return n

        def __getitem__(self, i):
            return {"image": timgs[i], "mask": tmask[i],
                    "orientation": torient[i]}

    tr = mo.Trainer(SynthMO(), num_epochs=1, batch_size=bs, n_filter=NF,
                    output_heads=MO_HEADS, val_split=0.0, device_cache=True,
                    half_precision=True, tensorboard=False, log_images=False,
                    save_dir=os.path.join(tmp, "mo_train"), seed=0)
    tr._iterate_train(0)
    best = float("inf")
    for e in range(3):
        t0 = time.perf_counter()
        tr._iterate_train(1 + e)
        best = min(best, time.perf_counter() - t0)
    train_pps = (tr._n_train // bs) * bs / best
    return {"infer_mpix_per_s": device_mpix, "e2e_mpix_per_s": e2e_mpix,
            "train_patches_per_s": train_pps}


def ours_unet3d():
    import jax.numpy as jnp

    from bio_image_unet_tpu.models import UNet3D
    from bio_image_unet_tpu.predict import Predict3D
    from bio_image_unet_tpu.predict.predictor import _Engine
    from bio_image_unet_tpu.predict.tiling import grid_starts

    tmp = "/tmp/family_bench"
    os.makedirs(tmp, exist_ok=True)
    ckpt = _ckpt(tmp, "u3d", UNet3D(n_filter=NF), [(1, 16, 64, 64, 1)],
                 {"model_name": "UNet3D", "n_filter": NF})
    rng = np.random.default_rng(0)
    d, h, w = 64, 512, 512
    vol = rng.integers(0, 255, (d, h, w), dtype=np.uint8)

    eng = _Engine(ckpt, "UNet3D", batch_size=4, half_precision=True)
    zs = grid_starts(d, 32, 0)
    xs = grid_starts(h, 128, 0)
    ys = grid_starts(w, 128, 0)
    out = eng.fused_predict_volume(vol, zs, xs, ys, (32, 128, 128),
                                   (0.0, 99.8), False)  # warm/compile
    _sync(out)
    vol_dev = jnp.asarray(vol)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = eng.fused_predict_volume(vol_dev, zs, xs, ys, (32, 128, 128),
                                       (0.0, 99.8), False)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    device_mvox = d * h * w / 1e6 / best

    Predict3D(vol, None, ckpt, resize_dim=(32, 128, 128),
              show_progress=False, half_precision=True)  # warm
    t0 = time.perf_counter()
    Predict3D(vol, None, ckpt, resize_dim=(32, 128, 128),
              show_progress=False, half_precision=True)
    e2e_mvox = d * h * w / 1e6 / (time.perf_counter() - t0)

    from bio_image_unet_tpu import unet3d as u3d

    n, bs = 40, 4
    tvols = rng.random((n, 16, 64, 64, 1)).astype(np.float32)
    tmask = (rng.random((n, 16, 64, 64, 1)) > 0.5).astype(np.float32)

    class Synth3D:
        dim_out = (16, 64, 64)

        def __len__(self):
            return n

        def __getitem__(self, i):
            return {"image": tvols[i], "mask": tmask[i]}

    tr = u3d.Trainer(Synth3D(), num_epochs=1, batch_size=bs, n_filter=NF,
                     val_split=0.0, device_cache=True, half_precision=True,
                     save_dir=os.path.join(tmp, "u3d_train"), seed=0)
    tr._iterate_train(0)
    best = float("inf")
    for e in range(3):
        t0 = time.perf_counter()
        tr._iterate_train(1 + e)
        best = min(best, time.perf_counter() - t0)
    train_vps = (tr._n_train // bs) * bs / best
    return {"infer_mvox_per_s": device_mvox, "e2e_mvox_per_s": e2e_mvox,
            "train_volumes_per_s": train_vps}


CONFIGS = {
    "siam": (baseline_siam, ours_siam, "mpix", "patches"),
    "multi_output": (baseline_multi_output, ours_multi_output, "mpix",
                     "patches"),
    "unet3d": (baseline_unet3d, ours_unet3d, "mvox", "volumes"),
}


def main():
    names = sys.argv[1:] or list(CONFIGS)
    baselines = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            baselines = json.load(fh)
    for name in names:
        if name not in baselines:
            baselines[name] = CONFIGS[name][0]()
            with open(BASELINE_CACHE, "w") as fh:
                json.dump(baselines, fh, indent=1)

    results = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            results = json.load(fh)
    for name in names:
        _, ours_fn, px_unit, train_unit = CONFIGS[name]
        base = baselines[name]
        ours = ours_fn()
        infer_key = f"infer_{px_unit}_per_s"
        e2e_key = f"e2e_{px_unit}_per_s"
        train_key = ("train_patches_per_s" if train_unit == "patches"
                     else "train_volumes_per_s")
        rec = {
            "inference_device": round(ours[infer_key], 3),
            "inference_e2e": round(ours[e2e_key], 3),
            "inference_unit": f"mega{'pixels' if px_unit == 'mpix' else 'voxels'}/sec/chip",
            "inference_vs_baseline": round(ours[infer_key] / base[infer_key], 1),
            "inference_e2e_vs_baseline": round(ours[e2e_key] / base[infer_key], 1),
            "training": round(ours[train_key], 2),
            "training_unit": f"{train_unit}/sec/chip",
            "training_vs_baseline": round(ours[train_key] / base[train_key], 1),
            "baseline_config": base["config"],
        }
        results[name] = rec
        with open(RESULTS, "w") as fh:
            json.dump(results, fh, indent=1)
        print(json.dumps({"config": name, **rec}))


if __name__ == "__main__":
    main()
