"""End-to-end multi-output 2D walkthrough (mask + orientation heads) — the
family the reference leaves undocumented (no notebook, no smoke test;
SURVEY.md §4).  Mirrors ``using_unet.ipynb``'s structure.

Data-layout contract (reference multi_output_unet/data.py:140-185): an image
dir plus one dir per target, all holding identically named tifs; the head
name is the target dir's basename.  ``orientation`` targets hold per-pixel
angles in radians (NaN where undefined) and are trained as cos/sin fields:

    training_data/
    ├── image/          raw microscopy images
    ├── mask/           binary masks (0 / 1 float)
    └── orientation/    per-pixel angle θ ∈ [0, 2π), NaN outside structures

Run with ``--demo`` to generate a synthetic dataset first.
"""

import os
import sys

# allow running from a plain repo checkout (no pip install)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

import bio_image_unet_tpu.multi_output_unet as mo
from bio_image_unet_tpu.data import tiff


def make_demo_data(base: str, n: int = 3, shape=(256, 256), seed: int = 0):
    """Oriented ridge patterns: mask = ridge support, orientation = ridge
    normal angle."""
    rng = np.random.default_rng(seed)
    for sub in ("image", "mask", "orientation"):
        os.makedirs(f"{base}/{sub}", exist_ok=True)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    for i in range(n):
        theta = float(rng.uniform(0, np.pi))
        wave = np.cos((xx * np.cos(theta) + yy * np.sin(theta)) * 0.15)
        mask = (wave > 0.3).astype(np.float32)
        orient = np.where(mask > 0, theta, np.nan).astype(np.float32)
        img = (wave * 0.5 + 0.5) * 200 + rng.normal(0, 8, shape)
        tiff.imwrite(f"{base}/image/s{i}.tif",
                     np.clip(img, 0, 255).astype(np.uint8))
        tiff.imwrite(f"{base}/mask/s{i}.tif", mask)
        tiff.imwrite(f"{base}/orientation/s{i}.tif", orient)
    return f"{base}/image", [f"{base}/mask", f"{base}/orientation"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-dir", default=None)
    ap.add_argument("--target-dir", action="append", default=None,
                    help="repeat per head; head name = dir basename")
    ap.add_argument("--workdir", default="./multi_output_run")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--n-filter", type=int, default=32)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--deep-supervision", action="store_true",
                    help="UNet++ per-level supervision (weights .5/.75/.875/1)")
    ap.add_argument("--demo", action="store_true", help="generate synthetic data")
    args = ap.parse_args()

    if args.demo:
        image_dir, target_dirs = make_demo_data(
            os.path.join(args.workdir, "training_data"))
    else:
        image_dir, target_dirs = args.image_dir, args.target_dir
        assert image_dir and target_dirs, "--image-dir/--target-dir or --demo required"
    keys = [os.path.basename(os.path.normpath(d)) for d in target_dirs]

    # 1) head config — the reference's checkpoint-embedded schema
    #    (multi_output_unet/multi_output_unet.py:16-21)
    heads = {}
    for key in keys:
        if "orientation" in key:
            heads[key] = {"channels": 2, "activation": None,
                          "loss": "WeightedVectorFieldLoss", "weight": 0.5}
        else:
            heads[key] = {"channels": 1, "activation": "sigmoid",
                          "loss": "BCEDiceLoss", "weight": 1.0}

    # 2) offline pipeline: NaN-aware rotation + orientation angle shift,
    #    area-proportional patch counts
    data = mo.DataProcess(
        image_dir, target_dirs, {k: k for k in keys},
        data_dir=os.path.join(args.workdir, "data"),
        dim_out=(args.dim, args.dim), aug_factor=4,
    )

    # 3) train a UNet++ with TensorBoard scalars + per-epoch validation grids
    trainer = mo.Trainer(
        data, num_epochs=args.epochs, batch_size=args.batch_size, lr=1e-4,
        n_filter=args.n_filter, output_heads=heads,
        deep_supervision=args.deep_supervision,
        save_dir=os.path.join(args.workdir, "model"),
    )
    trainer.start()

    # 4) per-head tiled inference with safe-margin stitching
    first = sorted(os.listdir(image_dir))[0]
    pred = mo.Predict(
        os.path.join(image_dir, first),
        os.path.join(args.workdir, "model", "model.ckpt"),
        result_path=os.path.join(args.workdir, "results"),
        max_patch_size=(args.dim, args.dim),
    )
    print(f"done — heads {list(pred.result)} under {args.workdir}/results")


if __name__ == "__main__":
    main()
