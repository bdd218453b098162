"""End-to-end multi-output 3D walkthrough — per-head volumes with the
overlap-factor grid and linear blend-margin stitching (reference
multi_output_unet3d/predict.py:127-307; the family has no reference notebook
or test).

Data-layout contract: a volume dir plus one dir per target, all holding
identically named (Z, X, Y) tif stacks; the head name is the target dir's
basename:

    training_data/
    ├── volume/   raw stacks
    └── mask/     binary mask stacks (0 / 1 float)

Run with ``--demo`` to generate a synthetic dataset first.
"""

import os
import sys

# allow running from a plain repo checkout (no pip install)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

import bio_image_unet_tpu.multi_output_unet3d as mo3d
from bio_image_unet_tpu.data import tiff


def make_demo_data(base: str, n: int = 3, shape=(16, 64, 64), seed: int = 0):
    rng = np.random.default_rng(seed)
    for sub in ("volume", "mask"):
        os.makedirs(f"{base}/{sub}", exist_ok=True)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
    for i in range(n):
        vol = np.zeros(shape, np.float32)
        for _ in range(6):
            cz = rng.integers(0, shape[0])
            cy, cx = rng.integers(0, shape[1]), rng.integers(0, shape[2])
            r = rng.integers(5, 14)
            vol += np.exp(-(((zz - cz) * 2) ** 2 + (yy - cy) ** 2
                            + (xx - cx) ** 2) / (2 * r**2))
        mask = (vol > 0.4).astype(np.float32)
        vol = vol / vol.max() * 200 + rng.normal(0, 10, shape)
        tiff.imwrite(f"{base}/volume/v{i}.tif",
                     np.clip(vol, 0, 255).astype(np.uint8))
        tiff.imwrite(f"{base}/mask/v{i}.tif", mask)
    return f"{base}/volume", [f"{base}/mask"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume-dir", default=None)
    ap.add_argument("--target-dir", action="append", default=None,
                    help="repeat per head; head name = dir basename")
    ap.add_argument("--workdir", default="./multi_output_3d_run")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--n-filter", type=int, default=16)
    ap.add_argument("--dim", type=int, nargs=3, default=[8, 32, 32],
                    help="(Z, X, Y) training patch size")
    ap.add_argument("--demo", action="store_true", help="generate synthetic data")
    args = ap.parse_args()

    if args.demo:
        volume_dir, target_dirs = make_demo_data(
            os.path.join(args.workdir, "training_data"))
    else:
        volume_dir, target_dirs = args.volume_dir, args.target_dir
        assert volume_dir and target_dirs, "--volume-dir/--target-dir or --demo required"
    keys = [os.path.basename(os.path.normpath(d)) for d in target_dirs]

    # 1) head config — BCEDiceTemporalLoss adds the z-slice consistency term
    #    (multi_output_unet3d/losses.py:250-298)
    heads = {k: {"channels": 1, "activation": "sigmoid",
                 "loss": "BCEDiceTemporalLoss", "weight": 1.0} for k in keys}

    # 2) offline 3D pipeline: two-stage augmentation (3D spatial then
    #    slice-wise intensity)
    data = mo3d.DataProcess(
        volume_dir, target_dirs, data_dir=os.path.join(args.workdir, "data"),
        dim_out=tuple(args.dim), aug_factor=4,
    )

    # 3) train (nearest-up/down interpolation decoder is this family's
    #    default — multi_output_unet3d/multi_output_unet3d.py:111-159)
    trainer = mo3d.Trainer(
        data, output_heads=heads, num_epochs=args.epochs,
        batch_size=args.batch_size, lr=1e-4, n_filter=args.n_filter,
        use_interpolation=True, save_dir=os.path.join(args.workdir, "model"),
    )
    trainer.start()

    # 4) per-head 3D inference with linear blend-margin stitching
    first = sorted(os.listdir(volume_dir))[0]
    pred = mo3d.Predict(
        os.path.join(volume_dir, first),
        os.path.join(args.workdir, "model", "model.ckpt"),
        result_path=os.path.join(args.workdir, "results"),
        max_patch_size=tuple(args.dim), overlap_factor=0.2,
    )
    print(f"done — heads {list(pred.result)} under {args.workdir}/results")


if __name__ == "__main__":
    main()
