"""End-to-end 3D U-Net walkthrough (no reference notebook exists for the 3D
family — this mirrors ``using_unet.ipynb``'s structure for volumes).

Data-layout contract (same as the 2D families): two folders with identically
named multi-page tif volumes —

    training_data/
    ├── volume/   raw (Z, X, Y) microscopy stacks
    └── label/    binary mask stacks (0 / 255)

Run with ``--demo`` to generate a synthetic dataset first.  The trainer adds
the 3D family's temporal-consistency term (SmoothL1 between adjacent slices,
reference unet3d/train.py:142-145) via ``time_loss_weight``.
"""

import os
import sys

# allow running from a plain repo checkout (no pip install)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

import bio_image_unet_tpu.unet3d as unet3d
from bio_image_unet_tpu.data import tiff


def make_demo_data(base: str, n: int = 4, shape=(24, 96, 96), seed: int = 0):
    rng = np.random.default_rng(seed)
    os.makedirs(f"{base}/volume", exist_ok=True)
    os.makedirs(f"{base}/label", exist_ok=True)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
    for i in range(n):
        vol = np.zeros(shape, np.float32)
        for _ in range(8):
            cz = rng.integers(0, shape[0])
            cy, cx = rng.integers(0, shape[1]), rng.integers(0, shape[2])
            r = rng.integers(6, 20)
            vol += np.exp(-(((zz - cz) * 3) ** 2 + (yy - cy) ** 2
                            + (xx - cx) ** 2) / (2 * r**2))
        mask = (vol > 0.4).astype(np.uint8) * 255
        vol = vol / vol.max() * 200 + rng.normal(0, 10, shape)
        tiff.imwrite(f"{base}/volume/stack_{i}.tif",
                     np.clip(vol, 0, 255).astype(np.uint8))
        tiff.imwrite(f"{base}/label/stack_{i}.tif", mask)
    return f"{base}/volume/", f"{base}/label/"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume-dir", default=None)
    ap.add_argument("--label-dir", default=None)
    ap.add_argument("--workdir", default="./unet3d_run")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--n-filter", type=int, default=16)
    ap.add_argument("--dim", type=int, nargs=3, default=[16, 64, 64],
                    help="(Z, X, Y) training patch size")
    ap.add_argument("--use-interpolation", action="store_true",
                    help="trilinear decoder instead of transposed convs")
    ap.add_argument("--demo", action="store_true", help="generate synthetic data")
    args = ap.parse_args()

    if args.demo:
        volume_dir, label_dir = make_demo_data(
            os.path.join(args.workdir, "training_data"))
    else:
        volume_dir, label_dir = args.volume_dir, args.label_dir
        assert volume_dir and label_dir, "--volume-dir/--label-dir or --demo required"

    # 1) offline pipeline: whole-volume normalize, 3-axis tile, 2.5D augment
    data = unet3d.DataProcess(
        (volume_dir, label_dir), dim_out=tuple(args.dim), aug_factor=4,
        data_path=os.path.join(args.workdir, "data"),
    )

    # 2) train with the temporal-consistency term
    trainer = unet3d.Trainer(
        data, num_epochs=args.epochs, batch_size=args.batch_size, lr=1e-4,
        n_filter=args.n_filter, loss_function="BCEDice",
        time_loss_weight=0.1, use_interpolation=args.use_interpolation,
        save_dir=os.path.join(args.workdir, "model"),
    )
    trainer.start()

    # 3) tiled 3D inference with mean-overlap stitching
    first = sorted(os.listdir(volume_dir))[0]
    unet3d.Predict(
        os.path.join(volume_dir, first),
        os.path.join(args.workdir, "prediction.tif"),
        os.path.join(args.workdir, "model", "model.ckpt"),
        resize_dim=tuple(args.dim),
    )
    print(f"done — model and prediction under {args.workdir}")


if __name__ == "__main__":
    main()
