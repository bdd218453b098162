"""End-to-end 2D U-Net walkthrough — executable equivalent of the
reference's ``using_unet.ipynb``.

Data-layout contract (same as the reference): two folders with identically
named tif files —

    training_data/
    ├── image/   raw microscopy images
    └── label/   binary masks (0 / 255)

Run with ``--demo`` to generate a synthetic dataset first.
"""

import os
import sys

# allow running from a plain repo checkout (no pip install)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

import bio_image_unet_tpu.unet as unet
from bio_image_unet_tpu.data import tiff


def make_demo_data(base: str, n: int = 5, shape=(512, 512), seed: int = 0):
    rng = np.random.default_rng(seed)
    os.makedirs(f"{base}/image", exist_ok=True)
    os.makedirs(f"{base}/label", exist_ok=True)
    for i in range(n):
        # blobby structures + noise, thresholded masks
        yy, xx = np.mgrid[: shape[0], : shape[1]]
        img = np.zeros(shape, np.float32)
        for _ in range(12):
            cy, cx = rng.integers(0, shape[0]), rng.integers(0, shape[1])
            r = rng.integers(10, 60)
            img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r**2))
        mask = (img > 0.4).astype(np.uint8) * 255
        img = img / img.max() * 200 + rng.normal(0, 10, shape)
        tiff.imwrite(f"{base}/image/sample_{i}.tif",
                     np.clip(img, 0, 255).astype(np.uint8))
        tiff.imwrite(f"{base}/label/sample_{i}.tif", mask)
    return f"{base}/image/", f"{base}/label/"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-dir", default=None)
    ap.add_argument("--label-dir", default=None)
    ap.add_argument("--workdir", default="./unet_run")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=12)
    ap.add_argument("--n-filter", type=int, default=32)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--demo", action="store_true", help="generate synthetic data")
    args = ap.parse_args()

    if args.demo:
        image_dir, label_dir = make_demo_data(os.path.join(args.workdir, "training_data"))
    else:
        image_dir, label_dir = args.image_dir, args.label_dir
        assert image_dir and label_dir, "--image-dir/--label-dir or --demo required"

    # 1) offline pipeline: normalize, tile to dim², augment ×10
    data = unet.DataProcess(
        (image_dir, label_dir), dim_out=(args.dim, args.dim), aug_factor=10,
        data_path=os.path.join(args.workdir, "data"),
    )

    # 2) train — the reference recipe (100-500 epochs, batch 10-12, lr 1e-4)
    trainer = unet.Trainer(
        data, num_epochs=args.epochs, batch_size=args.batch_size, lr=1e-4,
        n_filter=args.n_filter, loss_function="BCEDice", loss_params=(1.0, 1.0),
        save_dir=os.path.join(args.workdir, "model"),
    )
    trainer.start()

    # 3) tiled inference on the first training image (demo) — in practice
    #    point this at held-out movies
    first = sorted(os.listdir(image_dir))[0]
    unet.Predict(
        os.path.join(image_dir, first),
        os.path.join(args.workdir, "prediction.tif"),
        os.path.join(args.workdir, "model", "model.ckpt"),
        resize_dim=(512, 512),
    )
    print(f"done — model and prediction under {args.workdir}")


if __name__ == "__main__":
    main()
