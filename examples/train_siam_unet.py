"""Siamese U-Net walkthrough — executable equivalent of the reference's
``using_siam_unet.ipynb``.

Siam training inputs are frame *pairs*: either a W-doubled tif
([previous | current]) or a 2-layer stack per sample.  Helpers in
``bio_image_unet_tpu.tools`` build these from movies + frame-search results
(generate_coupled_image / find_frame_of_image / utilize_search_result).
"""

import os
import sys

# allow running from a plain repo checkout (no pip install)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

import bio_image_unet_tpu.siam_unet as siam
from bio_image_unet_tpu.data import tiff
from bio_image_unet_tpu.tools import generate_coupled_image


def make_demo_data(base: str, n: int = 5, shape=(256, 256), seed: int = 0):
    rng = np.random.default_rng(seed)
    os.makedirs(f"{base}/image", exist_ok=True)
    os.makedirs(f"{base}/label", exist_ok=True)
    movie_path = f"{base}/movie.tif"
    frames = rng.integers(0, 255, (n + 1,) + shape, dtype=np.uint8)
    tiff.imwrite(movie_path, frames)
    for i in range(1, n + 1):
        generate_coupled_image(movie_path, i, f"{base}/image/frame_{i}.tif")
        tiff.imwrite(f"{base}/label/frame_{i}.tif",
                     (rng.random(shape) > 0.5).astype(np.uint8) * 255)
    return f"{base}/image/", f"{base}/label/", movie_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="./siam_run")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=12)
    ap.add_argument("--n-filter", type=int, default=32)  # batch 12 fits 8 GB
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--aug-factor", type=int, default=10)
    ap.add_argument("--mode", default="max",
                    choices=["concat", "corr", "max", "control"])
    args = ap.parse_args()

    image_dir, label_dir, movie = make_demo_data(
        os.path.join(args.workdir, "training_data"))

    data = siam.DataProcess(
        (image_dir, label_dir), dim_out=(args.dim, args.dim),
        aug_factor=args.aug_factor,
        data_path=os.path.join(args.workdir, "data"),
    )
    trainer = siam.Trainer(
        data, num_epochs=args.epochs, batch_size=args.batch_size, lr=1e-4,
        n_filter=args.n_filter, mode=args.mode,
        save_dir=os.path.join(args.workdir, "model"),
    )
    trainer.start()

    # streaming movie prediction: frames decoded, predicted and written one
    # at a time — bounded memory for arbitrarily long movies
    siam.Predict(
        movie, os.path.join(args.workdir, "prediction.tif"),
        os.path.join(args.workdir, "model", "model.ckpt"),
        resize_dim=(args.dim, args.dim),
    )
    print(f"done — results under {args.workdir}")


if __name__ == "__main__":
    main()
