#!/usr/bin/env python
"""Generate the executable notebook walkthroughs (the notebook-form
counterparts of the reference's using_unet.ipynb / using_siam_unet.ipynb;
the same flows also exist as plain scripts under examples/).

Run `python notebooks/build.py` to (re)generate, then execute headless with
`BIU_DEMO_CPU=1 jupyter execute notebooks/using_unet.ipynb` (the env switch
forces the demo onto CPU on hosts without a TPU)."""

import os

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))


def nb(cells):
    n = nbf.v4.new_notebook()
    n.cells = [nbf.v4.new_markdown_cell(s) if kind == "md"
               else nbf.v4.new_code_cell(s) for kind, s in cells]
    n.metadata["kernelspec"] = {"name": "python3", "language": "python",
                                "display_name": "Python 3"}
    return n


SETUP = '''import os, sys

# run from a plain repo checkout (no pip install needed)
sys.path.insert(0, os.path.abspath(".."))
if os.environ.get("BIU_DEMO_CPU"):  # hosts without a TPU (CI, laptops)
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from bio_image_unet_tpu.data import tiff'''


UNET_CELLS = [
    ("md", """# U-Net quickstart — `bio_image_unet_tpu`

TPU-native rebuild of [danihae/bio-image-unet](https://github.com/danihae/bio-image-unet)
(this walkthrough mirrors the reference's `using_unet.ipynb`): train a 2D
U-Net for binary segmentation of microscopy images, then predict a movie.
The API is a drop-in for the reference — same `DataProcess` → `Trainer` →
`Predict` flow — while execution is jax/XLA on TPU (bf16 MXU matmuls, fused
on-device predict pipeline, optional multi-chip `mesh=`).

This notebook is self-contained: it builds a small synthetic blob dataset so
every cell executes end-to-end. Point `dir_images`/`dir_masks` at your own
data instead (TIFF images and identically-named label masks)."""),
    ("code", SETUP),
    ("md", """## 1. Training data generation and augmentation

`DataProcess` builds the training set: it normalizes and tiles the images,
augments them (shift/scale/rotate, brightness/contrast, blur, noise — the
package ships its own augmentation library, no albumentations needed), and
serves `(image, mask)` samples. Folder structure, as in the reference:

```
training_data/image/  *.tif
training_data/label/  *.tif   (same file names)
```"""),
    ("code", '''# synthetic blob dataset (replace these two dirs with your data)
base = "./temp_nb_unet"
dir_images, dir_masks = f"{base}/image/", f"{base}/label/"
os.makedirs(dir_images, exist_ok=True), os.makedirs(dir_masks, exist_ok=True)

rng = np.random.default_rng(0)
# the canonical demo recipe — the same generator the learning-sanity tests,
# the int8 accuracy gate and the training-parity A/B use
from bio_image_unet_tpu.utils import blob_sample as blob

for i in range(6):
    img, mask = blob(rng)
    tiff.imwrite(dir_images + f"s{i}.tif", img)
    tiff.imwrite(dir_masks + f"s{i}.tif", mask)'''),
    ("code", '''import bio_image_unet_tpu.unet as unet

dataset = unet.DataProcess(
    (dir_images, dir_masks),
    dim_out=(64, 64),        # tile size
    aug_factor=4,            # augmented copies per tile
    data_path=f"{base}/data",
    seed=0,
)'''),
    ("md", """## 2. Training

`Trainer` mirrors the reference's signature (loss functions, `val_split`,
`save_iter`, checkpoint/resume) and adds the TPU-first switches:

- `device_cache=True` — keep the whole training set in HBM and run each
  epoch as ONE fused `lax.scan` program (`'sharded'` to spread it over a mesh)
- `half_precision=True` — bf16 compute on the MXU
- `remat=True` — rematerialize activations (memory ↔ FLOPs trade)
- `mesh=get_mesh(...)` — data-parallel training over a TPU mesh
- `profile_dir=` — capture a `jax.profiler` trace"""),
    ("code", '''trainer = unet.Trainer(
    dataset,
    num_epochs=4, batch_size=4, lr=1e-3, n_filter=8,
    loss_function="BCEDice", loss_params=(0.5, 0.5),
    save_dir=f"{base}/model",
    device_cache=True, seed=0,
)
trainer.start()'''),
    ("md", """## 3. Prediction

`Predict` tiles each frame, runs the batched forward and stitches with
overlap averaging. On uint8/uint16/float32 inputs the whole
normalize→tile→forward→stitch chain runs as ONE device program per chunk
(`device_pipeline`, auto-enabled — 273 MP/s/chip device-resident on v5e,
`benchmarks/LASTGOOD.json`). `quantized=True` opts into w8a8 int8 on the MXU's
int8 path (~1.2× faster, masks within ~1 uint8 level)."""),
    ("code", '''movie = np.stack([blob(np.random.default_rng(100 + i))[0] for i in range(8)])
tiff.imwrite(f"{base}/movie.tif", movie)

pred = unet.Predict(
    f"{base}/movie.tif", f"{base}/result.tif",
    f"{base}/model/model.ckpt",
    resize_dim=(64, 64),
    show_progress=False,
)
print("result:", pred.result.shape, pred.result.dtype)'''),
    ("code", '''# sanity: the trained model should segment held-out blobs well above chance
from bio_image_unet_tpu.utils import iou

test_img, test_mask = blob(np.random.default_rng(123))
score = iou(unet.Predict(test_img, None, f"{base}/model/model.ckpt",
                         resize_dim=(64, 64), show_progress=False).result,
            test_mask)
print(f"held-out IoU: {score:.3f}")
assert score > 0.5'''),
    ("md", """## Next steps

- `docs/MIGRATION.md` — switching from the reference package
- `docs/API.md` — full API reference (all five model families)
- `examples/` — script versions of this and the other four families
- `python -m bio_image_unet_tpu train/predict …` — the CLI
- Reference checkpoints (`.pt`) load directly: pass them as `model_params`."""),
]


SIAM_CELLS = [
    ("md", """# Siamese U-Net quickstart — `bio_image_unet_tpu`

Notebook counterpart of the reference's `using_siam_unet.ipynb`: Siam_UNet
takes the *previous* movie frame as a second input for temporally-consistent
segmentation. Training samples are frame pairs; helpers build them from
movies (`generate_coupled_image`, `find_frame_of_image`,
`utilize_search_result` in `bio_image_unet_tpu.tools`)."""),
    ("code", SETUP),
    ("md", """## 1. Paired training data

Each training image is a W-doubled TIFF `[previous | current]` (or a 2-layer
stack); labels segment the *current* frame. `generate_coupled_image` cuts
pairs out of a movie."""),
    ("code", '''from bio_image_unet_tpu.tools import generate_coupled_image

base = "./temp_nb_siam"
dir_images, dir_masks = f"{base}/image/", f"{base}/label/"
os.makedirs(dir_images, exist_ok=True), os.makedirs(dir_masks, exist_ok=True)

rng = np.random.default_rng(0)
yy, xx = np.mgrid[:64, :64]
frames, masks = [], []
cy = 20.0
for i in range(7):  # a blob drifting downward
    cy += 3.0
    img = 40 + 180 * np.exp(-((yy - cy) ** 2 + (xx - 32) ** 2) / 150.0)
    frames.append(np.clip(img + rng.normal(0, 6, (64, 64)), 0, 255))
    masks.append((img > 120).astype(np.uint8) * 255)
movie = np.stack(frames).astype(np.uint8)
tiff.imwrite(f"{base}/movie.tif", movie)

for i in range(1, 7):
    generate_coupled_image(f"{base}/movie.tif", i, dir_images + f"frame_{i}.tif")
    tiff.imwrite(dir_masks + f"frame_{i}.tif", masks[i])'''),
    ("code", '''import bio_image_unet_tpu.siam_unet as siam

dataset = siam.DataProcess(
    (dir_images, dir_masks), dim_out=(64, 64), aug_factor=4,
    data_path=f"{base}/data",
)'''),
    ("md", """## 2. Training

`mode` selects how the two encoder streams join: `'max'` (default),
`'concat'`, `'corr'` (depthwise cross-correlation) or `'control'` (ignore
the previous frame). The TPU switches (`device_cache`, `half_precision`,
`mesh=`) work here too."""),
    ("code", '''trainer = siam.Trainer(
    dataset, num_epochs=4, batch_size=4, lr=1e-3, n_filter=8, mode="max",
    save_dir=f"{base}/model", device_cache=True, seed=0,
)
trainer.start()'''),
    ("md", """## 3. Streaming movie prediction

`siam.Predict` STREAMS: TIFF pages are decoded incrementally, paired with
their previous frame, predicted in fused on-device chunks and appended to
the output TIFF — memory stays bounded for arbitrarily long movies.
(`quantized=True` works here too; calibration pairs are sampled evenly
across the whole movie in a pre-pass.)"""),
    ("code", '''siam.Predict(
    f"{base}/movie.tif", f"{base}/result.tif",
    f"{base}/model/model.ckpt",
    resize_dim=(64, 64), show_progress=False,
)
result = tiff.imread(f"{base}/result.tif")
print("result:", result.shape, result.dtype)
assert result.shape == movie.shape'''),
]


def main():
    for name, cells in (("using_unet.ipynb", UNET_CELLS),
                        ("using_siam_unet.ipynb", SIAM_CELLS)):
        path = os.path.join(HERE, name)
        nbf.write(nb(cells), path)
        print("wrote", path)


if __name__ == "__main__":
    main()
