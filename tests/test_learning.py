"""Learning sanity + north-star IoU parity (BASELINE.json:5).

Everything else checks mechanics; this file checks the framework actually
LEARNS: a U-Net trained briefly on synthetic blob data must segment held-out
blobs well above chance, and predictions from reference-imported weights must
agree with the torch forward at IoU ≥ 0.999.
"""

import importlib.util
import os

import numpy as np

from bio_image_unet_tpu.data import tiff
from bio_image_unet_tpu.utils import iou


from bio_image_unet_tpu.utils import blob_sample as _blob_image  # one recipe


def test_unet_learns_blob_segmentation(tmp_path, rng):
    import bio_image_unet_tpu.unet as unet

    img_dir, mask_dir = tmp_path / "image", tmp_path / "label"
    os.makedirs(img_dir), os.makedirs(mask_dir)
    for i in range(6):
        img, mask = _blob_image(rng)
        tiff.imwrite(str(img_dir / f"s{i}.tif"), img)
        tiff.imwrite(str(mask_dir / f"s{i}.tif"), mask)

    data = unet.DataProcess(
        (str(img_dir) + "/", str(mask_dir) + "/"), dim_out=(64, 64),
        aug_factor=4, data_path=str(tmp_path / "data"), seed=0,
    )
    trainer = unet.Trainer(data, num_epochs=8, batch_size=4, lr=1e-3,
                           n_filter=8, save_dir=str(tmp_path / "out"),
                           device_cache=True, seed=0)
    trainer.start()

    # held-out blobs
    test_rng = np.random.default_rng(123)
    img, mask = _blob_image(test_rng)
    pred = unet.Predict(img, None, str(tmp_path / "out" / "model.ckpt"),
                        resize_dim=(64, 64), show_progress=False)
    score = iou(pred.result, mask)
    assert score > 0.5, f"IoU {score} — model failed to learn blob segmentation"


def test_north_star_iou_parity(tmp_path, rng):
    """With identical imported weights, our predicted mask and the torch
    forward's mask agree at IoU ≥ 0.999 (north star: parity within 1e-3)."""
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_unet_ns", "/root/reference/bio_image_unet/unet/unet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(1)
    net = mod.Unet(1, 1, n_filter=8)
    net.train()
    with torch.no_grad():
        for _ in range(3):
            net(torch.randn(2, 1, 64, 64))
    net.eval()
    ckpt = str(tmp_path / "m.pt")
    torch.save({"state_dict": net.state_dict(), "model_name": "Unet",
                "n_filter": 8, "in_channels": 1, "out_channels": 1}, ckpt)

    from bio_image_unet_tpu.predict import Predict
    from bio_image_unet_tpu.predict.predictor import _normalize_stack

    img, _ = _blob_image(rng, shape=(96, 96))
    ours = Predict(img, None, ckpt, resize_dim=(96, 96), show_progress=False)

    norm = _normalize_stack(img[None].astype(np.float32), "single", (0.0, 99.8))[0]
    with torch.no_grad():
        theirs = net(torch.from_numpy(norm.astype(np.uint8).astype(np.float32) / 255)
                     [None, None])[0].numpy()[0, 0]
    theirs_mask = (theirs * 255).astype(np.uint8)
    assert iou(ours.result, theirs_mask) >= 0.999


def test_metrics_binarize_scales():
    """threshold is on the [0,1] probability scale; 0-255 float predictions
    (the library's own saved tifs) and uint8/uint16 code points rescale it."""
    from bio_image_unet_tpu.utils import iou

    t = np.zeros((10, 10), np.uint8)
    t[:5] = 255
    # float16 probabilities·255, exactly matching the mask
    p255 = np.zeros((10, 10), np.float16)
    p255[:5] = 250.0
    p255[5:] = 5.0  # 2% — must binarize to background
    assert iou(p255, t) > 0.999
    # uint16 full-range probabilities
    p16 = np.zeros((10, 10), np.uint16)
    p16[:5] = 60000
    assert iou(p16, t) > 0.999
    # 0/255 masks in WIDE int dtypes (np.array(mask, dtype=int)) must use
    # the 255 value scale, not the dtype's max
    assert iou(t.astype(np.int64), t) > 0.999
    assert iou(t.astype(np.int16), t) > 0.999
    # plain [0,1] floats unchanged
    p = np.zeros((10, 10), np.float32)
    p[:5] = 0.9
    assert iou(p, t) > 0.999
