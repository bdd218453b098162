"""End-to-end 3D predict parity: torch reference UNet3D weights → our
Predict3D vs an independent torch per-patch loop + mean stitch."""

import importlib.util

import numpy as np

from bio_image_unet_tpu.predict import Predict3D, grid_starts


def test_predict3d_parity_with_reference(tmp_path, rng):
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_unet3d", "/root/reference/bio_image_unet/unet3d/unet3d.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    net = mod.UNet3D(in_channels=1, out_channels=1, n_filter=4)
    net.train()
    with torch.no_grad():
        for _ in range(2):
            net(torch.randn(1, 1, 8, 16, 16))
    net.eval()
    ckpt = str(tmp_path / "u3d.pt")
    torch.save({"state_dict": net.state_dict(), "model_name": "UNet3D",
                "n_filter": 4, "in_channels": 1, "out_channels": 1}, ckpt)

    vol = rng.integers(0, 255, (12, 24, 24), dtype=np.uint8)
    pred = Predict3D(vol, None, ckpt, resize_dim=(8, 16, 16),
                     show_progress=False, batch_size=2)

    # independent torch computation: whole-volume normalize → uint8 patches →
    # per-patch forward → uint8 quantize → mean stitch
    from bio_image_unet_tpu.predict.predictor import _normalize_stack

    v = _normalize_stack(vol[None].astype(np.float32), "all", (0.0, 99.8))[0]
    zs, xs, ys = grid_starts(12, 8), grid_starts(24, 16), grid_starts(24, 16)
    acc = np.zeros((12, 24, 24), np.float64)
    cnt = np.zeros((12, 24, 24), np.float64)
    with torch.no_grad():
        for z0 in zs:
            for x0 in xs:
                for y0 in ys:
                    p = v[z0 : z0 + 8, x0 : x0 + 16, y0 : y0 + 16].astype(np.uint8)
                    t = torch.from_numpy(p.astype(np.float32) / 255)[None, None]
                    r = net(t)[0].numpy()[0, 0]
                    r8 = (r * 255).astype(np.uint8)
                    acc[z0 : z0 + 8, x0 : x0 + 16, y0 : y0 + 16] += r8
                    cnt[z0 : z0 + 8, x0 : x0 + 16, y0 : y0 + 16] += 1
    expected = (acc / cnt).astype(np.uint8)
    diff = np.abs(pred.result.astype(int) - expected.astype(int))
    assert diff.max() <= 1, diff.max()
