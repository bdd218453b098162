#!/usr/bin/env python
"""Round-5 ship-decision probe for the REMAINING 3D decoder variants.

`benchmarks/int8_bench.py`'s ``unet3d`` leg measures the ConvTranspose3d
decoder only, but `quant._int8_family` gates all three volumetric decoder
styles behind the single ``'unet3d'`` family key (UNet3D tconv, UNet3D
trilinear ``use_interpolation=True``, MultiOutputUnet3D nearest+conv —
reference bio_image_unet/unet3d/unet3d.py:60-84 and
multi_output_unet3d/multi_output_unet3d.py:60-84).  Shipping the family on
one variant's number would leave the other two unmeasured, so this probe
A/Bs them end-to-end at the same geometry as the decision leg (64x512x512
uint8 volume, 32x128x128 tiles, device-resident, best-of-3):

- ``trilinear``: UNet3D(use_interpolation=True) through
  ``fused_predict_volume`` — exercises the round-5 int8-value trilinear
  upsample (quant3d.py: up(q)*s == up(q*s)).
- ``multi3d``: MultiOutputUnet3D (nearest x2 + conv decoder, two heads)
  through ``fused_predict_heads_3d`` with linear-blend stitching.

Writes benchmarks/PROBE_3D_VARIANTS_INT8.json.  Run alone on the TPU.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ["BIU_INT8_EXPERIMENTAL"] = "1"

import jax
import jax.numpy as jnp

from bench import _cpu_init_context
from bio_image_unet_tpu import checkpoint
from bio_image_unet_tpu.predict.predictor import _Engine
from bio_image_unet_tpu.predict.tiling import _blend_factors, grid_starts

NF = 32
OUT = os.path.join(ROOT, "benchmarks", "PROBE_3D_VARIANTS_INT8.json")
HEADS = {"mask": {"channels": 1, "activation": "sigmoid"},
         "vec": {"channels": 2, "activation": None}}


def _sync(t):
    if isinstance(t, dict):
        t = next(iter(t.values()))
    jax.device_get(jnp.ravel(t)[:1])


def _best(fn, n_outer=3):
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_trilinear():
    from bio_image_unet_tpu.models import UNet3D

    with _cpu_init_context():
        v = UNet3D(n_filter=NF, use_interpolation=True).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 128, 1)))
    ck = "/tmp/int8_probe_3d_tri.ckpt"
    checkpoint.save(ck, v, {"model_name": "UNet3D", "n_filter": NF,
                            "use_interpolation": True})
    d, h, w = 64, 512, 512
    vol = np.random.default_rng(0).integers(0, 255, (d, h, w),
                                            dtype=np.uint8)
    zs = grid_starts(d, 32, 0)
    xs, ys = grid_starts(h, 128, 0), grid_starts(w, 128, 0)

    def run(quantized):
        eng = _Engine(ck, None, batch_size=4, half_precision=True,
                      quantized=quantized)
        out = eng.fused_predict_volume(vol, zs, xs, ys, (32, 128, 128),
                                       (0.0, 99.8), False)
        _sync(out)
        vol_dev = jnp.asarray(vol)

        def one():
            return eng.fused_predict_volume(vol_dev, zs, xs, ys,
                                            (32, 128, 128), (0.0, 99.8),
                                            False)

        one(); _sync(one())  # settle
        return d * h * w / 1e6 / _best(one)

    return run(False), run(True)


def bench_multi3d():
    from bio_image_unet_tpu.models import MultiOutputUnet3D

    with _cpu_init_context():
        v = MultiOutputUnet3D(n_filter=NF, output_heads=HEADS).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 128, 1)))
    ck = "/tmp/int8_probe_3d_multi.ckpt"
    checkpoint.save(ck, v, {"model_name": "MultiOutputUnet3D",
                            "n_filter": NF, "output_heads": HEADS})
    d, h, w = 64, 512, 512
    vols = np.random.default_rng(1).integers(0, 255, (1, d, h, w),
                                             dtype=np.uint8)
    zs = grid_starts(d, 32, 0)
    xs, ys = grid_starts(h, 128, 0), grid_starts(w, 128, 0)
    factors = _blend_factors((len(zs), len(xs), len(ys)), (32, 128, 128), 8)

    def run(quantized):
        eng = _Engine(ck, None, batch_size=4, half_precision=True,
                      quantized=quantized)
        out = eng.fused_predict_heads_3d(vols, zs, xs, ys, (32, 128, 128),
                                         (0.0, 99.8), factors)
        _sync(out)
        vols_dev = jnp.asarray(vols)

        def one():
            return eng.fused_predict_heads_3d(vols_dev, zs, xs, ys,
                                              (32, 128, 128), (0.0, 99.8),
                                              factors)

        one(); _sync(one())  # settle
        return d * h * w / 1e6 / _best(one)

    return run(False), run(True)


def main():
    results = {}
    for name, fn in (("trilinear_unet3d", bench_trilinear),
                     ("multi_output_unet3d", bench_multi3d)):
        bf16, int8 = fn()
        results[name] = {"bf16_mvox_per_s": round(bf16, 1),
                         "int8_mvox_per_s": round(int8, 1),
                         "speedup": round(int8 / bf16, 3)}
        print(json.dumps({"variant": name, **results[name]}), flush=True)
    with open(OUT, "w") as fh:
        json.dump({"config": f"nf{NF} 64x512x512 uint8, 32x128x128 tiles, "
                             "device-resident, best-of-3; ship-decision "
                             "legs for the non-tconv 'unet3d' variants "
                             "(scale-folded round-5 formulation)",
                   **results}, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
