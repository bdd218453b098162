#!/usr/bin/env python
"""Decision measurement for the round-4 dilated-2D int8 extension: the
dilated trunk (dilation=2, unet/unet.py:5-104 ctor surface) rides the SAME
int8 graph as the measured plain trunk — identical FLOPs and requant
traffic, only ``rhs_dilation`` on the encoder/middle convs differs — but
MXU/vector-unit behavior of dilated int8 convs is an empirical question,
so the ship decision gets its own end-to-end A/B at the headline shapes
(64×1024², 256² tiles, nf32), device-resident, best-of-3.

Writes benchmarks/PROBE_DILATED_INT8.json.  Run alone on the TPU.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from bench import _cpu_init_context
from bio_image_unet_tpu import checkpoint
from bio_image_unet_tpu.predict.predictor import _Engine
from bio_image_unet_tpu.predict.tiling import grid_starts

NF = 32
OUT = os.path.join(ROOT, "benchmarks", "PROBE_DILATED_INT8.json")


def _sync(t):
    jax.device_get(jnp.ravel(t)[:1])


def _best(fn, n_outer=3):
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_dilated(dilation=2):
    from bio_image_unet_tpu.models import Unet

    with _cpu_init_context():
        v = Unet(n_filter=NF, dilation=dilation).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)))
    ck = "/tmp/int8_probe_dilated.ckpt"
    checkpoint.save(ck, v, {"model_name": "Unet", "n_filter": NF,
                            "in_channels": 1, "out_channels": 1,
                            "dilation": dilation})
    frames, h, w = 64, 1024, 1024
    movie = np.random.default_rng(0).integers(0, 255, (frames, h, w),
                                              dtype=np.uint8)
    xs, ys = grid_starts(h, 256, 0), grid_starts(w, 256, 0)

    def run(quantized):
        eng = _Engine(ck, None, batch_size=8, half_precision=True,
                      quantized=quantized)
        fn, chunk = eng.fused_runner(movie[:eng.FUSED_CHUNK_FRAMES], xs, ys,
                                     (256, 256), (0.0, 99.8))
        movie_dev = jax.device_put(movie)

        def one():
            outs = [fn(eng.variables, movie_dev[i: i + chunk])
                    for i in range(0, frames, chunk)]
            return outs[-1]

        one(); _sync(one())  # settle
        return frames * h * w / 1e6 / _best(one)

    return run(False), run(True)


def main():
    assert jax.devices()[0].platform != "cpu", \
        "refusing to measure the ship decision on CPU"
    bf16, int8 = bench_dilated()
    rec = {
        "config": "dilation=2 Unet nf32 fused pipeline, 64x1024^2 uint8, "
                  "256^2 tiles, device-resident, best-of-3",
        "bf16_mpix_per_s": round(bf16, 1),
        "int8_mpix_per_s": round(int8, 1),
        "speedup": round(int8 / bf16, 3),
    }
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
