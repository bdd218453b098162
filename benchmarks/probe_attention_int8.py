#!/usr/bin/env python
"""Decision measurement for the round-4 AttentionUnet int8 formulation:
quantized trunk with FLOAT gates (the gate multiplies two traced
activations — skip × psi — so w8a8 does not apply to it; the int8 graph
dequantizes around each of the four gates like it does for the float
output heads).  The open question is whether the per-level
dequant→gate→requant traffic at skip resolution dilutes the trunk's int8
win below the ~1.15× ship bar (UNet++'s denser per-cell version measured
0.62× at cell level).  End-to-end A/B at the headline shapes (64×1024²,
256² tiles, nf32), device-resident, best-of-3.

Writes benchmarks/PROBE_ATTENTION_INT8.json.  Run alone on the TPU.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("BIU_INT8_EXPERIMENTAL", "1")  # the probe IS the gate

import jax
import jax.numpy as jnp

from bench import _cpu_init_context
from bio_image_unet_tpu import checkpoint
from bio_image_unet_tpu.predict.predictor import _Engine
from bio_image_unet_tpu.predict.tiling import grid_starts

NF = 32
OUT = os.path.join(ROOT, "benchmarks", "PROBE_ATTENTION_INT8.json")


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


def bench_attention():
    from bio_image_unet_tpu.models import AttentionUnet

    with _cpu_init_context():
        v = AttentionUnet(n_filter=NF).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)))
    ck = "/tmp/int8_probe_attention.ckpt"
    checkpoint.save(ck, v, {"model_name": "AttentionUnet", "n_filter": NF,
                            "in_channels": 1, "out_channels": 1})
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
    bf16, int8 = bench_attention()
    rec = {
        "config": "AttentionUnet nf32 fused pipeline (float gates, int8 "
                  "trunk), 64x1024^2 uint8, 256^2 tiles, device-resident, "
                  "best-of-3",
        "bf16_mpix_per_s": round(bf16, 1),
        "int8_mpix_per_s": round(int8, 1),
        "speedup": round(int8 / bf16, 3),
    }
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
