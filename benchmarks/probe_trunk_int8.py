#!/usr/bin/env python
"""Decision measurements for the round-4 2D-trunk int8 extensions — one
parameterized harness (same timing protocol for every family, so the
ship-decision numbers stay comparable):

- ``dilated``  — dilation=2 Unet rides the plain int8 graph via
  ``rhs_dilation`` (identical FLOPs/requant traffic to the measured plain
  trunk, but dilated-conv MXU behavior is an empirical question).
  Writes PROBE_DILATED_INT8.json.  Measured: **1.333×** (247.4→329.7 MP/s).
- ``attention`` — AttentionUnet quantizes its trunk with the four gates in
  FLOAT (the gate multiplies two traced activations — skip × psi — so w8a8
  does not apply to it; the graph dequantizes around each gate).  The open
  question was whether per-level dequant→gate→requant dilutes the trunk win
  below the ~1.15× bar (UNet++'s denser per-cell version measured 0.62×).
  Writes PROBE_ATTENTION_INT8.json.  Measured: **1.338×** (217.6→291.2).

End-to-end A/B at the headline shapes (64×1024² uint8, 256² tiles, nf32),
device-resident, best-of-3.  Usage: ``python probe_trunk_int8.py
[dilated|attention]`` (default: both).  Run alone on the TPU.
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


def _make_ckpt(family):
    from bio_image_unet_tpu.models import AttentionUnet, Unet

    path = f"/tmp/int8_probe_{family}.ckpt"
    with _cpu_init_context():
        if family == "dilated":
            v = Unet(n_filter=NF, dilation=2).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)))
            hp = {"model_name": "Unet", "n_filter": NF, "in_channels": 1,
                  "out_channels": 1, "dilation": 2}
        else:
            v = AttentionUnet(n_filter=NF).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)))
            hp = {"model_name": "AttentionUnet", "n_filter": NF,
                  "in_channels": 1, "out_channels": 1}
    checkpoint.save(path, v, hp)
    return path


def bench_family(family):
    ck = _make_ckpt(family)
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


_CONFIG = {
    "dilated": ("PROBE_DILATED_INT8.json",
                "dilation=2 Unet nf32 fused pipeline, 64x1024^2 uint8, "
                "256^2 tiles, device-resident, best-of-3"),
    "attention": ("PROBE_ATTENTION_INT8.json",
                  "AttentionUnet nf32 fused pipeline (float gates, int8 "
                  "trunk), 64x1024^2 uint8, 256^2 tiles, device-resident, "
                  "best-of-3"),
}


def main():
    assert jax.devices()[0].platform != "cpu", \
        "refusing to measure the ship decision on CPU"
    families = sys.argv[1:] or list(_CONFIG)
    for family in families:
        out_name, config = _CONFIG[family]
        bf16, int8 = bench_family(family)
        rec = {
            "config": config,
            "bf16_mpix_per_s": round(bf16, 1),
            "int8_mpix_per_s": round(int8, 1),
            "speedup": round(int8 / bf16, 3),
        }
        with open(os.path.join(ROOT, "benchmarks", out_name), "w") as f:
            json.dump(rec, f, indent=1)
        print(json.dumps({"family": family, **rec}))


if __name__ == "__main__":
    main()
