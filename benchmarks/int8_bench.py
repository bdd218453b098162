#!/usr/bin/env python
"""Same-session bf16-vs-int8 A/B of the fused predict pipelines for every
family with an int8 formulation: the shipped 2D trunk paths (predict/
quant.py: 2D, Siam, multi-head) AND the measurement-gated families
(quant_nested.py UNet++, quant3d.py 3D) — the nested/unet3d legs ARE the
ship/no-ship decision measurements for quant._MEASURED_INT8 (~1.15x rule,
VERDICT r3 ask #2): set BIU_INT8_EXPERIMENTAL in-process so their engines
build the int8 path regardless of the gate.

Writes benchmarks/INT8_r05.json and prints one JSON line per family.  Each
leg times the SAME fused program path with `quantized=` toggled, device-
resident inputs, forced sync (`jax.device_get` of one element — this
runtime's `block_until_ready` does not reliably block).

Run alone on the TPU (never concurrently with pytest on this 1-core host).
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

from bench import _cpu_init_context  # guarded CPU-device walk (bench.py)
from bio_image_unet_tpu import checkpoint
from bio_image_unet_tpu.predict.predictor import _Engine
from bio_image_unet_tpu.predict.tiling import _margin_factors, grid_starts

NF = 32
OUT = os.path.join(ROOT, "benchmarks", "INT8_r05.json")


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


def bench_2d():
    from bio_image_unet_tpu.models import Unet

    with _cpu_init_context():
        v = Unet(n_filter=NF).init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 256, 256, 1)))
    ck = "/tmp/int8_bench_2d.ckpt"
    checkpoint.save(ck, v, {"model_name": "Unet", "n_filter": NF,
                            "in_channels": 1, "out_channels": 1})
    frames, h, w = 64, 1024, 1024
    movie = np.random.default_rng(0).integers(0, 255, (frames, h, w),
                                              dtype=np.uint8)
    xs, ys = grid_starts(h, 256, 0), grid_starts(w, 256, 0)

    def run(quantized):
        eng = _Engine(ck, None, batch_size=8, half_precision=True,
                      quantized=quantized)
        # supported accessor: warms + calibrates and returns the exact
        # chunk program the e2e path dispatches (VERDICT r3 weak #3)
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


def bench_siam():
    from bio_image_unet_tpu.models import Siam_UNet

    with _cpu_init_context():
        v = Siam_UNet(n_filter=NF).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)),
            jnp.zeros((1, 256, 256, 1)))
    ck = "/tmp/int8_bench_siam.ckpt"
    checkpoint.save(ck, v, {"model_name": "Siam_UNet", "n_filter": NF,
                            "mode": "max"})
    h, w, k = 1024, 1024, 16
    block = np.random.default_rng(0).integers(0, 255, (k + 1, h, w),
                                              dtype=np.uint8)
    xs, ys = grid_starts(h, 256, 0), grid_starts(w, 256, 0)

    def run(quantized):
        eng = _Engine(ck, "Siam_UNet", batch_size=8, half_precision=True,
                      quantized=quantized)
        out = eng.fused_predict_pairs(block, xs, ys, (256, 256),
                                      (0.0, 99.98), False, "single")
        _sync(out)
        block_dev = jnp.asarray(block)

        def one():
            outs = [eng.fused_predict_pairs(block_dev, xs, ys, (256, 256),
                                            (0.0, 99.98), False, "single")
                    for _ in range(2)]
            return outs[-1]

        return 2 * k * h * w / 1e6 / _best(one)

    return run(False), run(True)


def bench_multi_output():
    from bio_image_unet_tpu.models import MultiOutputUnet

    heads = {"mask": {"channels": 1, "activation": "sigmoid"},
             "orientation": {"channels": 2, "activation": None}}
    with _cpu_init_context():
        v = MultiOutputUnet(n_filter=NF, output_heads=heads).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)))
    ck = "/tmp/int8_bench_mo.ckpt"
    checkpoint.save(ck, v, {"model_name": "MultiOutputUnet", "n_filter": NF,
                            "in_channels": 1, "output_heads": heads})
    frames, h, w, ph = 8, 1024, 1024, 512
    imgs = np.random.default_rng(0).integers(0, 255, (frames, h, w),
                                             dtype=np.uint8)
    xs, ys = grid_starts(h, ph, 0), grid_starts(w, ph, 0)
    factors = _margin_factors((len(xs), len(ys)), (ph, ph), 20)

    def run(quantized):
        eng = _Engine(ck, None, batch_size=8, half_precision=True,
                      quantized=quantized)
        out = eng.fused_predict_heads(imgs, xs, ys, (ph, ph), (0.0, 99.98),
                                      factors)
        _sync(out["mask"])
        # device-resident input like every other leg (bench_nested comment):
        # the r04 run timed this leg with a host array, paying the tunnel
        # upload inside every iteration — benchmarks/PROBE_HEADS_BREAKDOWN
        # quantifies the split
        imgs_dev = jnp.asarray(imgs)

        def one():
            return eng.fused_predict_heads(imgs_dev, xs, ys, (ph, ph),
                                           (0.0, 99.98), factors)["mask"]

        one(); _sync(one())  # settle
        return frames * h * w / 1e6 / _best(one)

    return run(False), run(True)


def bench_nested():
    """UNet++ decision leg (quant_nested.py): 4-level grid at reference
    scale through the fused multi-head pipeline."""
    os.environ["BIU_INT8_EXPERIMENTAL"] = "1"
    from bio_image_unet_tpu.models import MultiOutputNestedUNet

    heads = {"mask": {"channels": 1, "activation": "sigmoid"}}
    with _cpu_init_context():
        v = MultiOutputNestedUNet(n_filter=NF, output_heads=heads).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)))
    ck = "/tmp/int8_bench_nested.ckpt"
    checkpoint.save(ck, v, {"model_name": "MultiOutputNestedUNet",
                            "n_filter": NF, "output_heads": heads})
    # the dense grid keeps full-res activations for every column: smaller
    # patches than the plain multi-head leg, same total pixels per dispatch
    frames, h, w, ph = 8, 1024, 1024, 512
    imgs = np.random.default_rng(0).integers(0, 255, (frames, h, w),
                                             dtype=np.uint8)
    xs, ys = grid_starts(h, ph, 0), grid_starts(w, ph, 0)
    factors = _margin_factors((len(xs), len(ys)), (ph, ph), 20)

    def run(quantized):
        eng = _Engine(ck, None, batch_size=4, half_precision=True,
                      quantized=quantized)
        out = eng.fused_predict_heads(imgs, xs, ys, (ph, ph), (0.0, 99.98),
                                      factors)
        _sync(out["mask"])
        # device-resident input: the timed region must not pay the tunnel
        # upload, or the int8-vs-bf16 ratio this ship gate decides on is
        # diluted by identical transfer time on both legs
        imgs_dev = jnp.asarray(imgs)

        def one():
            return eng.fused_predict_heads(imgs_dev, xs, ys, (ph, ph),
                                           (0.0, 99.98), factors)["mask"]

        one(); _sync(one())  # settle
        return frames * h * w / 1e6 / _best(one)

    return run(False), run(True)


def bench_unet3d():
    """3D decision leg (quant3d.py): UNet3D tconv decoder at the FAMILY
    config-5 geometry through the fused volume pipeline."""
    os.environ["BIU_INT8_EXPERIMENTAL"] = "1"
    from bio_image_unet_tpu.models import UNet3D

    with _cpu_init_context():
        v = UNet3D(n_filter=NF).init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 32, 128, 128, 1)))
    ck = "/tmp/int8_bench_3d.ckpt"
    checkpoint.save(ck, v, {"model_name": "UNet3D", "n_filter": NF})
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
        # device-resident input (see bench_nested: keep the tunnel upload
        # out of the ship-gate ratio)
        vol_dev = jnp.asarray(vol)

        def one():
            return eng.fused_predict_volume(vol_dev, zs, xs, ys,
                                            (32, 128, 128), (0.0, 99.8),
                                            False)

        one(); _sync(one())  # settle
        return d * h * w / 1e6 / _best(one)

    return run(False), run(True)


def main():
    results = {}
    legs = [("2d_unet", bench_2d), ("siam", bench_siam),
            ("multi_output", bench_multi_output),
            ("nested_unetpp", bench_nested), ("unet3d", bench_unet3d)]
    for name, fn in legs:
        bf16, int8 = fn()
        unit = "mvox_per_s" if name == "unet3d" else "mpix_per_s"
        results[name] = {f"bf16_{unit}": round(bf16, 1),
                         f"int8_{unit}": round(int8, 1),
                         "speedup": round(int8 / bf16, 3)}
        print(json.dumps({"family": name, **results[name]}), flush=True)
    with open(OUT, "w") as fh:
        json.dump({"config": f"nf{NF} bf16-vs-int8 fused pipelines, "
                             "device-resident, best-of-3; nested_unetpp/"
                             "unet3d are the _MEASURED_INT8 decision legs "
                             "(ship >= ~1.15x)",
                   **results}, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
