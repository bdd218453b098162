#!/usr/bin/env python
"""Component breakdown of the fused multi-head predict program.

INT8_r04.json measured the MultiOutputUnet fused pipeline at 20.5 MP/s bf16
— 13x slower per pixel than the plain 2D fused program (273 MP/s), despite
an identical conv trunk (multi_output_unet.py:6-134 is the Unet trunk plus
1x1 heads).  This probe separates the candidate costs so the fix (if any)
is targeted, not guessed:

  latency    — a 1-element identity program: the fixed dispatch+sync round
               trip over the tunneled link, which bounds any
               one-dispatch-per-sync timing (first probe revision measured
               trivial 8 MP reductions at ~28 ms — all latency)
  upload     — host->device transfer of the uint8 movie (the r04 bench's
               timed call ran `jnp.asarray` on a host array every iteration)
  fwd512/fwd256 — the bare multi-head forward at the heads path's
               16x512^2 batching vs the 2D path's 64x256^2 batching
  fwd256_plain — plain Unet control at 64x256^2: same trunk minus heads —
               the 2D headline's forward
  fused_dev  — the full fused_predict_heads program, input on device
  fused_host — same with a host numpy input (what the r04 bench timed)
  bounds/stitch — the non-forward components alone

All compute legs chain CHAIN async dispatches per sync (the 2D bench's own
pattern) so the tunnel round trip is amortized, and report per-dispatch
latency-free throughput alongside.

Run alone on the TPU (never concurrently with pytest on this 1-core host).
Prints one JSON line; writes benchmarks/PROBE_HEADS_BREAKDOWN.json.
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
from bio_image_unet_tpu.predict.tiling import _margin_factors, grid_starts

NF = 32
CHAIN = 8  # async dispatches per sync
OUT = os.path.join(ROOT, "benchmarks", "PROBE_HEADS_BREAKDOWN.json")


def _sync(t):
    jax.device_get(jnp.ravel(t)[:1])


def _pick(out):
    return out if not isinstance(out, dict) else next(iter(out.values()))


def _best_chain(fn, n=3):
    """Best wall time of CHAIN chained dispatches + ONE sync."""
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(CHAIN):
            out = fn()
        _sync(_pick(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from bio_image_unet_tpu.models import MultiOutputUnet, Unet

    heads = {"mask": {"channels": 1, "activation": "sigmoid"},
             "orientation": {"channels": 2, "activation": None}}
    with _cpu_init_context():
        v = MultiOutputUnet(n_filter=NF, output_heads=heads).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)))
        vp = Unet(n_filter=NF).init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    ck = "/tmp/probe_heads.ckpt"
    checkpoint.save(ck, v, {"model_name": "MultiOutputUnet", "n_filter": NF,
                            "in_channels": 1, "output_heads": heads})
    ckp = "/tmp/probe_heads_plain.ckpt"
    checkpoint.save(ckp, vp, {"model_name": "Unet", "n_filter": NF,
                              "in_channels": 1, "out_channels": 1})

    frames, h, w, ph = 8, 1024, 1024, 512
    mp = frames * h * w / 1e6
    imgs = np.random.default_rng(0).integers(0, 255, (frames, h, w),
                                             dtype=np.uint8)
    xs, ys = grid_starts(h, ph, 0), grid_starts(w, ph, 0)
    factors = _margin_factors((len(xs), len(ys)), (ph, ph), 20)

    eng = _Engine(ck, None, batch_size=8, half_precision=True)
    eng_p = _Engine(ckp, None, batch_size=8, half_precision=True)
    res = {"workload": f"{frames}x{h}x{w} uint8, {ph}^2 tiles, nf{NF}, "
                       "2 heads (1+2ch), bf16",
           "chain": CHAIN}

    # --- fixed dispatch+sync round trip
    ident = jax.jit(lambda a: a + 1)
    one_el = jnp.zeros((1,), jnp.float32)
    _sync(ident(one_el))
    t0 = time.perf_counter()
    for _ in range(5):
        _sync(ident(one_el))
    res["latency_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 2)

    # --- upload (synchronous: jnp.asarray blocks the chain on real data)
    def up():
        t0 = time.perf_counter()
        d = jax.device_put(imgs)
        _sync(d)
        return time.perf_counter() - t0

    up()
    t_up = min(up() for _ in range(3))
    res["upload_ms"] = round(t_up * 1e3, 2)
    res["upload_MBps"] = round(imgs.nbytes / 1e6 / t_up, 1)

    # --- bare forwards, chained
    def make_fwd(engine):
        return jax.jit(lambda vv, b: engine._forward_with(
            engine._apply_fn, engine.dtype, b, None, False, vv))

    fwd, fwd_p = make_fwd(eng), make_fwd(eng_p)
    legs = {"fwd512": (eng, fwd, 16, 512), "fwd256": (eng, fwd, 64, 256),
            "fwd256_plain": (eng_p, fwd_p, 64, 256)}
    for label, (engine, f, bs, t) in legs.items():
        batch = jnp.asarray(
            np.random.default_rng(1).random((bs, t, t, 1), np.float32))
        _sync(_pick(f(engine.variables, batch)))
        dt = _best_chain(lambda: f(engine.variables, batch))
        res[f"{label}_mpix_per_s"] = round(CHAIN * bs * t * t / 1e6 / dt, 1)

    # --- full fused program, device-resident vs host input, chained
    def run_fused(inp):
        return eng.fused_predict_heads(inp, xs, ys, (ph, ph), (0.0, 99.98),
                                       factors)["mask"]

    _sync(run_fused(imgs))
    imgs_dev = jax.device_put(imgs)
    res["fused_dev_mpix_per_s"] = round(
        CHAIN * mp / _best_chain(lambda: run_fused(imgs_dev)), 1)
    res["fused_host_mpix_per_s"] = round(
        CHAIN * mp / _best_chain(lambda: run_fused(imgs)), 1)

    # --- per-frame percentile bounds alone (16-pass bitwise search)
    from bio_image_unet_tpu.predict.predictor import _device_frame_bounds

    bounds = jax.jit(lambda m: _device_frame_bounds(m, (0.0, 99.98), 8)[1])
    _sync(bounds(imgs_dev))
    res["bounds_ms"] = round(
        (_best_chain(lambda: bounds(imgs_dev)) / CHAIN) * 1e3, 2)

    # --- stitch alone at bench shapes (per-frame patches, both heads' widths)
    from bio_image_unet_tpu.ops.stitch import _stitch_factored_xla

    per = len(xs) * len(ys)
    gx, gy = np.meshgrid(np.asarray(xs), np.asarray(ys), indexing="ij")
    starts = np.stack([gx.ravel(), gy.ravel()], 1).astype(np.int32)
    gi, gj = np.meshgrid(np.arange(len(xs)), np.arange(len(ys)), indexing="ij")
    gidx = np.stack([gi.ravel(), gj.ravel()], 1).astype(np.int32)
    facs = tuple(jnp.asarray(f) for f in factors)

    @jax.jit
    def stitch(framed):
        def one(fp):
            out, wsum = _stitch_factored_xla(fp, facs, jnp.asarray(gidx),
                                             jnp.asarray(starts), (h, w))
            return out / jnp.maximum(wsum, 1e-12)

        return jax.vmap(one)(framed)

    framed = jnp.asarray(np.random.default_rng(2).random(
        (frames, per, ph, ph, 3), np.float32))  # 3 = total head channels
    _sync(stitch(framed))
    res["stitch_ms"] = round(
        (_best_chain(lambda: stitch(framed)) / CHAIN) * 1e3, 2)

    print(json.dumps(res))
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
