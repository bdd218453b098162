#!/usr/bin/env python
"""Model-level w8a8 quantized-inference A/B: the EXACT Unet nf32 fastpath
graph (predict/fastpath.py apply_fn — encoder/middle/decoder with tconv
up-convs and skip concats) hand-built twice, bf16 vs int8×int8→int32 convs
with per-conv dequant→bias→leaky_relu→requant epilogues, timed on resident
256² tile batches.

benchmarks/probe_int8.py showed isolated convs gain 1.19-1.37× from the MXU
int8 path at this model's channel widths; this probe answers whether the
gain survives the full graph (requantization epilogues, maxpools, transposed
convs, concats) before committing to a quantized fast path.  Scales are
dummies (1.0) — irrelevant for speed, the epilogue arithmetic is identical.

Run alone on the TPU.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

NF = 32
BATCH = 256  # the fused pipeline's self-sized lax.map batch (predictor.py:500-502)
TILE = 256
REPEAT = 4

DN = ("NHWC", "HWIO", "NHWC")

# (name, cin, cout) in fastpath graph order — encoder + middle
ENC = [("encode1", 1, NF), ("encode2", NF, NF),
       ("encode3", NF, 2 * NF), ("encode4", 2 * NF, 2 * NF),
       ("encode5", 2 * NF, 4 * NF), ("encode6", 4 * NF, 4 * NF),
       ("encode7", 4 * NF, 8 * NF), ("encode8", 8 * NF, 8 * NF)]
MID = [("middle_conv1", 8 * NF, 16 * NF), ("middle_conv2", 16 * NF, 16 * NF)]
# decoder: up{i} tconv halves channels, then concat skip doubles them
DEC = [("up1", 16 * NF, 8 * NF), ("decode1", 16 * NF, 8 * NF), ("decode2", 8 * NF, 8 * NF),
       ("up2", 8 * NF, 4 * NF), ("decode3", 8 * NF, 4 * NF), ("decode4", 4 * NF, 4 * NF),
       ("up3", 4 * NF, 2 * NF), ("decode5", 4 * NF, 2 * NF), ("decode6", 2 * NF, 2 * NF),
       ("up4", 2 * NF, NF), ("decode7", 2 * NF, NF), ("decode8", NF, NF)]


def _weights(dtype):
    rng = np.random.default_rng(0)
    w = {}
    for name, cin, cout in ENC + MID + DEC:
        shape = (2, 2, cout, cin) if name.startswith("up") else (3, 3, cin, cout)
        if dtype == "int8":
            w[name] = (jnp.asarray(rng.integers(-127, 127, shape), jnp.int8),
                       jnp.asarray(rng.random(cout, np.float32) * 1e-3),
                       jnp.asarray(rng.random(cout, np.float32)))
        else:
            w[name] = (jnp.asarray(rng.random(shape, np.float32) * 0.05,
                                   jnp.bfloat16),
                       jnp.asarray(rng.random(cout, np.float32), jnp.bfloat16))
    fshape = (1, 1, NF, 1)
    if dtype == "int8":
        w["final"] = (jnp.asarray(rng.integers(-127, 127, fshape), jnp.int8),
                      jnp.asarray(rng.random(1, np.float32) * 1e-3),
                      jnp.asarray(rng.random(1, np.float32)))
    else:
        w["final"] = (jnp.asarray(rng.random(fshape, np.float32) * 0.05,
                                  jnp.bfloat16),
                      jnp.asarray(rng.random(1, np.float32), jnp.bfloat16))
    return w


def _max_pool(x):
    return lax.reduce_window(x, x.dtype.type(-127 if x.dtype == jnp.int8
                                             else -np.inf),
                             lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def build_bf16(w):
    def conv(x, name):
        k, b = w[name]
        y = lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                     dimension_numbers=DN) + b
        return jax.nn.leaky_relu(y, 0.1)

    def tconv(x, name):
        k, b = w[name]
        return lax.conv_transpose(x, k, (2, 2), "VALID",
                                  dimension_numbers=DN,
                                  transpose_kernel=True) + b

    @jax.jit
    def fwd(x):
        x = x.astype(jnp.bfloat16) * (1.0 / 255.0)
        e2 = conv(conv(x, "encode1"), "encode2")
        e4 = conv(conv(_max_pool(e2), "encode3"), "encode4")
        e6 = conv(conv(_max_pool(e4), "encode5"), "encode6")
        e8 = conv(conv(_max_pool(e6), "encode7"), "encode8")
        h = conv(conv(_max_pool(e8), "middle_conv1"), "middle_conv2")
        for i, skip in zip(range(1, 5), (e8, e6, e4, e2)):
            u = tconv(h, f"up{i}")
            h = jnp.concatenate([u, skip], axis=-1)
            h = conv(conv(h, f"decode{2 * i - 1}"), f"decode{2 * i}")
        k, b = w["final"]
        logits = (lax.conv_general_dilated(h, k, (1, 1), "VALID",
                                           dimension_numbers=DN)
                  + b).astype(jnp.float32)
        return (jax.nn.sigmoid(logits) * 255.0).astype(jnp.uint8)

    return fwd


def build_int8(w):
    """w8a8: int8 conv → int32 accumulate → f32 dequant+bias+leaky →
    requantize to int8 for the next conv (static per-tensor scales — the
    production path would calibrate them; arithmetic is identical)."""

    def requant(y):  # f32 → int8, scale folded into the preceding dequant
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

    def conv(x, name):
        k, s, b = w[name]
        y = lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                     dimension_numbers=DN,
                                     preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * s + b
        return requant(jax.nn.leaky_relu(y, 0.1))

    def tconv(x, name):
        k, s, b = w[name]
        y = lax.conv_transpose(x, k, (2, 2), "VALID",
                               dimension_numbers=DN, transpose_kernel=True,
                               preferred_element_type=jnp.int32)
        return requant(y.astype(jnp.float32) * s + b)

    @jax.jit
    def fwd(x):
        x = (x.astype(jnp.int16) - 128).astype(jnp.int8)  # u8 → symmetric i8
        e2 = conv(conv(x, "encode1"), "encode2")
        e4 = conv(conv(_max_pool(e2), "encode3"), "encode4")
        e6 = conv(conv(_max_pool(e4), "encode5"), "encode6")
        e8 = conv(conv(_max_pool(e6), "encode7"), "encode8")
        h = conv(conv(_max_pool(e8), "middle_conv1"), "middle_conv2")
        for i, skip in zip(range(1, 5), (e8, e6, e4, e2)):
            u = tconv(h, f"up{i}")
            h = jnp.concatenate([u, skip], axis=-1)
            h = conv(conv(h, f"decode{2 * i - 1}"), f"decode{2 * i}")
        k, s, b = w["final"]
        logits = lax.conv_general_dilated(
            h, k, (1, 1), "VALID", dimension_numbers=DN,
            preferred_element_type=jnp.int32).astype(jnp.float32) * s + b
        return (jax.nn.sigmoid(logits) * 255.0).astype(jnp.uint8)

    return fwd


def measure(fwd, x):
    out = fwd(x)
    jax.device_get(jnp.ravel(out)[:1])  # warm + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPEAT):
            out = fwd(x)
        jax.device_get(jnp.ravel(out)[:1])
        best = min(best, (time.perf_counter() - t0) / REPEAT)
    mpix = BATCH * TILE * TILE / 1e6
    return mpix / best


def main():
    x = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (BATCH, TILE, TILE, 1)), jnp.uint8)
    r_bf16 = measure(build_bf16(_weights("bf16")), x)
    r_int8 = measure(build_int8(_weights("int8")), x)
    print(json.dumps({"bf16_mpix_per_s": round(r_bf16, 1),
                      "int8_mpix_per_s": round(r_int8, 1),
                      "speedup": round(r_int8 / r_bf16, 3)}))


if __name__ == "__main__":
    main()
