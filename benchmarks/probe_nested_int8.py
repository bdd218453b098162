#!/usr/bin/env python
"""Cell-level int8-vs-bf16 probe for a UNet++ dense-lattice cell (x_{0,2}:
3-way concat incl. a bilinear upsample, then a 2-conv VGG block, full-res
512² at nf32's top-row channel width).

Decides whether a UNet++ int8 path is worth building: the int8 version pays
dequant→bilinear→requant for the upsample plus per-partner rescales at full
resolution — the epilogue-traffic class that diluted the plain graph's
1.54× to 1.26× (benchmarks/NOTES.md).  Written in round 3; a TPU tunnel
outage blocked the measurement — run it when deciding on UNet++ int8.

Run alone on the TPU.
"""

import json
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from bio_image_unet_tpu.ops.functional import upsample_linear

B, T, C = 32, 512, 32  # full-res UNet++ top-row cell at nf32, 512^2 tiles
rng = np.random.default_rng(0)
DN = ("NHWC", "HWIO", "NHWC")

# cell x_{0,2}: concat[x00 (C), x01 (C), up(x11) (2C->..)] -> VGG 2 convs
x00_f = jnp.asarray(rng.random((B, T, T, C), np.float32) * 2, jnp.bfloat16)
x01_f = jnp.asarray(rng.random((B, T, T, C), np.float32) * 2, jnp.bfloat16)
x11_f = jnp.asarray(rng.random((B, T//2, T//2, 2*C), np.float32) * 2, jnp.bfloat16)
k1b = jnp.asarray(rng.random((3, 3, 4*C, C), np.float32) * 0.1, jnp.bfloat16)
k2b = jnp.asarray(rng.random((3, 3, C, C), np.float32) * 0.1, jnp.bfloat16)

@jax.jit
def cell_bf16(x00, x01, x11, k1, k2):
    up = upsample_linear(x11, 2, align_corners=True)
    h = jnp.concatenate([x00, x01, up], axis=-1)
    h = jax.nn.leaky_relu(lax.conv_general_dilated(h, k1, (1,1), "SAME",
                                                   dimension_numbers=DN), 0.1)
    return jax.nn.leaky_relu(lax.conv_general_dilated(h, k2, (1,1), "SAME",
                                                      dimension_numbers=DN), 0.1)

x00_q = jnp.asarray(rng.integers(-127, 127, (B, T, T, C)), jnp.int8)
x01_q = jnp.asarray(rng.integers(-127, 127, (B, T, T, C)), jnp.int8)
x11_q = jnp.asarray(rng.integers(-127, 127, (B, T//2, T//2, 2*C)), jnp.int8)
k1q = jnp.asarray(rng.integers(-127, 127, (3, 3, 4*C, C)), jnp.int8)
k2q = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)

@jax.jit
def cell_int8(x00, x01, x11, k1, k2):
    # upsample needs float: dequant -> bilinear -> requant
    up_f = upsample_linear(x11.astype(jnp.float32) * 0.01, 2,
                           align_corners=True)
    up_q = jnp.clip(jnp.round(up_f / 0.011), -127, 127).astype(jnp.int8)
    # concat partners rescaled to a shared scale (two full-res passes)
    a = jnp.clip(jnp.round(x00.astype(jnp.float32) * 0.9), -127, 127).astype(jnp.int8)
    b = jnp.clip(jnp.round(x01.astype(jnp.float32) * 0.8), -127, 127).astype(jnp.int8)
    h = jnp.concatenate([a, b, up_q], axis=-1)
    y = lax.conv_general_dilated(h, k1, (1,1), "SAME", dimension_numbers=DN,
                                 preferred_element_type=jnp.int32)
    h = jnp.clip(jnp.round(jax.nn.leaky_relu(y.astype(jnp.float32)*1e-3, 0.1)/0.01),
                 -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(h, k2, (1,1), "SAME", dimension_numbers=DN,
                                 preferred_element_type=jnp.int32)
    return jnp.clip(jnp.round(jax.nn.leaky_relu(y.astype(jnp.float32)*1e-3, 0.1)/0.01),
                    -127, 127).astype(jnp.int8)

def t(f, *a):
    o = f(*a); jax.device_get(jnp.ravel(o)[:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3): o = f(*a)
        jax.device_get(jnp.ravel(o)[:1])
        best = min(best, (time.perf_counter()-t0)/3)
    return best*1e3

tb = t(cell_bf16, x00_f, x01_f, x11_f, k1b, k2b)
ti = t(cell_int8, x00_q, x01_q, x11_q, k1q, k2q)
print(json.dumps({"bf16_ms": round(tb,2), "int8_ms": round(ti,2),
                  "speedup": round(tb/ti, 3)}))
