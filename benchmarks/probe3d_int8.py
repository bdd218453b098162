#!/usr/bin/env python
"""Pipeline-shaped int8-vs-bf16 probe for the 3D family (VERDICT r3 ask #2).

Round 3 probed 3D convs int8-vs-bf16 at the CONV level only (1.10-1.22x,
benchmarks/probe3d.py); this probe answers the production question: a
representative two-level 3D U-Net forward — the full epilogue chain the
real int8 path would pay (int32 accumulate -> f32 dequant+bias ->
leaky_relu -> requant to int8, shared-scale concat, dequant/requant around
the transpose upconv) — at the fused 3D pipeline's true batch shape
(predictor.fused_predict_volume sizes its lax.map step at 2^23 tile voxels
-> batch 16 of (32,128,128) tiles at the FAMILY config-5 geometry).

Decision rule (benchmarks/NOTES.md): ship 3D int8 only if the forward
clears ~1.15x — below that the calibration/requant complexity is not worth
it (the 2D path cleared 1.21x end-to-end and shipped).

Run alone on the TPU (never concurrently with pytest on this 1-core host).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

B = 16                      # fused 3D pipeline batch at (32,128,128) tiles
TZ, TX, TY = 32, 128, 128   # FAMILY config-5 tile
C = 32                      # n_filter
DN = ("NDHWC", "DHWIO", "NDHWC")
rng = np.random.default_rng(0)


def _mk(shape, dtype, scale=0.1):
    return jnp.asarray(rng.random(shape, np.float32) * scale, dtype)


def _mki8(shape):
    return jnp.asarray(rng.integers(-127, 128, shape), jnp.int8)


def conv_f(x, k, b):
    a = lax.conv_general_dilated(x, k, (1, 1, 1), "SAME",
                                 dimension_numbers=DN)
    return jax.nn.leaky_relu(a + b, 0.1)


def pool_f(x):
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")


def build_bf16():
    p = dict(
        k1=_mk((3, 3, 3, 1, C), jnp.bfloat16), b1=_mk((C,), jnp.bfloat16),
        k2=_mk((3, 3, 3, C, C), jnp.bfloat16), b2=_mk((C,), jnp.bfloat16),
        k3=_mk((3, 3, 3, C, 2 * C), jnp.bfloat16), b3=_mk((2 * C,), jnp.bfloat16),
        k4=_mk((3, 3, 3, 2 * C, 2 * C), jnp.bfloat16), b4=_mk((2 * C,), jnp.bfloat16),
        ku=_mk((2, 2, 2, 2 * C, 2 * C), jnp.bfloat16), bu=_mk((2 * C,), jnp.bfloat16),
        k5=_mk((3, 3, 3, 3 * C, C), jnp.bfloat16), b5=_mk((C,), jnp.bfloat16),
        k6=_mk((3, 3, 3, C, C), jnp.bfloat16), b6=_mk((C,), jnp.bfloat16),
        kh=_mk((1, 1, 1, C, 1), jnp.bfloat16), bh=_mk((1,), jnp.bfloat16),
    )

    @jax.jit
    def fwd(x, p):
        e1 = conv_f(x, p["k1"], p["b1"])
        e2 = conv_f(e1, p["k2"], p["b2"])
        d1 = pool_f(e2)
        e3 = conv_f(d1, p["k3"], p["b3"])
        e4 = conv_f(e3, p["k4"], p["b4"])
        up = lax.conv_transpose(e4, p["ku"], (2, 2, 2), "VALID",
                                dimension_numbers=DN,
                                transpose_kernel=True) + p["bu"]
        h = jnp.concatenate([e2, up.astype(e2.dtype)], axis=-1)
        h = conv_f(h, p["k5"], p["b5"])
        h = conv_f(h, p["k6"], p["b6"])
        return lax.conv_general_dilated(h, p["kh"], (1, 1, 1), "SAME",
                                        dimension_numbers=DN)

    return fwd, p


def build_int8():
    p = dict(
        k1=_mk((3, 3, 3, 1, C), jnp.bfloat16), b1=_mk((C,), jnp.float32),
        k2=_mki8((3, 3, 3, C, C)), b2=_mk((C,), jnp.float32),
        k3=_mki8((3, 3, 3, C, 2 * C)), b3=_mk((2 * C,), jnp.float32),
        k4=_mki8((3, 3, 3, 2 * C, 2 * C)), b4=_mk((2 * C,), jnp.float32),
        ku=_mki8((2, 2, 2, 2 * C, 2 * C)), bu=_mk((2 * C,), jnp.float32),
        k5=_mki8((3, 3, 3, 3 * C, C)), b5=_mk((C,), jnp.float32),
        k6=_mki8((3, 3, 3, C, C)), b6=_mk((C,), jnp.float32),
        kh=_mki8((1, 1, 1, C, 1)), bh=_mk((1,), jnp.float32),
    )
    S = 0.013  # representative dequant scale (value is irrelevant to speed)

    def requant(a):
        return jnp.clip(jnp.round(a * (1.0 / S)), -127, 127).astype(jnp.int8)

    def conv_q(x_i8, k_i8, b):
        a = lax.conv_general_dilated(x_i8, k_i8, (1, 1, 1), "SAME",
                                     dimension_numbers=DN,
                                     preferred_element_type=jnp.int32)
        return requant(jax.nn.leaky_relu(a.astype(jnp.float32) * S + b, 0.1))

    def pool_q(x_i8):
        return lax.reduce_window(x_i8, jnp.int8(-128), lax.max,
                                 (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")

    @jax.jit
    def fwd(x, p):
        # encode1 stays bf16 (1->C is MXU-starved; same policy as 2D int8)
        e1 = conv_f(x, p["k1"], p["b1"].astype(jnp.bfloat16))
        e1q = requant(e1.astype(jnp.float32))
        e2 = conv_q(e1q, p["k2"], p["b2"])
        e3 = conv_q(pool_q(e2), p["k3"], p["b3"])
        e4 = conv_q(e3, p["k4"], p["b4"])
        a = lax.conv_transpose(e4, p["ku"], (2, 2, 2), "VALID",
                               dimension_numbers=DN, transpose_kernel=True,
                               preferred_element_type=jnp.int32)
        upq = requant(a.astype(jnp.float32) * S + p["bu"])
        h = jnp.concatenate([e2, upq], axis=-1)  # shared requant scale
        h = conv_q(h, p["k5"], p["b5"])
        h = conv_q(h, p["k6"], p["b6"])
        # head stays float (same policy as 2D int8)
        hf = h.astype(jnp.bfloat16) * jnp.bfloat16(S)
        return lax.conv_general_dilated(
            hf, p["kh"].astype(jnp.bfloat16), (1, 1, 1), "SAME",
            dimension_numbers=DN) + p["bh"].astype(jnp.bfloat16)

    return fwd, p


def _best(fn, x, p, n=3):
    out = fn(x, p)
    jax.device_get(jnp.ravel(out)[:1])  # warm + forced sync
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(x, p)
        jax.device_get(jnp.ravel(out)[:1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    x = jnp.asarray(rng.random((B, TZ, TX, TY, 1), np.float32), jnp.bfloat16)
    fwd_b, p_b = build_bf16()
    t_bf16 = _best(fwd_b, x, p_b)
    fwd_q, p_q = build_int8()
    t_int8 = _best(fwd_q, x, p_q)
    vox = B * TZ * TX * TY
    result = {
        "probe": "3d_unet_forward_int8_vs_bf16",
        "shape": f"B{B} ({TZ},{TX},{TY}) nf{C}, 2-level 3D U-Net incl. "
                 "requant epilogues, transpose upconv, shared-scale concat",
        "bf16_ms": round(t_bf16 * 1e3, 2),
        "int8_ms": round(t_int8 * 1e3, 2),
        "speedup": round(t_bf16 / t_int8, 3),
        "bf16_mvox_per_s": round(vox / t_bf16 / 1e6, 1),
        "int8_mvox_per_s": round(vox / t_int8 / 1e6, 1),
        "decision_rule": "ship 3D int8 only if speedup >= ~1.15",
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "PROBE3D_INT8.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
