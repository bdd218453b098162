#!/usr/bin/env python
"""A/B: int8 conv epilogues in bf16 vs f32 (candidate int8 speedup).

The shipped w8a8 graph (predict/quant.py) dequantizes each int32 conv
accumulator in f32 (scale-mul + bias + leaky_relu + requant).  XLA fuses the
chain into the conv output write, but f32 intermediates carry 2x the
register/VMEM traffic of bf16.  This probe times the SAME int8 2D U-Net
forward with both epilogue dtypes at the fused pipeline's true batch shape
(256-tile lax.map step per the round-3 note in benchmarks/NOTES.md) and
reports the accuracy cost (bf16 has 8 mantissa bits; int32 accumulators up
to ~127*127*9*C lose relative precision ~0.4%, comparable to one int8
quantization step — measure, don't assume).

Decision rule: adopt bf16 epilogues (as a quant.py-wide change, A/B'd again
end-to-end) only if this forward-level probe clears ~1.08x AND the sigmoid
delta stays within one uint8 level; otherwise record the losing A/B in
benchmarks/NOTES.md.

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

B, T, C = 256, 256, 32  # fused-pipeline map step: 256 tiles of 256², nf32
DN = ("NHWC", "HWIO", "NHWC")
rng = np.random.default_rng(0)


def build(ep_dtype):
    """Minimal 2-level int8 U-Net slice with the shipped epilogue chain,
    parameterized by the dequant/requant compute dtype."""
    def mki8(shape):
        return jnp.asarray(rng.integers(-127, 128, shape), jnp.int8)

    p = dict(
        k1=jnp.asarray(rng.random((3, 3, 1, C), np.float32) * 0.1, jnp.bfloat16),
        b1=jnp.asarray(rng.random((C,), np.float32), jnp.float32),
        k2=mki8((3, 3, C, C)), k3=mki8((3, 3, C, 2 * C)),
        k4=mki8((3, 3, 2 * C, 2 * C)), ku=mki8((2, 2, 2 * C, 2 * C)),
        k5=mki8((3, 3, 3 * C, C)), k6=mki8((3, 3, C, C)),
        kh=jnp.asarray(rng.random((1, 1, C, 1), np.float32) * 0.1, jnp.bfloat16),
        **{f"b{i}": jnp.asarray(rng.random((c,), np.float32), np.float32)
           for i, c in [(2, C), (3, 2 * C), (4, 2 * C), (5, C), (6, C)]},
        bu=jnp.asarray(rng.random((2 * C,), np.float32), np.float32),
    )
    S = jnp.asarray(0.013, ep_dtype)

    def requant(a):
        return jnp.clip(jnp.round(a / S), -127, 127).astype(jnp.int8)

    def conv_q(x_i8, k_i8, b):
        y = lax.conv_general_dilated(x_i8, k_i8, (1, 1), "SAME",
                                     dimension_numbers=DN,
                                     preferred_element_type=jnp.int32)
        a = y.astype(ep_dtype) * S + b.astype(ep_dtype)
        return requant(jax.nn.leaky_relu(a, 0.1))

    def pool_q(x):
        return lax.reduce_window(x, jnp.int8(-128), lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    @jax.jit
    def fwd(x, p):
        e1 = lax.conv_general_dilated(x.astype(jnp.bfloat16), p["k1"],
                                      (1, 1), "SAME", dimension_numbers=DN)
        e1 = jax.nn.leaky_relu(e1 + p["b1"].astype(jnp.bfloat16), 0.1)
        q = requant(e1.astype(ep_dtype))
        e2 = conv_q(q, p["k2"], p["b2"])
        e3 = conv_q(pool_q(e2), p["k3"], p["b3"])
        e4 = conv_q(e3, p["k4"], p["b4"])
        u = lax.conv_transpose(e4, p["ku"], (2, 2), "VALID",
                               dimension_numbers=DN, transpose_kernel=True,
                               preferred_element_type=jnp.int32)
        uq = requant(u.astype(ep_dtype) * S + p["bu"].astype(ep_dtype))
        h = jnp.concatenate([e2, uq], axis=-1)
        h = conv_q(h, p["k5"], p["b5"])
        h = conv_q(h, p["k6"], p["b6"])
        hf = h.astype(jnp.bfloat16) * jnp.bfloat16(0.013)
        out = lax.conv_general_dilated(hf, p["kh"], (1, 1), "SAME",
                                       dimension_numbers=DN)
        return jax.nn.sigmoid(out.astype(jnp.float32))

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
    return best, out


def main():
    x = jnp.asarray(rng.random((B, T, T, 1), np.float32))
    fwd_f32, p_f32 = build(jnp.float32)
    t_f32, out_f32 = _best(fwd_f32, x, p_f32)
    fwd_bf16, p_bf16 = build(jnp.bfloat16)
    t_bf16, out_bf16 = _best(fwd_bf16, x, p_bf16)
    delta = float(jnp.max(jnp.abs(out_f32 - out_bf16)))
    px = B * T * T
    result = {
        "probe": "int8_epilogue_bf16_vs_f32",
        "shape": f"B{B} ({T},{T}) nf{C}, 2-level int8 U-Net slice",
        "f32_ms": round(t_f32 * 1e3, 2),
        "bf16_ms": round(t_bf16 * 1e3, 2),
        "speedup": round(t_f32 / t_bf16, 3),
        "f32_mpix_per_s": round(px / t_f32 / 1e6, 1),
        "bf16_mpix_per_s": round(px / t_bf16 / 1e6, 1),
        "max_sigmoid_delta": round(delta, 5),
        "decision_rule": "adopt bf16 epilogues only if speedup >= ~1.08 "
                         "and max_sigmoid_delta <= ~1/255",
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "PROBE_EPILOGUE.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
