#!/usr/bin/env python
"""Is there a quantized-inference win left on the table? Measures int8 conv
rates vs bf16 at this framework's dominant model shapes.

Motivation: TPU MXUs can run int8 matmuls at up to 2x the bf16 rate.  But the
2D/3D U-Net FLOP mass sits in NARROW convs (32-64 channels against 128 MXU
lanes), which benchmarks/NOTES.md shows are lane-bound, not arithmetic-bound
— so int8 should NOT help there, and this probe exists to close that frontier
with a measurement instead of an assumption (same methodology as the Pallas
A/Bs in NOTES.md).

Shapes: the 2D family-bench L1/L2 convs (batch = the fused pipeline's tile
batch) plus one wide 256-channel control where int8 COULD show a win if XLA
routes it to the MXU's int8 path.

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

# (name, batch, (H,W), c_in, c_out) — 2D 3x3 convs
SHAPES = [
    ("2D L1 32->32", 64, (256, 256), 32, 32),
    ("2D L2 64->64", 64, (128, 128), 64, 64),
    ("2D wide 256->256", 64, (64, 64), 256, 256),
]
REPEAT = 8


def rate(batch, spatial, cin, cout, dtype):
    rng = np.random.default_rng(0)
    if dtype == "int8":
        x = jnp.asarray(rng.integers(-127, 127, (batch,) + spatial + (cin,)),
                        jnp.int8)
        k = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)), jnp.int8)
        kb = jnp.asarray(rng.integers(-127, 127, (3, 3, cout, cin)), jnp.int8)

        @jax.jit
        def run(x, k, kb):
            def body(t, _):
                y = lax.conv_general_dilated(
                    t, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                # requantize the int32 accumulator back to int8 (shift-scale,
                # what a real quantized inference path would do)
                t = lax.conv_general_dilated(
                    (y >> 8).astype(jnp.int8), kb, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return (t >> 8).astype(jnp.int8), None

            out, _ = lax.scan(body, x, None, length=REPEAT)
            return out
    else:
        x = jnp.asarray(rng.random((batch,) + spatial + (cin,), np.float32),
                        jnp.bfloat16)
        k = jnp.asarray(rng.random((3, 3, cin, cout), np.float32) * 0.1,
                        jnp.bfloat16)
        kb = jnp.asarray(rng.random((3, 3, cout, cin), np.float32) * 0.1,
                         jnp.bfloat16)

        @jax.jit
        def run(x, k, kb):
            def body(t, _):
                y = lax.conv_general_dilated(
                    t, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                t = lax.conv_general_dilated(
                    y, kb, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return t * 0.5, None

            out, _ = lax.scan(body, x, None, length=REPEAT)
            return out

    out = run(x, k, kb)
    jax.device_get(jnp.ravel(out)[:1])  # warm + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x, k, kb)
        jax.device_get(jnp.ravel(out)[:1])
        best = min(best, time.perf_counter() - t0)
    px = batch * int(np.prod(spatial))
    # both convs of the scan body, 9-tap kernels, 2 op/MAC
    ops = REPEAT * px * 9 * (cin * cout + cout * cin) * 2
    return ops / best / 1e12


def main():
    for name, batch, spatial, cin, cout in SHAPES:
        tf_bf16 = rate(batch, spatial, cin, cout, "bf16")
        tf_int8 = rate(batch, spatial, cin, cout, "int8")
        print(json.dumps({"shape": name, "bf16_tflops": round(tf_bf16, 1),
                          "int8_tops": round(tf_int8, 1),
                          "int8_speedup": round(tf_int8 / tf_bf16, 2)}))


if __name__ == "__main__":
    main()
