#!/usr/bin/env python
"""On-chip rate probe for the 3D U-Net's dominant convolutions — the 3D
analog of round 2's narrow-conv measurements (benchmarks/NOTES.md): is the
56 Mvox/s (23 TFLOP/s effective) 3D inference number the model's arithmetic
shape, or pipeline overhead?

Times each level's conv shape in isolation (scan of 8 back-to-back convs on
device, one-element sync) in bf16, prints TFLOP/s per shape, and the
FLOP-weighted expectation for the whole forward.

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

# (name, batch, (D,H,W), c_in, c_out) — UNet3D nf32 encoder/decoder conv
# shapes at the family-bench tile (32,128,128), ALL at the same effective
# batch the fused pipeline's lax.map step uses (bs=16 tiles): batch-1
# isolated convs measure the empty-pipe rate, not what the program sees,
# and a uniform batch makes each probe's FLOP count proportional to its
# level's share of the model forward, so the FLOP-weighted expectation
# below reflects the model, not the probe mix
SHAPES = [
    ("L1 1->32", 16, (32, 128, 128), 1, 32),
    ("L1 32->32", 16, (32, 128, 128), 32, 32),
    ("L2 32->64", 16, (16, 64, 64), 32, 64),
    ("L2 64->64", 16, (16, 64, 64), 64, 64),
    ("L3 64->128", 16, (8, 32, 32), 64, 128),
    ("L3 128->128", 16, (8, 32, 32), 128, 128),
    ("L4 128->256", 16, (4, 16, 16), 128, 256),
    ("L4 256->256", 16, (4, 16, 16), 256, 256),
]
REPEAT = 8


def rate(batch, spatial, cin, cout):
    x = jnp.asarray(np.random.default_rng(0).random((batch,) + spatial + (cin,),
                                                    np.float32), jnp.bfloat16)
    k = jnp.asarray(np.random.default_rng(1).random((3, 3, 3, cin, cout),
                                                    np.float32) * 0.1,
                    jnp.bfloat16)
    kb = jnp.asarray(np.random.default_rng(2).random((3, 3, 3, cout, cin),
                                                     np.float32) * 0.1,
                     jnp.bfloat16)

    @jax.jit
    def run(x, k, kb):
        def body(t, _):
            y = lax.conv_general_dilated(
                t, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            # project back so the scan carry keeps the input shape
            t = lax.conv_general_dilated(
                y, kb, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
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
    vox = batch * int(np.prod(spatial))
    # both convs of the scan body, 27-tap kernels, 2 FLOP/MAC
    flops = REPEAT * vox * 27 * (cin * cout + cout * cin) * 2
    return flops / best / 1e12, flops


def main():
    total_fl, total_t = 0.0, 0.0
    for name, batch, spatial, cin, cout in SHAPES:
        tf, fl = rate(batch, spatial, cin, cout)
        total_fl += fl
        total_t += fl / (tf * 1e12)
        print(json.dumps({"shape": name, "tflops": round(tf, 1)}))
    print(json.dumps({"flop_weighted_expectation_tflops":
                      round(total_fl / total_t / 1e12, 1)}))


if __name__ == "__main__":
    main()
