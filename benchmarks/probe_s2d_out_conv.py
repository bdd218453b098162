#!/usr/bin/env python
"""A/B: output-side space-to-depth formulation for C_out=32 convs (the
UNet++/multi-head MXU model-shape ceiling, VERDICT round-4 item 7).

Mechanism under test: a 3x3 stride-1 conv with C_out=32 fills only 32 of
the MXU's 128 output lanes (pallas guide: last-dim tile is always 128), so
the full-resolution level-0 cells of the dense UNet++ grid — ~59% of its
wall-clock by the FLOPs/utilization model in benchmarks/NOTES.md round-5 —
run at ~25% lane utilization.  The round-2/round-4 space-to-depth A/Bs
rejected the INPUT-widening form (4x FLOPs eats the fill gain, NOTES.md).
This probe tests the cheaper OUTPUT-side-only form:

    conv3x3(x)[2i+p, 2j+q, co]  ==  conv4x4_stride2(x, K)[i, j, (p,q,co)]

with K the 3x3 kernel zero-embedded at offset (p, q) of a 4x4 window
(verified exact to f32 rounding).  C_in is untouched; FLOPs grow 16/9x
(the zero taps are computed) while output lanes go 32 -> 128 = 4x fill,
so the speed-of-light win on these convs is 4*(9/16) = 2.25x, minus one
depth-to-space relayout of the output (pure transpose; XLA may fuse it
into the consumer).

Legs, at the UNet++ fused pipeline's true map step (16 tiles of 512²,
bf16, leaky-relu epilogue like predict/fastpath._conv):

  ci{32,96,160}    — single conv C_in -> 32, baseline vs s2d-out+d2s
                     (160 = the worst top-row concat width, 4 partners + up)
  vgg              — a level-0 VGGBlock pair (64 -> 32 -> 32), both convs
                     s2d-out, d2s only after the second (the first conv's
                     output feeds the second IN s2d layout via a d2s that
                     XLA can fuse) — the integration-shaped leg

Decision rule: integrate into the fastpath level-0 cells and A/B the full
pipeline only if the vgg leg clears ~1.3x here (end-to-end dilution: level0
is ~59% of UNet++ time, so 2.25x micro -> ~1.49x e2e ceiling; 1.3x micro
-> ~1.17x e2e).  Either way the numbers land in benchmarks/NOTES.md.

Run alone on the TPU (never concurrently with pytest on this 1-core host).
Prints one JSON line; writes benchmarks/PROBE_S2D_OUT.json.
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

DN = ("NHWC", "HWIO", "NHWC")
B, T, CO = 16, 512, 32  # UNet++ map step: 4 Mpx cap = 16 tiles of 512²
CHAIN = 8
rng = np.random.default_rng(0)


def s2d_kernel(k):
    """(3,3,Ci,Co) -> (4,4,Ci,4Co): phase (p,q) of the stride-1 output at
    out-channel block (p*2+q); conv4x4 stride2 pad(1,1) of this kernel is
    the space-to-depth image of the stride-1 SAME conv3x3 (exact)."""
    kh, kw, ci, co = k.shape
    K = np.zeros((4, 4, ci, 4 * co), k.dtype)
    for p in range(2):
        for q in range(2):
            K[p:p + 3, q:q + 3, :, (p * 2 + q) * co:(p * 2 + q + 1) * co] = k
    return K


def d2s(z, co):
    b, h2, w2, _ = z.shape
    z = z.reshape(b, h2, w2, 2, 2, co)
    z = z.transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(b, h2 * 2, w2 * 2, co)


def conv_base(x, k, b):
    y = lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=DN)
    return jax.nn.leaky_relu(y + b, 0.1)


def conv_s2d(x, K4, b4, co):
    """s2d-out conv; returns the FULL-RES output (d2s applied)."""
    z = lax.conv_general_dilated(x, K4, (2, 2), ((1, 1), (1, 1)),
                                 dimension_numbers=DN)
    return d2s(jax.nn.leaky_relu(z + b4, 0.1), co)


_LATENCY = [0.0]  # dispatch+sync round trip over the tunneled link (s)


def _measure_latency():
    one = jnp.zeros((1,), jnp.float32)
    ident = jax.jit(lambda v: v + 1.0)
    jax.device_get(ident(one))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(ident(one))
        best = min(best, time.perf_counter() - t0)
    _LATENCY[0] = best


def timed(fn, *args, n=5):
    """Best-of-n wall time MINUS the tunnel dispatch+sync round trip (the
    probe_heads_breakdown latency leg): each call is one dispatch + one
    1-element device_get, so the constant must come off before dividing by
    CHAIN or every per-step figure inherits latency/CHAIN of noise."""
    out = fn(*args)
    jax.device_get(jnp.ravel(out)[:1])  # warm + forced sync (tunnel gotcha)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jnp.ravel(out)[:1])
        best = min(best, time.perf_counter() - t0)
    return max(best - _LATENCY[0], 1e-9)


def chain_fn(body):
    """CHAIN sequential applications per dispatch; per-step input perturbed
    by the carried scalar so XLA cannot CSE the steps."""
    @jax.jit
    def run(x, *params):
        def step(c, s):
            y = body(x + c.astype(x.dtype), *params)
            return jnp.float32(c + y[0, 0, 0, 0].astype(jnp.float32) * 1e-6), ()
        c, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(CHAIN))
        return c
    return run


def leg_single(ci):
    x = jnp.asarray(rng.standard_normal((B, T, T, ci)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, ci, CO)) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((CO,)), jnp.bfloat16)
    K4 = jnp.asarray(s2d_kernel(np.asarray(k, np.float32)), jnp.bfloat16)
    b4 = jnp.tile(b, 4)

    base = chain_fn(lambda xx, kk, bb: conv_base(xx, kk, bb))
    s2d = chain_fn(lambda xx, KK, bb: conv_s2d(xx, KK, bb, CO))
    t0 = timed(base, x, k, b)
    t1 = timed(s2d, x, K4, b4)

    ref = conv_base(x, k, b)
    alt = conv_s2d(x, K4, b4, CO)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - alt.astype(jnp.float32))))
    return {"base_ms": round(t0 / CHAIN * 1e3, 3),
            "s2d_ms": round(t1 / CHAIN * 1e3, 3),
            "speedup": round(t0 / t1, 3), "max_abs_delta": err}


def leg_vgg():
    """Level-0 VGGBlock shape: concat(skip, up) 64 -> 32 -> 32."""
    ci = 64
    x = jnp.asarray(rng.standard_normal((B, T, T, ci)), jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((3, 3, ci, CO)) * 0.05, jnp.bfloat16)
    k2 = jnp.asarray(rng.standard_normal((3, 3, CO, CO)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((CO,)), jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((CO,)), jnp.bfloat16)
    K1 = jnp.asarray(s2d_kernel(np.asarray(k1, np.float32)), jnp.bfloat16)
    K2 = jnp.asarray(s2d_kernel(np.asarray(k2, np.float32)), jnp.bfloat16)
    b14, b24 = jnp.tile(b1, 4), jnp.tile(b2, 4)

    def vgg_base(xx, ka, ba, kb, bb):
        return conv_base(conv_base(xx, ka, ba), kb, bb)

    def vgg_s2d(xx, KA, BA, KB, BB):
        h = conv_s2d(xx, KA, BA, CO)   # d2s between the convs — fusable
        return conv_s2d(h, KB, BB, CO)

    base = chain_fn(vgg_base)
    s2d = chain_fn(vgg_s2d)
    t0 = timed(base, x, k1, b1, k2, b2)
    t1 = timed(s2d, x, K1, b14, K2, b24)

    ref = vgg_base(x, k1, b1, k2, b2)
    alt = vgg_s2d(x, K1, b14, K2, b24)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - alt.astype(jnp.float32))))
    return {"base_ms": round(t0 / CHAIN * 1e3, 3),
            "s2d_ms": round(t1 / CHAIN * 1e3, 3),
            "speedup": round(t0 / t1, 3), "max_abs_delta": err}


def main():
    _measure_latency()
    result = {"probe": "s2d_out_conv",
              "latency_ms": round(_LATENCY[0] * 1e3, 2),
              "shape": f"{B}x{T}x{T} bf16, C_out={CO}, leaky epilogue, "
                       f"chain {CHAIN}",
              "decision_rule": "integrate into level-0 fastpath cells only "
                               "if vgg leg >= ~1.3x"}
    for ci in (32, 96, 160):
        result[f"ci{ci}"] = leg_single(ci)
        print(f"ci{ci}: {result[f'ci{ci}']}", file=sys.stderr)
    result["vgg"] = leg_vgg()
    print(f"vgg: {result['vgg']}", file=sys.stderr)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "PROBE_S2D_OUT.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
