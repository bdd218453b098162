"""w8a8 int8 inference forward for the 3-level volumetric trunks
(models/unet3d.py — the reference's UNet3D, unet3d/unet3d.py:6-99, and
MultiOutputUnet3D, multi_output_unet3d/multi_output_unet3d.py:7-170).

Same policy as the 2D path (predict/quant.py): per-output-channel symmetric
int8 kernels (per-tensor for the transposed up-convs), per-tensor activation
scales calibrated from sub-volumes of the data being predicted and threaded
in as TRACED arguments, first conv (encode1) and the 1×1×1 head(s) in
float.  Family-specific pieces:

- **Downsampling**: max-pool runs on int8 directly (order-preserving);
  MultiOutputUnet3D's nearest ×0.5 (reference :111-130) is a pure stride
  slice — exact on int8.
- **Up paths**, one per decoder style:
  - ConvTranspose3d (``use_interpolation=False``): int8 transposed conv
    with int32 accumulation, requantized straight to the decoder concat's
    shared scale.
  - trilinear (UNet3D ``use_interpolation=True``, align_corners=False):
    linear interpolation has no useful int8 form — dequantize, upsample in
    f32, requantize at the concat scale.  Convex combinations cannot exceed
    the input range, so the middle/decode site scale still bounds it.
  - nearest ×2 + conv (MultiOutputUnet3D, reference :67-69): the nearest
    repeat is exact on int8; the following conv block quantizes normally.
- **Decoder concats** rescale both halves to max(s_up, s_skip), like the
  2D decoder.

Measurement verdict (round 4, benchmarks/INT8_r04.json): the end-to-end
fused volume pipeline measured **1.109×** (58.1 → 64.4 Mvox/s, device-
resident) — a real gain, but below the ~1.15× ship bar; the forward-level
probe (benchmarks/PROBE3D_INT8.json) measured 1.179×, diluted to 1.109× by
the pipeline's non-conv work, consistent with the round-3 conv-level range
of 1.10–1.22× (benchmarks/probe3d.py).  The family therefore stays OUT of
quant._MEASURED_INT8 by default — ``quantized=True`` warns and runs bf16;
BIU_INT8_EXPERIMENTAL=1 opts into the +11% for users who accept the
~few-level PTQ accuracy cost.  Accuracy is platform-independent and
CPU-tested (tests/test_quant_families.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.functional import (
    downsample_nearest,
    max_pool,
    upsample_linear,
    upsample_nearest,
)
from .fastpath import _conv, _conv1x1, _convt, fold_unet2d
from .quant import _requant, _WeightPack

_DN3 = ("NDHWC", "DHWIO", "NDHWC")


def _maxpool_i8_3d(x):
    return lax.reduce_window(x, jnp.int8(-128), lax.max,
                             (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")


def _config(model):
    from ..models.unet3d import MultiOutputUnet3D

    multi = isinstance(model, MultiOutputUnet3D)
    return model.use_interpolation, multi, (model.heads if multi else None)


def _sites_3d(interp, multi):
    """Activation-scale sites in calibration-vector order.  The trilinear
    decoder (interp without multi) has no up-conv, hence no up site — the
    upsampled tensor keeps its input's calibrated scale."""
    sites = [f"e{i}" for i in range(1, 7)] + ["m1", "m2"]
    for i in (1, 2, 3):
        if (not interp) or multi:
            sites.append(f"up{i}")
        sites += [f"d{2 * i - 1}", f"d{2 * i}"]
    return sites


def build_calibrator_3d(model, variables):
    """One-dispatch instrumented bf16 forward mirroring
    fastpath._build_fast_3d: ``cal_fn(x_norm) -> (n_sites,) f32``."""
    folded = jax.tree_util.tree_map(np.asarray, fold_unet2d(variables))
    interp, multi, _ = _config(model)
    sites = _sites_3d(interp, multi)

    @jax.jit
    def cal_fn(x):
        x = x.astype(jnp.bfloat16)
        maxes = {}

        def rec(name, a):
            m = jnp.max(jnp.abs(a)).astype(jnp.float32)
            maxes[name] = jnp.maximum(maxes[name], m) if name in maxes else m
            return a

        f = {k: jax.tree_util.tree_map(jnp.asarray, v)
             for k, v in folded.items()}
        down = downsample_nearest if (multi and interp) else max_pool

        e1 = rec("e1", _conv(x, f["encode1"]))
        e2 = rec("e2", _conv(e1, f["encode2"]))
        e3 = rec("e3", _conv(down(e2), f["encode3"]))
        e4 = rec("e4", _conv(e3, f["encode4"]))
        e5 = rec("e5", _conv(down(e4), f["encode5"]))
        e6 = rec("e6", _conv(e5, f["encode6"]))
        h = rec("m1", _conv(down(e6), f["middle_conv1"]))
        h = rec("m2", _conv(h, f["middle_conv2"]))

        for i, skip in zip(range(1, 4), (e6, e4, e2)):
            if not interp:
                u = rec(f"up{i}", _convt(h, f[f"up{i}"]))
            elif multi:
                u = rec(f"up{i}", _conv(upsample_nearest(h),
                                        f[f"up{i}_conv"]))
            else:
                u = upsample_linear(h)
            h = jnp.concatenate([u, skip], axis=-1)
            h = rec(f"d{2 * i - 1}", _conv(h, f[f"decode{2 * i - 1}"]))
            h = rec(f"d{2 * i}", _conv(h, f[f"decode{2 * i}"]))
        return jnp.stack([maxes[s] for s in sites])

    return cal_fn


def build_int8_apply_3d(model, variables):
    """Return ``(apply_fn, make_variables)`` with the fastpath 3D output
    contract: ``(sigmoid, logits)`` for UNet3D, ``{head: activated}`` for
    MultiOutputUnet3D."""
    folded = jax.tree_util.tree_map(np.asarray, fold_unet2d(variables))
    interp, multi, heads = _config(model)
    sites = _sites_3d(interp, multi)
    site_idx = {name: i for i, name in enumerate(sites)}

    pack = _WeightPack()
    pack.float_layer("encode1", folded["encode1"])
    for name in ([f"encode{i}" for i in range(2, 7)]
                 + ["middle_conv1", "middle_conv2"]
                 + [f"decode{i}" for i in range(1, 7)]):
        pack.quant_conv(name, folded[name])
    for i in (1, 2, 3):
        if not interp:
            pack.quant_conv(f"up{i}", folded[f"up{i}"], per_channel=False)
        elif multi:
            pack.quant_conv(f"up{i}_conv", folded[f"up{i}_conv"])
    head_layers = (["final"] if heads is None
                   else [f"output_layers_{n}" for n in heads])
    for lyr in head_layers:
        pack.float_layer(lyr, folded[lyr])
    i8_buf, f32_buf, lookups = pack.finish()

    def make_variables(act_maxes) -> tuple:
        scales = np.maximum(np.asarray(act_maxes, np.float32), 1e-8) / 127.0
        return (i8_buf, f32_buf, jnp.asarray(scales))

    def apply_fn(vars_tuple, x):
        w8, f32 = lookups(vars_tuple)
        s = vars_tuple[2]

        def sa(site):
            return s[site_idx[site]]

        def qconv(x_q, s_in, name, s_out):
            y = lax.conv_general_dilated(
                x_q, w8(name), (1, 1, 1), "SAME", dimension_numbers=_DN3,
                preferred_element_type=jnp.int32)
            a = y.astype(jnp.float32) * (s_in * f32(f"{name}.sw")) \
                + f32(f"{name}.bias")
            return _requant(jax.nn.leaky_relu(a, 0.1), s_out)

        def qtconv(x_q, s_in, name, s_out):
            y = lax.conv_transpose(
                x_q, w8(name), (2, 2, 2), "VALID", dimension_numbers=_DN3,
                transpose_kernel=True, preferred_element_type=jnp.int32)
            a = y.astype(jnp.float32) * (s_in * f32(f"{name}.sw")) \
                + f32(f"{name}.bias")
            return _requant(a, s_out)  # no activation after up-convs

        down = (downsample_nearest if (multi and interp) else _maxpool_i8_3d)

        # encode1 in bf16 (same policy as 2D: <1% of FLOPs, input stays u8)
        e1 = _conv(x.astype(jnp.bfloat16),
                   {"kernel": f32("encode1.kernel"),
                    "bias": f32("encode1.bias")})
        q1 = _requant(e1.astype(jnp.float32), sa("e1"))
        q2 = qconv(q1, sa("e1"), "encode2", sa("e2"))
        q3 = qconv(down(q2), sa("e2"), "encode3", sa("e3"))
        q4 = qconv(q3, sa("e3"), "encode4", sa("e4"))
        q5 = qconv(down(q4), sa("e4"), "encode5", sa("e5"))
        q6 = qconv(q5, sa("e5"), "encode6", sa("e6"))
        h = qconv(down(q6), sa("e6"), "middle_conv1", sa("m1"))
        h, s_h = qconv(h, sa("m1"), "middle_conv2", sa("m2")), sa("m2")

        for i, (skip_q, skip_site) in zip(range(1, 4),
                                          ((q6, "e6"), (q4, "e4"), (q2, "e2"))):
            if not interp:
                s_cat = jnp.maximum(sa(f"up{i}"), sa(skip_site))
                u = qtconv(h, s_h, f"up{i}", s_cat)
            elif multi:
                s_cat = jnp.maximum(sa(f"up{i}"), sa(skip_site))
                u = qconv(upsample_nearest(h), s_h, f"up{i}_conv", s_cat)
            else:
                # trilinear on dequantized values; convex combinations stay
                # within the input range, so s_h bounds the upsampled tensor
                s_cat = jnp.maximum(s_h, sa(skip_site))
                u = _requant(upsample_linear(h.astype(jnp.float32) * s_h),
                             s_cat)
            skip = _requant(skip_q.astype(jnp.float32) * sa(skip_site), s_cat)
            h = jnp.concatenate([u, skip], axis=-1)
            h = qconv(h, s_cat, f"decode{2 * i - 1}", sa(f"d{2 * i - 1}"))
            h = qconv(h, sa(f"d{2 * i - 1}"), f"decode{2 * i}",
                      sa(f"d{2 * i}"))
            s_h = sa(f"d{2 * i}")

        hd = (h.astype(jnp.float32) * s_h).astype(jnp.bfloat16)
        if heads is None:
            logits = _conv1x1(hd, {"kernel": f32("final.kernel"),
                                   "bias": f32("final.bias")}
                              ).astype(jnp.float32)
            return jax.nn.sigmoid(logits), logits
        from ..models.unet2d import apply_activation

        return {
            name: apply_activation(
                _conv1x1(hd, {"kernel": f32(f"output_layers_{name}.kernel"),
                              "bias": f32(f"output_layers_{name}.bias")}
                         ).astype(jnp.float32),
                cfg.get("activation"))
            for name, cfg in heads.items()
        }

    return apply_fn, make_variables
