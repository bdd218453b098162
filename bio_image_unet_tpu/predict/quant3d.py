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
    with int32 accumulation, requantized to its own calibrated site scale.
  - trilinear (UNet3D ``use_interpolation=True``, align_corners=False):
    linear interpolation commutes with the scale (``up(q)·s = up(q·s)``),
    so the deeper tensor is upsampled directly on its int8 VALUES in f32
    and rounded/clipped back at the SAME scale — convex combinations
    cannot exceed the input range.
  - nearest ×2 + conv (MultiOutputUnet3D, reference :67-69): the nearest
    repeat is exact on int8; the following conv block quantizes normally.
- **Decoder concats** (round-5 scale-folded formulation, same scheme as
  quant_nested.py): the up tensor and the skip concatenate as RAW int8,
  each at its own calibrated scale; the per-partner input scales are
  folded into the consuming decode conv's kernel slices at
  ``make_variables`` time (calibration maxes are concrete there).  This
  removes the round-4 formulation's per-level full-volume skip requant to
  max(s_up, s_skip) — the exact mechanism the UNet++ rewrite removed.

Measurement verdict (round 5, per decoder variant — each variant is its
own quant._int8_family key so each carries its own ship decision):

- **UNet3D ConvTranspose3d (the default)**: the scale-folded formulation
  measured **1.153×** end-to-end on the committed round-close artifact
  (58.4 → 67.4 Mvox/s, benchmarks/INT8_r05.json; 1.162× on the in-session
  decision run — ~1% session variance), device-resident, fused volume
  pipeline at the config-5 geometry — at the ~1.15× ship bar, so it SHIPS
  (``quantized=True`` quantizes).  The round-4 shared-concat-scale
  formulation had measured 1.109× (INT8_r04.json); folding the concat
  partners' scales into the decode kernels recovered the per-level
  full-volume skip-requant traffic.
- **UNet3D trilinear** (``use_interpolation=True``): 1.122× and
  **MultiOutputUnet3D** (nearest+conv): 1.116×
  (benchmarks/PROBE_3D_VARIANTS_INT8.json) — real gains but below the
  bar (their up paths add non-MXU interpolation/nearest-repeat work the
  fold cannot remove), so they stay experimental: ``quantized=True``
  warns and runs bf16; BIU_INT8_EXPERIMENTAL=1 opts in for users who
  accept the ~few-level PTQ accuracy cost.

Accuracy is platform-independent and CPU-tested
(tests/test_quant_families.py).
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
    MultiOutputUnet3D.

    Scale-folded formulation (round 5, same scheme as quant_nested.py):
    weight quantization is DEFERRED to ``make_variables`` — the calibration
    maxes are concrete Python floats there — so every conv's per-input-
    channel activation scales fold into its float kernel before
    per-output-channel int8 quantization (``k'[..., c, o] = k[..., c, o] *
    s_in(c)``).  Decoder concats therefore concatenate RAW int8 (the up
    tensor at its own site scale, the skip at the encoder site scale) with
    the two scales folded into the decode conv's kernel slices — no
    per-level full-volume skip requant to a shared max(s_up, s_skip)
    scale, and every dequant multiplier collapses to the per-output-channel
    ``sw``."""
    folded = jax.tree_util.tree_map(np.asarray, fold_unet2d(variables))
    interp, multi, heads = _config(model)
    sites = _sites_3d(interp, multi)
    site_idx = {name: i for i, name in enumerate(sites)}

    # skip widths (encoder conv out-channels) fix the decode-conv slice
    # layout: decode{2i-1} consumes [u | skip], u_ch = in_ch - skip_ch
    skip_site_for = {1: "e6", 2: "e4", 3: "e2"}
    skip_ch = {i: folded[f"encode{int(s[1])}"]["kernel"].shape[-1]
               for i, s in skip_site_for.items()}

    # conv specs: name -> (folded params, [(site, n_in_channels), ...]);
    # the spec is the input-scale layout folded into the kernel at
    # make_variables time.  Single-input convs have one full-width slice.
    def _single(params, site):
        return (params, [(site, params["kernel"].shape[-2])])

    conv_specs = {
        "encode2": _single(folded["encode2"], "e1"),
        "encode3": _single(folded["encode3"], "e2"),
        "encode4": _single(folded["encode4"], "e3"),
        "encode5": _single(folded["encode5"], "e4"),
        "encode6": _single(folded["encode6"], "e5"),
        "middle_conv1": _single(folded["middle_conv1"], "e6"),
        "middle_conv2": _single(folded["middle_conv2"], "m1"),
    }
    tconv_specs = {}
    h_site = "m2"
    for i in (1, 2, 3):
        if not interp:
            # (kd,kh,kw,O,I) under transpose_kernel=True: per-tensor quant,
            # scalar input-scale fold
            tconv_specs[f"up{i}"] = (folded[f"up{i}"], h_site)
            u_site = f"up{i}"
        elif multi:
            conv_specs[f"up{i}_conv"] = _single(folded[f"up{i}_conv"],
                                                h_site)
            u_site = f"up{i}"
        else:
            # trilinear keeps the input's scale (no up site, _sites_3d)
            u_site = h_site
        d_in = folded[f"decode{2 * i - 1}"]["kernel"].shape[-2]
        conv_specs[f"decode{2 * i - 1}"] = (
            folded[f"decode{2 * i - 1}"],
            [(u_site, d_in - skip_ch[i]), (skip_site_for[i], skip_ch[i])])
        conv_specs[f"decode{2 * i}"] = _single(folded[f"decode{2 * i}"],
                                               f"d{2 * i - 1}")
        h_site = f"d{2 * i}"

    head_layers = (["final"] if heads is None
                   else [f"output_layers_{n}" for n in heads])

    def _build_pack(scales):
        """Quantize all kernels with input scales folded in (deterministic
        insertion order ⇒ identical slot layout on every call)."""
        pack = _WeightPack()
        pack.float_layer("encode1", folded["encode1"])
        for name in ([f"encode{i}" for i in range(2, 7)]
                     + ["middle_conv1", "middle_conv2"]
                     + [f"decode{i}" for i in range(1, 7)]):
            if name not in conv_specs:
                continue
            params, spec = conv_specs[name]
            s_in = np.concatenate([
                np.full(n, scales[site_idx[site]], np.float32)
                for site, n in spec])
            pack.quant_conv(name, {
                "kernel": np.asarray(params["kernel"], np.float32)
                * s_in[:, None],
                "bias": params["bias"]})
        for i in (1, 2, 3):
            if f"up{i}" in tconv_specs:
                params, site = tconv_specs[f"up{i}"]
                pack.quant_conv(f"up{i}", {
                    "kernel": np.asarray(params["kernel"], np.float32)
                    * scales[site_idx[site]],
                    "bias": params["bias"]}, per_channel=False)
            elif f"up{i}_conv" in conv_specs:
                params, spec = conv_specs[f"up{i}_conv"]
                pack.quant_conv(f"up{i}_conv", {
                    "kernel": np.asarray(params["kernel"], np.float32)
                    * scales[site_idx[spec[0][0]]],
                    "bias": params["bias"]})
        for lyr in head_layers:
            pack.float_layer(lyr, folded[lyr])
        return pack.finish()

    # Slot lookups come from the first REAL pack build: _build_pack's
    # insertion order is deterministic (identical layout every call), and
    # the engine always runs make_variables (calibration,
    # predictor._finish_int8_calibration) before apply_fn is traced — so a
    # dry init-time build, which would quantize and device-upload the whole
    # weight set a second time just to learn the layout, is skipped.
    _lookups = []

    def make_variables(act_maxes) -> tuple:
        scales = np.maximum(np.asarray(act_maxes, np.float32), 1e-8) / 127.0
        i8_buf, f32_buf, lk = _build_pack(scales)
        _lookups[:] = [lk]
        return (i8_buf, f32_buf, jnp.asarray(scales))

    def apply_fn(vars_tuple, x):
        w8, f32 = _lookups[0](vars_tuple)
        s = vars_tuple[2]

        def sa(site):
            return s[site_idx[site]]

        def qconv(x_q, name, s_out):
            y = lax.conv_general_dilated(
                x_q, w8(name), (1, 1, 1), "SAME", dimension_numbers=_DN3,
                preferred_element_type=jnp.int32)
            a = y.astype(jnp.float32) * f32(f"{name}.sw") \
                + f32(f"{name}.bias")
            return _requant(jax.nn.leaky_relu(a, 0.1), s_out)

        def qtconv(x_q, name, s_out):
            y = lax.conv_transpose(
                x_q, w8(name), (2, 2, 2), "VALID", dimension_numbers=_DN3,
                transpose_kernel=True, preferred_element_type=jnp.int32)
            a = y.astype(jnp.float32) * f32(f"{name}.sw") \
                + f32(f"{name}.bias")
            return _requant(a, s_out)  # no activation after up-convs

        down = (downsample_nearest if (multi and interp) else _maxpool_i8_3d)

        # encode1 in bf16 (same policy as 2D: <1% of FLOPs, input stays u8)
        e1 = _conv(x.astype(jnp.bfloat16),
                   {"kernel": f32("encode1.kernel"),
                    "bias": f32("encode1.bias")})
        q1 = _requant(e1.astype(jnp.float32), sa("e1"))
        q2 = qconv(q1, "encode2", sa("e2"))
        q3 = qconv(down(q2), "encode3", sa("e3"))
        q4 = qconv(q3, "encode4", sa("e4"))
        q5 = qconv(down(q4), "encode5", sa("e5"))
        q6 = qconv(q5, "encode6", sa("e6"))
        h = qconv(down(q6), "middle_conv1", sa("m1"))
        h = qconv(h, "middle_conv2", sa("m2"))

        for i, skip_q in zip(range(1, 4), (q6, q4, q2)):
            if not interp:
                u = qtconv(h, f"up{i}", sa(f"up{i}"))
            elif multi:
                u = qconv(upsample_nearest(h), f"up{i}_conv", sa(f"up{i}"))
            else:
                # linearity: up(q)·s = up(q·s) — interpolate the int8 VALUES
                # and round back at the SAME scale (convex combinations stay
                # in range); the scale itself is folded into decode's kernel
                upf = upsample_linear(h.astype(jnp.float32))
                u = jnp.clip(jnp.round(upf), -127, 127).astype(jnp.int8)
            # raw int8 concat: each partner's scale lives in the decode
            # conv's kernel slices (no full-volume skip requant)
            h = jnp.concatenate([u, skip_q], axis=-1)
            h = qconv(h, f"decode{2 * i - 1}", sa(f"d{2 * i - 1}"))
            h = qconv(h, f"decode{2 * i}", sa(f"d{2 * i}"))

        hd = (h.astype(jnp.float32) * sa("d6")).astype(jnp.bfloat16)
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
