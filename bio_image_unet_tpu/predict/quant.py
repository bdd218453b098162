"""w8a8 int8 inference forward for the plain 2D U-Net (opt-in,
``Predict(..., quantized=True)``).

Why: the TPU MXU runs int8×int8→int32 contractions faster than bf16 at this
model family's channel widths — measured on the target chip at the fused
pipeline's own tile batch, the full Unet-nf32 graph runs **1.54×** faster in
int8 than bf16 (benchmarks/probe_quant.py: 274 → 423 MP/s; per-conv rates in
benchmarks/probe_int8.py).  There is no reference counterpart (the torch
package is f32-only) — this is a TPU-native extra, and it is approximate:
masks typically differ from the bf16 path by ≲2 uint8 levels (tested), so it
is opt-in and never the default.

Scheme (standard post-training quantization, no retraining):

- **Weights**: BN-folded conv kernels (fastpath.fold_unet2d) quantized
  per-output-channel symmetric int8; transposed-conv kernels per-tensor
  (their layout is (kh, kw, O, I) under ``transpose_kernel=True``); biases
  stay f32.
- **Activations**: per-tensor symmetric scales from a one-dispatch
  calibration forward (bf16, instrumented to return every site's max |a|)
  over sample tiles of the actual movie.  Scales enter the compiled program
  as *traced arguments*, so one compile serves every movie of the same
  shape.
- **Graph**: first conv (encode1) and the final 1×1 head run in bf16 — they
  are <1% of the FLOPs and keeping them float avoids quantizing the u8
  input a second time and the logits at all.  Everything between runs
  int8: conv → int32 accumulate → f32 dequant·(s_in·s_w)+bias → leaky_relu
  → requant to the next site's scale.  Max-pools operate on int8 directly
  (order-preserving).  At each decoder concat the skip tensor is rescaled
  int8→int8 to the shared concat scale max(s_up, s_skip).

The apply function conforms to the fastpath contract
``apply_fn(variables, x_norm) -> (sigmoid, logits)`` so the fused predict
pipeline (predictor.py) uses it unchanged; ``variables`` is the pytree
``(int8_packed, f32_packed, act_maxes)``.

This module owns the plain 2D trunk's int8 graph plus the family dispatch
(``int8_status`` / ``int8_builders``): UNet++ lives in quant_nested.py and
the 3-level volumetric trunks in quant3d.py, both measurement-gated via
``_MEASURED_INT8`` below.  Dilated 2D trunks ride the same int8 graph
(``rhs_dilation`` on the encoder/middle convs); AttentionUnet quantizes its
trunk with the four gates in float (dequant → gate → requant per level,
like the float output heads).  Only the 'corr' join has no int8
formulation (it correlates two traced activations — there is no weight
tensor to quantize) and always falls back to bf16 with a warning.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .fastpath import _conv, _conv1x1, attend, fold_unet2d

_DN = ("NHWC", "HWIO", "NHWC")

# Families whose int8 end-to-end pipeline MEASURED >= ~1.15x over bf16 on the
# target chip (the ship rule, benchmarks/NOTES.md): these quantize whenever
# the user passes quantized=True.  'attention2d' (int8 trunk, float gates)
# measured 1.338x end-to-end at the headline shapes
# (benchmarks/PROBE_ATTENTION_INT8.json) and ships; dilated trunks measured
# 1.333x (PROBE_DILATED_INT8.json) and ride 'unet2d'.  'unet3d' (the
# DEFAULT ConvTranspose3d decoder) ships on the round-5 scale-folded
# formulation — 1.162x on the decision run, 1.153x on the committed
# round-close artifact benchmarks/INT8_r05.json (~1% session variance, at
# the ~1.15x bar; the round-4 shared-concat-scale formulation measured
# 1.109x — folding the concat partners' scales into the decode kernels
# recovered the requant traffic).
# The decision legs measured everything else BELOW the bar — UNet++ 0.892x
# round-4, 0.935x after the same scale-folded rewrite
# (benchmarks/PROBE_NESTED_INT8.json — exclusion formulation-limited), and
# the non-tconv 3D decoder variants 1.122x (UNet3D trilinear) / 1.116x
# (MultiOutputUnet3D nearest+conv) (benchmarks/PROBE_3D_VARIANTS_INT8.json:
# their up paths add non-MXU work the fold cannot remove) — so those stay
# opt-in via BIU_INT8_EXPERIMENTAL=1 and otherwise warn + fall back to
# bf16.  The exclusion list is 100% measurement-backed.
_MEASURED_INT8 = frozenset({"unet2d", "attention2d", "unet3d"})

# measured end-to-end int8/bf16 ratios per family (benchmarks/INT8_r05.json,
# PROBE_ATTENTION_INT8.json, PROBE_NESTED_INT8.json,
# PROBE_3D_VARIANTS_INT8.json — the nested/3D ratios are the round-5
# scale-folded formulation's, their best; the 'unet2d' trunk ratio is the
# plain-2D leg — Siam 1.219x and MultiOutput 1.274x share the trunk),
# quoted in the fallback warning so a declined quantized=True explains
# itself with the number that decided it.
# tests/test_quant_families.py::test_ratio_registry_matches_artifacts pins
# every value to its committed artifact field.
_INT8_MEASURED_RATIO = {"unet2d": 1.268, "attention2d": 1.338,
                        "nested": 0.935, "unet3d": 1.153,
                        "unet3d_interp": 1.122, "multi_output_3d": 1.116}

def _sites(mode):
    """Activation-scale sites in calibration-vector order.  Siamese 'concat'
    adds a site for the join conv's output; 'max'/'control' joins reuse the
    (shared-weight) encoder's e8 scale — both streams are calibrated jointly
    so int8 max is exact."""
    base = (
        ["e1", "e2", "e3", "e4", "e5", "e6", "e7", "e8", "m1", "m2"]
        + [f"up{i}" for i in range(1, 5)]
        + [f"d{i}" for i in range(1, 9)]
    )
    if mode == "concat":
        base.append("join")
    return base


# encoder conv outputs that feed decoder concats, in up1..up4 order
_SKIPS = ("e8", "e6", "e4", "e2")

# siamese join modes with an int8 formulation ('corr' correlates two traced
# activations — a dynamic-kernel conv the int8 path does not cover)
_INT8_MODES = (None, "max", "control", "concat")


def _int8_family(model):
    """Architecture-level int8 support: the family key, or None.

    - ``'unet2d'`` — the plain 2D trunk, any integer dilation (Unet,
      Siam_UNet max/control/concat, MultiOutputUnet): trunk in int8,
      per-head 1×1 convs + activations in float.
    - ``'attention2d'`` — AttentionUnet: int8 trunk, the four gates in
      float (dequant → gate → requant per level).  Only 'corr'
      (dynamic-kernel conv) has no int8 formulation and falls back.
    - ``'nested'`` — UNet++ (MultiOutputNestedUNet, both depths): the dense
      VGG grid in int8, shared-scale concats, bilinear upsampling on
      dequantized values (predict/quant_nested.py).
    - ``'unet3d'`` / ``'unet3d_interp'`` / ``'multi_output_3d'`` — the
      3-level volumetric trunks (predict/quant3d.py), one key per DECODER
      STYLE so each carries its own on-chip ship decision: UNet3D
      ConvTranspose3d (the default; ships at 1.153x), UNet3D trilinear
      ``use_interpolation=True`` (1.122x, experimental), MultiOutputUnet3D
      nearest+conv (1.116x, experimental).
    """
    from ..models.nested_unet import MultiOutputNestedUNet
    from ..models.unet2d import UNet2DBase
    from ..models.unet3d import MultiOutputUnet3D, UNet3D

    if isinstance(model, UNet2DBase):
        if model.mode in _INT8_MODES:
            # any integer dilation rides the same int8 graph (rhs_dilation
            # on the encoder/middle convs — identical FLOPs/requant traffic
            # to the measured plain trunk; own on-chip decision leg measured
            # 1.333x end-to-end, benchmarks/PROBE_DILATED_INT8.json).
            # Attention gates stay float inside the int8 graph (dequant →
            # gate → requant per level) — a separate family key so the ship
            # decision is its own measurement.
            return "attention2d" if model.attention else "unet2d"
        return None
    if isinstance(model, MultiOutputNestedUNet):
        return "nested"
    if isinstance(model, MultiOutputUnet3D):
        return "multi_output_3d"
    if isinstance(model, UNet3D):
        return "unet3d_interp" if model.use_interpolation else "unet3d"
    return None


def int8_status(model):
    """``'enabled'`` (quantizes on ``quantized=True``), ``'experimental'``
    (int8 graph implemented but MEASURED below the ~1.15x end-to-end ship
    bar on the target chip — ``_INT8_MEASURED_RATIO`` — so it runs only
    under ``BIU_INT8_EXPERIMENTAL=1``), or ``None`` (no int8
    formulation)."""
    family = _int8_family(model)
    if family is None:
        return None
    opt_in = os.environ.get("BIU_INT8_EXPERIMENTAL", "").strip().lower()
    # "0"/"false"/"no"/"off" must DISABLE: a truthy-string check would turn
    # an intended opt-out (BIU_INT8_EXPERIMENTAL=0) into an opt-in
    if family in _MEASURED_INT8 or opt_in not in ("", "0", "false", "no",
                                                  "off"):
        return "enabled"
    return "experimental"


def supports_int8(model) -> bool:
    """True when ``quantized=True`` will actually run int8 for this model
    (architecture supported AND the family's on-chip win cleared the ship
    bar, or BIU_INT8_EXPERIMENTAL opts into a measured-below-bar family)."""
    return int8_status(model) == "enabled"


def int8_builders(model, variables):
    """The engine's quantization triple for a supported model:
    ``(cal_fn, apply_fn, make_variables)`` — the instrumented calibration
    forward, the int8 apply with the fastpath output contract, and the
    weight-baking closure (predictor._Engine._calibrate_int8)."""
    family = _int8_family(model)
    if family in ("unet2d", "attention2d"):
        mode = model.mode
        from ..models.unet2d import normalize_dilation

        d = normalize_dilation(model.dilation)
        att = family == "attention2d"
        return (build_calibrator(variables, mode, dilation=d, attention=att),
                *build_int8_apply(variables, mode,
                                  heads=getattr(model, "heads", None),
                                  dilation=d, attention=att))
    if family == "nested":
        from .quant_nested import build_calibrator_nested, build_int8_apply_nested

        return (build_calibrator_nested(model, variables),
                *build_int8_apply_nested(model, variables))
    if family in ("unet3d", "unet3d_interp", "multi_output_3d"):
        from .quant3d import build_calibrator_3d, build_int8_apply_3d

        return (build_calibrator_3d(model, variables),
                *build_int8_apply_3d(model, variables))
    raise ValueError(f"no int8 formulation for {type(model).__name__}")


def _pack(arrs, dtype):
    """One packed buffer + unpack recipe (fastpath.pack_tree, typed)."""
    from .fastpath import pack_tree

    return pack_tree(list(arrs), dtype)


def _requant(a, s_out):
    """f32 activations → symmetric int8 at scale ``s_out``."""
    return jnp.clip(jnp.round(a / s_out), -127, 127).astype(jnp.int8)


class _WeightPack:
    """Quantize + pack an int8 graph's weights into two device buffers
    (int8 kernels; f32 scales/biases/float-layer weights) with named-slot
    lookups — shared by the 2D (this module), UNet++ (quant_nested.py) and
    3D (quant3d.py) builders.  Host-side numpy; runs once per Predict."""

    def __init__(self):
        self._i8, self._f32 = [], []
        self._i8_slot, self._f32_slot = {}, {}

    def put_f32(self, name, a):
        self._f32_slot[name] = len(self._f32)
        self._f32.append(np.asarray(a, np.float32))

    def float_layer(self, name, p):
        """A layer kept in float (first conv / output heads)."""
        self.put_f32(f"{name}.kernel", p["kernel"])
        self.put_f32(f"{name}.bias", p["bias"])

    def quant_conv(self, name, p, per_channel=True):
        """Symmetric int8 kernel + f32 scale/bias.  ``per_channel`` scales
        per output channel (last kernel axis — HWIO/DHWIO convs);
        transposed-conv kernels ((…, O, I) under ``transpose_kernel=True``)
        use per-tensor."""
        k = np.asarray(p["kernel"], np.float32)
        if per_channel:
            sw = np.maximum(np.abs(k).max(axis=tuple(range(k.ndim - 1))),
                            1e-12) / 127.0
        else:
            sw = np.float32(max(float(np.abs(k).max()), 1e-12) / 127.0)
        self._i8_slot[name] = len(self._i8)
        self._i8.append(np.clip(np.round(k / sw), -127, 127).astype(np.int8))
        self.put_f32(f"{name}.sw", sw)
        self.put_f32(f"{name}.bias", p["bias"])

    def finish(self):
        """→ (i8_buf, f32_buf, lookups(vars_tuple) -> (w8, f32) getters)."""
        i8_buf, unpack_i8 = _pack(self._i8, jnp.int8)
        f32_buf, unpack_f32 = _pack(self._f32, jnp.float32)
        i8_slot, f32_slot = dict(self._i8_slot), dict(self._f32_slot)

        def lookups(vars_tuple):
            i8_leaves = unpack_i8(vars_tuple[0])
            f32_leaves = unpack_f32(vars_tuple[1])
            return (lambda name: i8_leaves[i8_slot[name]],
                    lambda name: f32_leaves[f32_slot[name]])

        return i8_buf, f32_buf, lookups


def _maxpool_i8(x):
    return lax.reduce_window(x, jnp.int8(-128), lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _maxpool_f(x):
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def build_calibrator(variables, mode=None, dilation=1, attention=False):
    """One-dispatch instrumented bf16 forward: returns
    ``cal_fn(x_norm[, prev_norm]) -> (len(_sites(mode)),) f32`` of per-site
    max |activation| over the sample batch.  Mirrors fastpath's graph
    exactly (incl. ``dilation`` on the encoder + middle convs, decoder at
    1 — unet/unet.py:38-52); for siamese modes both streams run the shared
    encoder and each encoder site records the max over BOTH streams (so one
    scale set serves both — int8 ``max`` join is then exact)."""
    folded = jax.tree_util.tree_map(np.asarray, fold_unet2d(variables))
    sites = _sites(mode)
    d = dilation

    def _convt_f(x, p):
        dt = x.dtype
        return lax.conv_transpose(
            x, jnp.asarray(p["kernel"], dt), (2, 2), "VALID",
            dimension_numbers=_DN, transpose_kernel=True,
        ) + jnp.asarray(p["bias"], dt)

    @jax.jit
    def cal_fn(x, prev=None):
        x = x.astype(jnp.bfloat16)
        maxes = {}

        def rec(name, a):
            m = jnp.max(jnp.abs(a)).astype(jnp.float32)
            maxes[name] = jnp.maximum(maxes[name], m) if name in maxes else m
            return a

        f = {k: jax.tree_util.tree_map(jnp.asarray, v)
             for k, v in folded.items()}

        def encode(x):
            e1 = rec("e1", _conv(x, f["encode1"], d))
            e2 = rec("e2", _conv(e1, f["encode2"], d))
            e3 = rec("e3", _conv(_maxpool_f(e2), f["encode3"], d))
            e4 = rec("e4", _conv(e3, f["encode4"], d))
            e5 = rec("e5", _conv(_maxpool_f(e4), f["encode5"], d))
            e6 = rec("e6", _conv(e5, f["encode6"], d))
            e7 = rec("e7", _conv(_maxpool_f(e6), f["encode7"], d))
            e8 = rec("e8", _conv(e7, f["encode8"], d))
            return e2, e4, e6, e8, _maxpool_f(e8)

        e2, e4, e6, e8, m4 = encode(x)
        if mode is None:
            join = m4
        else:
            prev = prev.astype(jnp.bfloat16)
            *_, mm4 = encode(prev)
            if mode == "max":
                join = jnp.maximum(m4, mm4)
            elif mode == "control":
                join = m4
            else:  # concat
                join = rec("join", _conv(
                    jnp.concatenate([m4, mm4], axis=-1), f["conv_concat"]))
        h = rec("m1", _conv(join, f["middle_conv1"], d))
        h = rec("m2", _conv(h, f["middle_conv2"], d))
        for i, skip in zip(range(1, 5), (e8, e6, e4, e2)):
            u = rec(f"up{i}", _convt_f(h, f[f"up{i}"]))
            if attention:
                # gates in float; |skip·psi| ≤ |skip|, so the attended skip
                # reuses the skip site's scale — no extra calibration site
                a = attend(f[f"attention{i}"], u, skip)
                h = jnp.concatenate([a, u], axis=-1)
            else:
                h = jnp.concatenate([u, skip], axis=-1)
            h = rec(f"d{2 * i - 1}", _conv(h, f[f"decode{2 * i - 1}"]))
            h = rec(f"d{2 * i}", _conv(h, f[f"decode{2 * i}"]))
        return jnp.stack([maxes[s] for s in sites])

    return cal_fn


def build_int8_apply(variables, mode=None, heads=None, dilation=1,
                     attention=False):
    """Return ``(apply_fn, make_variables)``.

    ``make_variables(act_maxes)`` bakes the quantized weight buffers once
    (host-side numpy) and pairs them with the calibration vector;
    ``apply_fn(vars_tuple, x_norm[, prev_norm])`` is the int8 forward with
    the fastpath output contract: ``(sigmoid, logits)`` single-head, or
    ``{head: activated}`` when ``heads`` (a MultiOutputUnet head config) is
    given — the trunk runs int8, each 1×1 head conv + activation stays
    float.  Siamese modes run the shared int8 encoder on both streams;
    'max' joins in int8 exactly (both streams share one calibrated scale
    set), 'concat' quantizes the join conv like any other layer."""
    folded = jax.tree_util.tree_map(np.asarray, fold_unet2d(variables))
    sites = _sites(mode)
    site_idx = {name: i for i, name in enumerate(sites)}
    dil = dilation

    pack = _WeightPack()
    # encode1 + the output 1×1 conv(s) stay float (packed whole)
    head_layers = (["final"] if heads is None
                   else [f"output_layers_{n}" for n in heads])
    for lyr in ["encode1"] + head_layers:
        pack.float_layer(lyr, folded[lyr])
    if attention:
        # the gates stay float (skip × psi multiplies two traced
        # activations — no w8a8 form); their BN-folded 1×1 convs pack into
        # the f32 buffer like the output heads
        for i in range(1, 5):
            for sub in ("W_gate", "W_x", "psi"):
                pack.float_layer(f"attention{i}.{sub}",
                                 folded[f"attention{i}"][sub])
    conv_names = ([f"encode{i}" for i in range(2, 9)]
                  + (["conv_concat"] if mode == "concat" else [])
                  + ["middle_conv1", "middle_conv2"]
                  + [f"decode{i}" for i in range(1, 9)])
    for name in conv_names:
        pack.quant_conv(name, folded[name])
    for i in range(1, 5):
        pack.quant_conv(f"up{i}", folded[f"up{i}"], per_channel=False)
    i8_buf, f32_buf, lookups = pack.finish()

    def make_variables(act_maxes) -> tuple:
        scales = np.maximum(np.asarray(act_maxes, np.float32), 1e-8) / 127.0
        return (i8_buf, f32_buf, jnp.asarray(scales))

    def apply_fn(vars_tuple, x, prev=None):
        w8, f32 = lookups(vars_tuple)
        s = vars_tuple[2]

        def sa(site):
            return s[site_idx[site]]

        requant = _requant

        def qconv(x_q, s_in, name, s_out, d=1):
            # encoder/middle convs carry the model's dilation (decoder at 1,
            # unet/unet.py:38-52); SAME padding keeps the spatial extent for
            # any rhs_dilation at k=3
            y = lax.conv_general_dilated(
                x_q, w8(name), (1, 1), "SAME", rhs_dilation=(d, d),
                dimension_numbers=_DN, preferred_element_type=jnp.int32)
            a = y.astype(jnp.float32) * (s_in * f32(f"{name}.sw")) \
                + f32(f"{name}.bias")
            return requant(jax.nn.leaky_relu(a, 0.1), s_out)

        def qtconv(x_q, s_in, name, s_out):
            y = lax.conv_transpose(
                x_q, w8(name), (2, 2), "VALID", dimension_numbers=_DN,
                transpose_kernel=True, preferred_element_type=jnp.int32)
            a = y.astype(jnp.float32) * (s_in * f32(f"{name}.sw")) \
                + f32(f"{name}.bias")
            return requant(a, s_out)  # no activation after up-convs

        def qencode(xf):
            # encode1 in bf16 (sub-1% of FLOPs; avoids re-quantizing input)
            e1 = _conv(xf.astype(jnp.bfloat16),
                       {"kernel": f32("encode1.kernel"),
                        "bias": f32("encode1.bias")}, dil)
            q = requant(e1.astype(jnp.float32), sa("e1"))
            q2 = qconv(q, sa("e1"), "encode2", sa("e2"), dil)
            q3 = qconv(_maxpool_i8(q2), sa("e2"), "encode3", sa("e3"), dil)
            q4 = qconv(q3, sa("e3"), "encode4", sa("e4"), dil)
            q5 = qconv(_maxpool_i8(q4), sa("e4"), "encode5", sa("e5"), dil)
            q6 = qconv(q5, sa("e5"), "encode6", sa("e6"), dil)
            q7 = qconv(_maxpool_i8(q6), sa("e6"), "encode7", sa("e7"), dil)
            q8 = qconv(q7, sa("e7"), "encode8", sa("e8"), dil)
            return q2, q4, q6, q8, _maxpool_i8(q8)

        q2, q4, q6, q8, m4 = qencode(x)
        if mode is None:
            join, s_join = m4, sa("e8")
        else:
            *_, mm4 = qencode(prev)
            if mode == "max":
                # same calibrated scale on both streams → int8 max is exact
                join, s_join = jnp.maximum(m4, mm4), sa("e8")
            elif mode == "control":
                join, s_join = m4, sa("e8")
            else:  # concat — both halves share s_e8, concat directly
                join = qconv(jnp.concatenate([m4, mm4], axis=-1), sa("e8"),
                             "conv_concat", sa("join"))
                s_join = sa("join")
        h = qconv(join, s_join, "middle_conv1", sa("m1"), dil)
        h, s_h = qconv(h, sa("m1"), "middle_conv2", sa("m2"), dil), sa("m2")

        for i, (skip_q, skip_site) in enumerate(
                zip((q8, q6, q4, q2), _SKIPS), start=1):
            s_cat = jnp.maximum(sa(f"up{i}"), sa(skip_site))
            u = qtconv(h, s_h, f"up{i}", s_cat)
            if attention:
                # dequant around the float gate; |skip·psi| ≤ |skip| ≤
                # s_cat·127, so the attended skip requants to s_cat exactly
                # like the raw skip would. Attended-first concat order
                # matches fastpath (attention_unet.py:89-106).
                u_f = (u.astype(jnp.float32) * s_cat).astype(jnp.bfloat16)
                skip_f = (skip_q.astype(jnp.float32)
                          * sa(skip_site)).astype(jnp.bfloat16)
                att = {sub: {"kernel": f32(f"attention{i}.{sub}.kernel"),
                             "bias": f32(f"attention{i}.{sub}.bias")}
                       for sub in ("W_gate", "W_x", "psi")}
                a = requant(attend(att, u_f, skip_f).astype(jnp.float32),
                            s_cat)
                h = jnp.concatenate([a, u], axis=-1)
            else:
                skip = requant(skip_q.astype(jnp.float32) * sa(skip_site),
                               s_cat)
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
