"""w8a8 int8 inference forward for UNet++ (models/nested_unet.py — the
reference's MultiOutputNestedUNet / _3Levels, multi_output_nested_unet.py:
58-240).

Scheme: identical policy to the plain-trunk 2D path (predict/quant.py) —
per-output-channel symmetric int8 kernels, per-tensor activation scales
calibrated from the movie being predicted and passed as TRACED arguments,
first conv (grid block (0,0) stage 1) and the 1×1 output heads kept in
float.  The parts specific to the dense skip grid:

- **Concats** (round-5 scale-folded formulation): block x_{k,j} consumes j
  same-level predecessors plus one upsampled deeper tensor, each at its own
  calibrated scale.  The per-partner scales are folded into the consuming
  conv's kernel slices at ``make_variables`` time (calibration maxes are
  concrete there), so partners concatenate as RAW int8 with no
  full-resolution rescale passes.  (The round-4 shared-concat-scale
  formulation requantized every partner to max(s_1..s_{j+1}) per cell and
  measured 0.62× at cell level.)
- **Bilinear upsampling** (align_corners=True, reference :73): linear
  interpolation commutes with the scale (``up(q)·s = up(q·s)``), so the
  deeper tensor is upsampled directly on its int8 VALUES in f32 and
  rounded/clipped back at the SAME scale — convex combinations cannot
  exceed the input's range.
- **Backbone dilation** (per-level ``dilations``): carried through the int8
  convs via ``rhs_dilation`` with the fastpath's explicit padding geometry.

Measurement verdict — FORMULATION-LIMITED, stays excluded:

- Round 4 (shared-concat-scale formulation, benchmarks/INT8_r04.json):
  **0.892×** end-to-end (17.4 → 15.5 MP/s on the fused heads pipeline,
  device-resident); the cell probe (benchmarks/probe_nested_int8.py)
  blamed the per-cell dequant→bilinear→requant + per-partner concat
  rescales at 0.62× cell level.
- Round 5 (THIS scale-folded formulation, with the blamed mechanism
  removed — raw-int8 concats, same-scale upsample, zero full-res requant
  passes; benchmarks/PROBE_NESTED_INT8.json): **0.935×** — still slower.
  With the requant traffic gone, what remains is the architecture itself:
  the dense x_{i,j} grid is dominated by nf=32-scale convs whose int8 MXU
  gain (1.37× at conv level) cannot pay for the int8↔f32 boundary work at
  the float first-conv/heads and the f32 epilogues.

The family therefore stays OUT of quant._MEASURED_INT8 —
``quantized=True`` warns and runs bf16; BIU_INT8_EXPERIMENTAL=1 forces
int8 anyway (A/B reproduction, accuracy tests).

Accuracy is platform-independent (integer math) and CPU-tested:
tests/test_quant_families.py bounds int8-vs-bf16 head outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.functional import upsample_linear
from .fastpath import _conv, _conv1x1, fold_unet2d
from .quant import _DN, _maxpool_f, _maxpool_i8, _requant, _WeightPack


def _grid_order(L):
    """Grid blocks (i, j) in forward order (models/nested_unet.py:87-98)."""
    order = [(0, 0)]
    for i in range(1, L + 1):
        order.append((i, 0))
        for k in range(i - 1, -1, -1):
            order.append((k, i - k))
    return order


def _sites_nested(L):
    """Activation-scale sites in calibration-vector order: two per VGG block
    (stage-1 and stage-2 conv outputs)."""
    sites = []
    for i, j in _grid_order(L):
        sites += [f"g{i}_{j}a", f"g{i}_{j}b"]
    return sites


def build_calibrator_nested(model, variables):
    """One-dispatch instrumented bf16 forward mirroring
    fastpath._build_fast_nested: ``cal_fn(x_norm) -> (n_sites,) f32`` of
    per-site max |activation| over the sample batch."""
    folded = jax.tree_util.tree_map(np.asarray, fold_unet2d(variables))
    L = model.levels
    dil = model.dilations
    sites = _sites_nested(L)

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

        def vgg(x, ij, d=1):
            blk = f[f"grid_conv{ij}"]
            a = rec(f"g{ij}a", _conv(x, blk["stage1"], d))
            return rec(f"g{ij}b", _conv(a, blk["stage2"], d))

        col = {0: {0: vgg(x, "0_0", dil[0])}}
        for i in range(1, L + 1):
            col.setdefault(i, {})
            col[i][0] = vgg(_maxpool_f(col[i - 1][0]), f"{i}_0", dil[i])
            for k in range(i - 1, -1, -1):
                j = i - k
                inputs = [col[k][jj] for jj in range(j)] + [
                    upsample_linear(col[k + 1][j - 1], 2, align_corners=True)]
                col[k][j] = vgg(jnp.concatenate(inputs, axis=-1), f"{k}_{j}")
        return jnp.stack([maxes[s] for s in sites])

    return cal_fn


def build_int8_apply_nested(model, variables):
    """Return ``(apply_fn, make_variables)`` with the fastpath nested output
    contract: ``apply_fn(vars_tuple, x_norm) -> {head: activated}`` (eval
    mode emits only the deepest level under deep supervision, reference
    multi_output_nested_unet.py:136-154).

    Scale-folded formulation (round 5): weight quantization is DEFERRED to
    ``make_variables`` — calibration maxes are concrete there — so each
    conv's per-input-channel activation scales are folded into its float
    kernel before per-output-channel int8 quantization
    (``k'[..., c, o] = k[..., c, o] * s_in(c)``).  Consequences on the
    dense grid: partner tensors concatenate as RAW int8 (no per-partner
    full-resolution requant to a shared concat scale), the bilinear
    upsample runs directly on the int8 values (linearity: ``up(q)*s =
    up(q*s)``; convex combinations stay in-range, so the round/clip back
    to the SAME scale is the only epilogue), and every dequant multiplier
    collapses to the per-output-channel ``sw`` — this removes exactly the
    per-cell requant/rescale traffic the round-4 probe blamed for 0.62×.
    """
    folded = jax.tree_util.tree_map(np.asarray, fold_unet2d(variables))
    L = model.levels
    dil = model.dilations
    heads = model.heads
    deep = model.deep_supervision
    sites = _sites_nested(L)
    site_idx = {name: i for i, name in enumerate(sites)}
    order = _grid_order(L)

    # per-cell output width (stage-2 kernel's out-channel count)
    width = {(i, j): folded[f"grid_conv{i}_{j}"]["stage2"]["kernel"].shape[-1]
             for i, j in order}

    # conv specs: name -> (kernel, bias, [(site, n_channels), ...]) — the
    # input-scale layout folded into the kernel at make_variables time
    conv_specs = {}
    for k, j in order:
        blk = folded[f"grid_conv{k}_{j}"]
        if (k, j) == (0, 0):
            # stage 1 of the input block stays float (same policy as the 2D
            # path's encode1: <1% of FLOPs, avoids re-quantizing the
            # normalized input)
            pass
        elif j == 0:
            conv_specs[f"g{k}_0s1"] = (
                blk["stage1"], [(f"g{k - 1}_0b", width[(k - 1, 0)])])
        else:
            spec = [(f"g{k}_{jj}b", width[(k, jj)]) for jj in range(j)]
            spec.append((f"g{k + 1}_{j - 1}b", width[(k + 1, j - 1)]))
            conv_specs[f"g{k}_{j}s1"] = (blk["stage1"], spec)
        conv_specs[f"g{k}_{j}s2"] = (
            blk["stage2"], [(f"g{k}_{j}a", blk["stage2"]["kernel"].shape[-2])])

    head_layers = {name: (f"output_layers_{name}_{L}" if deep
                          else f"output_layers_{name}")
                   for name in heads}

    def _build_pack(scales):
        """Quantize all kernels with input scales folded in (deterministic
        insertion order ⇒ identical slot layout on every call)."""
        pack = _WeightPack()
        pack.float_layer("g0_0s1", folded["grid_conv0_0"]["stage1"])
        for i, j in order:
            for stage in ("s1", "s2"):
                name = f"g{i}_{j}{stage}"
                if name not in conv_specs:
                    continue
                kern, spec = conv_specs[name]
                s_in = np.concatenate([
                    np.full(n, scales[site_idx[site]], np.float32)
                    for site, n in spec])
                pack.quant_conv(name, {
                    "kernel": np.asarray(kern["kernel"], np.float32)
                    * s_in[:, None],
                    "bias": kern["bias"]})
        for name, layer in head_layers.items():
            pack.float_layer(layer, folded[layer])
        return pack.finish()

    # Slot lookups come from the first REAL pack build (deterministic
    # insertion order ⇒ identical layout every call); make_variables always
    # runs before apply_fn is traced (predictor._finish_int8_calibration),
    # so the old dry init-time build — a second full quantize+upload just
    # to learn the layout — is skipped.
    _lookups = []

    def make_variables(act_maxes) -> tuple:
        scales = np.maximum(np.asarray(act_maxes, np.float32), 1e-8) / 127.0
        i8_buf, f32_buf, lk = _build_pack(scales)
        _lookups[:] = [lk]
        return (i8_buf, f32_buf, jnp.asarray(scales))

    def apply_fn(vars_tuple, x):
        from ..models.unet2d import apply_activation

        w8, f32 = _lookups[0](vars_tuple)
        s = vars_tuple[2]

        def sa(site):
            return s[site_idx[site]]

        def qconv(x_q, name, s_out, d=1):
            y = lax.conv_general_dilated(
                x_q, w8(name), (1, 1), [(d, d)] * 2, rhs_dilation=(d, d),
                dimension_numbers=_DN, preferred_element_type=jnp.int32)
            a = y.astype(jnp.float32) * f32(f"{name}.sw") \
                + f32(f"{name}.bias")
            return _requant(jax.nn.leaky_relu(a, 0.1), s_out)

        def qvgg(x_q, i, j, d=1):
            a = qconv(x_q, f"g{i}_{j}s1", sa(f"g{i}_{j}a"), d)
            return qconv(a, f"g{i}_{j}s2", sa(f"g{i}_{j}b"), d)

        # col[k][j] = int8 tensor at site scale g{k}_{j}b
        a = _conv(x.astype(jnp.bfloat16),
                  {"kernel": f32("g0_0s1.kernel"),
                   "bias": f32("g0_0s1.bias")}, dil[0])
        q = _requant(a.astype(jnp.float32), sa("g0_0a"))
        col = {0: {0: qconv(q, "g0_0s2", sa("g0_0b"), dil[0])}}
        for i in range(1, L + 1):
            col.setdefault(i, {})
            col[i][0] = qvgg(_maxpool_i8(col[i - 1][0]), i, 0, dil[i])
            for k in range(i - 1, -1, -1):
                j = i - k
                # raw int8 concat: each partner's scale is folded into the
                # consuming conv's kernel slice; the upsample is linear, so
                # interpolating the int8 VALUES and rounding back at the
                # same scale is exact up to the 0.5-level rounding
                upf = upsample_linear(
                    col[k + 1][j - 1].astype(jnp.float32), 2,
                    align_corners=True)
                up_q = jnp.clip(jnp.round(upf), -127, 127).astype(jnp.int8)
                parts = [col[k][jj] for jj in range(j)] + [up_q]
                col[k][j] = qvgg(jnp.concatenate(parts, axis=-1), k, j)

        hd = (col[0][L].astype(jnp.float32)
              * sa(f"g0_{L}b")).astype(jnp.bfloat16)
        return {
            name: apply_activation(
                _conv1x1(hd, {"kernel": f32(f"{head_layers[name]}.kernel"),
                              "bias": f32(f"{head_layers[name]}.bias")}
                         ).astype(jnp.float32),
                cfg.get("activation"))
            for name, cfg in heads.items()
        }

    return apply_fn, make_variables
