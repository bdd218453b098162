"""The 2D U-Net family on a single shared trunk.

The reference implements four near-identical 4-level U-Nets in four files
(unet/unet.py:5-104, unet/attention_unet.py:5-181, siam_unet/siam_unet.py:7-148,
multi_output_unet/multi_output_unet.py:6-134).  Here one configurable trunk
(`UNet2DBase`) covers all of them; the public classes only override defaults:

- ``Unet``            — plain 4-level U-Net, (sigmoid, logits) output
- ``AttentionUnet``   — + additive attention gates on every skip
- ``Siam_UNet``       — shared-weight twin encoder over (frame, prev_frame)
                        with join modes concat | corr | max | control
- ``MultiOutputUnet`` — per-head 1×1 conv outputs from ``output_heads`` config

Layout is channels-last NHWC (TPU-native); weights import from torch NCHW
checkpoints via :mod:`bio_image_unet_tpu.interop`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import (AttentionBlock, ConvBlock, ConvTranspose,
                          _torch_bias_uniform, he_normal_leaky)
from ..ops.functional import depthwise_xcorr, max_pool


def normalize_dilation(dilation) -> int:
    """The multi_output reference spells "no dilation" as False
    (multi_output_unet/train.py:22); flax ctors may also see None/True —
    all mean 1.  Single source of truth for the model, the BN-folded
    fastpath forward and the int8 graph."""
    return 1 if dilation in (False, None, True) else int(dilation)


def apply_activation(x, activation: Optional[str]):
    """Per-head activation (reference multi_output_unet.py:82-89)."""
    if activation == "sigmoid":
        return nn.sigmoid(x)
    if activation == "tanh":
        return nn.tanh(x)
    if activation in ("relu", "ReLU"):
        return nn.relu(x)
    return x


class UNet2DBase(nn.Module):
    """4-level encoder / 16·nf bottleneck / transposed-conv decoder trunk."""

    in_channels: int = 1
    out_channels: int = 1
    n_filter: int = 32
    dilation: int = 1
    attention: bool = False
    mode: Optional[str] = None  # siamese join: None|'concat'|'corr'|'max'|'control'
    multi_output: bool = False
    output_heads: Optional[Dict[str, dict]] = None
    dtype: Optional[jnp.dtype] = None  # bf16 compute; params/BN/logits fp32

    @property
    def heads(self) -> Optional[Dict[str, dict]]:
        """Resolved head config: explicit ``output_heads``, the reference's
        default single sigmoid head when multi_output, else None."""
        if self.output_heads is not None:
            return self.output_heads
        if self.multi_output:
            return {"default": {"channels": 1, "activation": "sigmoid"}}
        return None

    def setup(self):
        nf = self.n_filter
        d = normalize_dilation(self.dilation)
        dt = self.dtype
        # encoder (reference unet/unet.py:20-31)
        self.encode1 = ConvBlock(nf, dilation=d, dtype=dt)
        self.encode2 = ConvBlock(nf, dilation=d, dtype=dt)
        self.encode3 = ConvBlock(2 * nf, dilation=d, dtype=dt)
        self.encode4 = ConvBlock(2 * nf, dilation=d, dtype=dt)
        self.encode5 = ConvBlock(4 * nf, dilation=d, dtype=dt)
        self.encode6 = ConvBlock(4 * nf, dilation=d, dtype=dt)
        self.encode7 = ConvBlock(8 * nf, dilation=d, dtype=dt)
        self.encode8 = ConvBlock(8 * nf, dilation=d, dtype=dt)
        # siamese bottleneck join (siam_unet/siam_unet.py:36-38)
        if self.mode == "concat":
            self.conv_concat = ConvBlock(8 * nf, dtype=dt)
        # middle (unet/unet.py:34-35)
        self.middle_conv1 = ConvBlock(16 * nf, dilation=d, dtype=dt)
        self.middle_conv2 = ConvBlock(16 * nf, dilation=d, dtype=dt)
        # decoder (unet/unet.py:38-52); decode blocks use default dilation 1
        self.up1 = ConvTranspose(8 * nf, dtype=dt)
        self.decode1 = ConvBlock(8 * nf, dtype=dt)
        self.decode2 = ConvBlock(8 * nf, dtype=dt)
        self.up2 = ConvTranspose(4 * nf, dtype=dt)
        self.decode3 = ConvBlock(4 * nf, dtype=dt)
        self.decode4 = ConvBlock(4 * nf, dtype=dt)
        self.up3 = ConvTranspose(2 * nf, dtype=dt)
        self.decode5 = ConvBlock(2 * nf, dtype=dt)
        self.decode6 = ConvBlock(2 * nf, dtype=dt)
        self.up4 = ConvTranspose(nf, dtype=dt)
        self.decode7 = ConvBlock(nf, dtype=dt)
        self.decode8 = ConvBlock(nf, dtype=dt)
        # attention gates (attention_unet.py:38-50)
        if self.attention:
            self.attention1 = AttentionBlock(4 * nf)
            self.attention2 = AttentionBlock(2 * nf)
            self.attention3 = AttentionBlock(nf)
            self.attention4 = AttentionBlock(max(nf // 2, 1))
        # output: single final 1×1 conv or per-head 1×1 convs.  torch keeps
        # its default U(±1/√fan_in) bias here (the reference's init_weights
        # re-inits weights only, utils/utils.py:76-78); fan_in = nf (d8 width)
        if self.heads is None:
            self.final = nn.Conv(
                self.out_channels, (1, 1), padding="VALID",
                kernel_init=he_normal_leaky,
                bias_init=_torch_bias_uniform(nf), name="final",
            )
        else:
            self.output_layers = {
                name: nn.Conv(
                    cfg["channels"], (1, 1), padding="VALID",
                    kernel_init=he_normal_leaky,
                    bias_init=_torch_bias_uniform(nf),
                )
                for name, cfg in self.heads.items()
            }

    def _encode(self, x, train: bool):
        e1 = self.encode1(x, train)
        e2 = self.encode2(e1, train)
        e3 = self.encode3(max_pool(e2), train)
        e4 = self.encode4(e3, train)
        e5 = self.encode5(max_pool(e4), train)
        e6 = self.encode6(e5, train)
        e7 = self.encode7(max_pool(e6), train)
        e8 = self.encode8(e7, train)
        m4 = max_pool(e8)
        return e2, e4, e6, e8, m4

    def __call__(self, x, prev_x=None, train: bool = False):
        if x.shape[-1] != self.in_channels and self.mode is None:
            raise ValueError(
                f"expected {self.in_channels} input channels (NHWC), got {x.shape[-1]}"
            )
        e2, e4, e6, e8, m4 = self._encode(x, train)

        if self.mode is not None:
            # twin encoder with shared weights (siam_unet/siam_unet.py:100-112)
            if prev_x is None:
                raise ValueError("Siam mode requires prev_x")
            *_, mm4 = self._encode(prev_x, train)
            if self.mode == "corr":
                join = depthwise_xcorr(m4, mm4)
            elif self.mode == "max":
                join = jnp.maximum(m4, mm4)
            elif self.mode == "concat":
                join = self.conv_concat(jnp.concatenate([m4, mm4], axis=-1), train)
            elif self.mode == "control":
                join = m4
            else:
                raise NotImplementedError(f"Unknown mode: {self.mode}")
        else:
            join = m4

        mid1 = self.middle_conv1(join, train)
        mid2 = self.middle_conv2(mid1, train)

        # decoder; plain concat order is (up, skip) (unet/unet.py:87-102),
        # attention concat order is (attended_skip, up) (attention_unet.py:88-106)
        u1 = self.up1(mid2)
        if self.attention:
            a1 = self.attention1(gate=u1, skip_connection=e8, train=train)
            c1 = jnp.concatenate([a1, u1], axis=-1)
        else:
            c1 = jnp.concatenate([u1, e8], axis=-1)
        d1 = self.decode1(c1, train)
        d2 = self.decode2(d1, train)
        u2 = self.up2(d2)
        if self.attention:
            a2 = self.attention2(gate=u2, skip_connection=e6, train=train)
            c2 = jnp.concatenate([a2, u2], axis=-1)
        else:
            c2 = jnp.concatenate([u2, e6], axis=-1)
        d3 = self.decode3(c2, train)
        d4 = self.decode4(d3, train)
        u3 = self.up3(d4)
        if self.attention:
            a3 = self.attention3(gate=u3, skip_connection=e4, train=train)
            c3 = jnp.concatenate([a3, u3], axis=-1)
        else:
            c3 = jnp.concatenate([u3, e4], axis=-1)
        d5 = self.decode5(c3, train)
        d6 = self.decode6(d5, train)
        u4 = self.up4(d6)
        if self.attention:
            a4 = self.attention4(gate=u4, skip_connection=e2, train=train)
            c4 = jnp.concatenate([a4, u4], axis=-1)
        else:
            c4 = jnp.concatenate([u4, e2], axis=-1)
        d7 = self.decode7(c4, train)
        d8 = self.decode8(d7, train)

        if self.heads is None:
            logits = self.final(d8).astype(jnp.float32)
            return nn.sigmoid(logits), logits
        outputs = {}
        for name, cfg in self.heads.items():
            logits = self.output_layers[name](d8).astype(jnp.float32)
            outputs[name] = apply_activation(logits, cfg.get("activation"))
        return outputs


class Unet(UNet2DBase):
    """Plain 4-level 2D U-Net (reference unet/unet.py:5-104)."""


class AttentionUnet(UNet2DBase):
    """U-Net with additive attention gates on each skip
    (reference unet/attention_unet.py:5-181)."""

    attention: bool = True


class Siam_UNet(UNet2DBase):
    """Siamese U-Net: shared-weight twin encoder over (current, previous)
    frames with bottleneck join mode ∈ {concat, corr, max, control}
    (reference siam_unet/siam_unet.py:7-148).  Fixed 1-in/1-out."""

    mode: str = "concat"


class MultiOutputUnet(UNet2DBase):
    """U-Net trunk with per-head 1×1 conv outputs and in-model activations,
    returning ``{head_name: activated tensor}``
    (reference multi_output_unet/multi_output_unet.py:6-134)."""

    multi_output: bool = True
