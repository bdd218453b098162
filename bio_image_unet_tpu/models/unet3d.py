"""3-level volumetric U-Nets: UNet3D and MultiOutputUnet3D.

Layout is channels-last NDHWC.  Both trunks share ConvBlock (3D via rank
inference).  Architectural facts from the reference:

- ``UNet3D`` (unet3d/unet3d.py:6-99): channels nf/2→nf→nf→2nf→2nf→4nf,
  middle 4nf→8nf; decoder via ConvTranspose3d(k2,s2) or trilinear
  interpolation (align_corners=False) when ``use_interpolation``;
  asymmetric decoder concats (12nf→4nf, 6nf→2nf, 3nf→nf); returns
  (sigmoid, logits).
- ``MultiOutputUnet3D`` (multi_output_unet3d/multi_output_unet3d.py:7-170):
  same trunk; ``use_interpolation=True`` (default) replaces maxpools with
  nearest ×0.5 downsampling and transposed convs with nearest ×2 + conv;
  multi-head 1×1×1 output convs with in-model activations.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import (ConvBlock, ConvTranspose, _torch_bias_uniform,
                          he_normal_leaky)
from ..ops.functional import downsample_nearest, max_pool, upsample_linear, upsample_nearest
from .unet2d import apply_activation


class UNet3D(nn.Module):
    """Time-consistent / volumetric segmentation U-Net
    (reference unet3d/unet3d.py:6-99, adapted from DeepCAD-RT)."""

    in_channels: int = 1
    out_channels: int = 1
    n_filter: int = 16
    use_interpolation: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        nf = self.n_filter
        self.encode1 = ConvBlock(nf // 2, dtype=self.dtype)
        self.encode2 = ConvBlock(nf, dtype=self.dtype)
        self.encode3 = ConvBlock(nf, dtype=self.dtype)
        self.encode4 = ConvBlock(2 * nf, dtype=self.dtype)
        self.encode5 = ConvBlock(2 * nf, dtype=self.dtype)
        self.encode6 = ConvBlock(4 * nf, dtype=self.dtype)
        self.middle_conv1 = ConvBlock(4 * nf, dtype=self.dtype)
        self.middle_conv2 = ConvBlock(8 * nf, dtype=self.dtype)
        if not self.use_interpolation:
            self.up1 = ConvTranspose(8 * nf, dtype=self.dtype)
            self.up2 = ConvTranspose(4 * nf, dtype=self.dtype)
            self.up3 = ConvTranspose(2 * nf, dtype=self.dtype)
        self.decode1 = ConvBlock(4 * nf, dtype=self.dtype)
        self.decode2 = ConvBlock(4 * nf, dtype=self.dtype)
        self.decode3 = ConvBlock(2 * nf, dtype=self.dtype)
        self.decode4 = ConvBlock(2 * nf, dtype=self.dtype)
        self.decode5 = ConvBlock(nf, dtype=self.dtype)
        self.decode6 = ConvBlock(nf // 2, dtype=self.dtype)
        # torch keeps its default U(±1/√fan_in) bias on the final 1×1×1
        # (init_weights re-inits weights only); fan_in = nf//2 (decode6 width)
        self.final = nn.Conv(
            self.out_channels, (1, 1, 1), padding="VALID",
            kernel_init=he_normal_leaky,
            bias_init=_torch_bias_uniform(nf // 2),
        )

    def __call__(self, x, train: bool = False):
        e1 = self.encode1(x, train)
        e2 = self.encode2(e1, train)
        e3 = self.encode3(max_pool(e2), train)
        e4 = self.encode4(e3, train)
        e5 = self.encode5(max_pool(e4), train)
        e6 = self.encode6(e5, train)
        m3 = max_pool(e6)

        mid1 = self.middle_conv1(m3, train)
        mid2 = self.middle_conv2(mid1, train)

        u1 = upsample_linear(mid2) if self.use_interpolation else self.up1(mid2)
        d1 = self.decode1(jnp.concatenate([u1, e6], axis=-1), train)
        d2 = self.decode2(d1, train)
        u2 = upsample_linear(d2) if self.use_interpolation else self.up2(d2)
        d3 = self.decode3(jnp.concatenate([u2, e4], axis=-1), train)
        d4 = self.decode4(d3, train)
        u3 = upsample_linear(d4) if self.use_interpolation else self.up3(d4)
        d5 = self.decode5(jnp.concatenate([u3, e2], axis=-1), train)
        d6 = self.decode6(d5, train)
        logits = self.final(d6).astype(jnp.float32)
        return nn.sigmoid(logits), logits


class MultiOutputUnet3D(nn.Module):
    """3D U-Net with multiple output heads
    (reference multi_output_unet3d/multi_output_unet3d.py:7-170)."""

    in_channels: int = 1
    output_heads: Optional[Dict[str, dict]] = None
    n_filter: int = 16
    use_interpolation: bool = True
    dtype: Optional[jnp.dtype] = None

    @property
    def heads(self) -> Dict[str, dict]:
        return self.output_heads or {"default": {"channels": 1, "activation": "sigmoid"}}

    def setup(self):
        nf = self.n_filter
        self.encode1 = ConvBlock(nf // 2, dtype=self.dtype)
        self.encode2 = ConvBlock(nf, dtype=self.dtype)
        self.encode3 = ConvBlock(nf, dtype=self.dtype)
        self.encode4 = ConvBlock(2 * nf, dtype=self.dtype)
        self.encode5 = ConvBlock(2 * nf, dtype=self.dtype)
        self.encode6 = ConvBlock(4 * nf, dtype=self.dtype)
        self.middle_conv1 = ConvBlock(4 * nf, dtype=self.dtype)
        self.middle_conv2 = ConvBlock(8 * nf, dtype=self.dtype)
        if not self.use_interpolation:
            self.up1 = ConvTranspose(8 * nf, dtype=self.dtype)
            self.up2 = ConvTranspose(4 * nf, dtype=self.dtype)
            self.up3 = ConvTranspose(2 * nf, dtype=self.dtype)
        else:
            # nearest ×2 + conv replaces the transposed conv
            # (multi_output_unet3d.py:67-69,137-159)
            self.up1_conv = ConvBlock(8 * nf, dtype=self.dtype)
            self.up2_conv = ConvBlock(4 * nf, dtype=self.dtype)
            self.up3_conv = ConvBlock(2 * nf, dtype=self.dtype)
        self.decode1 = ConvBlock(4 * nf, dtype=self.dtype)
        self.decode2 = ConvBlock(4 * nf, dtype=self.dtype)
        self.decode3 = ConvBlock(2 * nf, dtype=self.dtype)
        self.decode4 = ConvBlock(2 * nf, dtype=self.dtype)
        self.decode5 = ConvBlock(nf, dtype=self.dtype)
        self.decode6 = ConvBlock(nf // 2, dtype=self.dtype)
        self.output_layers = {
            name: nn.Conv(
                cfg["channels"], (1, 1, 1), padding="VALID",
                kernel_init=he_normal_leaky,
                bias_init=_torch_bias_uniform(nf // 2),
            )
            for name, cfg in self.heads.items()
        }

    def _down(self, x):
        # nearest ×0.5 downscale replaces maxpool (multi_output_unet3d.py:111-130)
        return downsample_nearest(x) if self.use_interpolation else max_pool(x)

    def __call__(self, x, train: bool = False):
        e1 = self.encode1(x, train)
        e2 = self.encode2(e1, train)
        e3 = self.encode3(self._down(e2), train)
        e4 = self.encode4(e3, train)
        e5 = self.encode5(self._down(e4), train)
        e6 = self.encode6(e5, train)
        m3 = self._down(e6)

        mid1 = self.middle_conv1(m3, train)
        mid2 = self.middle_conv2(mid1, train)

        if self.use_interpolation:
            u1 = self.up1_conv(upsample_nearest(mid2), train)
        else:
            u1 = self.up1(mid2)
        d1 = self.decode1(jnp.concatenate([u1, e6], axis=-1), train)
        d2 = self.decode2(d1, train)
        if self.use_interpolation:
            u2 = self.up2_conv(upsample_nearest(d2), train)
        else:
            u2 = self.up2(d2)
        d3 = self.decode3(jnp.concatenate([u2, e4], axis=-1), train)
        d4 = self.decode4(d3, train)
        if self.use_interpolation:
            u3 = self.up3_conv(upsample_nearest(d4), train)
        else:
            u3 = self.up3(d4)
        d5 = self.decode5(jnp.concatenate([u3, e2], axis=-1), train)
        d6 = self.decode6(d5, train)

        outputs = {}
        for name, cfg in self.heads.items():
            logits = self.output_layers[name](d6).astype(jnp.float32)
            outputs[name] = apply_activation(logits, cfg.get("activation"))
        return outputs
