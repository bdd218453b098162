"""Legacy 2D variants: Unet_v0 and BabyUnet.

Kept for loading old checkpoints — ``Unet_v0`` is reachable through
``Predict(network='Unet_v0')`` in the reference (unet/predict.py:93-97).
Both use ReLU blocks (not Leaky), dropout 0.5 in the bottleneck's second conv,
skip connections taken from the *first* conv of each level (e1/e3/e5/e7 —
unlike ``Unet`` which skips e2/e4/e6/e8), an extra decode stage down to one
channel, and a fixed 1-in/1-out head
(reference unet/unet_v0.py:5-106, unet/baby_unet.py:5-93).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import (ConvBlock, ConvTranspose, _torch_bias_uniform,
                          he_normal_leaky)
from ..ops.functional import max_pool


def _relu_block(features: int, dropout: float = 0.0) -> ConvBlock:
    # legacy conv block: Conv(k3, padding=1) + BN + ReLU + Dropout2d
    return ConvBlock(features, dilation=1, dropout=dropout, activation="relu")


class Unet_v0(nn.Module):
    """reference unet/unet_v0.py:5-106 (4-level, ReLU, middle dropout 0.5)."""

    n_filter: int = 32

    def setup(self):
        nf = self.n_filter
        self.encode1 = _relu_block(nf)
        self.encode2 = _relu_block(nf)
        self.encode3 = _relu_block(2 * nf)
        self.encode4 = _relu_block(2 * nf)
        self.encode5 = _relu_block(4 * nf)
        self.encode6 = _relu_block(4 * nf)
        self.encode7 = _relu_block(8 * nf)
        self.encode8 = _relu_block(8 * nf)
        self.middle_conv1 = _relu_block(16 * nf)
        self.middle_conv2 = _relu_block(16 * nf, dropout=0.5)
        self.up1 = ConvTranspose(8 * nf)
        self.decode1 = _relu_block(8 * nf)
        self.decode2 = _relu_block(8 * nf)
        self.up2 = ConvTranspose(4 * nf)
        self.decode3 = _relu_block(4 * nf)
        self.decode4 = _relu_block(4 * nf)
        self.up3 = ConvTranspose(2 * nf)
        self.decode5 = _relu_block(2 * nf)
        self.decode6 = _relu_block(2 * nf)
        self.up4 = ConvTranspose(nf)
        self.decode7 = _relu_block(nf)
        self.decode8 = _relu_block(nf)
        self.decode9 = _relu_block(1)
        # fan_in 1: the last decode block narrows to a single channel; torch
        # keeps its default U(±1/√fan_in) bias (init_weights re-inits weights
        # only, utils/utils.py:76-78)
        self.final = nn.Conv(1, (1, 1), padding="VALID",
                             kernel_init=he_normal_leaky,
                             bias_init=_torch_bias_uniform(1))

    def __call__(self, x, train: bool = False):
        e1 = self.encode1(x, train)
        e2 = self.encode2(e1, train)
        e3 = self.encode3(max_pool(e2), train)
        e4 = self.encode4(e3, train)
        e5 = self.encode5(max_pool(e4), train)
        e6 = self.encode6(e5, train)
        e7 = self.encode7(max_pool(e6), train)
        e8 = self.encode8(e7, train)
        m4 = max_pool(e8)

        mid1 = self.middle_conv1(m4, train)
        mid2 = self.middle_conv2(mid1, train)

        # legacy skip wiring: e7/e5/e3/e1 (unet_v0.py:89-103)
        u1 = self.up1(mid2)
        d1 = self.decode1(jnp.concatenate([u1, e7], axis=-1), train)
        d2 = self.decode2(d1, train)
        u2 = self.up2(d2)
        d3 = self.decode3(jnp.concatenate([u2, e5], axis=-1), train)
        d4 = self.decode4(d3, train)
        u3 = self.up3(d4)
        d5 = self.decode5(jnp.concatenate([u3, e3], axis=-1), train)
        d6 = self.decode6(d5, train)
        u4 = self.up4(d6)
        d7 = self.decode7(jnp.concatenate([u4, e1], axis=-1), train)
        d8 = self.decode8(d7, train)
        d9 = self.decode9(d8, train)
        logits = self.final(d9)
        return nn.sigmoid(logits), logits


class BabyUnet(nn.Module):
    """reference unet/baby_unet.py:5-93 (3-level mini U-Net, ReLU blocks,
    default n_filter=4; skips from e1/e3/e5)."""

    n_filter: int = 4

    def setup(self):
        nf = self.n_filter
        self.encode1 = _relu_block(nf)
        self.encode2 = _relu_block(nf)
        self.encode3 = _relu_block(2 * nf)
        self.encode4 = _relu_block(2 * nf)
        self.encode5 = _relu_block(4 * nf)
        self.encode6 = _relu_block(4 * nf)
        self.middle_conv1 = _relu_block(8 * nf)
        self.middle_conv2 = _relu_block(8 * nf, dropout=0.5)
        self.up1 = ConvTranspose(4 * nf)
        self.decode1 = _relu_block(4 * nf)
        self.decode2 = _relu_block(4 * nf)
        self.up2 = ConvTranspose(2 * nf)
        self.decode3 = _relu_block(2 * nf)
        self.decode4 = _relu_block(2 * nf)
        self.up3 = ConvTranspose(nf)
        self.decode5 = _relu_block(nf)
        self.decode6 = _relu_block(nf)
        self.decode7 = _relu_block(1)
        # fan_in 1: the last decode block narrows to a single channel; torch
        # keeps its default U(±1/√fan_in) bias (init_weights re-inits weights
        # only, utils/utils.py:76-78)
        self.final = nn.Conv(1, (1, 1), padding="VALID",
                             kernel_init=he_normal_leaky,
                             bias_init=_torch_bias_uniform(1))

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

        u1 = self.up1(mid2)
        d1 = self.decode1(jnp.concatenate([u1, e5], axis=-1), train)
        d2 = self.decode2(d1, train)
        u2 = self.up2(d2)
        d3 = self.decode3(jnp.concatenate([u2, e3], axis=-1), train)
        d4 = self.decode4(d3, train)
        u3 = self.up3(d4)
        d5 = self.decode5(jnp.concatenate([u3, e1], axis=-1), train)
        d6 = self.decode6(d5, train)
        d9 = self.decode7(d6, train)
        logits = self.final(d9)
        return nn.sigmoid(logits), logits
