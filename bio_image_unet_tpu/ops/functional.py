"""Pure-function compute primitives, channels-last, rank-agnostic (2D & 3D).

All primitives lower to single XLA HLOs (reduce_window, conv_general_dilated,
gather) so the compiler can tile them onto the MXU/VPU and fuse the
surrounding elementwise work.  Semantics match the torch ops the reference
relies on (verified by golden tests in tests/test_ops_parity.py):

- ``max_pool``           ≙ nn.MaxPool2d/3d(kernel_size=2, stride=2)
- ``depthwise_xcorr``    ≙ grouped F.conv2d cross-correlation
                           (reference siam_unet/siam_unet.py:75-83)
- ``upsample_nearest``   ≙ F.interpolate(scale_factor=2, mode='nearest')
- ``downsample_nearest`` ≙ F.interpolate(scale_factor=0.5, mode='nearest')
- ``resize_linear``      ≙ bilinear/trilinear F.interpolate with either
                           align_corners convention
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _spatial_axes(x) -> Tuple[int, ...]:
    """Spatial axes of a channels-last batched array (N, *spatial, C)."""
    return tuple(range(1, x.ndim - 1))


def max_pool(x, window: int = 2, stride: int | None = None):
    """Max pooling over all spatial axes (VALID padding — floor semantics for
    odd sizes, same as torch MaxPool)."""
    stride = window if stride is None else stride
    dims = (1,) + (window,) * (x.ndim - 2) + (1,)
    strides = (1,) + (stride,) * (x.ndim - 2) + (1,)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "VALID")


def upsample_nearest(x, factor: int = 2):
    """Nearest-neighbor ×factor upsampling of all spatial axes
    (exactly torch F.interpolate(scale_factor=factor, mode='nearest'))."""
    for ax in _spatial_axes(x):
        x = jnp.repeat(x, factor, axis=ax)
    return x


def downsample_nearest(x, factor: int = 2):
    """Nearest-neighbor 1/factor downsampling (torch scale_factor=0.5 keeps
    every ``factor``-th element starting at 0)."""
    slices = [slice(None)] + [slice(None, None, factor)] * (x.ndim - 2) + [slice(None)]
    return x[tuple(slices)]


def resize_linear(x, out_sizes: Sequence[int], align_corners: bool = False):
    """Bi/trilinear resize of the spatial axes to ``out_sizes``.

    ``align_corners=False`` is the half-pixel convention
    (torch F.interpolate(..., align_corners=False), reference
    unet3d/unet3d.py:78-92) and lowers to jax.image.resize;
    ``align_corners=True`` matches nn.Upsample(align_corners=True)
    (reference multi_output_nested_unet.py:73) via an exact separable gather.
    """
    axes = _spatial_axes(x)
    assert len(out_sizes) == len(axes)
    if not align_corners:
        shape = list(x.shape)
        for ax, n in zip(axes, out_sizes):
            shape[ax] = n
        return jax.image.resize(x, tuple(shape), method="linear")
    for ax, out_n in zip(axes, out_sizes):
        in_n = x.shape[ax]
        if out_n == in_n:
            continue
        if out_n == 1 or in_n == 1:
            coords = jnp.zeros((out_n,))
        else:
            coords = jnp.arange(out_n) * ((in_n - 1) / (out_n - 1))
        lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, in_n - 1)
        hi = jnp.clip(lo + 1, 0, in_n - 1)
        t = (coords - lo).astype(x.dtype)
        bshape = [1] * x.ndim
        bshape[ax] = out_n
        t = t.reshape(bshape)
        x = jnp.take(x, lo, axis=ax) * (1 - t) + jnp.take(x, hi, axis=ax) * t
    return x


def upsample_linear(x, factor: int = 2, align_corners: bool = False):
    """×factor linear upsampling of all spatial axes."""
    out_sizes = [s * factor for s in x.shape[1:-1]]
    return resize_linear(x, out_sizes, align_corners)


def depthwise_xcorr(embed_curr, embed_prev, precision=None):
    """Depthwise cross-correlation: correlate each (batch, channel) plane of
    the current-frame embedding with the same plane of the previous-frame
    embedding used as the kernel, 'same' padding.

    TPU-native formulation of the reference's grouped-conv trick
    (siam_unet/siam_unet.py:75-83: F.conv2d(curr.view(1,B·C,H,W),
    prev.view(B·C,1,h,w), groups=B·C, padding='same')): fold (B, C) into the
    feature axis and run one conv_general_dilated with
    feature_group_count=B·C, which XLA maps onto the MXU.

    Both inputs are (B, H, W, C) channels-last; output is (B, H, W, C).
    Note torch 'same' padding for even kernels puts the extra pad *after*
    ((k-1)//2 before, k//2 after) — matched here, and verified against
    F.conv2d(padding='same') in tests/test_ops_parity.py.
    """
    b, h, w, c = embed_curr.shape
    kb, kh, kw, kc = embed_prev.shape
    assert (b, c) == (kb, kc), "current/previous embeddings must match in B and C"
    # lhs: (1, H, W, B*C) — fold batch into features, keeping (b, c) order
    lhs = jnp.moveaxis(embed_curr, 0, -2).reshape(1, h, w, b * c)
    # rhs: (kh, kw, 1, B*C) — one single-channel kernel per (b, c) group
    rhs = jnp.moveaxis(embed_prev, 0, -2).reshape(kh, kw, 1, b * c)
    pad = [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)]
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding=pad,
        feature_group_count=b * c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    return jnp.moveaxis(out.reshape(h, w, b, c), 2, 0)
