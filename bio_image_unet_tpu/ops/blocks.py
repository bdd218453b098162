"""flax.linen building blocks with exact torch-op parity, channels-last.

These are the shared bricks from which every model in the family is built —
the reference repeats them as ``nn.Sequential(Conv, BatchNorm, LeakyReLU,
Dropout)`` in each of its five subpackages (e.g. unet/unet.py:54-60,
unet3d/unet3d.py:52-58); here they exist once and are rank-agnostic (the
spatial rank is inferred from the input, so the same ``ConvBlock`` serves 2D
and 3D).

Parity notes (verified against torch in tests/test_ops_parity.py):
- ``TorchBatchNorm`` reproduces torch BatchNorm exactly, including the
  *unbiased* running-variance update torch uses (flax's BatchNorm stores the
  biased batch variance — a subtle eval-time divergence we avoid).
- ``ConvTranspose`` reproduces nn.ConvTranspose2d/3d(kernel_size=2, stride=2)
  via lax.conv_transpose(transpose_kernel=True); the kernel parameter is laid
  out (*spatial, out, in).
- Conv kernels default to He-normal init with leaky_relu gain, matching the
  reference's ``init_weights`` pass (utils/utils.py:76-78) that the Trainer
  applies to every conv (unet/train.py:68-70).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax


def he_normal_leaky(key, shape, dtype=jnp.float32):
    """Kaiming-normal, fan_in, leaky_relu gain with torch's default
    negative_slope=0.01 (≙ nn.init.kaiming_normal_(w, nonlinearity='leaky_relu'))."""
    import jax

    gain = np.sqrt(2.0 / (1.0 + 0.01**2))
    fan_in = int(np.prod(shape[:-1]))  # HWIO: prod(spatial)*in
    return (gain / np.sqrt(fan_in)) * jax.random.normal(key, shape, dtype)


def _torch_bias_uniform(fan_in: int):
    """torch's default conv bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    import jax

    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch semantics (momentum 0.1, eps 1e-5,
    biased batch variance for normalization, unbiased for the running var)."""

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((features,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((features,)))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduction_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=reduction_axes)
            var = jnp.mean(jnp.square(x), axis=reduction_axes) - jnp.square(mean)
            if not self.is_initializing():
                n = x.size / features
                if n <= 1:
                    # torch raises "Expected more than 1 value per channel
                    # when training" — the unbiased update below would write
                    # inf/NaN into the running stats silently
                    raise ValueError(
                        "TorchBatchNorm requires more than 1 value per "
                        f"channel in training mode, got {int(n)} "
                        f"(input shape {x.shape})")
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var * (n / (n - 1))
        inv = lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale + bias


class TorchInstanceNorm(nn.Module):
    """InstanceNorm with torch defaults (affine=False, no running stats):
    per-sample, per-channel normalization over the spatial axes
    (reference multi_output_nested_unet.py:14-16 FirstVGGBlock)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x), axis=axes, keepdims=True) - jnp.square(mean)
        return (x - mean) * lax.rsqrt(var + self.epsilon)


class ConvBlock(nn.Module):
    """Conv(k3, padding=dilation, dilation) + BatchNorm + activation +
    channel Dropout — the reference's universal ``conv``/``conv3D`` block
    (unet/unet.py:54-60, unet3d/unet3d.py:52-58).  Rank-agnostic: the spatial
    rank comes from the input (NHWC → 2D, NDHWC → 3D).

    ``negative_slope=0.1`` is the family default; ``activation='relu'``
    reproduces the legacy Unet_v0/BabyUnet blocks (unet/unet_v0.py:56-62).
    """

    features: int
    kernel_size: int = 3
    dilation: int = 1
    dropout: float = 0.0
    activation: str = "leaky_relu"
    negative_slope: float = 0.1
    dtype: Optional[jnp.dtype] = None  # bf16 compute (params stay fp32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        nsp = x.ndim - 2
        fan_in = x.shape[-1] * self.kernel_size**nsp
        # shape-preserving padding for any odd kernel: dilation·(k−1)/2
        # (equals the reference's padding=dilation at its fixed k=3,
        # unet/unet.py:54-60)
        pad = self.dilation * (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size,) * nsp,
            padding=[(pad, pad)] * nsp,
            kernel_dilation=(self.dilation,) * nsp,
            kernel_init=he_normal_leaky,
            bias_init=_torch_bias_uniform(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)
        # BatchNorm always in float32 (bf16 mean/var drift); output returns
        # to the compute dtype
        in_dtype = x.dtype
        x = TorchBatchNorm(name="bn")(x.astype(jnp.float32),
                                      use_running_average=not train)
        x = x.astype(self.dtype or in_dtype)
        if self.activation == "leaky_relu":
            x = nn.leaky_relu(x, self.negative_slope)
        elif self.activation == "relu":
            x = nn.relu(x)
        else:
            raise ValueError(f"unknown activation {self.activation}")
        if self.dropout > 0.0:
            # torch Dropout2d/3d drops whole channels per sample
            x = nn.Dropout(
                self.dropout,
                broadcast_dims=tuple(range(1, x.ndim - 1)),
                deterministic=not train,
            )(x)
        return x


class ConvTranspose(nn.Module):
    """nn.ConvTranspose2d/3d(kernel_size=2, stride=2) parity upsampling.

    Kernel parameter layout: (*spatial, out, in) — exactly what
    lax.conv_transpose(transpose_kernel=True) consumes, and a plain
    (2,3,1,0)/(2,3,4,1,0) transpose of torch's (in, out, *spatial) weight.
    """

    features: int
    kernel_size: int = 2
    stride: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        nsp = x.ndim - 2
        in_ch = x.shape[-1]
        kshape = (self.kernel_size,) * nsp + (self.features, in_ch)
        # torch ConvTranspose default init: kaiming_uniform(a=√5) with
        # fan_in = out * prod(kernel) (torch counts dim 1 of (in,out,kh,kw))
        fan_in = self.features * self.kernel_size**nsp
        bound = np.sqrt(1.0 / fan_in)

        def kernel_init(key, shape, dtype=jnp.float32):
            import jax

            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", kernel_init, kshape)
        bias = self.param("bias", _torch_bias_uniform(fan_in), (self.features,))
        if nsp == 2:
            dn = ("NHWC", "HWIO", "NHWC")
        elif nsp == 3:
            dn = ("NDHWC", "DHWIO", "NDHWC")
        else:
            raise ValueError(f"unsupported spatial rank {nsp}")
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        y = lax.conv_transpose(
            x, kernel, (self.stride,) * nsp, "VALID",
            dimension_numbers=dn, transpose_kernel=True,
        )
        return y + bias


class AttentionBlock(nn.Module):
    """Additive attention gate (reference unet/attention_unet.py:112-181):
    psi = σ(BN(conv1×1(relu(BN(conv1×1(gate)) + BN(conv1×1(skip)))))),
    returns skip × psi."""

    n_coefficients: int

    @nn.compact
    def __call__(self, gate, skip_connection, train: bool = False):
        def conv1x1(features, name, in_ch):
            # torch's Conv2d keeps its default U(±1/√fan_in) bias here —
            # the reference's init_weights re-inits only weights
            # (utils/utils.py:76-78), so bias parity needs the uniform init
            return nn.Conv(
                features, (1, 1), padding="VALID",
                kernel_init=he_normal_leaky,
                bias_init=_torch_bias_uniform(in_ch), name=name,
            )

        g1 = conv1x1(self.n_coefficients, "W_gate_conv", gate.shape[-1])(gate)
        g1 = TorchBatchNorm(name="W_gate_bn")(g1, use_running_average=not train)
        x1 = conv1x1(self.n_coefficients, "W_x_conv",
                     skip_connection.shape[-1])(skip_connection)
        x1 = TorchBatchNorm(name="W_x_bn")(x1, use_running_average=not train)
        psi = nn.relu(g1 + x1)
        psi = conv1x1(1, "psi_conv", self.n_coefficients)(psi)
        psi = TorchBatchNorm(name="psi_bn")(psi, use_running_average=not train)
        psi = nn.sigmoid(psi)
        return skip_connection * psi


class VGGBlock(nn.Module):
    """Two (Conv3×3 + BN + LeakyReLU(0.1) + Dropout) stages with a middle
    channel width (reference multi_output_nested_unet.py:33-55)."""

    middle_features: int
    features: int
    dropout: float = 0.0
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, feats in enumerate((self.middle_features, self.features), start=1):
            nsp = x.ndim - 2
            fan_in = x.shape[-1] * 3**nsp
            x = nn.Conv(
                feats, (3,) * nsp,
                padding=[(self.dilation, self.dilation)] * nsp,
                kernel_dilation=(self.dilation,) * nsp,
                kernel_init=he_normal_leaky,
                bias_init=_torch_bias_uniform(fan_in),
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            in_dtype = x.dtype
            x = TorchBatchNorm(name=f"bn{i}")(x.astype(jnp.float32),
                                              use_running_average=not train)
            x = x.astype(self.dtype or in_dtype)
            x = nn.leaky_relu(x, 0.1)
            if self.dropout > 0.0:
                x = nn.Dropout(
                    self.dropout,
                    broadcast_dims=tuple(range(1, x.ndim - 1)),
                    deterministic=not train,
                )(x)
        return x


class FirstVGGBlock(nn.Module):
    """VGGBlock variant with InstanceNorm (reference
    multi_output_nested_unet.py:7-30; defined but unused upstream — provided
    for completeness)."""

    middle_features: int
    features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, feats in enumerate((self.middle_features, self.features), start=1):
            nsp = x.ndim - 2
            fan_in = x.shape[-1] * 3**nsp
            x = nn.Conv(
                feats, (3,) * nsp, padding=[(1, 1)] * nsp,
                kernel_init=he_normal_leaky,
                bias_init=_torch_bias_uniform(fan_in),
                name=f"conv{i}",
            )(x)
            x = TorchInstanceNorm(name=f"in{i}")(x)
            x = nn.leaky_relu(x, 0.1)
            if self.dropout > 0.0:
                x = nn.Dropout(
                    self.dropout,
                    broadcast_dims=tuple(range(1, x.ndim - 1)),
                    deterministic=not train,
                )(x)
        return x
