"""UNet++ (nested U-Net) with multi-head outputs and deep supervision.

Reference: multi_output_unet/multi_output_nested_unet.py:58-240 (4- and
3-pool-level variants).  The dense skip grid x_{i,j} of VGGBlocks is upsampled
with bilinear align_corners=True (reference :73) — reproduced exactly by
``resize_linear(..., align_corners=True)``.

Deep supervision (reference :95-105,136-154): with ``deep_supervision=True``
and ``train=True`` the output dict contains ``{name}_1..{name}_L`` per head
plus ``name`` aliased to the deepest level; in eval mode only ``name``
(from the deepest level's conv) is produced.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import VGGBlock, _torch_bias_uniform, he_normal_leaky
from ..ops.functional import max_pool, upsample_linear
from .unet2d import apply_activation


def _head_conv(channels: int, in_ch: int) -> nn.Conv:
    # torch keeps its default U(±1/√fan_in) bias on the 1×1 heads (the
    # reference's init_weights re-inits weights only, utils/utils.py:76-78)
    return nn.Conv(channels, (1, 1), padding="VALID",
                   kernel_init=he_normal_leaky,
                   bias_init=_torch_bias_uniform(in_ch))


class MultiOutputNestedUNet(nn.Module):
    """4-level UNet++ (reference multi_output_nested_unet.py:58-156)."""

    in_channels: int = 1
    output_heads: Optional[Dict[str, dict]] = None
    n_filter: int = 32
    deep_supervision: bool = False
    dilation: Union[bool, Tuple[int, ...]] = False
    train_mode: bool = True  # reference ctor flag; call-time ``train`` also gates levels
    dtype: Optional[jnp.dtype] = None

    levels: int = 4  # grid depth; the 3-level subclass overrides

    @property
    def heads(self) -> Dict[str, dict]:
        return self.output_heads or {"default": {"channels": 1, "activation": "sigmoid"}}

    @property
    def dilations(self) -> Tuple[int, ...]:
        if self.dilation is False or self.dilation is None:
            return (1,) * (self.levels + 1)
        if isinstance(self.dilation, int):  # scalar → uniform per-level dilation
            return (self.dilation,) * (self.levels + 1)
        return tuple(self.dilation)

    def setup(self):
        nf = self.n_filter
        L = self.levels
        nb = [nf * (2**i) for i in range(L + 1)]
        dil = self.dilations

        # backbone column x_{i,0}
        grid = {}
        grid["conv0_0"] = VGGBlock(nb[0], nb[0], dilation=dil[0], dtype=self.dtype)
        for i in range(1, L + 1):
            grid[f"conv{i}_0"] = VGGBlock(nb[i], nb[i], dilation=dil[i], dtype=self.dtype)
        # dense skip grid x_{i,j}: in = nb[i]*j + nb[i+1], middle = out = nb[i]
        for j in range(1, L + 1):
            for i in range(0, L + 1 - j):
                grid[f"conv{i}_{j}"] = VGGBlock(nb[i], nb[i], dtype=self.dtype)
        self.grid = grid

        heads = {}
        if self.deep_supervision:
            for name, cfg in self.heads.items():
                for level in range(1, L + 1):
                    heads[f"{name}_{level}"] = _head_conv(cfg["channels"], nb[0])
        else:
            for name, cfg in self.heads.items():
                heads[name] = _head_conv(cfg["channels"], nb[0])
        self.output_layers = heads

    def __call__(self, x, train: bool = False):
        L = self.levels
        up = lambda t: upsample_linear(t, 2, align_corners=True)  # noqa: E731

        # x[i][j] dense grid (reference forward :116-134)
        col = {0: {}}
        col[0][0] = self.grid["conv0_0"](x, train)
        for i in range(1, L + 1):
            col.setdefault(i, {})
            col[i][0] = self.grid[f"conv{i}_0"](max_pool(col[i - 1][0]), train)
            # after computing x_{i,0}, fill the anti-diagonal entries x_{k, i-k}
            for k in range(i - 1, -1, -1):
                j = i - k
                inputs = [col[k][jj] for jj in range(j)] + [up(col[k + 1][j - 1])]
                col[k][j] = self.grid[f"conv{k}_{j}"](
                    jnp.concatenate(inputs, axis=-1), train
                )

        outputs = {}
        if self.deep_supervision:
            for name, cfg in self.heads.items():
                act = cfg.get("activation")
                # Always apply every level head (1×1 convs, negligible cost) so
                # all parameters exist regardless of the init-time train flag;
                # the returned dict matches the reference per mode (:136-154).
                levels = {
                    level: apply_activation(
                        self.output_layers[f"{name}_{level}"](col[0][level])
                        .astype(jnp.float32), act
                    )
                    for level in range(1, L + 1)
                }
                if train and self.train_mode:
                    for level, value in levels.items():
                        outputs[f"{name}_{level}"] = value
                outputs[name] = levels[L]
        else:
            for name, cfg in self.heads.items():
                outputs[name] = apply_activation(
                    self.output_layers[name](col[0][L]).astype(jnp.float32),
                    cfg.get("activation")
                )
        return outputs


class MultiOutputNestedUNet_3Levels(MultiOutputNestedUNet):
    """3-level UNet++ (reference multi_output_nested_unet.py:159-240)."""

    levels: int = 3
