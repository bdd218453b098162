"""Whole-frame spatially-sharded prediction — for frames too large to fit one
chip's HBM (the domain's context parallelism; SURVEY.md §5 "long-context").

Instead of host-side tiling, the frame's H axis is sharded over the mesh's
``spatial`` axis and the full U-Net forward runs with ppermute halo exchange
at shard boundaries (:mod:`..parallel.halo`).  Interior rows (> ``halo`` from
the global border) are bit-identical to the unsharded forward; border rows
see a zero frame (the documented halo contract).

Requirements: H divisible by (mesh spatial size × pooling stride),
``halo`` ≥ the model's receptive-field half-width and a multiple of the
pooling stride (2^levels: 16 for the 4-level family, 8 for
BabyUnet/the 3-level volumetric trunks).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import checkpoint
from ..models import get_model
from ..parallel import spatial_shard_apply
from .predictor import _normalize_stack


def _resolve_forward(model_params, network, half_precision: bool):
    """Load a checkpoint and build the single-output forward both sharded
    predictors share: BN-folded raw-lax fast path where supported (same ~10×
    device win as the tiled engine), flax fallback otherwise.  Returns
    ``(model, forward)``."""
    state = checkpoint.load(model_params)
    hp = dict(state["hyperparams"])
    name = network or hp.get("model_name") or hp.get("network")
    if half_precision:
        hp["dtype"] = jnp.bfloat16
    model = get_model(name, **hp)
    variables = state["variables"]

    from .fastpath import build_fast_apply

    fast = build_fast_apply(model, variables,
                            jnp.bfloat16 if half_precision else None)
    if fast is not None:
        apply_fn, packed = fast

        def forward(t):
            return apply_fn(packed, t)[0]
    else:
        def forward(t):
            return model.apply(variables, t, train=False)[0]

    return model, forward


def _pooling_stride(model) -> int:
    """2^levels, derived from the resolved model (16 for the 4-level 2D
    trunks, 8 for BabyUnet and the 3-level volumetric trunks)."""
    from ..models.legacy import BabyUnet
    from ..models.unet3d import MultiOutputUnet3D, UNet3D

    levels = getattr(model, "levels", None)
    if levels is None:
        levels = 3 if isinstance(model, (BabyUnet, UNet3D, MultiOutputUnet3D)) else 4
    return 2 ** levels


def _check_divisible(extent: int, n_spatial: int, stride: int, halo: int,
                     what: str) -> None:
    if extent % (n_spatial * stride) != 0:
        raise ValueError(
            f"{what} {extent} must be divisible by mesh_spatial×{stride} "
            f"({n_spatial * stride})"
        )
    if halo % stride != 0:
        raise ValueError(f"halo {halo} must be a multiple of {stride}")


def predict_frames_spatial_sharded(
    imgs,
    model_params,
    mesh,
    halo: int = 128,
    network=None,
    normalization_mode: str = "single",
    clip_threshold=(0.0, 99.8),
    invert: bool = False,
    half_precision: bool = False,
):
    """Predict (N, H, W) frames with the model's forward sharded over the
    mesh's ``spatial`` axis.  Returns uint8 probability·255 masks (N, H, W).
    """
    imgs = np.asarray(imgs)
    squeeze = imgs.ndim == 2
    if squeeze:
        imgs = imgs[None]

    model, forward = _resolve_forward(model_params, network, half_precision)
    n_spatial = mesh.shape["spatial"]
    stride = _pooling_stride(model)
    _check_divisible(imgs.shape[1], n_spatial, stride, halo, "frame height")

    norm = _normalize_stack(imgs, normalization_mode,
                            clip_threshold, invert).astype(np.uint8)
    x = jnp.asarray(norm[..., None].astype(np.float32) / 255.0)

    probs = spatial_shard_apply(forward, x, mesh, halo=halo)
    out = (probs.astype(jnp.float32) * 255.0).astype(jnp.uint8)
    result = np.asarray(out)[..., 0]
    return result[0] if squeeze else result


def predict_volume_spatial_sharded(
    vol,
    model_params,
    mesh,
    halo: int = 64,
    network=None,
    clip_threshold=(0.0, 99.8),
    invert: bool = False,
    half_precision: bool = False,
):
    """Predict one (Z, H, W) volume with the 3D U-Net's forward sharded over
    the mesh's ``spatial`` axis along H — context parallelism for volumes
    that exceed one chip's HBM.  Whole-volume normalization (the 3D family's
    only mode, reference unet3d/predict.py:109-117).  Returns uint8
    probability·255 masks (Z, H, W).

    Requirements: H divisible by (mesh spatial × 8) (the 3-level trunk's
    pooling stride) and ``halo`` a multiple of 8 and ≥ the receptive-field
    half-width."""
    vol = np.asarray(vol)
    model, forward = _resolve_forward(model_params, network, half_precision)
    n_spatial = mesh.shape["spatial"]
    stride = _pooling_stride(model)
    _check_divisible(vol.shape[1], n_spatial, stride, halo, "volume height")

    # uint8 quantization matches Predict3D's patch buffer (predictor.py) so
    # interior voxels are bit-identical between the tiled and sharded paths
    norm = _normalize_stack(vol[None], "all", clip_threshold,
                            invert)[0].astype(np.uint8)
    x = jnp.asarray(norm[None, ..., None].astype(np.float32) / 255.0)

    # (1, Z, H, W, 1): H is axis 2
    probs = spatial_shard_apply(forward, x, mesh, halo=halo, spatial_axis=2)
    out = (probs.astype(jnp.float32) * 255.0).astype(jnp.uint8)
    return np.asarray(out)[0, ..., 0]
