"""Image augmentation — native reimplementation of the albumentations ops
the reference depends on.

albumentations is not a dependency of this framework; the exact op set the
reference composes is reimplemented here on numpy/cv2/scipy with matching
*distributions* (exact RNG-stream equality with albumentations is neither
possible nor required — SURVEY.md §7.4):

- unet/data.py:217-226     → RandomRotate90, ShiftScaleRotate,
                             RandomBrightnessContrast, Blur, MultiplicativeNoise
- siam_unet/data.py:235-243 → + GaussNoise
- multi_output_unet/data.py:187-201 → RandomScale, PadIfNeeded(border_wrap,
                             bottom_left), RandomCrop, ShotNoise, GaussNoise
- multi_output_unet3d/data.py:152-178 → ShiftScaleRotate(3D), RandomCrop3D
- multi_output_unet/data.py:213-248 → NaN-aware arbitrary-angle ``rotate_array``
                             (grid-wrap) and ``rotate_array_90``

Conventions (albumentations-compatible):
- a sample is a dict of named targets; ``image`` receives both spatial and
  intensity ops, every other target ("mask" semantics) only spatial ops with
  nearest/flagged interpolation;
- intensity amplitudes scale with the value range: 255 for uint8 inputs,
  1.0 for float inputs;
- each transform fires with probability ``p``; ``Compose(p=...)`` gates the
  whole pipeline.

Everything here is host-side (numpy) — it runs once during offline dataset
preparation, exactly like the reference.  The train-time device-side
augmentation lives in :mod:`.augment_jax`.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage


def _max_value(img: np.ndarray) -> float:
    return 255.0 if img.dtype == np.uint8 else 1.0


def _clip_like(img: np.ndarray, out: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint8:
        return np.clip(out, 0, 255).astype(np.uint8)
    # albumentations float semantics: float images live in [0, 1] and every
    # intensity op clips there — without this, noise ops write negative /
    # >1 pixels the reference-trained models never see
    return np.clip(out, 0.0, 1.0).astype(img.dtype, copy=False)


class Transform:
    """Base transform: ``sample`` draws shared params once per call,
    ``apply``/``apply_mask`` use them on each target."""

    def __init__(self, p: float = 0.5):
        self.p = p

    def sample(self, rng: np.random.Generator, shape) -> dict:
        return {}

    def apply(self, img: np.ndarray, params: dict) -> np.ndarray:
        return img

    def apply_mask(self, mask: np.ndarray, params: dict) -> np.ndarray:
        return self.apply(mask, params)


class Compose:
    """Apply transforms in order; the whole pipeline fires with prob ``p``.
    Spatial params are shared across all targets (albumentations semantics).

    ``targets`` maps extra target names to 'image' (gets intensity ops too)
    or 'mask' (spatial only) — ≙ albumentations ``additional_targets``.
    """

    def __init__(self, transforms: Sequence[Transform], p: float = 1.0,
                 targets: Optional[Dict[str, str]] = None):
        self.transforms = list(transforms)
        self.p = p
        self.targets = dict(targets or {})

    def __call__(self, rng: Optional[np.random.Generator] = None, **data):
        rng = rng or np.random.default_rng()
        if rng.random() >= self.p:
            return dict(data)
        out = dict(data)
        for t in self.transforms:
            if rng.random() >= t.p:
                continue
            # sample from the shape *at this point* in the pipeline (crops
            # after pads/scales must see the updated extent)
            ref_shape = out["image"].shape if "image" in out else next(iter(out.values())).shape
            params = t.sample(rng, ref_shape)
            for name, arr in out.items():
                kind = "image" if name == "image" else self.targets.get(name, "mask")
                if kind == "image":
                    out[name] = t.apply(arr, params)
                else:
                    out[name] = t.apply_mask(arr, params)
        return out


# --- spatial -----------------------------------------------------------------


class RandomRotate90(Transform):
    """≙ albumentations RandomRotate90: k ∈ {0,1,2,3} quarter-turns."""

    def sample(self, rng, shape):
        return {"k": int(rng.integers(0, 4))}

    def apply(self, img, params):
        return np.ascontiguousarray(np.rot90(img, params["k"]))


class HorizontalFlip(Transform):
    def apply(self, img, params):
        return np.ascontiguousarray(img[:, ::-1])


class VerticalFlip(Transform):
    def apply(self, img, params):
        return np.ascontiguousarray(img[::-1])


class ShiftScaleRotate(Transform):
    """≙ albumentations ShiftScaleRotate(shift_limit, scale_limit,
    rotate_limit): affine with shift ∈ ±shift_limit·(W,H), scale ∈
    1±scale_limit, angle ∈ ±rotate_limit (deg); reflect-101 border,
    linear interpolation for images / nearest for masks."""

    def __init__(self, shift_limit=0.0625, scale_limit=0.1, rotate_limit=45, p=0.5):
        super().__init__(p)
        self.shift_limit = self._pair(shift_limit)
        self.scale_limit = self._pair(scale_limit)
        self.rotate_limit = self._pair(rotate_limit)

    @staticmethod
    def _pair(v):
        return tuple(v) if isinstance(v, (tuple, list)) else (-v, v)

    def sample(self, rng, shape):
        return {
            "dx": rng.uniform(*self.shift_limit),
            "dy": rng.uniform(*self.shift_limit),
            "scale": 1.0 + rng.uniform(*self.scale_limit),
            "angle": rng.uniform(*self.rotate_limit),
        }

    def _warp(self, img, params, nearest: bool):
        import cv2

        h, w = img.shape[:2]
        m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), params["angle"], params["scale"])
        m[0, 2] += params["dx"] * w
        m[1, 2] += params["dy"] * h
        flags = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        squeeze = img.ndim == 3 and img.shape[-1] == 1
        src = img[..., 0] if squeeze else img
        if src.ndim == 3 and src.shape[-1] > 4:  # cv2 supports ≤4 channels per warp
            out = np.stack(
                [cv2.warpAffine(src[..., c], m, (w, h), flags=flags,
                                borderMode=cv2.BORDER_REFLECT_101)
                 for c in range(src.shape[-1])], axis=-1)
        else:
            out = cv2.warpAffine(src, m, (w, h), flags=flags,
                                 borderMode=cv2.BORDER_REFLECT_101)
        if squeeze:
            out = out[..., None]
        elif img.ndim == 3 and out.ndim == 2:
            out = out[..., None]
        return out

    def apply(self, img, params):
        return self._warp(img, params, nearest=False)

    def apply_mask(self, mask, params):
        return self._warp(mask, params, nearest=True)


class RandomScale(Transform):
    """≙ albumentations RandomScale(scale_limit, nearest): resize by
    1 + U(lo, hi) (multi_output_unet/data.py:190-192 uses INTER_NEAREST
    for both image and mask)."""

    def __init__(self, scale_limit=(0.0, 0.0), p=0.5):
        super().__init__(p)
        self.scale_limit = (
            tuple(scale_limit) if isinstance(scale_limit, (tuple, list))
            else (-scale_limit, scale_limit)
        )

    def sample(self, rng, shape):
        return {"factor": 1.0 + rng.uniform(*self.scale_limit)}

    def apply(self, img, params):
        f = params["factor"]
        if f == 1.0:
            return img
        h, w = img.shape[:2]
        nh, nw = max(int(round(h * f)), 1), max(int(round(w * f)), 1)
        yi = np.minimum((np.arange(nh) / f).astype(np.int64), h - 1)
        xi = np.minimum((np.arange(nw) / f).astype(np.int64), w - 1)
        return np.ascontiguousarray(img[yi][:, xi])


class PadIfNeeded(Transform):
    """≙ albumentations PadIfNeeded(border_mode=BORDER_WRAP,
    position='bottom_left') (multi_output_unet/data.py:194-195): original
    content sits at the bottom-left; wrap padding fills top and right."""

    def __init__(self, min_height: int, min_width: int, p: float = 1.0):
        super().__init__(p)
        self.min_height, self.min_width = min_height, min_width

    def apply(self, img, params):
        h, w = img.shape[:2]
        pad_h = max(0, self.min_height - h)
        pad_w = max(0, self.min_width - w)
        if pad_h == 0 and pad_w == 0:
            return img
        widths = [(pad_h, 0), (0, pad_w)] + [(0, 0)] * (img.ndim - 2)
        return np.pad(img, widths, mode="wrap")


class RandomCrop(Transform):
    """≙ albumentations RandomCrop(height, width)."""

    def __init__(self, height: int, width: int, p: float = 1.0):
        super().__init__(p)
        self.height, self.width = height, width

    def sample(self, rng, shape):
        h, w = shape[:2]
        return {
            "y": int(rng.integers(0, max(h - self.height, 0) + 1)),
            "x": int(rng.integers(0, max(w - self.width, 0) + 1)),
        }

    def apply(self, img, params):
        y, x = params["y"], params["x"]
        return np.ascontiguousarray(img[y : y + self.height, x : x + self.width])


class RandomCrop3D(Transform):
    """≙ albumentations RandomCrop3D(size=(Z,X,Y))
    (multi_output_unet3d/data.py:160)."""

    def __init__(self, size: Tuple[int, int, int], p: float = 1.0):
        super().__init__(p)
        self.size = tuple(size)

    def sample(self, rng, shape):
        starts = [int(rng.integers(0, max(shape[i] - self.size[i], 0) + 1)) for i in range(3)]
        return {"starts": starts}

    def apply(self, img, params):
        z, x, y = params["starts"]
        dz, dx, dy = self.size
        return np.ascontiguousarray(img[z : z + dz, x : x + dx, y : y + dy])


class ShiftScaleRotate3D(Transform):
    """Slice-wise affine over the last two axes of a (Z, X, Y) volume:
    the 3D spatial step of the multi_output 3D pipeline
    (multi_output_unet3d/data.py:159 — shift 0, scale/rotate limits).
    Rotation is about the Z axis, applied identically to every z-slice."""

    def __init__(self, shift_limit=0.0, scale_limit=(-0.75, 0.0),
                 rotate_limit=(0.0, 360.0), p=0.8):
        super().__init__(p)
        self._ssr = ShiftScaleRotate(shift_limit, scale_limit, rotate_limit, p=1.0)

    def sample(self, rng, shape):
        return self._ssr.sample(rng, shape[1:])

    def _vol(self, vol, params, nearest):
        fn = self._ssr.apply_mask if nearest else self._ssr.apply
        return np.stack([fn(sl, params) for sl in vol])

    def apply(self, vol, params):
        return self._vol(vol, params, nearest=False)

    def apply_mask(self, vol, params):
        return self._vol(vol, params, nearest=True)


# --- intensity (image-only) ---------------------------------------------------


class RandomBrightnessContrast(Transform):
    """≙ albumentations RandomBrightnessContrast(brightness_by_max=True):
    out = img·(1+c) + b·max_value."""

    def __init__(self, brightness_limit=0.2, contrast_limit=0.2, p=0.5):
        super().__init__(p)
        self.brightness_limit = brightness_limit
        self.contrast_limit = contrast_limit

    def sample(self, rng, shape):
        return {
            "alpha": 1.0 + rng.uniform(-self.contrast_limit, self.contrast_limit),
            "beta": rng.uniform(-self.brightness_limit, self.brightness_limit),
        }

    def apply(self, img, params):
        out = img.astype(np.float32) * params["alpha"] + params["beta"] * _max_value(img)
        return _clip_like(img, out)

    def apply_mask(self, mask, params):
        return mask


class Blur(Transform):
    """≙ albumentations Blur(blur_limit): box blur with random odd kernel
    size in [lo, hi]."""

    def __init__(self, blur_limit=(3, 7), p=0.5, volumetric: bool = False):
        super().__init__(p)
        self.blur_limit = (
            tuple(blur_limit) if isinstance(blur_limit, (tuple, list)) else (3, blur_limit)
        )
        # volumetric inputs are channel-less (Z, X, Y): blur in-plane per
        # z-slice (size (1, k, k)) like the reference's slice-wise 2D Blur
        # (multi_output_unet3d/data.py:166-178) — a (k, k, 1) filter there
        # would bleed depth information between slices
        self.volumetric = volumetric

    def sample(self, rng, shape):
        lo, hi = self.blur_limit
        ks = int(rng.integers(lo // 2, hi // 2 + 1)) * 2 + 1  # odd in [lo, hi]
        return {"ksize": ks}

    def apply(self, img, params):
        k = params["ksize"]
        if self.volumetric:
            size = (1,) * (img.ndim - 2) + (k, k)
        else:
            size = (k, k) + (1,) * (img.ndim - 2)
        out = ndimage.uniform_filter(
            img.astype(np.float32), size=size, mode="nearest"
        )
        return _clip_like(img, out)

    def apply_mask(self, mask, params):
        return mask


class MultiplicativeNoise(Transform):
    """≙ albumentations MultiplicativeNoise(multiplier, elementwise=True)
    (unet/data.py:224): per-pixel uniform multiplier."""

    def __init__(self, multiplier=(0.9, 1.1), elementwise=True, p=0.5):
        super().__init__(p)
        self.multiplier = tuple(multiplier)
        self.elementwise = elementwise

    def sample(self, rng, shape):
        return {"rng": rng}

    def apply(self, img, params):
        rng = params["rng"]
        m = (
            rng.uniform(*self.multiplier, size=img.shape)
            if self.elementwise
            else rng.uniform(*self.multiplier)
        )
        return _clip_like(img, img.astype(np.float32) * m)

    def apply_mask(self, mask, params):
        return mask


class GaussNoise(Transform):
    """Additive Gaussian noise.  ``var_limit`` is the legacy absolute-variance
    API (siam_unet/data.py:239: var_limit=(amp, amp) on uint8);
    ``std_range`` is the modern fraction-of-max API
    (multi_output_unet/data.py:198: std_range on [0,1] floats)."""

    def __init__(self, var_limit=None, std_range=None, p=0.5):
        super().__init__(p)
        if (var_limit is None) == (std_range is None):
            raise ValueError("pass exactly one of var_limit / std_range")
        self.var_limit = var_limit
        self.std_range = std_range

    def sample(self, rng, shape):
        if self.var_limit is not None:
            lo, hi = self.var_limit if isinstance(self.var_limit, (tuple, list)) else (0, self.var_limit)
            sigma = float(np.sqrt(rng.uniform(lo, hi)))
            relative = False
        else:
            sigma = float(rng.uniform(*self.std_range))
            relative = True
        return {"sigma": sigma, "relative": relative, "rng": rng}

    def apply(self, img, params):
        sigma = params["sigma"] * (_max_value(img) if params["relative"] else 1.0)
        noise = params["rng"].normal(0.0, sigma, size=img.shape)
        return _clip_like(img, img.astype(np.float32) + noise)

    def apply_mask(self, mask, params):
        return mask


class ShotNoise(Transform):
    """≙ albumentations ShotNoise(scale_range): Poisson (photon-count) noise,
    out = Poisson(img / scale)·scale on the [0, max] intensity scale
    (multi_output_unet/data.py:197)."""

    def __init__(self, scale_range=(0.1, 0.3), p=0.5):
        super().__init__(p)
        self.scale_range = tuple(scale_range)

    def sample(self, rng, shape):
        return {"scale": float(rng.uniform(*self.scale_range)), "rng": rng}

    def apply(self, img, params):
        mv = _max_value(img)
        scale = params["scale"] * mv
        lam = np.maximum(img.astype(np.float32), 0.0) / scale
        out = params["rng"].poisson(lam).astype(np.float32) * scale
        return _clip_like(img, out)

    def apply_mask(self, mask, params):
        return mask


# --- NaN-aware rotation helpers (multi_output_unet/data.py:213-248) -----------


def rotate_array(x: np.ndarray, angle: float, order: int = 1) -> np.ndarray:
    """Arbitrary-angle rotation with grid-wrap border, preserving NaN regions
    and the [0,1] range of probability masks (reference
    multi_output_unet/data.py:213-242, scipy.ndimage.rotate based).

    Documented divergence for CHW (3-D) targets: the reference calls
    ``scipy.ndimage.rotate`` with the default ``axes=(1, 0)``, which for a
    channels-first target rotates the (C, H) plane — mixing CHANNELS into
    rows.  Here a channels-first array rotates in its (H, W) image plane,
    which is what the reference's own docstring and its 2-D usage intend;
    multichannel rotated targets therefore differ from the reference."""
    if x.dtype == bool:
        x = x.astype(np.float32)
        xmin, xmax = 0.0, 1.0
        needs_clip = True
    elif np.nanmin(x) >= 0 and np.nanmax(x) <= 1:
        xmin, xmax = float(np.nanmin(x)), float(np.nanmax(x))
        needs_clip = True
    else:
        xmin = xmax = None
        needs_clip = False

    axes = (1, 2) if x.ndim == 3 and x.shape[0] < x.shape[1] else (0, 1)
    if np.any(np.isnan(x)):
        nan_mask = np.isnan(x)
        filled = np.where(nan_mask, 0, x)
        rotated = ndimage.rotate(filled, angle, axes=axes[::-1], reshape=False,
                                 mode="grid-wrap", order=order).astype(np.float32)
        rotated_mask = ndimage.rotate(nan_mask.astype(np.uint8), angle, axes=axes[::-1],
                                      reshape=False, mode="grid-wrap", order=order) > 0.5
        rotated[rotated_mask] = np.nan
    else:
        rotated = ndimage.rotate(x, angle, axes=axes[::-1], reshape=False,
                                 mode="grid-wrap", order=order).astype(np.float32)
    if needs_clip:
        rotated = np.clip(rotated, xmin, xmax)
    return rotated


def rotate_array_90(x: np.ndarray, factor: int) -> np.ndarray:
    """rot90 that handles CHW layout (reference
    multi_output_unet/data.py:244-248)."""
    if x.ndim == 3 and x.shape[0] < x.shape[1]:
        return np.ascontiguousarray(np.rot90(x, factor, axes=(1, 2)))
    return np.ascontiguousarray(np.rot90(x, factor))
