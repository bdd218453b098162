"""Device-side (jit) batched augmentation for the training hot path.

The reference augments offline only, multiplying the dataset on disk
(unet/data.py:217-245, aug_factor copies per tile).  On TPU it is cheaper to
keep one copy of the tiles and draw fresh augmentations *on device every
epoch* — these ops are elementwise/gather work that XLA fuses into the train
step, so they are effectively free against the conv FLOPs.  Enabled with
``Trainer(device_augment=True)``.

Per-sample spatial ops (shared image↔mask): rot90 k∈{0..3}, H/V flips.
Per-sample intensity ops (image only): brightness/contrast
(≙ RandomBrightnessContrast), elementwise multiplicative noise
(≙ MultiplicativeNoise), additive Gaussian noise (≙ GaussNoise).

All functions take explicit PRNG keys and are shape-polymorphic over batch;
rot90 requires square tiles (the pipelines' dim_out is square by default).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _rot90_single(x, k, axes=(0, 1)):
    """rot90 by a traced k∈{0,1,2,3} in the ``axes`` plane (square extent)."""
    return jax.lax.switch(
        k,
        [
            lambda t: t,
            lambda t: jnp.rot90(t, 1, axes=axes),
            lambda t: jnp.rot90(t, 2, axes=axes),
            lambda t: jnp.rot90(t, 3, axes=axes),
        ],
        x,
    )


def _spatial_tx(x, k, fh, fv, axes):
    """One sample's rot90-by-k + optional H/V flips in the ``axes`` plane —
    the single definition every batched spatial augmentation maps over."""
    x = _rot90_single(x, k, axes=axes)
    x = jnp.where(fh, jnp.flip(x, axis=axes[1]), x)
    x = jnp.where(fv, jnp.flip(x, axis=axes[0]), x)
    return x


def _draw_spatial(key, b):
    """Per-sample (k, flip_h, flip_v) draws shared by image and targets."""
    k_rot, k_h, k_v = jax.random.split(key, 3)
    return (jax.random.randint(k_rot, (b,), 0, 4),
            jax.random.bernoulli(k_h, 0.5, (b,)),
            jax.random.bernoulli(k_v, 0.5, (b,)))


def random_rot90_flip(key, *arrays, spatial_axes=(0, 1)):
    """Apply the same per-sample random rot90 + flips (in the per-sample
    ``spatial_axes`` plane) to every array in ``arrays``.  2D tiles use the
    default (0, 1); 3D (Z, X, Y, C) volumes pass (1, 2) so rotation stays in
    the image plane.  Square spatial extent required."""
    ks, flip_h, flip_v = _draw_spatial(key, arrays[0].shape[0])

    def tx(x, k, fh, fv):
        return _spatial_tx(x, k, fh, fv, spatial_axes)

    return tuple(jax.vmap(tx)(a, ks, flip_h, flip_v) for a in arrays)


def random_brightness_contrast(key, image, brightness: float = 0.25,
                               contrast: float = 0.25, p: float = 0.5,
                               max_value: float = 1.0):
    """Per-sample out = img·(1+c) + b·max_value with probability p
    (≙ albumentations RandomBrightnessContrast, unet/data.py:221-222)."""
    b = image.shape[0]
    k_apply, k_a, k_b = jax.random.split(key, 3)
    apply = jax.random.bernoulli(k_apply, p, (b,))
    alpha = 1.0 + jax.random.uniform(k_a, (b,), minval=-contrast, maxval=contrast)
    beta = jax.random.uniform(k_b, (b,), minval=-brightness, maxval=brightness)
    shape = (b,) + (1,) * (image.ndim - 1)
    out = image * alpha.reshape(shape) + (beta * max_value).reshape(shape)
    return jnp.where(apply.reshape(shape), jnp.clip(out, 0.0, max_value), image)


def random_multiplicative_noise(key, image, multiplier: Tuple[float, float] = (0.5, 1.2),
                                p: float = 0.3, max_value: float = 1.0,
                                apply_key=None):
    """Per-pixel uniform multiplier (≙ MultiplicativeNoise(elementwise=True),
    unet/data.py:224).  ``apply_key`` overrides the Bernoulli gate's key so
    two calls (e.g. a siamese frame pair) can share the per-sample apply
    decision while drawing independent noise fields."""
    b = image.shape[0]
    k_apply, k_m = jax.random.split(key)
    if apply_key is not None:
        k_apply = apply_key
    apply = jax.random.bernoulli(k_apply, p, (b,) + (1,) * (image.ndim - 1))
    m = jax.random.uniform(k_m, image.shape, minval=multiplier[0], maxval=multiplier[1])
    return jnp.where(apply, jnp.clip(image * m, 0.0, max_value), image)


def random_gauss_noise(key, image, sigma: float = 0.04, p: float = 0.3,
                       max_value: float = 1.0, apply_key=None):
    """Additive Gaussian noise (≙ GaussNoise, siam_unet/data.py:239;
    sigma in units of max_value).  ``apply_key`` — see
    :func:`random_multiplicative_noise`."""
    b = image.shape[0]
    k_apply, k_n = jax.random.split(key)
    if apply_key is not None:
        k_apply = apply_key
    apply = jax.random.bernoulli(k_apply, p, (b,) + (1,) * (image.ndim - 1))
    noise = sigma * max_value * jax.random.normal(k_n, image.shape)
    return jnp.where(apply, jnp.clip(image + noise, 0.0, max_value), image)


def _intensity(img, k_bc, k_mult, k_gauss, brightness_contrast, noise_mult,
               gauss_sigma, apply_keys=(None, None)):
    """The shared image-only intensity stage (brightness/contrast,
    multiplicative noise, Gaussian noise — each gated on its own
    probability).  ``apply_keys`` optionally pins the two noise ops'
    apply-gate keys (siamese pairs share gates, draw independent fields)."""
    out = random_brightness_contrast(k_bc, img, *brightness_contrast)
    if noise_mult is not None:
        out = random_multiplicative_noise(k_mult, out, noise_mult,
                                          apply_key=apply_keys[0])
    if gauss_sigma is not None:
        out = random_gauss_noise(k_gauss, out, gauss_sigma,
                                 apply_key=apply_keys[1])
    return out


def augment_batch(key, image, mask, prev_image=None,
                  brightness_contrast: Tuple[float, float] = (0.25, 0.25),
                  noise_mult: Optional[Tuple[float, float]] = (0.5, 1.2),
                  gauss_sigma: Optional[float] = None,
                  p_pipeline: float = 0.8):
    """One full augmentation draw (≙ the reference's offline Compose,
    unet/data.py:217-226, re-expressed on device): per-sample rot90+flips on
    all spatial targets, then intensity ops on the image(s) only.  The whole
    pipeline applies with probability ``p_pipeline`` per sample.  3D volumes
    ((B, Z, X, Y, C)) rotate in the (X, Y) plane."""
    (k_gate, k_spatial, k_bc, k_mult, k_gauss,
     k_mult2, k_gauss2, k_am, k_ag) = jax.random.split(key, 9)
    b = image.shape[0]
    gate = jax.random.bernoulli(k_gate, p_pipeline, (b,) + (1,) * (image.ndim - 1))

    spatial_axes = (1, 2) if image.ndim == 5 else (0, 1)
    targets = (image, mask) if prev_image is None else (image, mask, prev_image)
    spatial = random_rot90_flip(k_spatial, *targets, spatial_axes=spatial_axes)

    aug_image = _intensity(spatial[0], k_bc, k_mult, k_gauss,
                           brightness_contrast, noise_mult, gauss_sigma,
                           apply_keys=(k_am, k_ag))
    aug_mask = spatial[1]
    out_image = jnp.where(gate, aug_image, image)
    out_mask = jnp.where(gate, aug_mask, mask)
    if prev_image is None:
        return out_image, out_mask
    # siamese pair semantics ≙ the offline pipeline, which stacks
    # (image, prev) as channels of ONE albumentations image
    # (pipelines.py:488, siam_unet/data.py:254-258): brightness/contrast is
    # one scalar draw for the pair (same k_bc), the noise apply-gates are
    # shared (k_am/k_ag — the op hits both frames or neither), and the
    # per-pixel noise FIELDS are independent per frame (fresh k_mult2/
    # k_gauss2).  The round-4 review found the previous wiring inverted:
    # identical noise fields, independent brightness.
    aug_prev = _intensity(spatial[2], k_bc, k_mult2, k_gauss2,
                          brightness_contrast, noise_mult, gauss_sigma,
                          apply_keys=(k_am, k_ag))
    return out_image, out_mask, jnp.where(gate, aug_prev, prev_image)


# cos/sin of k·90° for k∈{0..3} — used to rotate orientation vector fields
_COS_K = (1.0, 0.0, -1.0, 0.0)
_SIN_K = (0.0, 1.0, 0.0, -1.0)


def _orientation_components(t, k, flip_h, flip_v):
    """Re-express (H, W, 2) cos/sin orientation channels in the transformed
    frame.  rot90 by k shifts the angle by −k·π/2 (≙ the offline pipeline's
    ``(θ − π/2·factor) mod 2π`` rule, reference multi_output_unet/
    data.py:270-282); a horizontal flip maps θ→π−θ, a vertical flip θ→−θ."""
    c, s = t[..., 0], t[..., 1]
    ck = jnp.asarray(_COS_K)[k]
    sk = jnp.asarray(_SIN_K)[k]
    c, s = c * ck + s * sk, s * ck - c * sk
    c = jnp.where(flip_h, -c, c)
    s = jnp.where(flip_v, -s, s)
    return jnp.stack([c, s], axis=-1)


def augment_batch_heads(key, image, targets, orientation_keys=(),
                        brightness_contrast: Tuple[float, float] = (0.25, 0.25),
                        noise_mult: Optional[Tuple[float, float]] = (0.5, 1.2),
                        gauss_sigma: Optional[float] = None,
                        p_pipeline: float = 0.8):
    """Device augmentation for multi-output batches: one per-sample random
    rot90 + flips applied to the image and EVERY head target; heads listed in
    ``orientation_keys`` additionally get their cos/sin channels rotated into
    the new frame (the device counterpart of the offline orientation
    angle-shift, multi_output_unet/data.py:270-282).  Intensity ops touch the
    image only.  3D volumes ((B, Z, X, Y, C)) rotate in the (X, Y) plane."""
    k_gate, k_spatial, k_bc, k_mult, k_gauss = jax.random.split(key, 5)
    b = image.shape[0]
    gate = jax.random.bernoulli(k_gate, p_pipeline, (b,))
    ks, flip_h, flip_v = _draw_spatial(k_spatial, b)
    axes = (1, 2) if image.ndim == 5 else (0, 1)

    def tx(img, tgts, k, fh, fv, g):
        img_a = _spatial_tx(img, k, fh, fv, axes)
        out = {}
        for name, t in tgts.items():
            ta = _spatial_tx(t, k, fh, fv, axes)
            if name in orientation_keys:
                ta = _orientation_components(ta, k, fh, fv)
            out[name] = jnp.where(g, ta, t)
        return jnp.where(g, img_a, img), out

    aug_image, out_targets = jax.vmap(tx)(image, dict(targets), ks, flip_h,
                                          flip_v, gate)

    shape = (b,) + (1,) * (image.ndim - 1)
    out = _intensity(aug_image, k_bc, k_mult, k_gauss, brightness_contrast,
                     noise_mult, gauss_sigma)
    out_image = jnp.where(gate.reshape(shape), out, aug_image)
    return out_image, out_targets
