"""Augmentation tests: host Compose op semantics vs numpy oracles, and the
device-side (jit) batch augmentation (augment_jax)."""

import jax
import jax.numpy as jnp
import numpy as np

from bio_image_unet_tpu.data.augment import (
    Blur,
    Compose,
    GaussNoise,
    MultiplicativeNoise,
    PadIfNeeded,
    RandomBrightnessContrast,
    RandomCrop,
    RandomRotate90,
    ShiftScaleRotate,
    rotate_array,
    rotate_array_90,
)
from bio_image_unet_tpu.data.augment_jax import (
    augment_batch,
    random_brightness_contrast,
    random_gauss_noise,
    random_multiplicative_noise,
    random_rot90_flip,
)


# --- host ops -----------------------------------------------------------------


def test_rotate90_shares_params_across_targets(rng):
    img = rng.integers(0, 255, (16, 16), dtype=np.uint8)
    mask = rng.integers(0, 255, (16, 16), dtype=np.uint8)
    pipe = Compose([RandomRotate90(p=1.0)], p=1.0)
    out = pipe(np.random.default_rng(3), image=img, mask=mask)
    # find the k that was applied to the image; mask must share it
    for k in range(4):
        if np.array_equal(out["image"], np.rot90(img, k)):
            np.testing.assert_array_equal(out["mask"], np.rot90(mask, k))
            break
    else:
        raise AssertionError("output is not any rot90 of the input")


def test_intensity_ops_skip_masks(rng):
    img = rng.integers(10, 200, (16, 16), dtype=np.uint8)
    mask = rng.integers(0, 2, (16, 16)).astype(np.uint8) * 255
    pipe = Compose([
        RandomBrightnessContrast(0.3, 0.3, p=1.0),
        MultiplicativeNoise((0.5, 1.5), p=1.0),
        GaussNoise(var_limit=(100, 100), p=1.0),
        Blur((3, 3), p=1.0),
    ], p=1.0)
    out = pipe(np.random.default_rng(0), image=img, mask=mask)
    np.testing.assert_array_equal(out["mask"], mask)
    assert not np.array_equal(out["image"], img)
    assert out["image"].dtype == np.uint8


def test_pad_wrap_and_crop(rng):
    img = rng.integers(0, 255, (20, 30), dtype=np.uint8)
    pipe = Compose([PadIfNeeded(32, 32), RandomCrop(32, 32, p=1.0)], p=1.0)
    out = pipe(np.random.default_rng(0), image=img)
    assert out["image"].shape == (32, 32)
    # bottom-left position: original content at bottom-left of the pad
    padded = PadIfNeeded(32, 32).apply(img, {})
    np.testing.assert_array_equal(padded[-20:, :30], img)
    np.testing.assert_array_equal(padded[:12, :30], img[-12:])  # wrap rows


def test_shift_scale_rotate_identity():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    t = ShiftScaleRotate(0, 0, 0, p=1.0)
    out = t.apply(img, {"dx": 0.0, "dy": 0.0, "scale": 1.0, "angle": 0.0})
    np.testing.assert_array_equal(out, img)


def test_rotate_array_nan_preserved():
    x = np.ones((16, 16), dtype=np.float32) * 0.5
    x[:4] = np.nan
    out = rotate_array(x, 90.0, order=1)
    assert np.isnan(out).any()
    finite = out[np.isfinite(out)]
    assert finite.min() >= 0.0 and finite.max() <= 1.0


def test_rotate_array_90_chw():
    x = np.arange(2 * 4 * 4, dtype=np.float32).reshape(2, 4, 4)  # CHW
    out = rotate_array_90(x, 1)
    np.testing.assert_array_equal(out[0], np.rot90(x[0]))


# --- device ops ----------------------------------------------------------------


def test_device_rot90_flip_shared(rng):
    img = jnp.asarray(rng.random((4, 8, 8, 1)).astype(np.float32))
    mask = jnp.asarray(rng.random((4, 8, 8, 1)).astype(np.float32))
    out_img, out_mask = jax.jit(random_rot90_flip)(jax.random.PRNGKey(0), img, mask)
    # every sample's mask transform matches its image transform: check by
    # transforming a known linear relation
    rel_in = np.asarray(img) - np.asarray(mask)
    rel_out = np.asarray(out_img) - np.asarray(out_mask)
    # the same spatial permutation applied to both → per-sample sorted values equal
    for b in range(4):
        np.testing.assert_allclose(np.sort(rel_out[b].ravel()),
                                   np.sort(rel_in[b].ravel()), rtol=1e-6)


def test_device_intensity_ranges(rng):
    img = jnp.asarray(rng.random((4, 8, 8, 1)).astype(np.float32))
    out = random_brightness_contrast(jax.random.PRNGKey(1), img, 0.3, 0.3, p=1.0)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    out = random_multiplicative_noise(jax.random.PRNGKey(2), img, (0.5, 1.5), p=1.0)
    assert out.shape == img.shape
    out = random_gauss_noise(jax.random.PRNGKey(3), img, 0.1, p=1.0)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_augment_batch_jit_and_siam(rng):
    img = jnp.asarray(rng.random((4, 8, 8, 1)).astype(np.float32))
    mask = (jnp.asarray(rng.random((4, 8, 8, 1))) > 0.5).astype(jnp.float32)
    prev = jnp.asarray(rng.random((4, 8, 8, 1)).astype(np.float32))
    f = jax.jit(augment_batch)
    out_img, out_mask = f(jax.random.PRNGKey(0), img, mask)
    assert out_img.shape == img.shape and out_mask.shape == mask.shape
    # masks stay binary (no intensity ops applied to them)
    assert set(np.unique(np.asarray(out_mask))) <= {0.0, 1.0}
    o_i, o_m, o_p = jax.jit(augment_batch)(jax.random.PRNGKey(1), img, mask, prev)
    assert o_p.shape == prev.shape


def test_trainer_device_augment(tmp_path, rng):
    from bio_image_unet_tpu.data import DataProcess2D, tiff
    from bio_image_unet_tpu.train import Trainer

    import os

    for sub in ("image", "label"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    for i in range(2):
        tiff.imwrite(str(tmp_path / "image" / f"i{i}.tif"),
                     rng.integers(0, 255, (32, 32), dtype=np.uint8))
        tiff.imwrite(str(tmp_path / "label" / f"i{i}.tif"),
                     (rng.random((32, 32)) > 0.5).astype(np.uint8) * 255)
    data = DataProcess2D(
        (str(tmp_path / "image") + "/", str(tmp_path / "label") + "/"),
        dim_out=(32, 32), aug_factor=4, data_path=str(tmp_path / "data"), seed=0,
    )
    trainer = Trainer(data, num_epochs=1, network="Unet", batch_size=4,
                      n_filter=4, device_augment=True,
                      save_dir=str(tmp_path / "out"), seed=0)
    best = trainer.start()
    assert np.isfinite(best)


def test_augment_batch_3d(rng):
    vol = jnp.asarray(rng.random((2, 4, 8, 8, 1)).astype(np.float32))
    mask = (jnp.asarray(rng.random((2, 4, 8, 8, 1))) > 0.5).astype(jnp.float32)
    out_v, out_m = jax.jit(augment_batch)(jax.random.PRNGKey(0), vol, mask)
    assert out_v.shape == vol.shape and out_m.shape == mask.shape
    assert np.isfinite(np.asarray(out_v)).all()
    # spatial ops act in the (X, Y) plane only: the MASK (no intensity ops)
    # must be a per-(sample, z)-slice permutation of the input mask
    m_in, m_out = np.asarray(mask), np.asarray(out_m)
    for b in range(2):
        for z in range(4):
            np.testing.assert_array_equal(
                np.sort(m_out[b, z, ..., 0].ravel()),
                np.sort(m_in[b, z, ..., 0].ravel()),
            )


def test_blur_volumetric_slicewise(rng):
    """3D Blur must stay in-plane per z-slice (reference slice-wise 2D blur,
    multi_output_unet3d/data.py:166-178) — no depth bleed."""
    from bio_image_unet_tpu.data.augment import Blur

    vol = np.zeros((8, 16, 16), np.float32)
    vol[4, 8, 8] = 1.0
    b = Blur(blur_limit=(3, 3), p=1.0, volumetric=True)
    out = b.apply(vol, b.sample(np.random.default_rng(0), vol.shape))
    assert out[3, 8, 8] == 0.0 and out[5, 8, 8] == 0.0  # no z spread
    assert out[4, 8, 7] > 0.0 and out[4, 7, 8] > 0.0    # isotropic in-plane


def test_float_intensity_ops_clip_to_unit(rng):
    """albumentations float semantics: intensity outputs clip to [0, 1]."""
    from bio_image_unet_tpu.data.augment import GaussNoise, RandomBrightnessContrast

    img = np.full((32, 32), 0.05, np.float32)
    g = GaussNoise(std_range=(0.5, 0.5), p=1.0)
    out = g.apply(img, g.sample(np.random.default_rng(0), img.shape))
    assert out.min() >= 0.0 and out.max() <= 1.0
    bc = RandomBrightnessContrast(0.9, 0.9, p=1.0)
    out2 = bc.apply(img, bc.sample(np.random.default_rng(1), img.shape))
    assert out2.min() >= 0.0 and out2.max() <= 1.0


def test_augment_batch_siam_noise_semantics(rng):
    """Siamese pair intensity semantics ≙ the offline pipeline (which stacks
    image+prev as channels of ONE albumentations image): shared scalar
    brightness draw, shared noise apply-gates, INDEPENDENT per-pixel noise
    fields.  The round-4 review found the wiring inverted (identical noise
    fields, independent brightness)."""
    b = 64
    const = jnp.full((b, 8, 8, 1), 0.5, jnp.float32)
    mask = jnp.zeros((b, 8, 8, 1), jnp.float32)
    key = jax.random.PRNGKey(7)

    # brightness only: equal inputs must give EQUAL outputs (one scalar
    # draw + gate for the pair)
    img_b, _, prev_b = augment_batch(key, const, mask, const,
                                     noise_mult=None, gauss_sigma=None,
                                     p_pipeline=1.0)
    np.testing.assert_array_equal(np.asarray(img_b), np.asarray(prev_b))

    # multiplicative noise only (brightness off): gates shared, fields free
    img_n, _, prev_n = augment_batch(key, const, mask, const,
                                     brightness_contrast=(0.0, 0.0),
                                     noise_mult=(0.5, 1.2), gauss_sigma=None,
                                     p_pipeline=1.0)
    applied_i = np.any(np.asarray(img_n) != 0.5, axis=(1, 2, 3))
    applied_p = np.any(np.asarray(prev_n) != 0.5, axis=(1, 2, 3))
    np.testing.assert_array_equal(applied_i, applied_p)  # shared gate
    assert applied_i.any()  # p=0.3 over 64 samples: some applied
    both = applied_i & applied_p
    # independent fields: the noisy frames must NOT be bit-identical
    assert not np.array_equal(np.asarray(img_n)[both], np.asarray(prev_n)[both])
