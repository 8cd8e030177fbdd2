"""Device-side augmentation math tests (hsv round-trip, blur normalization,
mixup label algebra — ref behaviours: model/model.py:77-103,228-254)."""

import jax
import jax.numpy as jnp
import numpy as np

from tdeed_tpu.train import augment


def test_hsv_roundtrip(rng):
    x = rng.random((4, 5, 3)).astype(np.float32)
    h, s, v = augment._rgb_to_hsv(jnp.asarray(x))
    back = np.asarray(augment._hsv_to_rgb(h, s, v))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_hue_shift_full_cycle_identity(rng):
    x = rng.random((4, 5, 3)).astype(np.float32)
    out = np.asarray(augment.adjust_hue(jnp.asarray(x), 1.0))
    np.testing.assert_allclose(out, x, atol=1e-5)


def test_brightness_contrast_saturation_identity(rng):
    x = rng.random((2, 4, 5, 3)).astype(np.float32)
    for fn in (augment.adjust_brightness, augment.adjust_contrast,
               augment.adjust_saturation):
        np.testing.assert_allclose(
            np.asarray(fn(jnp.asarray(x), 1.0)), x, atol=1e-6
        )


def test_gaussian_blur_preserves_mean_of_constant(rng):
    x = jnp.full((2, 8, 8, 3), 0.5)
    out = np.asarray(augment.gaussian_blur5(x, jnp.asarray(1.0)))
    np.testing.assert_allclose(out, 0.5, atol=1e-6)  # kernel sums to 1


def test_center_and_random_crop(rng):
    x = jnp.asarray(rng.random((2, 3, 10, 12, 3)).astype(np.float32))
    c = augment.center_crop(x, 8)
    assert c.shape == (2, 3, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(x[:, :, 1:9, 2:10]))
    r = augment.random_crop_batch(x, 8, jax.random.PRNGKey(0))
    assert r.shape == (2, 3, 8, 8, 3)


def test_standardize_values():
    x = jnp.ones((1, 1, 2, 2, 3))
    out = np.asarray(augment.standardize(x))
    want = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0, 0], want, rtol=1e-5)


def test_mixup_soft_labels_sum_to_one(rng):
    b, t = 4, 6
    f1 = jnp.asarray(rng.random((b, t, 4, 4, 3)).astype(np.float32)) * 255
    f2 = jnp.asarray(rng.random((b, t, 4, 4, 3)).astype(np.float32)) * 255
    l1 = jnp.asarray(rng.integers(0, 3, (b, t)))
    l2 = jnp.asarray(rng.integers(0, 3, (b, t)))
    d1 = jnp.asarray(rng.random((b, t)).astype(np.float32))
    d2 = jnp.asarray(rng.random((b, t)).astype(np.float32))
    mixed, soft, mixed_d = augment.mixup_batch(
        f1, l1, f2, l2, jax.random.PRNGKey(0), 3, d1, d2
    )
    np.testing.assert_allclose(np.asarray(soft).sum(-1), 1.0, rtol=1e-5)
    # mixed frames are a convex combination: within [min, max] of inputs,
    # up to the documented single bf16 rounding (1/2 LSB at the 0..255
    # scale — the same rounding the kernel's bf16 staging applied before)
    lo = np.minimum(np.asarray(f1), np.asarray(f2))
    hi = np.maximum(np.asarray(f1), np.asarray(f2))
    m = np.asarray(mixed, np.float32)
    assert np.all(m >= lo - 1.0) and np.all(m <= hi + 1.0)
    assert mixed_d.shape == (b, t)


def test_train_preprocess_shapes_and_determinism(rng):
    f = jnp.asarray(rng.integers(0, 256, (2, 3, 12, 12, 3)).astype(np.uint8))
    k = jax.random.PRNGKey(3)
    a = augment.train_preprocess(f, k, 8)
    b = augment.train_preprocess(f, k, 8)
    assert a.shape == (2, 3, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_preprocess_hflip_tta(rng):
    f = jnp.asarray(rng.integers(0, 256, (1, 2, 8, 8, 3)).astype(np.uint8))
    plain = np.asarray(augment.eval_preprocess(f, None, hflip=False))
    flip = np.asarray(augment.eval_preprocess(f, None, hflip=True))
    np.testing.assert_array_equal(flip, plain[:, :, :, ::-1, :])