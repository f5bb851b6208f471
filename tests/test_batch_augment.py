"""Fused on-device batched augmentation tests."""
import numpy as np

import jax
import jax.numpy as jnp

from bodyct_dram_emph_subtype_tpu.transforms import batch_augment


def _batch(rng, b=4, shape=(16, 24, 32)):
    img = rng.randn(b, *shape).astype(np.float32)
    lung = (rng.rand(b, *shape) > 0.4).astype(np.float32)
    em = (rng.rand(b, *shape) > 0.8).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(lung), jnp.asarray(em)


def test_shapes_preserved_and_deterministic(rng):
    img, lung, em = _batch(rng)
    out1 = batch_augment(img, lung, em, jax.random.PRNGKey(0))
    out2 = batch_augment(img, lung, em, jax.random.PRNGKey(0))
    for k in ("image", "lung_mask", "em_mask"):
        assert out1[k].shape == img.shape
        np.testing.assert_array_equal(np.asarray(out1[k]), np.asarray(out2[k]))


def test_varies_with_key_and_across_samples(rng):
    img, lung, em = _batch(rng)
    a = batch_augment(img, lung, em, jax.random.PRNGKey(0))
    b = batch_augment(img, lung, em, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(a["image"]), np.asarray(b["image"]))
    # identical input samples must get *different* augmentations (per-sample
    # key split)
    same = jnp.broadcast_to(img[:1], img.shape)
    out = batch_augment(same, lung, em, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out["image"][0]),
                           np.asarray(out["image"][1]))


def test_masks_stay_binary(rng):
    img, lung, em = _batch(rng)
    out = batch_augment(img, lung, em, jax.random.PRNGKey(3))
    for k in ("lung_mask", "em_mask"):
        vals = np.unique(np.asarray(out[k]))
        assert np.isin(vals, [0.0, 1.0]).all()
