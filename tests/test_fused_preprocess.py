"""Fused on-device preprocess must match the host numpy chain exactly."""
import numpy as np

import jax.numpy as jnp

from bodyct_dram_emph_subtype_tpu.data.host_preprocess import preprocess_sample
from bodyct_dram_emph_subtype_tpu.ops.preprocess import fused_preprocess


def test_fused_matches_host_chain(rng):
    target = (16, 24, 32)
    pad_shape = (40, 48, 56)
    B = 3
    imgs = np.zeros((B, *pad_shape), np.int16)
    lungs = np.zeros((B, *pad_shape), np.int8)
    sizes = np.zeros((B, 3), np.int32)
    raw = []
    for b in range(B):
        shape = (40 - 4 * b, 48 - 6 * b, 56 - 8 * b)
        img = rng.randint(-1200, -400, shape).astype(np.int16)
        lung = (rng.rand(*shape) > 0.4).astype(np.int8)
        imgs[b, :shape[0], :shape[1], :shape[2]] = img
        lungs[b, :shape[0], :shape[1], :shape[2]] = lung
        sizes[b] = shape
        raw.append({"image": img, "lung_mask": lung,
                    "em_mask": (img < -950) & (lung > 0)})

    out = fused_preprocess(jnp.asarray(imgs), jnp.asarray(lungs),
                           jnp.asarray(sizes), target_size=target,
                           em_threshold=-950.0)
    for b in range(B):
        want = preprocess_sample(raw[b], target)
        np.testing.assert_allclose(np.asarray(out["image"][b]),
                                   want["image"], rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out["lung_mask"][b]),
                                      want["lung_mask"])
        np.testing.assert_array_equal(np.asarray(out["em_mask"][b]),
                                      want["em_mask"])


def test_fused_preprocess_ess_threshold(rng):
    """-910 (inference) vs -950 (training) thresholds differ."""
    shape = (16, 20, 24)
    img = rng.randint(-1000, -860, shape).astype(np.int16)
    lung = np.ones(shape, np.int8)
    sizes = jnp.asarray([[*shape]], jnp.int32)
    out950 = fused_preprocess(jnp.asarray(img[None]), jnp.asarray(lung[None]),
                              sizes, target_size=shape, em_threshold=-950.0)
    out910 = fused_preprocess(jnp.asarray(img[None]), jnp.asarray(lung[None]),
                              sizes, target_size=shape, em_threshold=-910.0)
    assert (np.asarray(out910["em_mask"]).sum()
            > np.asarray(out950["em_mask"]).sum())
