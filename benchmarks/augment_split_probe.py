#!/usr/bin/env python
"""Decompose the fused device augmentation's ~25 ms (DEVNOTES round-3).

The chain (transforms/batch_augment.py) is noise -> cutout -> composed
flip/crop tap-matrix resample, all vmapped with per-sample threefry keys.
Times each stage alone under the same jit/vmap regime, plus two RNG
variants for the noise (threefry in-vmap vs one hoisted hardware-RNG
`rbg` draw for the whole batch), so the next cut goes where the ms are.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TARGET = (128, 224, 288)
B = 4
MASK_OUT = (64, 112, 144)


def _timeit(f, *args):
    out = f(*args)
    np.asarray(jax_tree_leaf(out))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(6):
            out = f(*args)
        np.asarray(jax_tree_leaf(out))
        best = min(best, (time.time() - t0) / 6 * 1e3)
    return round(best, 2)


def jax_tree_leaf(out):
    import jax
    return jax.tree_util.tree_leaves(out)[0][..., :1]


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.ops.grid_sample import flip_crop_resize
    from bodyct_dram_emph_subtype_tpu.ops.intensity import (
        box_cutout, gaussian_additive_noise)
    from bodyct_dram_emph_subtype_tpu.train.steps import _augment_batch

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, *TARGET).astype(np.float32))
    lungs = jnp.ones((B, *TARGET), jnp.float32)
    ems = jnp.asarray((rng.rand(B, *TARGET) > 0.9).astype(np.float32))
    key = jax.random.PRNGKey(0)

    results = {}

    # full chain (current production path, masks at dense-map res)
    f_full = jax.jit(lambda im, lu, em, k: _augment_batch(
        im, lu, em, k, MASK_OUT))
    results["full_chain"] = _timeit(f_full, images, lungs, ems, key)

    # noise only, threefry in-vmap (as production)
    @jax.jit
    def noise_tf(im, k):
        ks = jax.random.split(k, im.shape[0])

        def one(img, kk):
            k_s, k_e = jax.random.split(kk)
            sigma = jax.random.uniform(k_s, (), minval=0.03, maxval=0.06)
            return gaussian_additive_noise(img, k_e, sigma)
        return jax.vmap(one)(im, ks)
    results["noise_threefry"] = _timeit(noise_tf, images, key)

    # noise only, one hoisted rbg draw for the whole batch
    @jax.jit
    def noise_rbg(im, k):
        seed = jax.random.bits(k, (4,), jnp.uint32)
        rk = jax.random.wrap_key_data(seed, impl="rbg")
        eps = jax.random.normal(rk, im.shape, jnp.float32)
        ks = jax.random.split(k, im.shape[0])
        sigma = jax.vmap(lambda kk: jax.random.uniform(
            jax.random.split(kk)[0], (), minval=0.03, maxval=0.06))(ks)
        d_min = im.min(axis=(1, 2, 3), keepdims=True)
        d_rng = im.max(axis=(1, 2, 3), keepdims=True) - d_min
        resc = (im - d_min) / (d_rng + 1e-7)
        resc = jnp.clip(resc + sigma[:, None, None, None] * eps, 0.0, 1.0)
        return resc * d_rng + d_min
    results["noise_rbg_hoisted"] = _timeit(noise_rbg, images, key)

    # raw RNG draw cost alone (threefry vs rbg), no min/max math
    results["raw_normal_threefry"] = _timeit(
        jax.jit(lambda k: jax.random.normal(k, (B, *TARGET), jnp.float32)),
        key)

    @jax.jit
    def raw_rbg(k):
        seed = jax.random.bits(k, (4,), jnp.uint32)
        rk = jax.random.wrap_key_data(seed, impl="rbg")
        return jax.random.normal(rk, (B, *TARGET), jnp.float32)
    results["raw_normal_rbg"] = _timeit(raw_rbg, key)

    # cutout only (in-vmap, as production)
    @jax.jit
    def cut(im, k):
        ks = jax.random.split(k, im.shape[0])

        def one(img, kk):
            k_n, k_c, k_s = jax.random.split(kk, 3)
            n = jax.random.randint(k_n, (), 1, 11)
            cs = jax.random.uniform(k_c, (10, 3), minval=0.2, maxval=0.8)
            ss = jax.random.uniform(k_s, (10, 3), minval=0.01, maxval=0.06)
            return box_cutout(img, cs, ss, jnp.arange(10) < n)
        return jax.vmap(one)(im, ks)
    results["cutout"] = _timeit(cut, images, key)

    # composed flip/crop resample only: image (full res) + 2 masks (map res)
    @jax.jit
    def resample(im, lu, em, k):
        ks = jax.random.split(k, im.shape[0])

        def one(img, lung, emm, kk):
            k_f, k_c, k_s = jax.random.split(kk, 3)
            flip = jax.random.uniform(k_f, (3,)) < 0.5
            center = jax.random.uniform(k_c, (3,), minval=0.45, maxval=0.55)
            size = jax.random.uniform(k_s, (3,), minval=0.95, maxval=1.0)
            i2 = flip_crop_resize(img, center, size, flip, True,
                                  is_mask=False, align_corners=True)
            l2 = flip_crop_resize(lung, center, size, flip, True,
                                  is_mask=True, out_sizes=MASK_OUT)
            e2 = flip_crop_resize(emm, center, size, flip, True,
                                  is_mask=True, out_sizes=MASK_OUT)
            return i2, l2, e2
        return jax.vmap(one)(im, lu, em, ks)
    results["resample_img_plus_masks"] = _timeit(
        resample, images, lungs, ems, key)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
