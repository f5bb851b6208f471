"""CT packing roundtrips (12-bit full-range, 10-bit window-domain)."""
import numpy as np

import jax.numpy as jnp

from bodyct_dram_emph_subtype_tpu.ops.packing import (
    WINDOW_HI, WINDOW_LO, pack10_host, pack12_host, unpack10_device,
    unpack12_device)


def test_pack_unpack_roundtrip(rng):
    hu = rng.randint(-2048, 2048, (3, 8, 10, 12)).astype(np.int16)
    packed = pack12_host(hu)
    assert packed.dtype == np.uint8
    assert packed.size == hu.size * 3 // 2
    out = np.asarray(unpack12_device(jnp.asarray(packed), hu.shape[1:]))
    np.testing.assert_array_equal(out, hu.astype(np.float32))


def test_pack_clips_out_of_range(rng):
    hu = np.asarray([[-3000, 3000, 0, -2048]], np.int16)
    out = np.asarray(unpack12_device(jnp.asarray(pack12_host(hu)), (4,)))
    np.testing.assert_array_equal(out, [[-2048, 2047, 0, -2048]])


def test_pack10_window_matches_preprocess_window():
    # the clamp-before-pack exactness argument relies on the transport
    # window being the preprocessing window
    from bodyct_dram_emph_subtype_tpu.ops.preprocess import WINDOW
    assert (float(WINDOW_LO), float(WINDOW_HI)) == WINDOW


def test_pack10_roundtrip_is_window_clamp(rng):
    hu = rng.randint(-2048, 2048, (3, 8, 10, 12)).astype(np.int16)
    packed = pack10_host(hu)
    assert packed.dtype == np.uint8
    assert packed.size == hu.size + hu.size // 4        # 1.25 B/voxel
    out = np.asarray(unpack10_device(jnp.asarray(packed), hu.shape[1:]))
    np.testing.assert_array_equal(
        out, np.clip(hu, WINDOW_LO, WINDOW_HI).astype(np.float32))


def test_pack10_preprocess_equals_raw_preprocess(rng):
    # clamping to the window before packing changes NOTHING the fused
    # preprocess computes: window rescale, standardize stats, and the
    # em/ess threshold masks (−950/−910 both inside the window)
    from bodyct_dram_emph_subtype_tpu.ops.preprocess import fused_preprocess
    pad = (8, 12, 16)
    hu = rng.randint(-2048, 500, (2, *pad)).astype(np.int16)
    lung = (rng.rand(2, *pad) > 0.4).astype(np.uint8)
    sizes = np.asarray([[8, 12, 16], [7, 11, 13]], np.int32)
    target = (4, 6, 8)
    for thr in (-950.0, -910.0):
        ref = fused_preprocess(jnp.asarray(hu), jnp.asarray(lung),
                               jnp.asarray(sizes), target_size=target,
                               em_threshold=thr)
        via = fused_preprocess(
            unpack10_device(jnp.asarray(pack10_host(hu)), pad),
            jnp.asarray(lung), jnp.asarray(sizes), target_size=target,
            em_threshold=thr)
        for k in ref:
            np.testing.assert_array_equal(np.asarray(ref[k]),
                                          np.asarray(via[k]))
