"""12-bit CT packing roundtrip."""
import numpy as np

import jax.numpy as jnp

from bodyct_dram_emph_subtype_tpu.ops.packing import pack12_host, unpack12_device


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
