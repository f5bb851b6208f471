"""12-bit CT packing for the host→HBM link (planar layout).

CT voxels span [-2048, 2047] HU — 12 bits.  Packing two voxels into three
bytes cuts host→device transfer bytes by 25% vs int16.

Layout matters on TPU: byte-interleaved packing needs stride-3 gathers on
device (vector-lane hostile).  We use a *planar* layout instead — the flat
volume is split into halves (v0 = first half, v1 = second half) and three
contiguous byte planes are shipped:

  plane0 = v0 & 0xFF
  plane1 = (v0 >> 8) | ((v1 & 0xF) << 4)
  plane2 = v1 >> 4

so the device unpack is three contiguous slices + a concat — no shuffles.
Lossless for any HU in range (clipped first, matching the −2048 background
the preprocessing assigns anyway, ``dataset.py:70``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

OFFSET = 2048


def pack12_host(hu: np.ndarray) -> np.ndarray:
    """(B, ...) int16 HU → (B, 3, N/2) uint8 planes; N (voxels per sample)
    must be even."""
    squeeze = hu.ndim == 1
    flat = hu.reshape(1, -1) if squeeze else hu.reshape(hu.shape[0], -1)
    n = flat.shape[-1]
    assert n % 2 == 0, "voxel count must be even for 12-bit packing"
    # stay in 16-bit: the int32 widening costs ~100x under memory pressure
    # on small-core hosts (identical result: clip-then-offset == the old
    # offset-then-clip for the int16 value range)
    v = (np.clip(flat, -OFFSET, 4095 - OFFSET) + OFFSET).astype(np.uint16)
    v0 = v[:, :n // 2]
    v1 = v[:, n // 2:]
    out = np.empty((flat.shape[0], 3, n // 2), np.uint8)
    out[:, 0] = v0 & 0xFF
    out[:, 1] = ((v0 >> 8) | ((v1 & 0xF) << 4)).astype(np.uint8)
    out[:, 2] = (v1 >> 4).astype(np.uint8)
    return out[0] if squeeze else out


def unpack12_device(packed: jax.Array, out_shape) -> jax.Array:
    """(B, 3, N/2) uint8 planes → (B, *out_shape) float32 HU (device-side)."""
    squeeze = packed.ndim == 2
    if squeeze:
        packed = packed[None]
    p = packed.astype(jnp.int32)
    b0, b1, b2 = p[:, 0], p[:, 1], p[:, 2]
    v0 = b0 | ((b1 & 0xF) << 8)
    v1 = (b1 >> 4) | (b2 << 4)
    flat = jnp.concatenate([v0, v1], axis=-1) - OFFSET
    out = flat.astype(jnp.float32).reshape(packed.shape[0], *out_shape)
    return out[0] if squeeze else out
