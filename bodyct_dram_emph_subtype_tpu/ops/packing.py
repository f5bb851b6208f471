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

# The deployment/bench transport window (== ops.preprocess.WINDOW, pinned by
# a test).  Every consumer of the raw CT on device first clips to this HU
# window (``fused_preprocess``), and both emphysema thresholds (−950 train
# LAA, −910 inference ess) lie strictly inside it, so clamping on the host
# BEFORE packing changes nothing downstream: window rescale, standardize
# stats, and the ``raw < threshold`` mask comparisons are all invariant
# under clip(hu, −1150, −300).  851 levels fit in 10 bits → 1.25 B/voxel
# vs 1.5 for the full-range 12-bit pack (the host→device link is the e2e
# gate — DEVNOTES transfer notes).
WINDOW_LO = -1150
WINDOW_HI = -300


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


def pack10_host(hu: np.ndarray) -> np.ndarray:
    """(B, ...) int16 HU → (B, N + N/4) uint8 window-domain 10-bit pack.

    Values are clamped to the HU window [−1150, −300] (exact for the whole
    device pipeline — see the module comment) and shifted to [0, 850].
    Planar layout for vector-lane-friendly device unpack: the first N bytes
    are the low 8 bits; the last N/4 bytes hold the 2 high bits of the four
    N/4-sized quarters (quarter k in bits 2k..2k+1) — contiguous slices +
    shifts on device, no interleaved gathers (DEVNOTES: interleaved byte
    packing costs stride gathers).  N (voxels per sample) must be %4 == 0.
    """
    squeeze = hu.ndim == 1
    flat = hu.reshape(1, -1) if squeeze else hu.reshape(hu.shape[0], -1)
    n = flat.shape[-1]
    assert n % 4 == 0, "voxel count must be divisible by 4 for 10-bit pack"
    q = n // 4
    # stay in 16-bit ops (same memory-pressure rationale as pack12_host)
    v = (np.clip(flat, WINDOW_LO, WINDOW_HI)
         - np.int16(WINDOW_LO)).astype(np.uint16)
    out = np.empty((flat.shape[0], n + q), np.uint8)
    out[:, :n] = v & 0xFF
    hi = (v >> 8).astype(np.uint8)      # values 0..3
    acc = hi[:, :q]
    for k in range(1, 4):
        acc = acc | (hi[:, k * q:(k + 1) * q] << (2 * k))
    out[:, n:] = acc
    return out[0] if squeeze else out


def unpack10_device(packed: jax.Array, out_shape) -> jax.Array:
    """(B, N + N/4) uint8 window-domain pack → (B, *out_shape) float32
    clamped HU (device-side inverse of :func:`pack10_host`)."""
    squeeze = packed.ndim == 1
    if squeeze:
        packed = packed[None]
    n = int(np.prod(out_shape))
    q = n // 4
    lo = packed[:, :n].astype(jnp.int32)
    hi = packed[:, n:].astype(jnp.int32)
    hi_parts = jnp.concatenate(
        [(hi >> (2 * k)) & 3 for k in range(4)], axis=-1)
    flat = lo + (hi_parts << 8) + WINDOW_LO
    out = flat.astype(jnp.float32).reshape(packed.shape[0], *out_shape)
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
