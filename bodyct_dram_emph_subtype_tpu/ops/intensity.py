"""Intensity-domain functional ops (pure JAX, jit/vmap friendly).

Functional parity targets in the reference:
- ``intensity_window``   — HU clip + rescale       (``functional.py:13-26``)
- ``contrast_strenching``— sigmoid contrast curve  (``functional.py:29-41``)
- ``gaussian_smooth``    — separable 1-D gaussian  (``functional.py:44-64``)
- ``Standardize``        — per-volume zero-mean/unit-std
                           (``intensity_transforms.py:104-114``)
- ``GaussianAddictive``  — additive noise in rescaled [0,1] space
                           (``intensity_transforms.py:145-177``)
- ``BoxMaskOut``         — random box cutout (``intensity_transforms.py:180-237``)
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

EPSILON = 1e-7


def intensity_window(img: jax.Array, from_span: Optional[Tuple[float, float]] = (-1150, 350),
                     to_span: Tuple[float, float] = (0, 255)) -> jax.Array:
    """Clip to ``from_span`` then rescale into ``to_span``.

    ``from_span=None`` uses the data min/max (reference ``functional.py:16-18``).
    """
    img = img.astype(jnp.float32)
    if from_span is None:
        lo, hi = img.min(), img.max()
    else:
        lo, hi = from_span
    img = jnp.clip(img, lo, hi)
    return ((img - lo) / (hi - lo)) * (to_span[1] - to_span[0]) + to_span[0]


def contrast_stretching(img: jax.Array, rescale: bool, middle_point: float,
                        gamma: float) -> jax.Array:
    """Sigmoid-shaped contrast stretch (reference ``functional.py:29-41``)."""
    img = img.astype(jnp.float32)
    if rescale:
        d_min = img.min()
        d_range = img.max() - d_min
        standard = (img - d_min) / (d_range + EPSILON)
    else:
        standard = img
    return 1.0 / (1.0 + (middle_point / (standard + EPSILON)) ** gamma)


def standardize(img: jax.Array) -> jax.Array:
    """Per-volume zero-mean / unit-std.

    torch ``Tensor.std()`` uses the unbiased (ddof=1) estimator, which the
    reference relies on (``intensity_transforms.py:108-111``).
    """
    img = img.astype(jnp.float32)
    mean = img.mean()
    std = jnp.sqrt(img.var() * (img.size / max(img.size - 1, 1)))
    return (img - mean) / std


def gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Normalized 1-D gaussian taps; radius = int(truncate*sigma + 0.5)
    (reference ``functional.py:44-51``). ``sigma`` must be static."""
    radius = int(truncate * float(sigma) + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    phi = jnp.exp(-0.5 / float(sigma) ** 2 * x ** 2)
    return phi / phi.sum()


def gaussian_smooth(img: jax.Array, sigma: float, truncate: float = 4.0) -> jax.Array:
    """Separable gaussian blur over every axis with 'same' padding
    (reference ``functional.py:54-64``)."""
    kernel = gaussian_kernel_1d(sigma, truncate)
    img = img.astype(jnp.float32)
    for axis in range(img.ndim):
        img = _conv1d_same(img, kernel, axis)
    return img


def _conv1d_same(x: jax.Array, kernel: jax.Array, axis: int) -> jax.Array:
    """1-D correlation along ``axis`` with zero 'same' padding."""
    x_moved = jnp.moveaxis(x, axis, -1)
    lead_shape = x_moved.shape[:-1]
    n = x_moved.shape[-1]
    flat = x_moved.reshape(-1, 1, n)
    k = kernel.reshape(1, 1, -1)
    pad = (kernel.shape[0] - 1) // 2
    out = jax.lax.conv_general_dilated(
        flat, k, window_strides=(1,), padding=[(pad, kernel.shape[0] - 1 - pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out.reshape(*lead_shape, n), -1, axis)


def gaussian_additive_noise(img: jax.Array, key: jax.Array, sigma,
                            eps: Optional[jax.Array] = None) -> jax.Array:
    """Additive gaussian noise applied in rescaled [0,1] space, then mapped
    back to the original range (reference ``intensity_transforms.py:163-177``).

    ``eps``: optional pre-drawn N(0,1) field (e.g. a hoisted hardware-RNG
    batch draw, ``transforms.batch_augment.batch_noise_eps``); when absent
    the noise comes from ``key`` (threefry)."""
    img = img.astype(jnp.float32)
    d_min = img.min()
    d_range = img.max() - d_min
    rescaled = (img - d_min) / (d_range + 1e-7)
    if eps is None:
        eps = jax.random.normal(key, img.shape, jnp.float32)
    noise = sigma * eps
    rescaled = jnp.clip(rescaled + noise, 0.0, 1.0)
    return rescaled * d_range + d_min


def box_cutout(img: jax.Array, centers: jax.Array, sizes: jax.Array,
               valid: jax.Array, assign_value: float = 0.0) -> jax.Array:
    """Zero out up to N axis-aligned boxes given fractional centers/sizes.

    ``centers``/``sizes`` are (N, ndim) fractions; ``valid`` is (N,) bool and
    masks the boxes actually applied (static N keeps shapes jit-stable while
    the reference samples a random count, ``intensity_transforms.py:199-237``).
    Box extents replicate the reference integer arithmetic:
      start = max(0, int(c*s) - int(m*s)//2)
      stop  = min(int(c*s) + (int(m*s) - int(m*s)//2), s)
    """
    ndim = img.ndim
    shape = jnp.asarray(img.shape, jnp.float32)
    c = (centers * shape).astype(jnp.int32)                 # int(mc * ds)
    m = (sizes * shape).astype(jnp.int32)                   # int(ms * ds)
    starts = jnp.maximum(0, c - m // 2)
    stops = jnp.minimum(c + (m - m // 2), jnp.asarray(img.shape, jnp.int32))
    if ndim == 3:
        # separable form: a box is the outer product of three per-axis
        # indicator vectors, so the union over N boxes is a rank-N
        # contraction (two small matmuls) instead of N*2*ndim full-volume
        # compares — exact, since sums of <=N ones stay integral
        ind = []
        for axis in range(3):
            ar = jnp.arange(img.shape[axis], dtype=jnp.int32)[None, :]
            ind.append(((ar >= starts[:, axis:axis + 1])
                        & (ar < stops[:, axis:axis + 1]))
                       .astype(jnp.float32))
        ind[0] = ind[0] * valid[:, None].astype(jnp.float32)
        cover = jnp.einsum("bd,bh,bw->dhw", *ind)
        return jnp.where(cover > 0.5,
                         jnp.asarray(assign_value, img.dtype), img)
    iotas = [jax.lax.broadcasted_iota(jnp.int32, img.shape, axis)
             for axis in range(ndim)]
    keep = jnp.zeros(img.shape, bool)
    for n in range(centers.shape[0]):
        inside = valid[n]
        for axis in range(ndim):
            inside = inside & (iotas[axis] >= starts[n, axis]) \
                            & (iotas[axis] < stops[n, axis])
        keep |= inside
    return jnp.where(keep, jnp.asarray(assign_value, img.dtype), img)
