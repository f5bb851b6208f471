"""Pallas TPU kernels for the framework's hot reductions.

The dRAM head ends in a lobe-masked mean (``med3d.py:387``): per sample,
``sum(dense * lung) / sum(lung)`` over ~10^6 voxels.  XLA already fuses the
jnp version well; this kernel exists for the cases where we want the
reduction fused with neighbouring work in one VMEM pass and as the
foundation for further Pallas work (fused preprocess tiles, halo kernels).

The kernel streams (H, W) slices through VMEM over a (B, D) grid and
accumulates masked sums in the output block — grid iterations on TPU are
sequential, so revisiting the same output block is the idiomatic
accumulation pattern.

``interpret=True`` runs the same kernel on CPU for tests.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LANES = 128  # output rows are padded to one full lane tile


def _masked_sums_kernel(dense_ref, lung_ref, out_ref):
    bi = pl.program_id(0)
    d = pl.program_id(1)

    @pl.when((bi == 0) & (d == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    dense = dense_ref[0, 0]          # (H, W, C)
    lung = lung_ref[0, 0]            # (H, W, 1)
    masked = dense * lung
    num = jnp.sum(masked, axis=(0, 1))          # (C,)
    den = jnp.sum(lung, axis=(0, 1))            # (1,)
    vals = jnp.concatenate([num, den])
    out_ref[bi, :] += jnp.pad(vals, (0, _LANES - vals.shape[0]))


def masked_sums_pallas(dense: jax.Array, lung: jax.Array,
                       interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """(B,D,H,W,C) dense x (B,D,H,W,1) lung → ((B,C) masked sums, (B,) lung
    sums) in one VMEM pass."""
    b, d, h, w, c = dense.shape
    assert lung.shape == (b, d, h, w, 1)
    out = pl.pallas_call(
        _masked_sums_kernel,
        grid=(b, d),
        in_specs=[
            pl.BlockSpec((1, 1, h, w, c), lambda bi, di: (bi, di, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, w, 1), lambda bi, di: (bi, di, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, _LANES), lambda bi, di: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, _LANES), jnp.float32),
        interpret=interpret,
    )(dense.astype(jnp.float32), lung.astype(jnp.float32))
    return out[:, :c], out[:, c]


def lung_masked_fraction_pallas(dense: jax.Array, lung: jax.Array,
                                interpret: bool = False) -> jax.Array:
    """Drop-in Pallas variant of
    :func:`bodyct_dram_emph_subtype_tpu.ops.masked_pool.lung_masked_fraction`
    for lungs already at the dense resolution."""
    num, den = masked_sums_pallas(dense, lung, interpret=interpret)
    return num / den[:, None]
