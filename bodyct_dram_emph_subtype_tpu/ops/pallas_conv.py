"""Pallas TPU kernel: stride-1 3x3x3 convolution as an im2col MXU matmul.

Why: XLA-TPU's direct 3-D convolution path runs the decoder's 64-channel
convs at ~8% MFU (measured, ``benchmarks/exp_conv_decomp.py``) while a plain
NHWC conv2d of the same arithmetic runs at ~24% and a straight matmul far
higher.  This kernel turns the conv into what the MXU actually wants:

  for each (batch, depth-slice, H-tile):
    DMA the 3 halo'd input planes HBM -> VMEM
    assemble A = (H_TILE*W, 27*Cin) patch matrix with 27 static VMEM copies
    out = A @ K                      one MXU matmul, K = (27*Cin, Cout)

The kernel handles the model's stride-1 dilation-1 3^3 convs (decoder us1/
us2/us3 and the space-to-batch sub-grid convs of the dilated trunk feed it
too since s2b reduces those to dense stride-1 convs).  Everything else
(k=7 stem, stride-2 downsamples, 1x1x1) stays on XLA.

Gradients: ``pallas_conv3d`` carries a custom VJP whose backward recomputes
through the direct XLA conv formulation — forward speed where it matters
(inference hot path), unchanged training numerics.

Reference op being accelerated: ``conv3x3x3`` (``med3d.py:91-100``).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_h_tile(h: int, w: int = 0, c: int = 0, max_tile: int = 8,
                 itemsize: int = 2) -> int:
    """Largest divisor of ``h`` (<= max_tile) whose patch matrix still fits
    the VMEM budget; the A matrix is the dominant buffer at large C.
    ``itemsize`` must match the input dtype so this estimate and the
    ``supports_pallas_conv3d`` gate use the same budget arithmetic."""
    for t in range(max_tile, 0, -1):
        if h % t:
            continue
        if c and t * max(w, 1) * 27 * c * itemsize > 8 * 1024 * 1024:
            continue
        return t
    return 1


def _kernel_body(x_hbm, k_ref, out_ref, planes, a_ref, sem, *,
                 D: int, H_TILE: int, W: int, C: int):
    n = pl.program_id(0)          # b * D + d
    ht = pl.program_id(1)
    b = n // D
    d = n % D
    h0 = ht * H_TILE

    # 3 halo'd planes (D taps) x (H_TILE + 2 halo rows) x Wp x Cp.  Mosaic
    # requires HBM slices aligned to the (8, 128) tiling on the two minor
    # dims, so the caller pads W to a multiple of 8 and C to a multiple of
    # 128; the A-matrix copies below read only the C valid channels.
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(d, 3), pl.ds(h0, H_TILE + 2)], planes, sem)
    dma.start()
    dma.wait()

    # im2col: 27 static shifted copies into the patch matrix's column bands
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                i = (kd * 3 + kh) * 3 + kw
                a_ref[:, :, i * C:(i + 1) * C] = (
                    planes[kd, kh:kh + H_TILE, kw:kw + W, :C])

    a = a_ref[:].reshape(H_TILE * W, 27 * C)
    out = jnp.dot(a, k_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = out.reshape(H_TILE, W, -1).astype(out_ref.dtype)


def _pallas_conv3d_impl(x: jax.Array, kernel: jax.Array) -> jax.Array:
    B, D, H, W, C = x.shape
    O = kernel.shape[-1]
    H_TILE = _pick_h_tile(H, W, C, itemsize=x.dtype.itemsize)
    wp = -(-(W + 2) // 8) * 8      # 8-aligned width for the HBM DMA
    cp = -(-C // 128) * 128        # 128-aligned lane dim for the HBM DMA
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, wp - W - 1), (0, cp - C)))
    k2 = kernel.reshape(27 * C, O).astype(x.dtype)

    body = functools.partial(_kernel_body, D=D, H_TILE=H_TILE, W=W, C=C)
    out = pl.pallas_call(
        body,
        grid=(B * D, H // H_TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # padded input in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # (27C, O) weights
        ],
        out_specs=pl.BlockSpec(
            (1, H_TILE, W, O),
            lambda n, ht: (n, ht, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * D, H, W, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, H_TILE + 2, wp, cp), x.dtype),
            pltpu.VMEM((H_TILE, W, 27 * C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, k2)
    return out.reshape(B, D, H, W, O)


def _direct_conv3d(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@jax.custom_vjp
def pallas_conv3d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Stride-1 pad-1 3x3x3 conv (NDHWC x DHWIO), Pallas forward."""
    return _pallas_conv3d_impl(x, kernel)


def _fwd(x, kernel):
    return _pallas_conv3d_impl(x, kernel), (x, kernel)


def _bwd(res, g):
    x, kernel = res
    _, vjp = jax.vjp(_direct_conv3d, x, kernel)
    return vjp(g)


pallas_conv3d.defvjp(_fwd, _bwd)


def supports_pallas_conv3d(shape: Tuple[int, ...],
                           kernel_shape: Tuple[int, ...],
                           strides: Tuple[int, int, int],
                           itemsize: int = 2,
                           max_vmem_bytes: int = 12 * 1024 * 1024) -> bool:
    """True when the (shape, kernel, stride) combination fits this kernel:
    3^3 stride-1 convs whose per-step VMEM footprint stays under budget."""
    if tuple(kernel_shape[:3]) != (3, 3, 3) or strides != (1, 1, 1):
        return False
    B, D, H, W, C = shape
    O = kernel_shape[-1]
    H_TILE = _pick_h_tile(H, W, C, itemsize=itemsize)
    pad = lambda v, m: -(-v // m) * m  # noqa: E731
    planes = 3 * (H_TILE + 2) * pad(W + 2, 8) * pad(C, 128) * itemsize
    a_mat = H_TILE * pad(W, 8) * pad(27 * C, 128) * itemsize
    weights = pad(27 * C, 8) * pad(O, 128) * itemsize
    out_t = H_TILE * pad(W, 8) * pad(O, 128) * itemsize
    return planes + a_mat + weights + 2 * out_t < max_vmem_bytes
