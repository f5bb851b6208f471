"""Pallas TPU kernel: stride-1 3x3x3 conv as full-MXU "tap matmuls".

Why another conv kernel: XLA-TPU runs the model's decoder convs at ~40-50
TFLOP/s in-model (DEVNOTES round-2 table) — the 64-output-channel 3-D convs
half-fill the 128-lane MXU and the conv lowering never reaches matmul-class
efficiency.  This kernel reformulates the conv so every MXU op is a large,
full-lane, full-depth matmul:

- **depth taps → K**: the input is pre-concatenated along channels with its
  two depth neighbours (``xcat[b, d] = [x[b,d-1]; x[b,d]; x[b,d+1]]``), so
  the contraction dim is ``3*Cin`` (>=192 — full MXU contraction even for
  the decoder's 64-channel convs).
- **width taps → N**: the weight matrix per H-tap stacks the three W-taps
  along columns (``N = 3*Cout`` >= 192 — full lanes), and the three
  partial-product bands are combined with cheap VPU shifted adds inside the
  padded row, instead of materialising a 27x im2col patch matrix (whose
  VMEM copy traffic is what capped ``ops/pallas_conv.py`` at ~24-47
  TFLOP/s).
- **height taps → 3 shifted views**: three H-shifted slices of the (padded)
  concat array are passed as separate inputs, so each grid step sees the
  rows ``h-1, h, h+1`` for its tile as three aligned VMEM blocks — no
  manual halo DMA; Pallas' automatic grid pipeline double-buffers every
  block (the round-2 kernel's single-buffered hand-DMA stalled on HBM).
- **weight streaming → grid axis**: output channels can be chunked over an
  innermost grid axis so the 512-channel trunk convs (whose (3C,3O) weight
  matrices exceed VMEM) stream weight tiles while activations stay
  resident.

The pre-concat and the three views cost extra HBM (<1 ms at decoder shapes
— arithmetic intensity here is hundreds of FLOP/byte, HBM is nowhere near
the bottleneck) and buy matmul shapes the MXU actually likes.

Gradients: ``tap_conv3d`` carries a custom VJP whose backward runs the
direct XLA conv formulation (forward speed where it matters; training
numerics equal to the reference lowering up to float reassociation).

Reference op being accelerated: ``conv3x3x3`` (``med3d.py:91-100``) as used
by the decoder ``UpsampleConvBlock5d`` (``med3d.py:50-89``) and the
residual blocks (``med3d.py:115-144``).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _plan(shape: Tuple[int, ...], o: int, itemsize: int,
          vmem_budget: int = 10 * 1024 * 1024):
    """Pick (h_tile, n_chunks) for the given conv, or None if unsupported.

    h_tile divides H (whole tiles only); n_chunks divides O.  The VMEM
    model counts the double-buffered view blocks, the streamed weight
    block, the f32 partial/accumulator, and the output block.
    """
    b, d, h, w, c = shape
    wp = _round_up(w + 2, 8)
    if wp - w > max(8, w // 3):      # padding waste makes tap matmuls lose
        return None
    best = None
    for nc in (1, 2, 4, 8):
        if o % nc or (o // nc) % 8:
            continue
        oc = o // nc
        weights = 3 * (3 * c) * (3 * oc) * itemsize
        if weights > 6 * 1024 * 1024:
            continue
        for t in range(min(h, 16), 3, -1):
            if h % t:
                continue
            views = 3 * 2 * t * wp * (3 * c) * itemsize
            partial = t * wp * (3 * oc) * 4
            acc = t * w * oc * 4
            out = 2 * t * w * oc * itemsize
            if views + weights + partial + acc + out <= vmem_budget:
                if best is None or nc < best[1]:
                    best = (t, nc)
                break
        if best is not None:
            break
    return best


def supports_tap_conv3d(shape: Tuple[int, ...],
                        kernel_shape: Tuple[int, ...],
                        strides: Tuple[int, int, int],
                        itemsize: int = 2) -> bool:
    """True when (shape, kernel, stride) fits this kernel: 3^3 stride-1
    convs at widths where row padding stays small and a tile plan exists."""
    if tuple(kernel_shape[:3]) != (3, 3, 3) or tuple(strides) != (1, 1, 1):
        return False
    if shape[3] < 24 or shape[2] < 4:     # narrow rows: padding waste
        return False
    return _plan(tuple(shape), kernel_shape[-1], itemsize) is not None


def _kernel_body(v0, v1, v2, w_ref, out_ref, *, T: int, W: int, WP: int,
                 C3: int, OC: int):
    acc = None
    for dh, v in enumerate((v0, v1, v2)):
        a = v[0, 0].reshape(T * WP, C3)
        p = jnp.dot(a, w_ref[dh], preferred_element_type=jnp.float32)
        p = p.reshape(T, WP, 3 * OC)
        for dw in range(3):
            band = p[:, dw:dw + W, dw * OC:(dw + 1) * OC]
            acc = band if acc is None else acc + band
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _tap_conv3d_impl(x: jax.Array, kernel: jax.Array,
                     interpret: bool = False,
                     plan: Optional[Tuple[int, int]] = None) -> jax.Array:
    B, D, H, W, C = x.shape
    O = kernel.shape[-1]
    plan = plan or _plan(x.shape, O, x.dtype.itemsize)
    assert plan is not None, "unsupported shape — gate with supports_tap_conv3d"
    T, NC = plan
    OC = O // NC
    WP = _round_up(W + 2, 8)

    # depth-tap concat: channels = [d-1 | d | d+1], zeros beyond the ends
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xcat = jnp.concatenate([xp[:, 0:D], xp[:, 1:D + 1], xp[:, 2:D + 2]],
                           axis=-1)
    # W: 1 zero left + zeros right to alignment; H: 1 each side for views
    xcat = jnp.pad(xcat, ((0, 0), (0, 0), (1, 1), (1, WP - W - 1), (0, 0)))
    views = [jax.lax.slice_in_dim(xcat, dh, dh + H, axis=2)
             for dh in range(3)]

    # weights: w[dh, nc, dd*C + ci, dw*OC + oc] = kernel[dd, dh, dw, ci, o]
    k = kernel.astype(x.dtype)
    w = jnp.transpose(k, (1, 0, 3, 2, 4))           # (dh, dd, C, dw, O)
    w = w.reshape(3, 3 * C, 3, NC, OC)              # (dh, 3C, dw, nc, OC)
    w = jnp.transpose(w, (0, 3, 1, 2, 4)).reshape(3, NC, 3 * C, 3 * OC)

    view_spec = pl.BlockSpec(
        (1, 1, T, WP, 3 * C),
        lambda b, d, ht, j: (b, d, ht, 0, 0),
        memory_space=pltpu.VMEM)
    body = functools.partial(_kernel_body, T=T, W=W, WP=WP, C3=3 * C, OC=OC)
    out = pl.pallas_call(
        body,
        grid=(B, D, H // T, NC),
        in_specs=[view_spec, view_spec, view_spec,
                  pl.BlockSpec((3, 1, 3 * C, 3 * OC),
                               lambda b, d, ht, j: (0, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, T, W, OC),
                               lambda b, d, ht, j: (b, d, ht, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, O), x.dtype),
        interpret=interpret,
    )(*views, w)
    return out


def _direct_conv3d(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@jax.custom_vjp
def tap_conv3d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Stride-1 pad-1 3x3x3 conv (NDHWC x DHWIO), tap-matmul forward."""
    return _tap_conv3d_impl(x, kernel)


def _fwd(x, kernel):
    return _tap_conv3d_impl(x, kernel), (x, kernel)


def _bwd(res, g):
    x, kernel = res
    _, vjp = jax.vjp(_direct_conv3d, x, kernel)
    return vjp(g)


tap_conv3d.defvjp(_fwd, _bwd)
