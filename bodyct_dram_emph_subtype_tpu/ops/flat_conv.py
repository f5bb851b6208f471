"""Pallas TPU kernel: plane-flat im2col conv for the s2b trunk layers.

Fourth kernel generation, aimed at the FLOP bulk of the model: the dense
256/512-channel 3^3 convs that layer3/layer4 run in the space-to-batch
domain (8.2 of the trunk's 9.5 TFLOP; reference ``med3d.py:207-213``).
Their shapes after whole-layer s2b are

    layer3:  (B*8,  8, 14, 18, 256) . (3,3,3,256,256)
    layer4:  (B*64, 4,  7,  9, 512) . (3,3,3,512,512)

i.e. full-lane channels (C, O multiples of 128 -> no packing, no
structural-zero FLOPs) but tiny spatial planes, where a per-row W-tile
would waste 33-78% of the MXU rows on padding.  The formulation here:

- **plane-flat rows**: each depth plane (H, W, C) is flattened to
  (H*(W+1), C) rows with ONE zero column between consecutive H-rows (plus
  W+2 guard zeros on both flat ends).  A W-tap then becomes a +-1 sublane
  shift of the flat vector and an H-tap a +-(W+1) shift — every (dh, dw)
  tap pair is a single shifted copy of the whole plane, and the only row
  overheads are the separator column (~5-11%) and the final round-to-8.
- **rolling patch ring**: the 9 (dh, dw)-shifted copies of a plane are
  built once into one (R, 9C) patch; a 3-slot ring reuses each plane's
  patch across the 3 output planes that consume it.  Copies total 9x the
  input volume, all VMEM->VMEM.
- **one matmul per depth tap**: acc[dout] = sum_dd patch[dout+dd] @
  W9[dd], with W9[dd] = kernel[dd] reshaped (9C, O) — K >= 2304, rows
  H*(W+1): MXU-shaped, zero structural waste.
- **O-chunked resident weights**: grid (O/OC, N); the (3, 9C, OC) weight
  chunk is manually DMA'd into VMEM once per chunk (layer4's full 14 MB
  kernel exceeds VMEM) and amortised over all N batch elements; the input
  block pipeline re-reads activations once per chunk (~0.1 ms/conv).

Gradients: custom VJP falls back to the direct XLA conv (training keeps
the 'direct' lowering anyway; this kernel serves the inference path).

**Measured verdict (v5e, B=4 bf16, benchmarks/flat_probe.py): LOSES to
XLA direct** — layer3 4.68 ms vs 4.29 (48.8 vs 53.3 TF/s), layer4 10.22
vs 8.01 (89.4 vs 114.1 TF/s), full fwd 214.9 ms vs 198.3 without.  The
current XLA conv stack tiles these full-lane shapes better than round-2's
did; the kernel stays as opt-in conv mode 'flat' (a tested, documented
manual-DMA weight-streaming example), NOT in the default path.

Reference op targeted: ``conv3x3x3`` (``med3d.py:91-100``) inside
layer3/layer4 (``med3d.py:207-213``).
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


def _geom(shape: Tuple[int, ...]) -> Tuple[int, int, int]:
    """(WS, R, RP): flat row stride, logical rows, padded flat length.

    RP must fit the largest shifted read: offset a <= 2*WS+2 plus RP8 rows
    (the patch height), hence the round-up of RP8 + 2*(WS+1)."""
    _, _, h, w, _ = shape
    ws = w + 1
    r = h * ws
    rp = _round_up(_round_up(r, 8) + 2 * (ws + 1), 8)
    return ws, r, rp


def _plan(shape: Tuple[int, ...], o: int, itemsize: int,
          vmem_budget: int = 11 * 1024 * 1024) -> Optional[int]:
    """Pick the largest output-channel chunk OC (multiple of 128) that
    fits the VMEM budget, or None when the shape is unsupported."""
    n, d, h, w, c = shape
    if c % 128 or o % 128:
        return None
    ws, r, rp = _geom(shape)
    rp8 = _round_up(r, 8)
    dp = d + 2
    oc = o
    while oc >= 128:
        if o % oc == 0:
            x_blk = dp * rp * c * itemsize
            ring = 3 * rp8 * 9 * c * itemsize
            wts = 3 * 9 * c * oc * itemsize
            acc = rp8 * oc * 4
            out_blk = d * rp8 * oc * itemsize
            if 2 * x_blk + ring + wts + acc + 2 * out_blk <= vmem_budget:
                return oc
        oc //= 2
    return None


def supports_flat_conv(shape: Tuple[int, ...], kernel_shape: Tuple[int, ...],
                       itemsize: int = 2) -> bool:
    """``shape`` is the NDHWC activation shape; stride-1 pad-1 3^3 only."""
    if tuple(kernel_shape[:3]) != (3, 3, 3):
        return False
    if shape[-1] != kernel_shape[3]:
        return False
    return _plan(tuple(shape), kernel_shape[-1], itemsize) is not None


def _kernel_body(x_ref, w_hbm, out_ref, wts, ring, w_sem, *, D: int, R: int,
                 RP8: int, WS: int, C: int, OC: int):
    o_i = pl.program_id(0)
    n_i = pl.program_id(1)

    @pl.when(n_i == 0)
    def _():
        pltpu.make_async_copy(
            w_hbm.at[:, :, pl.ds(o_i * OC, OC)], wts, w_sem).start()
        pltpu.make_async_copy(
            w_hbm.at[:, :, pl.ds(o_i * OC, OC)], wts, w_sem).wait()

    def build_patch(i):
        # padded-plane i: (RP, C) flat rows; 9 shifted whole-plane copies
        plane = x_ref[0, i]
        slot = i % 3
        for dh in range(3):
            for p in range(3):
                a = (dh - 1) * WS + (p - 1) + (WS + 1)
                ring[slot, :, (dh * 3 + p) * C:(dh * 3 + p + 1) * C] = (
                    plane[a:a + RP8])

    build_patch(0)
    build_patch(1)
    for dout in range(D):          # static unroll: D is 4 or 8
        build_patch(dout + 2)
        acc = jnp.zeros((RP8, OC), jnp.float32)
        for dd in range(3):
            acc = acc + jnp.dot(ring[(dout + dd) % 3], wts[dd],
                                preferred_element_type=jnp.float32)
        out_ref[0, dout] = acc.astype(out_ref.dtype)


def _flat_conv_impl(x: jax.Array, kernel: jax.Array,
                    interpret: bool = False,
                    vmem_budget: int = 11 * 1024 * 1024) -> jax.Array:
    N, D, H, W, C = x.shape
    O = kernel.shape[-1]
    OC = _plan(x.shape, O, x.dtype.itemsize, vmem_budget)
    assert OC is not None, "gate with supports_flat_conv"
    WS, R, RP = _geom(x.shape)
    RP8 = _round_up(R, 8)
    DP = D + 2

    # flat layout: one zero column after each W row, then (WS+1) guard
    # zeros before row 0 and after row R-1 (the dh=-1/+1 taps of the first/
    # last rows land in the guards), one zero plane each side of D
    xf = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 1), (0, 0)))
    xf = xf.reshape(N, DP, R, C)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (WS + 1, RP - R - WS - 1), (0, 0)))

    # (3,3,3,C,O) -> (3, 9C, O): W9[dd][(dh*3+dw)*C + c, o]
    w9 = kernel.astype(x.dtype).reshape(3, 9 * C, O)

    body = functools.partial(_kernel_body, D=D, R=R, RP8=RP8, WS=WS, C=C,
                             OC=OC)
    out = pl.pallas_call(
        body,
        grid=(O // OC, N),
        in_specs=[
            pl.BlockSpec((1, DP, RP, C), lambda o, n: (n, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, D, RP8, OC), lambda o, n: (n, 0, 0, o)),
        out_shape=jax.ShapeDtypeStruct((N, D, RP8, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, 9 * C, OC), x.dtype),       # weight chunk
            pltpu.VMEM((3, RP8, 9 * C), x.dtype),      # patch ring
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xf, w9)
    # (N, D, RP8, O) flat rows -> (N, D, H, W, O)
    return out[:, :, :R].reshape(N, D, H, WS, O)[:, :, :, :W]


def _direct_reference(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@jax.custom_vjp
def flat_conv3d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Stride-1 pad-1 3^3 conv: (N,D,H,W,C) x (3,3,3,C,O) -> (N,D,H,W,O).
    Pallas plane-flat forward, direct-conv backward."""
    return _flat_conv_impl(x, kernel)


def _fwd(x, kernel):
    return _flat_conv_impl(x, kernel), (x, kernel)


def _bwd(res, g):
    x, kernel = res
    _, vjp = jax.vjp(_direct_reference, x, kernel)
    return vjp(g)


flat_conv3d.defvjp(_fwd, _bwd)
