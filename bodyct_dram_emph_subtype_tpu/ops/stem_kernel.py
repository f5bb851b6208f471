"""Pallas TPU kernel: fused stem conv + BN + ReLU + k3s2p1 max-pool.

The model's k=7 stride-2 stem conv (reference ``med3d.py:198-206``:
conv1 + bn1 + relu + maxpool) is the single most off-roofline region of
the forward pass: XLA runs the (2,2,8) space-to-depth conv form at ~62
TF/s gross (13.0 ms at the B=4 deployment shape), then pays a 528 MB
materialize + an off-roofline pool (region total ~31.4 ms chained,
``benchmarks/maxpool_probe{,3}.py``) against a ~6 ms floor.

This kernel runs the whole region in one pass.  The first cut extracted
the three W taps in-kernel with sublane-offset VMEM slices — the same
per-tile relayout trap that sank ``ops/tap_conv.py`` (Wq = 36 quad
columns is not 8-aligned, so every tap copy relayouts).  This version
has NO in-kernel tap extraction at all:

- **input**: ALL 12 (kh, kw) taps ride the lane dim, stacked by XLA
  (``_stack_taps``): lane ``kw*128 + kh*32 + c`` of the FLAT plane
  (B, D2, H2*Wq, 384) holds ``xg[d, h + kh - 2, wq + kw - 1, c]`` with
  zero halos baked in.  Each flat row IS its full per-depth-tap im2col
  patch row; the kernel never shifts or slices anything.
- **conv**: per output plane, 4 matmuls (H2*Wq, 384) @ (384, 256) — one
  per depth tap ``kd`` — accumulated in f32.  Same gross FLOPs as the
  XLA lowering (the (2,2,8) map is 343/1536 dense) but at rolling-ring
  MFU with the DMA double-buffered behind the matmuls.
- **epilogue**: folded BN affine + ReLU (quad-tiled (256,) vectors).
- **pool**: a 3-slot ring of conv planes stays in VMEM; every odd plane
  emits a pooled plane.  The H/W pool stages run on the FLAT row space
  with sublane rolls (±Wq for the odd/odd-up H rows, +1 for the W
  neighbour) plus iota masks — no misaligned reshape or slice; rows
  ``j % (2*Wq) >= Wq`` of the pooled plane are don't-care and sliced
  off (cheaply, 66 MB) outside the kernel.  Post-ReLU, so the zero
  boundary fill is exact.  The 528 MB stem activation is WRITTEN once
  (the decoder skip needs it) and never re-read for pooling.

Outputs: the quad-lane stem (B, D2, H2, Wq, 256) and the W-pair packed
pooled activation (B, D2/2, H2/2, Wq, 2*64).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supports_fused_stem(shape: Tuple[int, ...], features: int = 64,
                        itemsize: int = 2,
                        vmem_budget: int = 44 * 1024 * 1024) -> bool:
    """(B, D, H, W, 1) NDHWC input gate: (2,2,8)-divisible dims, pool-even
    outputs, and the plane ring + accumulators must fit VMEM."""
    if len(shape) != 5 or shape[-1] != 1 or features != 64:
        return False
    b, d, h, w, _ = shape
    if d % 4 or h % 4 or w % 8 or d < 16:
        return False
    d2, h2, wq = d // 2, h // 2, w // 8
    hwq = h2 * wq
    if hwq % 8:
        return False
    o = 4 * features
    ring = 6 * hwq * 384 * itemsize
    acc = hwq * o * 4
    cring = 3 * hwq * o * itemsize
    sstage = 2 * hwq * o * itemsize
    pstage = 2 * hwq * 2 * features * itemsize
    weights = 4 * 384 * o * itemsize
    return (ring + acc + cring + sstage + pstage + weights) <= vmem_budget


def _stack_taps(xg: jax.Array) -> jax.Array:
    """(B, D2, H2, Wq, 32) s2d grid -> flat (B, D2, H2*Wq, 384) with all
    12 (kh, kw) taps stacked in lanes: lane ``kw*128 + kh*32 + c`` holds
    ``xg[d, h + kh - 2, wq + kw - 1, c]`` (zero halos baked in)."""
    b, d2, h2, wq, c = xg.shape
    xh = jnp.pad(xg, ((0, 0), (0, 0), (2, 1), (0, 0), (0, 0)))
    x4 = jnp.concatenate([xh[:, :, kh:kh + h2] for kh in range(4)], -1)
    xw = jnp.pad(x4, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    x12 = jnp.concatenate([xw[:, :, :, kw:kw + wq] for kw in range(3)], -1)
    return x12.reshape(b, d2, h2 * wq, 12 * c)


def _sublane_roll(x: jax.Array, shift: int) -> jax.Array:
    """jnp.roll(x, shift, axis=0) on a (R, L) VMEM value at any element
    width (Mosaic's rotate is 32-bit only on chip).  ``pltpu.bitcast``
    to i32 packs along dim 0 (rows 2r, 2r+1 share an i32 row), so the
    packed view must roll by ``shift // k`` — and only k-divisible
    shifts can ride the bitcast at all; others fall back to a
    slice-concat rotation."""
    s = shift % x.shape[0]
    if s == 0:
        return x
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, s, 0)
    k = 4 // x.dtype.itemsize
    if s % k == 0 and x.shape[0] % k == 0:
        i32 = pltpu.bitcast(x, jnp.int32)
        return pltpu.bitcast(pltpu.roll(i32, s // k, 0), x.dtype)
    return jnp.concatenate([x[x.shape[0] - s:], x[:x.shape[0] - s]], axis=0)


def _lane_roll(x: jax.Array, c: int):
    """jnp.roll on the lane dim (same bitcast trick, see
    ``maxpool_kernel._lane_roll``: bitcast packs along the second-minor
    dim, lane count unchanged, so the i32 roll amount is ``c``)."""
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, c % x.shape[-1], x.ndim - 1)
    assert x.shape[-2] % (4 // x.dtype.itemsize) == 0
    i32 = pltpu.bitcast(x, jnp.int32)
    return pltpu.bitcast(
        pltpu.roll(i32, c % i32.shape[-1], x.ndim - 1), x.dtype)


def _pool_flat(p: jax.Array, Wq: int, C: int) -> jax.Array:
    """H and W pool stages on a depth-maxed FLAT (H2*Wq, 4C) quad plane.

    Row ``j = g*2*Wq + r`` holds H row pair ``g``: even H row at
    ``r < Wq``, odd at ``r >= Wq``.  Returns the (H2*Wq, 2C) W-pair
    packed pooled plane, valid at rows ``j % (2*Wq) < Wq`` (the rest is
    don't-care).  Zero fill — exact post-ReLU."""
    R, C4 = p.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    # H: max(even[g], odd[g], odd[g-1]) on the flat rows
    odd = _sublane_roll(p, -Wq)                       # v[j + Wq]
    odd_up = jnp.where(row >= Wq, _sublane_roll(p, Wq),
                       jnp.zeros_like(p))             # v[j - Wq]
    hm = jnp.maximum(p, jnp.maximum(odd, odd_up))
    # W: quad lanes (pos, c); prev quad column = previous flat row
    t1 = jnp.maximum(hm, _lane_roll(hm, -C))
    prev = jnp.where(row % Wq == 0, jnp.zeros_like(hm),
                     _sublane_roll(hm, 1))
    ev = jnp.maximum(t1, _lane_roll(prev, C))      # lanes 0:C valid
    t2 = jnp.maximum(t1, _lane_roll(t1, -C))       # lanes C:2C valid
    lane = jax.lax.broadcasted_iota(jnp.int32, ev.shape, ev.ndim - 1)
    return jnp.where(lane < C, ev, t2)[:, :2 * C]


def _kernel_body(x_hbm, w_ref, s_ref, b_ref, stem_hbm, pool_hbm,
                 ring, cring, sstage, pstage,
                 in_sems, s_sems, p_sems, *,
                 D2: int, HWq: int, Wq: int, O: int):
    b = pl.program_id(0)

    def in_dma(di):
        slot = jax.lax.rem(di, 5)
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(di, 1)], ring.at[pl.ds(slot, 1)],
            in_sems.at[slot])

    # slot 5 stays all-zero: the d < 0 / d >= D2 virtual planes
    ring[pl.ds(5, 1)] = jnp.zeros_like(ring[pl.ds(5, 1)])
    in_dma(0).start()
    in_dma(1).start()

    def loop(d, carry):
        @pl.when(d + 2 < D2)
        def _():
            in_dma(d + 2).start()

        @pl.when(d + 1 < D2)
        def _():
            in_dma(d + 1).wait()

        @pl.when(d == 0)
        def _():
            in_dma(0).wait()

        acc = jnp.zeros((HWq, O), jnp.float32)
        for kd in range(4):
            di = d + kd - 2
            slot = jnp.where((di >= 0) & (di < D2),
                             jax.lax.rem(jnp.maximum(di, 0), 5), 5)
            plane = ring[pl.ds(slot, 1)][0]          # (HWq, 384)
            acc = acc + jnp.dot(plane, w_ref[kd],
                                preferred_element_type=jnp.float32)
        y = jnp.maximum(acc * s_ref[...] + b_ref[...], 0.0)
        y = y.astype(cring.dtype)                    # (HWq, O)

        cring[pl.ds(jax.lax.rem(d, 3), 1)] = y.reshape(1, HWq, O)

        # stem plane out (2-slot staging; planes ride HBM flattened to
        # (H2*Wq, O) so the DMA's second-minor dim is 8-aligned — Mosaic
        # rejects a raw Wq = 36 slice)
        ss = jax.lax.rem(d, 2)

        @pl.when(d >= 2)
        def _():
            pltpu.make_async_copy(sstage.at[pl.ds(ss, 1)],
                                  stem_hbm.at[b, pl.ds(d - 2, 1)],
                                  s_sems.at[ss]).wait()
        sstage[pl.ds(ss, 1)] = y.reshape(1, HWq, O)
        pltpu.make_async_copy(sstage.at[pl.ds(ss, 1)],
                              stem_hbm.at[b, pl.ds(d, 1)],
                              s_sems.at[ss]).start()

        # pooled plane out on odd d: conv planes d-2, d-1, d (post-ReLU,
        # so the d = -1 boundary is an exact zero plane)
        @pl.when(jax.lax.rem(d, 2) == 1)
        def _():
            do = (d - 1) // 2
            pm1 = jnp.where(
                d >= 3, cring[pl.ds(jax.lax.rem(jnp.maximum(d - 2, 0), 3),
                                    1)][0],
                jnp.zeros((HWq, O), cring.dtype))
            p = jnp.maximum(pm1, jnp.maximum(
                cring[pl.ds(jax.lax.rem(d - 1, 3), 1)][0],
                cring[pl.ds(jax.lax.rem(d, 3), 1)][0]))
            res = _pool_flat(p, Wq, O // 4)
            ps = jax.lax.rem(do, 2)

            @pl.when(do >= 2)
            def _():
                pltpu.make_async_copy(pstage.at[pl.ds(ps, 1)],
                                      pool_hbm.at[b, pl.ds(do - 2, 1)],
                                      p_sems.at[ps]).wait()
            pstage[pl.ds(ps, 1)] = res.reshape(1, HWq, O // 2)
            pltpu.make_async_copy(pstage.at[pl.ds(ps, 1)],
                                  pool_hbm.at[b, pl.ds(do, 1)],
                                  p_sems.at[ps]).start()
        return carry

    jax.lax.fori_loop(0, D2, loop, 0)
    # drain the last two stem + pooled DMAs
    pltpu.make_async_copy(sstage.at[pl.ds((D2 - 2) % 2, 1)],
                          stem_hbm.at[b, pl.ds(D2 - 2, 1)],
                          s_sems.at[(D2 - 2) % 2]).wait()
    pltpu.make_async_copy(sstage.at[pl.ds((D2 - 1) % 2, 1)],
                          stem_hbm.at[b, pl.ds(D2 - 1, 1)],
                          s_sems.at[(D2 - 1) % 2]).wait()
    Dp = D2 // 2
    pltpu.make_async_copy(pstage.at[pl.ds((Dp - 2) % 2, 1)],
                          pool_hbm.at[b, pl.ds(Dp - 2, 1)],
                          p_sems.at[(Dp - 2) % 2]).wait()
    pltpu.make_async_copy(pstage.at[pl.ds((Dp - 1) % 2, 1)],
                          pool_hbm.at[b, pl.ds(Dp - 1, 1)],
                          p_sems.at[(Dp - 1) % 2]).wait()


def fused_stem_pool(x: jax.Array, kernel: jax.Array,
                    mul: jax.Array, add: jax.Array,
                    dtype=jnp.bfloat16, interpret: bool = False):
    """Fused conv1+bn1+relu+maxpool (gate with :func:`supports_fused_stem`).

    ``x`` (B, D, H, W, 1) raw volume; ``kernel`` the logical (7,7,7,1,F)
    stem weights; ``mul``/``add`` the folded BN eval affine (F,) f32.
    Returns ``(stem_quad, pooled_pair)``: the quad-lane (B, D/2, H/2,
    W/8, 4F) post-ReLU stem and the (B, D/4, H/4, W/8, 2F) W-pair packed
    pooled activation (``models.packed.unpack_w`` restores NDHWC).
    """
    from ..models.packed import _s2d_stem_map

    B, D, H, W, cin = x.shape
    F = kernel.shape[-1]
    assert cin == 1 and F == 64, (cin, F)
    D2, H2, Wq = D // 2, H // 2, W // 8
    HWq = H2 * Wq
    O = 4 * F

    xg = x.astype(dtype).reshape(B, D2, 2, H2, 2, Wq, 8)
    xg = xg.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, D2, H2, Wq, 32)
    x12 = _stack_taps(xg)

    # (343, ed*eh*ew*32*nj) map -> packed kernel (4, 4, 3, 32, 256) ->
    # matmul rows ordered (kw, kh, c) to match the stacked lane layout
    m = jnp.asarray(_s2d_stem_map((2, 2, 8)), dtype)
    kp = jnp.einsum("ks,ko->so", m, kernel.astype(dtype).reshape(343, F)
                    ).reshape(4, 4, 3, 32, O)
    w4 = kp.transpose(0, 2, 1, 3, 4).reshape(4, 384, O)
    s4 = jnp.tile(mul.astype(jnp.float32), 4).reshape(1, O)
    b4 = jnp.tile(add.astype(jnp.float32), 4).reshape(1, O)

    body = functools.partial(_kernel_body, D2=D2, HWq=HWq, Wq=Wq, O=O)
    stem, pooled = pl.pallas_call(
        body,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)],
        # output planes ride HBM flattened to (H2*Wq, O): Wq itself (36 at
        # deployment W=288) is not 8-aligned on the second-minor dim, which
        # Mosaic rejects for DMA slices; H2*Wq is, and the NDHWC reshape
        # below is free on the contiguous layout
        out_shape=[jax.ShapeDtypeStruct((B, D2, HWq, O), dtype),
                   jax.ShapeDtypeStruct((B, D2 // 2, HWq, 2 * F), dtype)],
        scratch_shapes=[
            pltpu.VMEM((6, HWq, 384), dtype),        # tap-stacked ring
            pltpu.VMEM((3, HWq, O), dtype),          # conv-plane ring
            pltpu.VMEM((2, HWq, O), dtype),          # stem staging
            pltpu.VMEM((2, HWq, 2 * F), dtype),      # pooled staging
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=52 * 1024 * 1024),
        interpret=interpret,
    )(x12, w4, s4, b4)
    stem = stem.reshape(B, D2, H2, Wq, O)
    # pooled rows j % (2*Wq) >= Wq are don't-care (odd H rows of each
    # pair) — slice them off on the small 2F-lane tensor
    pooled = pooled.reshape(B, D2 // 2, H2 // 2, 2 * Wq, 2 * F)[
        :, :, :, :Wq, :]
    return stem, pooled
