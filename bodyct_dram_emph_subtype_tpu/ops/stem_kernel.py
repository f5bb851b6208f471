"""Pallas TPU kernel: fused stem conv + BN + ReLU + k3s2p1 max-pool.

The model's k=7 stride-2 stem conv (reference ``med3d.py:198-206``:
conv1 + bn1 + relu + maxpool) is the single most off-roofline region of
the forward pass: XLA runs the (2,2,8) space-to-depth conv form at ~62
TF/s gross (13.0 ms at the B=4 deployment shape), then pays a 528 MB
materialize + an off-roofline pool (region total ~31.4 ms chained,
``benchmarks/maxpool_probe{,3}.py``) against a ~6 ms floor.

This kernel runs the whole region in one pass:

- **input**: the s2d (2,2,8) grid, kh-STACKED in the lane dim by XLA
  (``_stack_kh``): lane ``kh*32 + c`` of plane (B, D2, H2, WqH, 128)
  holds ``xg[d, h + kh - 2, wb - 1, c]`` (zero halos baked in).  The
  height taps therefore live IN the lanes and the W taps are whole
  128-lane blocks — the per-depth-tap im2col is three lane-ALIGNED
  VMEM copies, no sub-tile lane surgery.
- **conv**: per output plane, 4 matmuls (H2*Wq, 384) @ (384, 256) — one
  per depth tap ``kd`` — accumulated in f32.  Same gross FLOPs as the
  XLA lowering (the (2,2,8) map is 343/1536 dense) but at rolling-ring
  MFU with the DMA double-buffered behind the matmuls.
- **epilogue**: folded BN affine + ReLU (quad-tiled (256,) vectors).
- **pool**: a 3-slot ring of conv planes stays in VMEM; every odd plane
  emits a pooled plane via the shared H/W stages
  (``maxpool_kernel._pool_hw``; post-ReLU, so zero boundary fill is
  exact).  The 528 MB stem activation is WRITTEN once (the decoder skip
  needs it) and never re-read for pooling.

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

from .maxpool_kernel import _pool_hw


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def supports_fused_stem(shape: Tuple[int, ...], features: int = 64,
                        itemsize: int = 2,
                        vmem_budget: int = 40 * 1024 * 1024) -> bool:
    """(B, D, H, W, 1) NDHWC input gate: (2,2,8)-divisible dims, pool-even
    outputs, and the plane ring + patch + accumulators must fit VMEM."""
    if len(shape) != 5 or shape[-1] != 1 or features != 64:
        return False
    b, d, h, w, _ = shape
    if d % 4 or h % 4 or w % 8 or d < 16:
        return False
    d2, h2, wq = d // 2, h // 2, w // 8
    wqh = _round_up(wq + 2, 8)
    o = 4 * features
    ring = 7 * h2 * wqh * 128 * itemsize
    patch = h2 * wq * 384 * itemsize
    acc = h2 * wq * o * 4
    cring = 3 * h2 * wq * o * itemsize
    sstage = 2 * h2 * wq * o * itemsize
    pstage = 2 * (h2 // 2) * wq * 2 * features * itemsize
    weights = 4 * 384 * o * itemsize
    return (ring + patch + acc + cring + sstage + pstage
            + weights) <= vmem_budget


def _stack_kh(xg: jax.Array, wqh: int) -> jax.Array:
    """(B, D2, H2, Wq, 32) s2d grid -> (B, D2, H2, WqH, 128) with the four
    height taps stacked in lanes (lane kh*32+c = row h+kh-2) and the W
    halo baked in (data at wb index 1..Wq, zeros elsewhere)."""
    b, d2, h2, wq, c = xg.shape
    xh = jnp.pad(xg, ((0, 0), (0, 0), (2, 1), (0, 0), (0, 0)))
    x4 = jnp.concatenate([xh[:, :, kh:kh + h2] for kh in range(4)], -1)
    return jnp.pad(x4, ((0, 0), (0, 0), (0, 0),
                        (1, wqh - wq - 1), (0, 0)))


def _kernel_body(x_hbm, w_ref, s_ref, b_ref, stem_hbm, pool_hbm,
                 ring, patch, cring, sstage, pstage,
                 in_sems, s_sems, p_sems, *,
                 D2: int, H2: int, Wq: int, WqH: int, O: int):
    b = pl.program_id(0)
    HWq = H2 * Wq

    def in_dma(di):
        slot = jax.lax.rem(di, 6)
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(di, 1)], ring.at[pl.ds(slot, 1)],
            in_sems.at[slot])

    # slot 6 stays all-zero: the d < 0 / d >= D2 virtual planes
    ring[pl.ds(6, 1)] = jnp.zeros_like(ring[pl.ds(6, 1)])
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
                             jax.lax.rem(jnp.maximum(di, 0), 6), 6)
            plane = ring[pl.ds(slot, 1)][0]          # (H2, WqH, 128)
            for kw in range(3):
                patch[:, :, kw * 128:(kw + 1) * 128] = \
                    plane[:, kw:kw + Wq, :]
            acc = acc + jnp.dot(patch[...].reshape(HWq, 384), w_ref[kd],
                                preferred_element_type=jnp.float32)
        y = jnp.maximum(acc * s_ref[...] + b_ref[...], 0.0)
        y = y.astype(cring.dtype).reshape(1, H2, Wq, O)

        cring[pl.ds(jax.lax.rem(d, 3), 1)] = y

        # stem plane out (2-slot staging)
        ss = jax.lax.rem(d, 2)

        @pl.when(d >= 2)
        def _():
            pltpu.make_async_copy(sstage.at[pl.ds(ss, 1)],
                                  stem_hbm.at[b, pl.ds(d - 2, 1)],
                                  s_sems.at[ss]).wait()
        sstage[pl.ds(ss, 1)] = y
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
                jnp.zeros((H2, Wq, O), cring.dtype))
            p = jnp.maximum(pm1, jnp.maximum(
                cring[pl.ds(jax.lax.rem(d - 1, 3), 1)][0],
                cring[pl.ds(jax.lax.rem(d, 3), 1)][0]))
            res = _pool_hw(p.reshape(H2 // 2, 2, Wq, O), O // 4, 0.0)
            ps = jax.lax.rem(do, 2)

            @pl.when(do >= 2)
            def _():
                pltpu.make_async_copy(pstage.at[pl.ds(ps, 1)],
                                      pool_hbm.at[b, pl.ds(do - 2, 1)],
                                      p_sems.at[ps]).wait()
            pstage[pl.ds(ps, 1)] = res.reshape(1, H2 // 2, Wq, O // 2)
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
    WqH = _round_up(Wq + 2, 8)
    O = 4 * F

    xg = x.astype(dtype).reshape(B, D2, 2, H2, 2, Wq, 8)
    xg = xg.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, D2, H2, Wq, 32)
    x4 = _stack_kh(xg, WqH)

    # (343, ed*eh*ew*32*nj) map -> packed kernel (4, 4, 3, 32, 256) ->
    # matmul rows ordered (kw, kh, c) to match the patch lane layout
    m = jnp.asarray(_s2d_stem_map((2, 2, 8)), dtype)
    kp = jnp.einsum("ks,ko->so", m, kernel.astype(dtype).reshape(343, F)
                    ).reshape(4, 4, 3, 32, O)
    w4 = kp.transpose(0, 2, 1, 3, 4).reshape(4, 384, O)
    s4 = jnp.tile(mul.astype(jnp.float32), 4).reshape(1, O)
    b4 = jnp.tile(add.astype(jnp.float32), 4).reshape(1, O)

    body = functools.partial(_kernel_body, D2=D2, H2=H2, Wq=Wq, WqH=WqH,
                             O=O)
    stem, pooled = pl.pallas_call(
        body,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)],
        out_shape=[jax.ShapeDtypeStruct((B, D2, H2, Wq, O), dtype),
                   jax.ShapeDtypeStruct((B, D2 // 2, H2 // 2, Wq, 2 * F),
                                        dtype)],
        scratch_shapes=[
            pltpu.VMEM((7, H2, WqH, 128), dtype),       # kh-stacked ring
            pltpu.VMEM((H2, Wq, 384), dtype),           # per-tap patch
            pltpu.VMEM((3, H2, Wq, O), dtype),          # conv-plane ring
            pltpu.VMEM((2, H2, Wq, O), dtype),          # stem staging
            pltpu.VMEM((2, H2 // 2, Wq, 2 * F), dtype),  # pooled staging
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x4, w4, s4, b4)
    return stem, pooled
