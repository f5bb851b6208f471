"""Pallas TPU kernel: whole-layer1 residual stack resident in VMEM.

The trunk prefix truth table (``benchmarks/trunk_prefix_probe.py``, B=4
bf16 chained) puts layer1 at **18.2 ms** against a ~6 ms roofline —
while layer3/4 run at 177-211 TF/s (no headroom).  layer1's 64-channel
convs at (32, 56, 72) are too small for the streaming rolling-ring
kernel (DMA-bound at 8.3 M elements, measured neutral in-model,
DEVNOTES round 3b) and XLA runs them at ~20% MFU with six 33 MB
HBM round-trips between the convs.

This kernel exploits the one property the streaming kernels can't: the
ENTIRE per-item activation is 16.5 MB W-pair packed — the whole layer
fits in VMEM.  One pallas_call per batch item:

- one bulk DMA in (the halo'd packed volume, ~23 MB),
- NB residual blocks x (conv1+BN+ReLU -> conv2+BN -> +residual -> ReLU)
  computed plane-by-plane with the production rolling-ring patch scheme
  (``ops/roll_conv.py``: W-pair packed lanes, compact K=4C tap
  matrices, height taps as free major-dim patch rows),
- conv outputs go back into the halo'd layout with ONE f32 W-roll(+1)
  + boundary mask per plane (the patch alignment shifts the output one
  packed column left; rolling restores it so every conv reads the same
  layout),
- conv2 writes IN PLACE over the block input volume (the residual add
  consumes A[d] in the same step), so two volumes ping-pong the whole
  stack,
- one bulk DMA out.

Intermediate activations never touch HBM: traffic is 23 MB in + 17 MB
out per item vs ~400 MB for the unfused path.  Eval-only (BN folded to
affines); training keeps the standard path.  Reference layer:
``med3d.py:115-144,199-209`` (layer1 = 2-3 BasicBlocks, 64 planes).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .maxpool_kernel import _pool_hw
from .roll_conv import _edge_block, build_roll_weights_compact


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def supports_fused_layer1(xp_shape: Tuple[int, ...], planes: int,
                          n_blocks: int, itemsize: int = 2,
                          vmem_budget: int = 58 * 1024 * 1024) -> bool:
    """``xp_shape`` is the PACKED (B, D, H, Wh, 2C) layer input.  Needs
    identity residuals (2*planes == 2C, full lane tiles — layer1's 128
    and layer2-tail's 256 both qualify), the compact patch scheme,
    whole-W residency, and two halo'd volumes in VMEM."""
    if len(xp_shape) != 5 or n_blocks < 1:
        return False
    b, d, h, wh, c2 = xp_shape
    if c2 not in (128, 256) or 2 * planes != c2 or d < 4:
        return False
    wt = _round_up(wh + 1, 8)
    wtp = _round_up(wt + 2, 8)
    hp = h + 2
    vol = (d + 2) * hp * wtp * c2 * itemsize
    patch = hp * wt * 2 * c2 * itemsize
    weights = 2 * n_blocks * 9 * 2 * c2 * c2 * itemsize
    acc = h * wt * c2 * 4
    return 2 * vol + patch + weights + 2 * acc <= vmem_budget


def _conv_phase(A, Bv, patch, w_ref, sc_ref, sh_ref, *, D: int, H: int,
                Wh: int, WT: int, C2: int, NB: int):
    """The residual-stack conv passes over a filled halo'd volume A."""
    # post-roll layout: data at cols 1..Wh; col 0 (wrap-in) and cols
    # >= Wh+1 (partial/affine-only windows) are garbage -> zero
    col = jax.lax.broadcasted_iota(jnp.int32, (1, WT, 1), 1)
    edge = (col == 0) | (col >= Wh + 1)

    def conv_pass(ci, src, dst, relu, residual):
        """One conv+affine(+relu / +residual+relu) sweep src -> dst."""

        def plane_loop(od, carry):
            acc = jnp.zeros((H * WT, C2), jnp.float32)
            for dd in range(3):
                plane = src[pl.ds(od + dd, 1)][0]      # (HP, WTP, C2)
                patch[:, :, 0:C2] = plane[:, 1:1 + WT, :]
                patch[:, :, C2:2 * C2] = _edge_block(plane, WT, C2)
                for dh in range(3):
                    a = patch[pl.ds(dh, H)].reshape(H * WT, 2 * C2)
                    acc = acc + jnp.dot(a, w_ref[ci, dd, dh],
                                        preferred_element_type=jnp.float32)
            acc = acc * sc_ref[ci] + sh_ref[ci]
            if relu:
                acc = jnp.maximum(acc, 0.0)
            # the patch alignment yields output packed-col j at acc col j;
            # the halo'd layout stores data at col j+1 — roll +1 and zero
            # the wrapped/garbage columns (0 and >= Wh+1)
            y = pltpu.roll(acc.reshape(H, WT, C2), 1, 1)
            y = jnp.where(edge, 0.0, y)
            if residual:
                y = y + A[pl.ds(od + 1, 1)][0][1:1 + H, 0:WT].astype(
                    jnp.float32)
                y = jnp.maximum(y, 0.0)
            dst[pl.ds(od + 1, 1), pl.ds(1, H), pl.ds(0, WT)] = \
                y.astype(dst.dtype).reshape(1, H, WT, C2)
            return carry

        jax.lax.fori_loop(0, D, plane_loop, 0)

    for i in range(NB):
        conv_pass(2 * i, A, Bv, relu=True, residual=False)
        conv_pass(2 * i + 1, Bv, A, relu=False, residual=True)


def _kernel_body(x_hbm, w_ref, sc_ref, sh_ref, out_hbm, A, Bv, patch,
                 in_sem, out_sem, *, D: int, H: int, Wh: int, WT: int,
                 WTP: int, C2: int, NB: int):
    b = pl.program_id(0)

    # halo planes + the scratch volume start all-zero; the bulk input DMA
    # fills A[1:D+1] (the XLA-side pad supplies the H/W halos)
    A[pl.ds(0, 1)] = jnp.zeros_like(A[pl.ds(0, 1)])
    A[pl.ds(D + 1, 1)] = jnp.zeros_like(A[pl.ds(D + 1, 1)])
    Bv[...] = jnp.zeros_like(Bv[...])
    pltpu.make_async_copy(x_hbm.at[b], A.at[pl.ds(1, D)], in_sem).start()
    pltpu.make_async_copy(x_hbm.at[b], A.at[pl.ds(1, D)], in_sem).wait()

    _conv_phase(A, Bv, patch, w_ref, sc_ref, sh_ref, D=D, H=H, Wh=Wh,
                WT=WT, C2=C2, NB=NB)

    pltpu.make_async_copy(
        A.at[pl.ds(1, D), pl.ds(1, H), pl.ds(0, WT)],
        out_hbm.at[b], out_sem).start()
    pltpu.make_async_copy(
        A.at[pl.ds(1, D), pl.ds(1, H), pl.ds(0, WT)],
        out_hbm.at[b], out_sem).wait()


def fused_layer1(xp: jax.Array,
                 kernels: Sequence[jax.Array],
                 muls: Sequence[jax.Array],
                 adds: Sequence[jax.Array],
                 interpret: bool = False) -> jax.Array:
    """Whole-layer residual stack on a packed (B, D, H, Wh, 2C) input.

    ``kernels``: 2*NB logical (3,3,3,C,C) conv kernels in execution order
    (block0 conv1, block0 conv2, block1 conv1, ...); ``muls``/``adds``
    the matching folded BN eval affines ((C,) f32).  Returns the packed
    layer output, same shape as ``xp``.  Gate with
    :func:`supports_fused_layer1`.
    """
    B, D, H, Wh, C2 = xp.shape
    NB = len(kernels) // 2
    assert len(kernels) == len(muls) == len(adds) == 2 * NB
    # the stored (rolled) layout keeps data at cols 1..Wh, so the
    # computed width must reach col Wh
    WT = _round_up(Wh + 1, 8)
    WTP = _round_up(WT + 2, 8)
    HP = H + 2

    # halo'd layout: one zero packed col left, data at cols 1..Wh, zeros
    # out to WTP; one zero H row each side
    xpad = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (1, WTP - Wh - 1), (0, 0)))

    w = jnp.stack([build_roll_weights_compact(k.astype(xp.dtype))
                   for k in kernels])          # (2NB, 3, 3, 2C2, C2)
    sc = jnp.stack([jnp.tile(m.astype(jnp.float32), 2).reshape(1, C2)
                    for m in muls])
    sh = jnp.stack([jnp.tile(a.astype(jnp.float32), 2).reshape(1, C2)
                    for a in adds])

    body = functools.partial(_kernel_body, D=D, H=H, Wh=Wh, WT=WT,
                             WTP=WTP, C2=C2, NB=NB)
    out = pl.pallas_call(
        body,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, D, H, WT, C2), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((D + 2, HP, WTP, C2), xp.dtype),   # volume A
            pltpu.VMEM((D + 2, HP, WTP, C2), xp.dtype),   # volume B
            pltpu.VMEM((HP, WT, 2 * C2), xp.dtype),       # tap patch
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xpad, w, sc, sh)
    # the halo'd layout stores data at packed cols 1..Wh
    return out[:, :, :, 1:Wh + 1, :]


def supports_fused_pool_layer1(x_shape: Tuple[int, ...], planes: int,
                               n_blocks: int, itemsize: int = 2,
                               vmem_budget: int = 88 * 1024 * 1024) -> bool:
    """Gate for :func:`fused_pool_layer1` on the PRE-POOL NDHWC stem
    activation ``x_shape`` = (B, D, H, W, C).  Requires the pool to land
    on the 128-lane identity-residual regime (C == planes == 64) and the
    conv-phase volumes PLUS the pool plane ring to fit VMEM."""
    if len(x_shape) != 5 or n_blocks < 1:
        return False
    b, d, h, w, c = x_shape
    if c != planes or 2 * c != 128 or (4 * c) % 128:
        return False
    if d % 2 or h % 2 or w % 4 or d // 2 < 4:
        return False
    d2, h2, wq = d // 2, h // 2, w // 4
    c2 = 2 * c
    wt = _round_up(wq + 1, 8)
    wtp = _round_up(wt + 2, 8)
    hp = h2 + 2
    vol = (d2 + 2) * hp * wtp * c2 * itemsize
    patch = hp * wt * 2 * c2 * itemsize
    weights = 2 * n_blocks * 9 * 2 * c2 * c2 * itemsize
    acc = h2 * wt * c2 * 4
    n_slots = 9 if d2 % 2 == 0 else 5     # fat two-plane pool steps
    ring = n_slots * h2 * 2 * _round_up(wq, 8) * 4 * c * itemsize
    return 2 * vol + patch + weights + 2 * acc + ring <= vmem_budget


def _pool_kernel_body(x_hbm, w_ref, sc_ref, sh_ref, out_hbm, A, Bv, patch,
                      ring, in_sems, out_sem, *, D2: int, H2: int, Wq: int,
                      WqP: int, WT: int, C: int, NB: int,
                      pool_only: bool = False, fat: bool = False):
    """Pool fill (k3 s2 p1 max over streamed stem planes, post-ReLU so the
    boundary fill is 0) straight into the halo'd conv volume, then the
    residual-stack conv phase of :func:`_kernel_body`.

    ``fat`` (even D2): TWO output planes per loop step over a 9-slot ring
    — step j consumes input planes 4j-1..4j+3 and prefetches 4j+4..4j+7
    at the step top (slot distances 5..8 from the oldest live plane, so
    prefetch never aliases a live read — same safety argument as the
    5-slot rotation).  Halves the serialized step count (the pool's
    in-model cost is per-step DMA-wait/store latency, not bandwidth —
    DEVNOTES round 3e) and writes both planes with ONE contiguous store.
    """
    b = pl.program_id(0)
    C2 = 2 * C
    n_slots = 9 if fat else 5

    A[...] = jnp.zeros_like(A[...])      # halos + unwritten cols
    Bv[...] = jnp.zeros_like(Bv[...])

    def pool_dma(di):
        slot = jax.lax.rem(di, n_slots)
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(di, 1)], ring.at[pl.ds(slot, 1)],
            in_sems.at[slot])

    col = jax.lax.broadcasted_iota(jnp.int32, (1, WT, 1), 1)
    edge = (col == 0) | (col >= Wq + 1)

    def _ring_at(di):
        return ring[pl.ds(jax.lax.rem(di, n_slots), 1)][0]

    def _hw_plane(p):
        res = _pool_hw(p, C, 0.0)          # (H2, WqP, 2C), cols < Wq
        if WT > WqP:
            res = jnp.concatenate(
                [res, jnp.zeros((H2, WT - WqP, C2), res.dtype)], axis=1)
        return res

    def pool_step(do, carry):
        # 5-slot rotation: the prefetch slots ((2do+2) % 5, (2do+3) % 5)
        # never alias this step's three reads — an async refill of a
        # slot still being read would race (4 slots are NOT enough)
        @pl.when(2 * do + 2 < 2 * D2)
        def _():
            pool_dma(2 * do + 2).start()

        @pl.when(2 * do + 3 < 2 * D2)
        def _():
            pool_dma(2 * do + 3).start()

        pool_dma(2 * do).wait()
        pool_dma(2 * do + 1).wait()
        sm1 = jnp.where(do == 0, 0, jax.lax.rem(2 * do - 1, n_slots))
        pm1 = jnp.where(do == 0, 0.0, ring[pl.ds(sm1, 1)][0])
        p = jnp.maximum(pm1, jnp.maximum(_ring_at(2 * do),
                                         _ring_at(2 * do + 1)))

        res = _hw_plane(p)
        # store in the halo'd layout: data at packed cols 1..Wq.  The
        # sublane roll must run at 32 bits (chip dynamic_rotate is
        # 32-bit-only for sub-word dtypes, as in the conv phase).
        y = pltpu.roll(res.astype(jnp.float32), 1, 1)
        y = jnp.where(edge, 0.0, y)
        A[pl.ds(do + 1, 1), pl.ds(1, H2), pl.ds(0, WT)] = \
            y.astype(A.dtype).reshape(1, H2, WT, C2)
        return carry

    def pool_step2(j, carry):
        base = 4 * j
        for k in range(4, 8):              # next step's planes, step-top
            @pl.when(base + k < 2 * D2)
            def _(k=k):
                pool_dma(base + k).start()
        for k in range(4):
            pool_dma(base + k).wait()
        sm1 = jnp.where(j == 0, 0, jax.lax.rem(base - 1, n_slots))
        pm1 = jnp.where(j == 0, 0.0, ring[pl.ds(sm1, 1)][0])
        p1 = _ring_at(base + 1)
        dm0 = jnp.maximum(pm1, jnp.maximum(_ring_at(base), p1))
        dm1 = jnp.maximum(p1, jnp.maximum(_ring_at(base + 2),
                                          _ring_at(base + 3)))
        y = jnp.stack([_hw_plane(dm0), _hw_plane(dm1)])   # (2, H2, WT, C2)
        y = pltpu.roll(y.astype(jnp.float32), 1, 2)
        y = jnp.where(edge[None], 0.0, y)
        A[pl.ds(2 * j + 1, 2), pl.ds(1, H2), pl.ds(0, WT)] = \
            y.astype(A.dtype)
        return carry

    if fat:
        # planes 4..7 are started at step 0's own top — starting them here
        # too would double-start into the same slot/semaphore (a race)
        for di in range(4):
            pool_dma(di).start()
        jax.lax.fori_loop(0, D2 // 2, pool_step2, 0)
    else:
        pool_dma(0).start()
        pool_dma(1).start()
        jax.lax.fori_loop(0, D2, pool_step, 0)

    if not pool_only:          # debug hook: emit the pool fill itself
        _conv_phase(A, Bv, patch, w_ref, sc_ref, sh_ref, D=D2, H=H2,
                    Wh=Wq, WT=WT, C2=C2, NB=NB)

    pltpu.make_async_copy(
        A.at[pl.ds(1, D2), pl.ds(1, H2), pl.ds(0, WT)],
        out_hbm.at[b], out_sem).start()
    pltpu.make_async_copy(
        A.at[pl.ds(1, D2), pl.ds(1, H2), pl.ds(0, WT)],
        out_hbm.at[b], out_sem).wait()


def fused_pool_layer1(x: jax.Array,
                      kernels: Sequence[jax.Array],
                      muls: Sequence[jax.Array],
                      adds: Sequence[jax.Array],
                      interpret: bool = False,
                      pool_only: bool = False) -> jax.Array:
    """k3 s2 p1 max-pool + whole-layer1 residual stack in ONE Pallas pass.

    ``x`` is the POST-ReLU NDHWC stem activation (B, D, H, W, C) — values
    must be >= 0 (the pool boundary fill is 0).  The pool result never
    touches HBM: stem planes stream through a 4-slot VMEM ring, the
    3-axis max lands directly in the halo'd W-pair packed conv volume
    (``ops/maxpool_kernel.py`` pool math), and the residual stack runs
    VMEM-resident exactly as :func:`fused_layer1`.  Replaces the separate
    pool dispatch + pack + pad + bulk-DMA chain (~6.8 ms in-model pool at
    the deployment stem shape vs ~1 ms of streaming DMA).  Returns the
    packed (B, D/2, H/2, W/4, 2C) layer output.  Gate with
    :func:`supports_fused_pool_layer1`.  Reference ops:
    ``med3d.py:206`` (MaxPool3d(3, 2, 1)) + ``med3d.py:115-144`` (layer1).
    """
    B, D, H, W, C = x.shape
    return _fused_pool_layer1_quadview(
        x.reshape(B, D, H, W // 4, 4 * C), C, kernels, muls, adds,
        interpret=interpret, pool_only=pool_only)


def fused_pool_layer1_pair(xpair: jax.Array,
                           kernels: Sequence[jax.Array],
                           muls: Sequence[jax.Array],
                           adds: Sequence[jax.Array],
                           interpret: bool = False,
                           pool_only: bool = False) -> jax.Array:
    """:func:`fused_pool_layer1` from a W-PAIR packed stem activation
    (B, D, H, W/2, 2C) — e.g. ``StemConvS2D(pair_output=True)`` — instead
    of NDHWC.  The kernel's quad view (W/4, 4C) is the same flat order as
    the pair layout, so this is the identical pallas program fed by a
    cheaper (128→256 lane) retiling than NDHWC's 64→256."""
    B, D, H, Wp, C2 = xpair.shape
    assert Wp % 2 == 0 and C2 % 2 == 0
    return _fused_pool_layer1_quadview(
        xpair.reshape(B, D, H, Wp // 2, 2 * C2), C2 // 2, kernels, muls,
        adds, interpret=interpret, pool_only=pool_only)


def _fused_pool_layer1_quadview(xq: jax.Array, C: int,
                                kernels: Sequence[jax.Array],
                                muls: Sequence[jax.Array],
                                adds: Sequence[jax.Array],
                                interpret: bool = False,
                                pool_only: bool = False) -> jax.Array:
    B, D, H, Wq, C4 = xq.shape
    assert C4 == 4 * C
    NB = len(kernels) // 2
    assert len(kernels) == len(muls) == len(adds) == 2 * NB
    D2, H2 = D // 2, H // 2
    C2 = 2 * C
    WqP = _round_up(Wq, 8)
    WT = _round_up(Wq + 1, 8)
    WTP = _round_up(WT + 2, 8)
    HP = H2 + 2
    if WqP != Wq:
        # Mosaic DMAs slice the second-minor (quad) dim — 8-align it.
        # Zero pad quads are inert: pool col j only reads quads j-1, j,
        # so cols < Wq never see them (and cols >= Wq are masked).
        xq = jnp.pad(xq, ((0, 0),) * 3 + ((0, WqP - Wq), (0, 0)))
    xv = xq.reshape(B, D, H2, 2, WqP, C4)

    w = jnp.stack([build_roll_weights_compact(k.astype(xq.dtype))
                   for k in kernels])          # (2NB, 3, 3, 2C2, C2)
    sc = jnp.stack([jnp.tile(m.astype(jnp.float32), 2).reshape(1, C2)
                    for m in muls])
    sh = jnp.stack([jnp.tile(a.astype(jnp.float32), 2).reshape(1, C2)
                    for a in adds])

    fat = D2 % 2 == 0      # two-plane pool steps over a 9-slot ring
    n_slots = 9 if fat else 5
    body = functools.partial(_pool_kernel_body, D2=D2, H2=H2, Wq=Wq,
                             WqP=WqP, WT=WT, C=C, NB=NB,
                             pool_only=pool_only, fat=fat)
    out = pl.pallas_call(
        body,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, D2, H2, WT, C2), xq.dtype),
        scratch_shapes=[
            pltpu.VMEM((D2 + 2, HP, WTP, C2), xq.dtype),   # volume A
            pltpu.VMEM((D2 + 2, HP, WTP, C2), xq.dtype),   # volume B
            pltpu.VMEM((HP, WT, 2 * C2), xq.dtype),        # tap patch
            pltpu.VMEM((n_slots, H2, 2, WqP, C4), xq.dtype),  # plane ring
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(xv, w, sc, sh)
    return out[:, :, :, 1:Wq + 1, :]
