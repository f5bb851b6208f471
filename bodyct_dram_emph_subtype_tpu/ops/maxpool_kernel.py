"""Pallas TPU kernel: k=3 s=2 p=1 max-pool on NDHWC activations.

XLA's ``reduce_window`` runs the stem maxpool at ~14x off the HBM roofline
on the v5e (measured 10.6 ms for the B=4 deployment shape against ~0.8 ms
of traffic; the separable and W-pair XLA reformulations are no better —
``benchmarks/tail_probe.py``).  This kernel streams depth planes once and
does the whole 3-axis window in VMEM:

- **D**: a rolling 5-slot ring of input planes; each output plane
  max-reduces the three planes ``2*do-1 .. 2*do+1`` (the ``d = -1``
  boundary is a ``-inf`` select, not a stored plane).
- **H**: the plane is viewed as (H/2, 2, Wq, 4C) so the stride-2 window is
  ``max(odd[i-1], even[i], odd[i])`` — one sublane-major shift, no strided
  access.
- **W**: positions ride the lane dim in quads (Wq = W/4, lanes (pos, c)).
  With ``t1 = max(A, roll(A, -C))`` the even/odd output taps become single
  lane-block reads, and the result lands directly in the W-pair packed
  layout (lanes (parity, c)) — ``models.packed.unpack_w`` (a free reshape)
  restores NDHWC.

Reference op: ``MaxPool3d(3, 2, 1)`` (``med3d.py:206``).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def supports_maxpool_pallas(shape: Tuple[int, ...], itemsize: int = 2,
                            vmem_budget: int = 13 * 1024 * 1024) -> bool:
    """(B, D, H, W, C) gate: even D/H, W % 4 == 0, lane-tile-aligned quad
    lanes, even C (the lane roll bitcasts to i32), and the plane ring must
    fit VMEM."""
    if len(shape) != 5:
        return False
    b, d, h, w, c = shape
    # d >= 4: the kernel's two-slot output-stage drain indexes D2-2
    if d < 4 or d % 2 or h % 2 or w % 4 or (4 * c) % 128 or c % 2:
        return False
    plane = (h // 2) * 2 * (w // 4) * 4 * c
    stage = 2 * (h // 2) * _round_up(w // 4, 8) * 2 * c
    return (5 * plane + stage) * itemsize <= vmem_budget


def _lane_roll(x, c: int):
    """Static lane roll at any element width (Mosaic's rotate is 32-bit
    only on chip — same bitcast trick as ``ops/roll_conv.py``).

    ``pltpu.bitcast`` to a wider type packs along the SECOND-MINOR dim
    (lane count unchanged, both on chip and in interpret — verified by
    direct probe), so the i32 view is rolled by the ORIGINAL lane count
    ``c``, not ``c`` scaled by the width ratio."""
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, c % x.shape[-1], x.ndim - 1)
    assert x.shape[-2] % (4 // x.dtype.itemsize) == 0
    i32 = pltpu.bitcast(x, jnp.int32)
    return pltpu.bitcast(
        pltpu.roll(i32, c % i32.shape[-1], x.ndim - 1), x.dtype)


def _pool_hw(p, C: int, fill):
    """H and W pool stages on a depth-maxed (H2, 2, Wq, 4C) quad plane ->
    (H2, Wq, 2C) W-pair packed.  ``fill`` is the boundary value (-inf in
    general; 0 suffices for post-ReLU activations)."""
    H2, _, Wq, C4 = p.shape
    # H: max(odd[i-1], even[i], odd[i])
    even = p[:, 0]
    odd = p[:, 1]
    odd_up = jnp.concatenate(
        [jnp.full((1, Wq, C4), fill, p.dtype), odd[:-1]], axis=0)
    hm = jnp.maximum(even, jnp.maximum(odd, odd_up))  # (H2, Wq, 4C)
    # W: quad lanes (pos, c).  t1 block l = max(A.l, A.l+1); the previous
    # quad contributes its last position to the even tap.
    t1 = jnp.maximum(hm, _lane_roll(hm, -C))
    prev = jnp.concatenate(
        [jnp.full((H2, 1, C4), fill, p.dtype), hm[:, :-1]], axis=1)
    ev = jnp.maximum(t1, _lane_roll(prev, C))      # lanes 0:C valid
    t2 = jnp.maximum(t1, _lane_roll(t1, -C))       # lanes C:2C valid
    lane = jax.lax.broadcasted_iota(jnp.int32, ev.shape, ev.ndim - 1)
    return jnp.where(lane < C, ev, t2)[:, :, :2 * C]


def _kernel(x_hbm, out_hbm, ring, stage, in_sems, out_sems, *,
            D2: int, H2: int, Wq: int, C: int, WoP: int):
    b = pl.program_id(0)
    C4 = 4 * C
    minf = float("-inf")

    def in_dma(di):
        slot = jax.lax.rem(di, 5)
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(di, 1)], ring.at[pl.ds(slot, 1)],
            in_sems.at[slot])

    in_dma(0).start()
    in_dma(1).start()

    def loop(do, carry):
        # prefetch the next output's two planes (5-slot rotation: their
        # slots never collide with this step's three reads)
        @pl.when(2 * do + 2 < 2 * D2)
        def _():
            in_dma(2 * do + 2).start()

        @pl.when(2 * do + 3 < 2 * D2)
        def _():
            in_dma(2 * do + 3).start()

        in_dma(2 * do).wait()
        in_dma(2 * do + 1).wait()

        sm1 = jnp.where(do == 0, 0, jax.lax.rem(2 * do - 1, 5))
        pm1 = jnp.where(do == 0, minf, ring[pl.ds(sm1, 1)][0])
        p = jnp.maximum(pm1, jnp.maximum(
            ring[pl.ds(jax.lax.rem(2 * do, 5), 1)][0],
            ring[pl.ds(jax.lax.rem(2 * do + 1, 5), 1)][0]))
        res = _pool_hw(p, C, minf)

        sslot = jax.lax.rem(do, 2)

        @pl.when(do >= 2)
        def _():
            pltpu.make_async_copy(stage.at[pl.ds(sslot, 1)],
                                  out_hbm.at[b, pl.ds(do - 2, 1)],
                                  out_sems.at[sslot]).wait()
        stage[pl.ds(sslot, 1), :, :Wq] = res.reshape(1, H2, Wq, 2 * C)
        pltpu.make_async_copy(stage.at[pl.ds(sslot, 1)],
                              out_hbm.at[b, pl.ds(do, 1)],
                              out_sems.at[sslot]).start()
        return carry

    jax.lax.fori_loop(0, D2, loop, 0)
    pltpu.make_async_copy(stage.at[pl.ds((D2 - 2) % 2, 1)],
                          out_hbm.at[b, pl.ds(D2 - 2, 1)],
                          out_sems.at[(D2 - 2) % 2]).wait()
    pltpu.make_async_copy(stage.at[pl.ds((D2 - 1) % 2, 1)],
                          out_hbm.at[b, pl.ds(D2 - 1, 1)],
                          out_sems.at[(D2 - 1) % 2]).wait()


def supports_maxpool_quads(shape: Tuple[int, ...], itemsize: int = 2,
                           vmem_budget: int = 13 * 1024 * 1024) -> bool:
    """Gate for :func:`max_pool_quads` on a quad-lane (B, D, H, Wq, 4C)
    activation — the NDHWC gate evaluated on the logical shape."""
    if len(shape) != 5 or shape[-1] % 4:
        return False
    b, d, h, wq, c4 = shape
    return supports_maxpool_pallas((b, d, h, 4 * wq, c4 // 4), itemsize,
                                   vmem_budget)


def max_pool_quads(xq: jax.Array, interpret: bool = False):
    """k3 s2 p1 max-pool on a QUAD-LANE activation, W-pair packed output.

    ``xq`` is (B, D, H, Wq, 4C) with lane ``j*C + c`` holding logical
    position ``w = 4*wq + j`` — the native output layout of the s2d stem
    conv (``models/packed.py::StemConvS2D(quad_output=True)``), consumed
    here with NO relayout (the 64-lane NDHWC round-trip costs ~6 ms at
    the stem shape, ``benchmarks/maxpool_probe3.py``: pool 12.9 ms via
    the NDHWC entry vs 6.7 quad-resident).  Returns (B, D/2, H/2, Wq, 2C)
    in the W-pair packed layout (lane ``parity*C + c``, logical pooled
    ``w = 2*wq + parity``); ``models.packed.unpack_w`` restores NDHWC.
    """
    B, D, H, Wq, C4 = xq.shape
    C = C4 // 4
    D2, H2 = D // 2, H // 2
    WqP = _round_up(Wq, 8)
    if WqP != Wq:
        # Mosaic DMAs slice the second-minor (quad) dim — it must be
        # 8-aligned, so pad with -inf quads (ignored by every max)
        xq = jnp.pad(xq, ((0, 0),) * 3 + ((0, WqP - Wq), (0, 0)),
                     constant_values=-jnp.inf)
    xv = xq.reshape(B, D, H2, 2, WqP, C4)
    body = functools.partial(_kernel, D2=D2, H2=H2, Wq=WqP, C=C, WoP=WqP)
    out = pl.pallas_call(
        body,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, D2, H2, WqP, 2 * C), xq.dtype),
        scratch_shapes=[
            pltpu.VMEM((5, H2, 2, WqP, C4), xq.dtype),
            pltpu.VMEM((2, H2, WqP, 2 * C), xq.dtype),
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the ring + compute temporaries exceed XLA's conservative 16 MB
        # scoped-vmem default; the v5e has far more physical VMEM
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(xv)
    return out[:, :, :, :Wq]


def max_pool_k3s2p1_pallas(x: jax.Array, interpret: bool = False):
    """(B, D, H, W, C) -> (B, D/2, H/2, W/2, C) max-pool (k3 s2 p1).
    Gate with :func:`supports_maxpool_pallas`."""
    B, D, H, W, C = x.shape
    D2, H2, Wq = D // 2, H // 2, W // 4
    out = max_pool_quads(x.reshape(B, D, H, Wq, 4 * C), interpret=interpret)
    return out.reshape(B, D2, H2, Wq * 2, C)
