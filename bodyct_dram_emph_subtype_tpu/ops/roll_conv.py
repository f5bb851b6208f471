"""Pallas TPU kernel: packed-domain 3x3x3 conv with a rolling depth ring.

Third kernel generation for the decoder's sub-128-lane convs, built on the
round-3 measurements (DEVNOTES):

- XLA runs the decoder's 64-out convs at ~44-49 TF/s in-model and every
  XLA-level reformulation (packres 2x, packw 4/3-stride-2) pays its
  overhead back exactly — in-model layout assignment erases the isolated
  wins.  A Pallas kernel has a FIXED schedule: isolated == in-model.
- The round-3 ``tap_conv`` kernel lost to HBM read amplification (9x) and
  misaligned band extraction.  This kernel fixes both:

  * **read-once DMA**: grid over (batch, W-tiles); the kernel loops over
    depth with a 4-slot ring of halo'd planes in VMEM, double-buffering
    the next plane's DMA behind the current plane's matmuls.  Each input
    element is fetched from HBM once (plus a small W-tile halo).
  * **aligned taps**: activations are W-pair packed (``models/packed.py``
    layout, (B,D,H,Wh,2C)) so the three packed W-taps are *whole-lane*
    blocks — the patch build is 3 sublane-shift copies per depth tap, no
    lane slicing.  Height taps become row-offset slices of the SAME patch
    (major dim — free), depth taps select ring planes.
  * **full-lane matmuls**: 9 matmuls of (H*WT, 3*2C) @ (3*2C, 2O) per
    output plane — K >= 384, N = 128 for the model's 64-channel convs.

  Cost model: the packed-domain weight matrices are half structural zeros
  (2x the logical FLOPs — same as XLA's packres form), so beating XLA
  requires > ~100 TF/s gross, i.e. >= 50% MXU on (2688, 384, 128)-class
  matmuls with DMA fully hidden.

Weights per (dd, dh): rows (p-block, packed channel) x cols (o, oc) with
``W[(p+1)*2C + q*C + c, o*O + oc] = k[dd, dh, dw, c, oc]`` where
``dw = 2p + q - o + 1`` when 0 <= dw <= 2 (6 of 12 parity blocks nonzero
— the ``models/packed.py`` pairing table, transposed into matmul form).

Reference op: ``conv3x3x3`` (``med3d.py:91-100``) in the decoder
(``med3d.py:50-89,215-233``).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def build_roll_weights(kernel: jax.Array) -> jax.Array:
    """(3,3,3,C,O) logical kernel -> (3,3, 6C, 2O) packed tap matrices."""
    _, _, _, c, o = kernel.shape
    out = jnp.zeros((3, 3, 6 * c, 2 * o), kernel.dtype)
    for p in (-1, 0, 1):
        for q in (0, 1):
            for oo in (0, 1):
                dw = 2 * p + q - oo + 1
                if not 0 <= dw <= 2:
                    continue
                r0 = (p + 1) * 2 * c + q * c
                out = out.at[:, :, r0:r0 + c,
                             oo * o:(oo + 1) * o].set(kernel[:, :, dw])
    return out


def build_roll_weights_compact(kernel: jax.Array) -> jax.Array:
    """(3,3,3,C,O) logical kernel -> (3,3, 4C, 2O) compact tap matrices.

    The 6C scheme's weight matrices are half structural zeros (every
    (p, q) parity block feeds only one output parity).  The p = 0 packed
    column is the exception: BOTH its q halves feed BOTH output parities
    (oc0: dw=1 via q0, dw=2 via q1; oc1: dw=0 via q0, dw=1 via q1), so its
    (2C, 2O) block is fully dense.  The two edge taps (oc0/dw=0 from
    p=-1 q1 and oc1/dw=2 from p=+1 q0) are lane-rolled into ONE 2C block
    (see ``_edge_block``), leaving a single 25%-zero (2C, 2O) block.
    Net: K drops 6C -> 4C at identical logical output — 2/3 the MXU
    cycles of the 6C form."""
    _, _, _, c, o = kernel.shape
    out = jnp.zeros((3, 3, 4 * c, 2 * o), kernel.dtype)
    # p=0 block (rows 0:2C): dense
    out = out.at[:, :, 0:c, 0:o].set(kernel[:, :, 1])          # q0 -> oc0
    out = out.at[:, :, 0:c, o:2 * o].set(kernel[:, :, 0])      # q0 -> oc1
    out = out.at[:, :, c:2 * c, 0:o].set(kernel[:, :, 2])      # q1 -> oc0
    out = out.at[:, :, c:2 * c, o:2 * o].set(kernel[:, :, 1])  # q1 -> oc1
    # edge block (rows 2C:4C): lanes 0:C = p=-1 q1, lanes C:2C = p=+1 q0
    out = out.at[:, :, 2 * c:3 * c, 0:o].set(kernel[:, :, 0])  # -> oc0
    out = out.at[:, :, 3 * c:4 * c, o:2 * o].set(kernel[:, :, 2])
    return out


# Patch scheme: 'compact' (K=4C, lane-rolled edge block) when the roll
# shift qualifies, else the 6C form.  Overridable for A/B probes.
_PATCH_SCHEME = "auto"

# VMEM plan budget: how much scratch the tile plans may claim.  11 MB was
# tuned against XLA's default 16 MB scoped-vmem limit; the pallas_calls
# raise the scoped limit alongside the budget (``_vmem_limit``).  18 MB
# moved us2_conv1 (and the fused-heads tail) from WT=8 to WT=24 (-1.1 ms
# full fwd, benchmarks/fwd_r3c_probe.py); 20 MB additionally admits
# us1_conv1 (C=576 compact: ring+weights 18.8 MB, 14.8 vs 17.8 ms
# packed-XLA, benchmarks/us1c1_probe.py).  52 MB gives the hot streaming
# shapes whole-W single-tile plans (us1_conv1 WT 8 -> 40, us2_conv1/2
# 24 -> 72 — no halo re-reads): fwd 156.0 -> 155.4 ms, train step
# 639.7 -> 634.1 ms, same-window A/Bs (benchmarks/budget_probe.py,
# benchmarks/train_budget_probe.py).
_VMEM_BUDGET = 52 * 1024 * 1024


def set_roll_vmem_budget(n: int) -> None:
    """Override the tile-plan VMEM budget (chip A/B hook)."""
    global _VMEM_BUDGET
    _VMEM_BUDGET = int(n)


def _vmem_limit() -> int:
    """Scoped-VMEM limit for the pallas_calls: the plan budget plus
    compiler slop, never below the tuned 32 MB floor (the layer1
    resident kernel proved 64 MB compiles and runs on the v5e)."""
    return max(32 * 1024 * 1024, _VMEM_BUDGET + 14 * 1024 * 1024)


_PATCH_BUFS = 1


def set_roll_patch_bufs(n: int) -> None:
    """1 | 2 | 3 rotating tap-patch buffers (chip A/B hook).  With one
    buffer the VPU patch build and the MXU matmuls fully serialize (the
    next depth tap's build has a WAR hazard on the patch the matmuls
    are reading); extra buffers break the hazard so Mosaic can overlap
    the streams."""
    global _PATCH_BUFS
    _PATCH_BUFS = int(n)


def set_roll_patch_scheme(scheme: str) -> None:
    """'auto' | 'compact' | 'wide' — chip-probe override hook."""
    global _PATCH_SCHEME
    assert scheme in ("auto", "compact", "wide")
    _PATCH_SCHEME = scheme


def _compact_ok(c2: int) -> bool:
    """The edge build lane-rolls by C within a 2C-lane vector: any
    C % 64 == 0 works (the bf16 roll bitcasts to an integral i32 roll;
    the half-tile-offset case measured fine on chip — us1_conv1 C=576
    at 14.8 ms vs 17.8 packed-XLA, benchmarks/us1c1_probe.py)."""
    return (c2 // 2) % 64 == 0


def _use_compact(c2: int) -> bool:
    if _PATCH_SCHEME == "wide":
        return False
    if _PATCH_SCHEME == "compact":
        return True
    return _compact_ok(c2)


def _plan(shape: Tuple[int, ...], o: int, itemsize: int,
          vmem_budget: Optional[int] = None) -> Optional[int]:
    """Pick the packed-W tile (WT, divides the 8-rounded Wh) or None."""
    if vmem_budget is None:
        vmem_budget = _VMEM_BUDGET
    b, d, h, wh, c2 = shape
    kb = 2 if _use_compact(c2) else 3     # patch K blocks (compact: 4C=2*2C)
    hp = h + 2
    whp = _round_up(wh, 8)           # impl zero-pads Wh up to this
    o2p = max(2 * o, 128)            # impl zero-pads output lanes to >=128
    # tile sizes are multiples of 8 so every tile's W offset is 8-aligned
    # (Mosaic requires provably tiling-aligned slice starts on the
    # second-minor dim for both the HBM DMA and the VMEM views).  48/40
    # serve the quarter-resolution stages (Wh = 36 -> WhP = 40 as ONE
    # tile instead of five 8-wide ones) — the deployment half-res shapes
    # (WhP = 72) keep their 24/8 plans.
    for wt in (72, 56, 48, 40, 32, 24, 16, 8):
        if whp % wt:
            continue
        wtp = _round_up(wt + 2, 8)
        ring = 5 * hp * wtp * c2 * itemsize
        patch = hp * wt * kb * c2 * itemsize * _PATCH_BUFS
        weights = 9 * kb * c2 * o2p * itemsize
        acc = 2 * h * wt * o2p * 4
        stage = 2 * h * wt * o2p * itemsize
        if ring + patch + weights + acc + stage <= vmem_budget:
            return wt
    return None


def supports_roll_conv(shape: Tuple[int, ...], kernel_shape: Tuple[int, ...],
                       itemsize: int = 2) -> bool:
    """``shape`` is the PACKED activation shape (B, D, H, Wh, 2C)."""
    if tuple(kernel_shape[:3]) != (3, 3, 3):
        return False
    if shape[-1] != 2 * kernel_shape[3]:
        return False
    if shape[-1] % 128:
        # sub-lane-tile packed inputs (e.g. the us3 32-out conv's dgrad,
        # 2*32 = 64 lanes) fail Mosaic compile — keep them on XLA
        return False
    return _plan(tuple(shape), kernel_shape[-1], itemsize) is not None


def _lane_roll(x, c: int):
    """Lane-dim roll at any element width.  Mosaic's ``dynamic_rotate`` is
    only implemented for 32-bit data (bf16 fails to compile on-chip), so
    narrow dtypes bitcast to i32 first — ``pltpu.bitcast`` packs along the
    second-minor dim, and a pure lane permutation commutes with any
    sublane packing, so bitcast⁻¹∘roll∘bitcast ≡ roll on the original."""
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, c, 2)
    assert x.shape[-2] % (4 // x.dtype.itemsize) == 0
    i32 = pltpu.bitcast(x, jnp.int32)
    return pltpu.bitcast(pltpu.roll(i32, c, 2), x.dtype)


def _edge_block(plane, WT: int, C2: int):
    """Compact-scheme edge block: lanes 0:C = p=-1's q1 sub-block, lanes
    C:2C = p=+1's q0 — ONE lane-roll per source (-C ≡ +C mod 2C) and a
    lane select, so both odd-parity edge taps ride a single dense-ish
    (2C, 2O) matmul block instead of two half-zero 2C blocks."""
    c = C2 // 2
    pm1 = _lane_roll(plane[:, 0:WT, :], c)
    pp1 = _lane_roll(plane[:, 2:2 + WT, :], c)
    lane = jax.lax.broadcasted_iota(jnp.int32, pm1.shape, 2)
    return jnp.where(lane < c, pm1, pp1)


def _kernel_body(x_hbm, w_ref, scale_ref, shift_ref, out_hbm, ring, patch,
                 stage, in_sems, out_sems, *, D: int, H: int, WT: int,
                 WTP: int, C2: int, O2: int, relu: bool, KB: int,
                 NPB: int):
    b = pl.program_id(0)
    wt_i = pl.program_id(1)
    HP = H + 2
    w0 = wt_i * WT                     # left halo starts at w0 (padded x)

    def in_dma(di):
        slot = jax.lax.rem(di, 4)
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(di, 1), :, pl.ds(w0, WTP)],
            ring.at[pl.ds(slot, 1)], in_sems.at[slot])

    # ring slot 4 stays all-zero: the d = -1 / d = D virtual planes
    ring[pl.ds(4, 1)] = jnp.zeros_like(ring[pl.ds(4, 1)])
    in_dma(0).start()
    in_dma(1).start()

    def loop(dout, carry):
        # prefetch the plane needed two iterations ahead
        @pl.when(dout + 2 < D)
        def _():
            in_dma(dout + 2).start()

        @pl.when(dout + 1 < D)
        def _():
            in_dma(dout + 1).wait()

        @pl.when(dout == 0)
        def _():
            in_dma(0).wait()

        acc = jnp.zeros((H * WT, O2), jnp.float32)
        for dd in range(3):
            di = dout + dd - 1
            slot = jnp.where((di >= 0) & (di < D), jax.lax.rem(di, 4), 4)
            plane = ring[pl.ds(slot, 1)][0]          # (HP, WTP, C2)
            pb = dd % NPB        # rotate: no WAR hazard on the live patch
            if KB == 2:                              # compact: p0 + edge
                patch[pb, :, :, 0:C2] = plane[:, 1:1 + WT, :]
                patch[pb, :, :, C2:2 * C2] = _edge_block(plane, WT, C2)
            else:
                for p in range(3):
                    patch[pb, :, :, p * C2:(p + 1) * C2] = \
                        plane[:, p:p + WT, :]
            for dh in range(3):
                a = patch[pb, pl.ds(dh, H)].reshape(H * WT, KB * C2)
                acc = acc + jnp.dot(a, w_ref[dd, dh],
                                    preferred_element_type=jnp.float32)

        acc = acc * scale_ref[...] + shift_ref[...]
        if relu:
            acc = jnp.maximum(acc, 0.0)

        sslot = jax.lax.rem(dout, 2)

        @pl.when(dout >= 2)
        def _():
            pltpu.make_async_copy(stage.at[pl.ds(sslot, 1)],
                                  out_hbm.at[b, pl.ds(dout - 2, 1), :,
                                             pl.ds(wt_i * WT, WT)],
                                  out_sems.at[sslot]).wait()
        stage[pl.ds(sslot, 1)] = acc.reshape(1, H, WT, O2).astype(stage.dtype)
        pltpu.make_async_copy(stage.at[pl.ds(sslot, 1)],
                              out_hbm.at[b, pl.ds(dout, 1), :, pl.ds(wt_i * WT, WT)],
                              out_sems.at[sslot]).start()
        return carry

    jax.lax.fori_loop(0, D, loop, 0)
    # drain the last two output DMAs
    pltpu.make_async_copy(stage.at[pl.ds((D - 2) % 2, 1)],
                          out_hbm.at[b, pl.ds(D - 2, 1), :, pl.ds(wt_i * WT, WT)],
                          out_sems.at[(D - 2) % 2]).wait()
    pltpu.make_async_copy(stage.at[pl.ds((D - 1) % 2, 1)],
                          out_hbm.at[b, pl.ds(D - 1, 1), :, pl.ds(wt_i * WT, WT)],
                          out_sems.at[(D - 1) % 2]).wait()


def _roll_conv_impl(xp: jax.Array, kernel: jax.Array,
                    scale: Optional[jax.Array] = None,
                    shift: Optional[jax.Array] = None,
                    relu: bool = False,
                    interpret: bool = False) -> jax.Array:
    B, D, H, Wh, C2 = xp.shape
    O = kernel.shape[-1]
    O2 = 2 * O
    O2P = max(O2, 128)               # pad output lanes to a full lane tile
    WT = _plan(xp.shape, O, xp.dtype.itemsize)
    assert WT is not None, "gate with supports_roll_conv"
    WTP = _round_up(WT + 2, 8)
    HP = H + 2
    WhP = _round_up(Wh, 8)           # packed-W cols incl. zero padding

    # pad: H one zero row each side; W one zero packed col left, then zero
    # cols up to WhP plus the last tile's DMA window (w0 max = WhP - WT
    # -> the padded array must reach WhP - WT + WTP cols after the left 1)
    wpad_r = (WhP - WT + WTP) - (Wh + 1)
    xpad = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (1, wpad_r), (0, 0)))

    compact = _use_compact(C2)
    KB = 2 if compact else 3
    w = (build_roll_weights_compact if compact
         else build_roll_weights)(kernel.astype(xp.dtype))
    if O2P != O2:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, O2P - O2)))
    if scale is None:
        scale = jnp.ones((O2,), jnp.float32)
    if shift is None:
        shift = jnp.zeros((O2,), jnp.float32)
    scale = jnp.pad(scale.astype(jnp.float32), (0, O2P - O2)).reshape(1, O2P)
    shift = jnp.pad(shift.astype(jnp.float32), (0, O2P - O2)).reshape(1, O2P)

    body = functools.partial(_kernel_body, D=D, H=H, WT=WT, WTP=WTP,
                             C2=C2, O2=O2P, relu=relu, KB=KB,
                             NPB=_PATCH_BUFS)
    out = pl.pallas_call(
        body,
        grid=(B, WhP // WT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, D, H, WhP, O2P), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((5, HP, WTP, C2), xp.dtype),    # plane ring + zero
            pltpu.VMEM((_PATCH_BUFS, HP, WT, KB * C2),
                       xp.dtype),                      # tap patch ring
            pltpu.VMEM((2, H, WT, O2P), xp.dtype),     # out staging
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(xpad, w, scale, shift)
    if WhP != Wh or O2P != O2:
        out = out[:, :, :, :Wh, :O2]
    return out


def _heads_plan(shape: Tuple[int, ...], o: int, itemsize: int,
                vmem_budget: Optional[int] = None) -> Optional[int]:
    """W tile for the heads-fused kernel: same ring/patch/weights as the
    forward, but the staging buffers hold the f32 head outputs."""
    if vmem_budget is None:
        vmem_budget = _VMEM_BUDGET
    b, d, h, wh, c2 = shape
    kb = 2 if _use_compact(c2) else 3
    hp = h + 2
    whp = _round_up(wh, 8)
    o2p = max(2 * o, 128)
    for wt in (72, 56, 48, 40, 32, 24, 16, 8):
        if whp % wt:
            continue
        wtp = _round_up(wt + 2, 8)
        ring = 5 * hp * wtp * c2 * itemsize
        patch = hp * wt * kb * c2 * itemsize
        weights = 9 * kb * c2 * o2p * itemsize + 128 * 128 * itemsize
        acc = 2 * h * wt * o2p * 4
        stage = 2 * h * wt * 128 * 4
        if ring + patch + weights + acc + stage <= vmem_budget:
            return wt
    return None


def supports_roll_heads(shape: Tuple[int, ...],
                        kernel_shape: Tuple[int, ...],
                        n_heads: int, itemsize: int = 2) -> bool:
    """Gate for the conv+affine+ReLU+1x1-heads+sigmoid fused kernel.
    ``shape`` is the PACKED activation shape (B, D, H, Wh, 2C)."""
    if tuple(kernel_shape[:3]) != (3, 3, 3):
        return False
    if shape[-1] != 2 * kernel_shape[3] or shape[-1] % 128:
        return False
    if 2 * n_heads > 128 or shape[1] < 2:
        return False
    return _heads_plan(tuple(shape), kernel_shape[-1], itemsize) is not None


def _heads_kernel_body(x_hbm, w_ref, scale_ref, shift_ref, hw_ref, hb_ref,
                       out_hbm, ring, patch, stage, in_sems, out_sems, *,
                       D: int, H: int, WT: int, WTP: int, C2: int, O2: int,
                       KB: int):
    """Forward body + fused head epilogue: the us3 32-channel activation is
    consumed ONLY by the 1x1x1 task heads (``med3d.py:226-233``), so the
    fused pass never writes it to HBM — it applies the conv+BN+ReLU, then
    the packed head matmul + bias + sigmoid in VMEM and stores the f32
    dense maps (2*n_heads packed lanes, zero-padded to 128)."""
    b = pl.program_id(0)
    wt_i = pl.program_id(1)
    w0 = wt_i * WT

    def in_dma(di):
        slot = jax.lax.rem(di, 4)
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(di, 1), :, pl.ds(w0, WTP)],
            ring.at[pl.ds(slot, 1)], in_sems.at[slot])

    ring[pl.ds(4, 1)] = jnp.zeros_like(ring[pl.ds(4, 1)])
    in_dma(0).start()
    in_dma(1).start()

    def loop(dout, carry):
        @pl.when(dout + 2 < D)
        def _():
            in_dma(dout + 2).start()

        @pl.when(dout + 1 < D)
        def _():
            in_dma(dout + 1).wait()

        @pl.when(dout == 0)
        def _():
            in_dma(0).wait()

        acc = jnp.zeros((H * WT, O2), jnp.float32)
        for dd in range(3):
            di = dout + dd - 1
            slot = jnp.where((di >= 0) & (di < D), jax.lax.rem(di, 4), 4)
            plane = ring[pl.ds(slot, 1)][0]
            if KB == 2:
                patch[:, :, 0:C2] = plane[:, 1:1 + WT, :]
                patch[:, :, C2:2 * C2] = _edge_block(plane, WT, C2)
            else:
                for p in range(3):
                    patch[:, :, p * C2:(p + 1) * C2] = plane[:, p:p + WT, :]
            for dh in range(3):
                a = patch[pl.ds(dh, H)].reshape(H * WT, KB * C2)
                acc = acc + jnp.dot(a, w_ref[dd, dh],
                                    preferred_element_type=jnp.float32)

        acc = jnp.maximum(acc * scale_ref[...] + shift_ref[...], 0.0)
        # head matmul with the unfused path's exact rounding chain: the
        # activation is rounded to the compute dtype (the stage output the
        # head conv would read back), the head logit and bias-add round
        # through the compute dtype (nn.Conv's output dtype), and only the
        # sigmoid runs in f32 (``resnet3d.py`` dense head)
        hv = jnp.dot(acc.astype(hw_ref.dtype), hw_ref[...],
                     preferred_element_type=jnp.float32).astype(hw_ref.dtype)
        hv = hv + hb_ref[...].astype(hw_ref.dtype)
        hv = jax.nn.sigmoid(hv.astype(jnp.float32))

        sslot = jax.lax.rem(dout, 2)

        @pl.when(dout >= 2)
        def _():
            pltpu.make_async_copy(stage.at[pl.ds(sslot, 1)],
                                  out_hbm.at[b, pl.ds(dout - 2, 1), :,
                                             pl.ds(wt_i * WT, WT)],
                                  out_sems.at[sslot]).wait()
        stage[pl.ds(sslot, 1)] = hv.reshape(1, H, WT, 128)
        pltpu.make_async_copy(stage.at[pl.ds(sslot, 1)],
                              out_hbm.at[b, pl.ds(dout, 1), :,
                                         pl.ds(wt_i * WT, WT)],
                              out_sems.at[sslot]).start()
        return carry

    jax.lax.fori_loop(0, D, loop, 0)
    pltpu.make_async_copy(stage.at[pl.ds((D - 2) % 2, 1)],
                          out_hbm.at[b, pl.ds(D - 2, 1), :,
                                     pl.ds(wt_i * WT, WT)],
                          out_sems.at[(D - 2) % 2]).wait()
    pltpu.make_async_copy(stage.at[pl.ds((D - 1) % 2, 1)],
                          out_hbm.at[b, pl.ds(D - 1, 1), :,
                                     pl.ds(wt_i * WT, WT)],
                          out_sems.at[(D - 1) % 2]).wait()


def roll_conv_heads_sigmoid(xp: jax.Array, kernel: jax.Array,
                            scale: jax.Array, shift: jax.Array,
                            head_w: jax.Array, head_b: jax.Array,
                            interpret: bool = False) -> jax.Array:
    """Fused eval tail: ``sigmoid(heads(relu(conv(xp)*scale + shift)))``.

    ``xp``: (B, D, H, Wh, 2C) packed; ``kernel``: (3,3,3,C,O);
    ``scale``/``shift``: per-packed-channel (2O,) f32 BN+bias folds;
    ``head_w``: (O, HN) logical 1x1x1 head weights; ``head_b``: (HN,).
    Returns (B, D, H, Wh, 2*HN) f32 packed sigmoid maps (unpack_w to
    (B, D, H, W, HN)).  The O-channel activation never touches HBM.
    Reference tail: ``med3d.py:226-233`` + sigmoid (``models.py:430-450``).
    """
    B, D, H, Wh, C2 = xp.shape
    O = kernel.shape[-1]
    O2 = 2 * O
    O2P = max(O2, 128)
    HN = head_w.shape[-1]
    WT = _heads_plan(xp.shape, O, xp.dtype.itemsize)
    assert WT is not None, "gate with supports_roll_heads"
    WTP = _round_up(WT + 2, 8)
    WhP = _round_up(Wh, 8)
    wpad_r = (WhP - WT + WTP) - (Wh + 1)
    xpad = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (1, wpad_r), (0, 0)))

    compact = _use_compact(C2)
    KB = 2 if compact else 3
    w = (build_roll_weights_compact if compact
         else build_roll_weights)(kernel.astype(xp.dtype))
    if O2P != O2:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, O2P - O2)))
    scale = jnp.pad(scale.astype(jnp.float32), (0, O2P - O2)).reshape(1, O2P)
    shift = jnp.pad(shift.astype(jnp.float32), (0, O2P - O2)).reshape(1, O2P)
    # packed head weights: rows (oc*O + c), cols (oc*HN + h) — block
    # diagonal over the W parity, zero-padded to (O2P, 128)
    hw = jnp.zeros((O2P, 128), xp.dtype)
    hwc = head_w.astype(xp.dtype)
    for oc in (0, 1):
        hw = hw.at[oc * O:(oc + 1) * O, oc * HN:(oc + 1) * HN].set(hwc)
    hb = jnp.zeros((1, 128), jnp.float32)
    for oc in (0, 1):
        hb = hb.at[0, oc * HN:(oc + 1) * HN].set(head_b.astype(jnp.float32))

    body = functools.partial(_heads_kernel_body, D=D, H=H, WT=WT, WTP=WTP,
                             C2=C2, O2=O2P, KB=KB)
    out = pl.pallas_call(
        body,
        grid=(B, WhP // WT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, D, H, WhP, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((5, H + 2, WTP, C2), xp.dtype),
            pltpu.VMEM((H + 2, WT, KB * C2), xp.dtype),
            pltpu.VMEM((2, H, WT, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(xpad, w, scale, shift, hw, hb)
    return out[:, :, :, :Wh, :2 * HN]


def _wgrad_plan(shape: Tuple[int, ...], o: int, itemsize: int,
                vmem_budget: Optional[int] = None) -> Optional[int]:
    """Pick the W tile for the wgrad kernel (or None).

    Budget: the x plane ring + tap patch of the forward, PLUS a 2-slot g
    plane ring and the full (3,3,6C,2O) f32 accumulator living in VMEM
    across the whole grid (revisiting-output pattern)."""
    if vmem_budget is None:
        vmem_budget = _VMEM_BUDGET
    b, d, h, wh, c2 = shape
    kb = 2 if _use_compact(c2) else 3
    o2 = 2 * o
    hp = h + 2
    whp = _round_up(wh, 8)
    acc = 9 * kb * c2 * o2 * 4
    if acc > vmem_budget // 2:
        # us1_conv1-class (6C = 3456 rows): the accumulator alone would
        # crowd out the pipeline — leave those on XLA
        return None
    for wt in (72, 56, 48, 40, 32, 24, 16, 8):
        if whp % wt:
            continue
        wtp = _round_up(wt + 2, 8)
        ring = 5 * hp * wtp * c2 * itemsize
        patch = hp * wt * kb * c2 * itemsize
        gbuf = 2 * h * wt * o2 * itemsize
        if ring + patch + gbuf + acc <= vmem_budget:
            return wt
    return None


def supports_roll_wgrad(shape: Tuple[int, ...],
                        kernel_shape: Tuple[int, ...],
                        itemsize: int = 2) -> bool:
    """``shape`` is the PACKED activation shape (B, D, H, Wh, 2C); the
    gradient must carry 2*O lanes with O = ``kernel_shape[-1]``."""
    if tuple(kernel_shape[:3]) != (3, 3, 3):
        return False
    if shape[-1] != 2 * kernel_shape[3]:
        return False
    if shape[-1] % 128 or (2 * kernel_shape[-1]) % 128:
        return False                      # sub-lane-tile operands: XLA
    return _wgrad_plan(tuple(shape), kernel_shape[-1], itemsize) is not None


def _wgrad_kernel_body(x_hbm, g_hbm, out_ref, ring, patch, gbuf,
                       in_sems, g_sems, *, B: int, D: int, H: int, WT: int,
                       WTP: int, C2: int, O2: int, NW: int, KB: int):
    b = pl.program_id(0)
    wt_i = pl.program_id(1)
    w0 = wt_i * WT

    @pl.when((b == 0) & (wt_i == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def in_dma(di):
        slot = jax.lax.rem(di, 4)
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(di, 1), :, pl.ds(w0, WTP)],
            ring.at[pl.ds(slot, 1)], in_sems.at[slot])

    def g_dma(di):
        slot = jax.lax.rem(di, 2)
        return pltpu.make_async_copy(
            g_hbm.at[b, pl.ds(di, 1), :, pl.ds(w0, WT)],
            gbuf.at[pl.ds(slot, 1)], g_sems.at[slot])

    ring[pl.ds(4, 1)] = jnp.zeros_like(ring[pl.ds(4, 1)])
    in_dma(0).start()
    in_dma(1).start()
    g_dma(0).start()

    def loop(dout, carry):
        @pl.when(dout + 2 < D)
        def _():
            in_dma(dout + 2).start()

        @pl.when(dout + 1 < D)
        def _():
            in_dma(dout + 1).wait()
            g_dma(dout + 1).start()

        @pl.when(dout == 0)
        def _():
            in_dma(0).wait()

        g_dma(dout).wait()
        gp = gbuf[pl.ds(jax.lax.rem(dout, 2), 1)][0].reshape(H * WT, O2)

        for dd in range(3):
            di = dout + dd - 1
            slot = jnp.where((di >= 0) & (di < D), jax.lax.rem(di, 4), 4)
            plane = ring[pl.ds(slot, 1)][0]          # (HP, WTP, C2)
            if KB == 2:                              # compact: p0 + edge
                patch[:, :, 0:C2] = plane[:, 1:1 + WT, :]
                patch[:, :, C2:2 * C2] = _edge_block(plane, WT, C2)
            else:
                for p in range(3):
                    patch[:, :, p * C2:(p + 1) * C2] = plane[:, p:p + WT, :]
            for dh in range(3):
                a = patch[pl.ds(dh, H)].reshape(H * WT, KB * C2)
                out_ref[dd, dh] += jax.lax.dot_general(
                    a, gp, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, D, loop, 0)


def roll_conv_wgrad(xp: jax.Array, g: jax.Array,
                    kernel_shape: Tuple[int, ...],
                    interpret: bool = False) -> jax.Array:
    """Weight gradient of the packed stride-1 pad-1 3^3 conv.

    ``xp``: (B, D, H, Wh, 2C) packed input; ``g``: (B, D, H, Wh, 2O) packed
    cotangent.  Returns the LOGICAL kernel gradient (3, 3, 3, C, O) f32.

    Same rolling-ring schedule as the forward (read-once DMA of x, 2-slot
    g ring), but each plane contributes nine (H*WT, 6C)^T @ (H*WT, 2O)
    matmuls into a persistent (3, 3, 6C, 2O) f32 VMEM accumulator
    (revisiting-output pattern over the whole grid).  The packed-domain
    accumulator folds back to the logical taps by the forward's parity
    table: dK[.., dwl, c, o] = sum over output parities oo of
    A[.., (p+1)*2C + q*C + c, oo*O + o] with 2p + q = dwl + oo - 1 —
    each (dwl, oo) pair selects exactly one (p, q) block.
    Reference op: wgrad of ``conv3x3x3`` (``med3d.py:91-100``)."""
    B, D, H, Wh, C2 = xp.shape
    C = C2 // 2
    O = kernel_shape[-1]
    O2 = 2 * O
    WT = _wgrad_plan(xp.shape, O, xp.dtype.itemsize)
    assert WT is not None, "gate with supports_roll_wgrad"
    WTP = _round_up(WT + 2, 8)
    WhP = _round_up(Wh, 8)

    wpad_r = (WhP - WT + WTP) - (Wh + 1)
    xpad = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (1, wpad_r), (0, 0)))
    gpad = (jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, WhP - Wh), (0, 0)))
            if WhP != Wh else g)

    NW = WhP // WT
    compact = _use_compact(C2)
    KB = 2 if compact else 3
    body = functools.partial(_wgrad_kernel_body, B=B, D=D, H=H, WT=WT,
                             WTP=WTP, C2=C2, O2=O2, NW=NW, KB=KB)
    acc = pl.pallas_call(
        body,
        grid=(B, NW),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((3, 3, KB * C2, O2),
                               lambda b, w: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 3, KB * C2, O2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((5, H + 2, WTP, C2), xp.dtype),   # x plane ring
            pltpu.VMEM((H + 2, WT, KB * C2), xp.dtype),  # tap patch
            pltpu.VMEM((2, H, WT, O2), xp.dtype),        # g plane ring
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(xpad, gpad)

    # fold the packed parity blocks back onto the logical taps
    dk = jnp.zeros((3, 3, 3, C, O), jnp.float32)
    if compact:
        # invert build_roll_weights_compact: each (K C-block, oc) pair
        # holds exactly one logical dw; the edge block's cross terms
        # (rows 2C:3C x oc1, rows 3C:4C x oc0) feed no output and are
        # simply not read
        for r0, oo, dwl in ((0, 0, 1), (0, 1, 0), (C, 0, 2), (C, 1, 1),
                            (2 * C, 0, 0), (3 * C, 1, 2)):
            dk = dk.at[:, :, dwl].add(
                acc[:, :, r0:r0 + C, oo * O:(oo + 1) * O])
    else:
        for dwl in range(3):
            for oo in (0, 1):
                s = dwl + oo - 1
                p = (s + 2) // 2 - 1
                q = (s + 2) % 2
                r0 = (p + 1) * 2 * C + q * C
                dk = dk.at[:, :, dwl].add(
                    acc[:, :, r0:r0 + C, oo * O:(oo + 1) * O])
    return dk


def _direct_packed_reference(xp, kernel):
    """Packed-domain reference: unpack -> direct conv -> pack."""
    from ..models.packed import pack_w, unpack_w
    x = unpack_w(xp)
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return pack_w(out)


@jax.custom_vjp
def roll_conv_packed(xp: jax.Array, kernel: jax.Array) -> jax.Array:
    """Packed-layout stride-1 pad-1 3^3 conv: (B,D,H,Wh,2C) x (3,3,3,C,O)
    -> (B,D,H,Wh,2O).  Pallas rolling-ring forward, direct-conv backward."""
    return _roll_conv_impl(xp, kernel)


def _fwd(xp, kernel):
    return _roll_conv_impl(xp, kernel), (xp, kernel)


def _pad_pair_lanes(a: jax.Array) -> jax.Array:
    """Zero-pad each W-parity block of a packed (..., 2C) tensor:
    ``[even C | odd C]`` → ``[even C, 0_C, odd C, 0_C]`` — exactly the
    ``pack_w`` layout of the same volume with its channels zero-extended
    C → 2C, so a packed conv over the result with zero-extended kernel
    rows computes the identical convolution at full 4C lanes."""
    c = a.shape[-1] // 2
    z = jnp.zeros(a.shape[:-1] + (c,), a.dtype)
    return jnp.concatenate([a[..., :c], z, a[..., c:], z], axis=-1)


def _bwd(res, g):
    xp, kernel = res
    # dgrad of a stride-1 pad-1 conv is the same conv with the kernel
    # spatially flipped and I/O-transposed; in the packed domain (pack and
    # unpack are permutations) that is again a packed conv — so the
    # rolling-ring kernel serves its OWN input gradient at full lanes,
    # instead of the unpacked 64-lane XLA dgrad.  wgrad has its own
    # rolling-ring kernel (persistent VMEM accumulator) when the operand
    # lanes qualify; otherwise XLA emits the weight-gradient contraction.
    kt = jnp.flip(kernel, (0, 1, 2)).swapaxes(3, 4)
    itemsize = g.dtype.itemsize
    dx = None
    if supports_roll_conv(g.shape, kt.shape, itemsize):
        dx = _roll_conv_impl(g, kt)
    elif g.shape[-1] == 64:   # half a (8, 128)-element lane tile
        # us3-class backward: 2x32 packed lanes are a sub-lane tile that
        # crashes Mosaic (re-confirmed round 5).  Zero-padding each
        # parity block to full lanes with zeroed kernel rows computes
        # the identical dgrad and still beats XLA: 18.8 vs 25.3 ms at
        # the us3 deployment shape (benchmarks/us3_pad_dgrad_probe.py).
        # The padded WGRAD measured slower than XLA (20.8 vs 17.6) —
        # only dgrad takes this path.
        ktp = jnp.concatenate([kt, jnp.zeros_like(kt)], axis=3)
        gp = _pad_pair_lanes(g)
        if supports_roll_conv(gp.shape, ktp.shape, itemsize):
            dx = _roll_conv_impl(gp, ktp)
    if dx is not None:
        if supports_roll_wgrad(xp.shape, kernel.shape, xp.dtype.itemsize):
            dw = roll_conv_wgrad(xp, g, kernel.shape).astype(kernel.dtype)
        else:
            dw = jax.grad(lambda k: jnp.sum(
                (_direct_packed_reference(xp, k) * g).astype(jnp.float32)))(
                    kernel)
        return dx, dw
    _, vjp = jax.vjp(_direct_packed_reference, xp, kernel)
    return vjp(g)


roll_conv_packed.defvjp(_fwd, _bwd)


def roll_conv_affine_relu(xp: jax.Array, kernel: jax.Array,
                          scale: jax.Array, shift: jax.Array,
                          relu: bool = True,
                          interpret: bool = False) -> jax.Array:
    """Fused eval-mode decoder stage: ``relu(conv(xp, kernel)*scale+shift)``
    in one kernel pass (BN running stats + conv bias folded into
    scale/shift by the caller).  ``scale``/``shift`` are per-PACKED-output-
    channel vectors of length ``2*O``.  Forward-only (no autodiff rule) —
    use :func:`roll_conv_packed` + explicit affine when gradients are
    needed.  Reference stage: conv+BN+ReLU in ``med3d.py:50-89``."""
    return _roll_conv_impl(xp, kernel, scale, shift, relu=relu,
                           interpret=interpret)
