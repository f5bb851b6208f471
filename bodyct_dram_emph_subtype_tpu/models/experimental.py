"""Quarantined stem-layout experiments — exact, tested, measured OFF.

Three independent chip A/Bs (DEVNOTES rounds 3c-4: quad stem, fused stem
kernel v1/v2, pair-output stem) converged on the *stem-region law*: every
reshuffling of the stem's layout conserves the ~528 MB materialize cost
somewhere downstream — the quad path pays it back at the decoder us2 skip
concat, the pair path's K=768 matmuls run below the (2,2,8) form's rate —
so the production forward keeps the plain NDHWC stem
(``resnet3d._Trunk.__call__`` live path).

Everything here is correct and pinned by tests
(``tests/test_packed_decoder.py::test_{quad,pair}_stem_pool_path_matches_direct``)
but runs ONLY when the ``set_*_enable`` A/B hooks flip it on
(``benchmarks/fwd_r3d_probe.py`` / ``fwd_pair_probe.py``).  Kept as
quarantined science: the measurements that retired these paths are as
load-bearing as the ones that shipped the winners.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

# Default OFF: the quad region alone wins 19.8 vs 31.4 ms chained
# (benchmarks/maxpool_probe3.py) but the decoder us2 skip pays the
# quad->pair relayout back with interest in-model (170.8 vs 167.8 ms,
# benchmarks/fwd_r3d_probe.py / stem_consumers_probe.py) — flip on when
# the skip consumer reads the quad layout natively.
_QUAD_STEM_ENABLE = False

# Pair-output stem (StemConvS2D(pair_output=True)): the (2,2,4)-factor
# conv's native output IS the W-pair packed stem — half the gross stem
# FLOPs of the (2,2,8) form, a 128-lane materialize instead of 64, and
# the decoder us2 skip concat needs no pack_w.  In-model it LOSES
# (158.5 vs 154.4 ms, benchmarks/fwd_pair_probe.py — DEVNOTES round 4).
_PAIR_STEM_ENABLE = False


def set_quad_stem_enable(on: bool) -> None:
    """Chip-A/B hook: toggle the quad stem->pool path."""
    global _QUAD_STEM_ENABLE
    _QUAD_STEM_ENABLE = bool(on)


def set_pair_stem_enable(on: bool) -> None:
    """Chip-A/B hook: toggle the pair-output stem->pool path."""
    global _PAIR_STEM_ENABLE
    _PAIR_STEM_ENABLE = bool(on)


def use_quad_stem(x_shape, train: bool, packed_decoder: bool,
                  dtype) -> bool:
    """Static gate for the quad-layout stem->pool path: eval, conv mode
    'roll', packed decoder (the skip consumer understands quad cats), and
    the stem/pool shape+VMEM gates (``packed.stem_quad_supported``)."""
    from . import blocks as _blocks
    from .packed import stem_quad_supported
    if train or not packed_decoder or _blocks._CONV3D_MODE != "roll":
        return False
    if not _QUAD_STEM_ENABLE:
        return False
    from ..parallel.mesh import mesh_fast_path_ok
    if not mesh_fast_path_ok(x_shape[0]):
        return False
    itemsize = jnp.dtype(dtype).itemsize if dtype is not None else 4
    return stem_quad_supported(tuple(x_shape), 64, itemsize)


def use_pair_stem(x_shape, train: bool, packed_decoder: bool, dtype,
                  n_blocks: int) -> bool:
    """Static gate for the pair-output stem->fused-pool+layer1 path:
    eval, conv mode 'roll', packed decoder (the us2 skip consumer reads
    pair cats natively), BasicBlock layer1 depth ``n_blocks``, and the
    fused pool+layer1 kernel's shape/VMEM gate on the NDHWC-equivalent
    stem activation."""
    from . import blocks as _blocks
    from .packed import supports_fused_pool_layer
    if train or not packed_decoder or _blocks._CONV3D_MODE != "roll":
        return False
    if not _PAIR_STEM_ENABLE:
        return False
    if len(x_shape) != 5 or x_shape[-1] != 1:
        return False
    b, d, h, w, _ = x_shape
    if d % 4 or h % 4 or w % 8:
        return False
    itemsize = jnp.dtype(dtype).itemsize if dtype is not None else 4
    return supports_fused_pool_layer((b, d // 2, h // 2, w // 2, 64),
                                     64, n_blocks, itemsize)


def experimental_stem(trunk, x, train: bool):
    """Stem forward for the quarantined layouts, run inside ``trunk``'s
    compact scope (submodule names identical to the live path, so the
    variable tree — and torch-checkpoint import — is unchanged).

    Returns ``(stem_skip, x1, xp)``: the decoder skip activation in the
    experiment's native layout, layer1's output when the experiment fused
    it (else ``None``), and the pooled NDHWC activation for the generic
    layer1 path (else ``None``).
    """
    from .blocks import NormWrapper
    from .packed import StemConvS2D

    if trunk.pair_stem:
        # pair-output stem: the (2,2,4)-factor conv's native output IS
        # the W-pair packed stem activation — BN/ReLU fold onto 128
        # lanes, the fused pool+layer1 kernel reads it via a cheap
        # 128->256 lane quad view, and the decoder us2 concat consumes
        # it with no pack.
        dtype = trunk.dtype or x.dtype
        conv1 = StemConvS2D(64, name="conv1", dtype=trunk.dtype,
                            pair_output=True)
        xpair = conv1(x)
        dummy = jnp.zeros((1, 1, 1, 1, 128), dtype)
        mul, add = NormWrapper(dtype=trunk.dtype, name="bn1")(
            dummy, train, return_affine=True)     # logical (64,) f32
        xpair = nn.relu(xpair.astype(jnp.float32) * jnp.tile(mul, 2)
                        + jnp.tile(add, 2)).astype(dtype)
        x1 = trunk._layer(xpair, 64, trunk.layers[0], 1, 1, "layer1",
                          train, prepool="pair")
        return xpair, x1, None

    # quad stem: keep the stem activation in the s2d conv's NATIVE
    # quad-lane layout (B, D/2, H/2, W/8, 256) — BN+ReLU fold onto the
    # 256-lane tensor and the max-pool runs as the quad-resident Pallas
    # kernel, so the 64-lane NDHWC materialize and the pool's input
    # relayout never happen (benchmarks/maxpool_probe3.py).
    from ..ops.maxpool_kernel import max_pool_quads
    from ..ops.stem_kernel import fused_stem_pool, supports_fused_stem
    from ..parallel.mesh import shard_map_data
    from .packed import unpack_w

    dtype = trunk.dtype or x.dtype
    conv1 = StemConvS2D(64, name="conv1", dtype=trunk.dtype,
                        quad_output=True)
    dummy = jnp.zeros((1, 1, 1, 1, 128), dtype)
    mul, add = NormWrapper(dtype=trunk.dtype, name="bn1")(
        dummy, train, return_affine=True)         # logical (64,) f32
    if supports_fused_stem(x.shape, 64, jnp.dtype(dtype).itemsize):
        # one Pallas pass: conv+BN+ReLU+maxpool, stem written once
        import functools
        kernel = conv1(x, return_params=True)
        xq, pooled = shard_map_data(
            functools.partial(fused_stem_pool, dtype=dtype),
            x, kernel, mul, add)
    else:
        xq = conv1(x)                             # (B,D2,H2,Wq,256)
        xq = nn.relu(xq.astype(jnp.float32) * jnp.tile(mul, 4)
                     + jnp.tile(add, 4)).astype(xq.dtype)
        pooled = shard_map_data(max_pool_quads, xq)
    return xq, None, unpack_w(pooled)
