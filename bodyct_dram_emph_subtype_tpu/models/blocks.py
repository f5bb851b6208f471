"""Building blocks for the 3-D ResNet zoo, in TPU-friendly NDHWC layout.

Structural parity targets in the reference ``med3d.py``:
- ``conv3x3x3``                  (``med3d.py:91-100``)
- ``downsample_basic_block``     (shortcut type 'A': stride-subsample +
                                  channel zero-pad, ``med3d.py:103-112``)
- ``BasicBlock`` (expansion 1)   (``med3d.py:115-144``)
- ``Bottleneck`` (expansion 4)   (``med3d.py:147-184``)
- ``crop_concat_5d``             (``med3d.py:39-48``)
- ``UpsampleConvBlock5d``        (``med3d.py:50-89``)
- ``normal_wrapper``/``act_wrapper`` (``med3d.py:10-37``)

Design notes (TPU-first, not a translation):
- activations are NDHWC so 3-D convs tile directly onto the MXU;
- BatchNorm statistics are taken over (N, D, H, W); when the batch dim is
  sharded over the mesh's data axis under GSPMD jit the reduction becomes a
  global (cross-replica) mean — exactly the reference's
  ``sync_batchnorm=True`` semantics with zero extra code;
- dilated convolutions map to ``lax.conv_general_dilated`` rhs_dilation.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal")  # == torch kaiming_normal_(mode='fan_out')


# ---------------------------------------------------------------------------
# 3-D conv lowering mode.
#
# XLA-TPU's direct 3-D convolution path underperforms badly at this model's
# shapes (the dilated case measured 8-2600x slow, DEVNOTES.md); a k-deep 3-D
# conv decomposes exactly into ``kd`` 2-D convs over depth taps with D folded
# into the batch dim, riding XLA-TPU's best-tuned NHWC conv2d path:
#
#   direct — one lax 3-D conv (XLA decides the lowering)
#   d2sum  — kd x conv2d over depth taps, accumulated       (no extra memory)
#   d2cat  — depth taps concatenated into channels, 1 conv2d (kd x input mem)
#
# The default comes from $BODYCT_CONV3D_MODE; benchmarks pick the winner on
# real hardware (benchmarks/exp_conv_decomp.py).
# ---------------------------------------------------------------------------
import os as _os

_CONV3D_MODE = _os.environ.get("BODYCT_CONV3D_MODE", "direct")


def set_conv3d_mode(mode: str) -> None:
    """Set the global 3-D conv lowering ('direct' | 'd2sum' | 'd2cat' |
    'pallas' | 'tapmm' | 'packw' | 'roll').  Takes effect at the next trace
    (jit programs already compiled keep their lowering).  'roll' selects the
    rolling-ring Pallas kernel for the PACKED decoder convs
    (``ops/roll_conv.py``) and the direct lowering everywhere else."""
    global _CONV3D_MODE
    assert mode in ("direct", "d2sum", "d2cat", "pallas", "tapmm",
                    "packw", "roll"), mode
    _CONV3D_MODE = mode


def get_conv3d_mode() -> str:
    return _CONV3D_MODE


# ---------------------------------------------------------------------------
# Subgrid W-merge for the space-to-batch dilated layers (eval only).
#
# Whole-layer s2b leaves layer3/layer4 with tiny W extents (18 / 9) that
# round up to 24 / 16 sublanes on every conv tile — 25% / 44% structural
# padding.  Merging k subgrids along W with a 2-column zero separator
# amortises the round-up (layer3 k=8: 158 -> 160 cols, ~1% waste).  A
# 3-wide W-tap never reaches across a 2-column zero gap, so re-zeroing the
# separator columns before every 3^3 conv makes the merged layer EXACTLY
# equal to the per-subgrid lowering (validated bit-level on CPU and by the
# layer oracle tests).  Eval-only: train-mode BN batch statistics would
# see the separator zeros.
# ---------------------------------------------------------------------------

_SGMERGE_K = int(_os.environ.get("BODYCT_SGMERGE_K", "0"))
_W_SEP_MASK = None   # trace-scoped: set by _Trunk._layer around merged blocks


def set_sgmerge_k(k: int) -> None:
    """Merge up to ``k`` s2b subgrids along W in eval forwards (0/1 = off).
    Takes effect at the next trace."""
    global _SGMERGE_K
    _SGMERGE_K = int(k)


def get_sgmerge_k() -> int:
    return _SGMERGE_K


def merge_w_subgrids(x, k: int):
    """(B·g, D, H, W, C) -> (B·g/k, D, H, k·(W+2)-2, C): concatenate k
    batch-consecutive subgrids along W with 2 zero separator columns."""
    Bs, D, H, W, C = x.shape
    x = x.reshape(Bs // k, k, D, H, W, C)
    x = jnp.pad(x, ((0, 0),) * 4 + ((0, 2), (0, 0)))
    x = x.transpose(0, 2, 3, 1, 4, 5).reshape(Bs // k, D, H, k * (W + 2), C)
    return x[:, :, :, :k * (W + 2) - 2]


def unmerge_w_subgrids(x, k: int, w: int):
    """Inverse of :func:`merge_w_subgrids` (drops separator columns)."""
    Bg, D, H, _, C = x.shape
    x = jnp.pad(x, ((0, 0),) * 3 + ((0, 2), (0, 0)))
    x = x.reshape(Bg, D, H, k, w + 2, C).transpose(0, 3, 1, 2, 4, 5)
    return x[:, :, :, :, :w].reshape(Bg * k, D, H, w, C)


def w_sep_mask(w: int, k: int):
    """(1,1,1,k·(W+2)-2,1) float32 mask: 0 on separator columns, 1 off."""
    import numpy as _np
    m = _np.ones((1, 1, 1, k * (w + 2) - 2, 1), _np.float32)
    for j in range(1, k):
        m[:, :, :, j * (w + 2) - 2:j * (w + 2)] = 0.0
    return jnp.asarray(m)


def _packw_conv3d(x, kernel):
    """Stride-1 pad-1 3^3 conv with the OUTPUT W-pairs packed into channels.

    The conv emits both W-parities of an output pair in one position:
    kernel (3,3,3,Ci,Co) -> (3,3,4,Ci,2Co) where parity-0 columns hold the
    taps at packed offsets 0..2 and parity-1 at 1..3, the conv strides 2
    over W, and a free channel-minor reshape unpacks (W/2, 2Co) -> (W, Co).
    Why: Co < 128 half-fills the MXU lanes (measured ~44-49 TF/s on the
    decoder's 64-out convs); 2Co columns fill them at 4/3 the FLOPs —
    62 TF/s net on the us2-conv1 shape (DEVNOTES round-3 table).  Numerics
    equal the direct lowering up to float reassociation."""
    B, D, H, W, _ = x.shape
    co = kernel.shape[-1]
    z = jnp.zeros(kernel.shape[:2] + (1,) + kernel.shape[3:], kernel.dtype)
    k0 = jnp.concatenate([kernel, z], axis=2)        # parity 0: taps 0..2
    k1 = jnp.concatenate([z, kernel], axis=2)        # parity 1: taps 1..3
    kp = jnp.concatenate([k0, k1], axis=-1)          # (3,3,4,Ci,2Co)
    out = jax.lax.conv_general_dilated(
        x, kp, (1, 1, 2), [(1, 1), (1, 1), (1, 2)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out.reshape(B, D, H, W, co)


def conv3d_apply(x, kernel, strides=(1, 1, 1), padding=None, mode=None):
    """Functional 3-D conv on NDHWC activations with a DHWIO kernel.

    ``padding`` is ``((pd0,pd1),(ph0,ph1),(pw0,pw1))``; defaults to
    torch-style symmetric ``(k-1)//2``.  All modes are numerically
    identical up to float reassociation (oracle-tested vs the direct path).
    """
    kd, kh, kw = kernel.shape[:3]
    if padding is None:
        padding = tuple(((k - 1) // 2, (k - 1) // 2) for k in (kd, kh, kw))
    # subgrid-merged layer (eval): re-zero separator columns so a W-tap
    # never reads a neighbouring subgrid — exactness condition of the merge
    if (_W_SEP_MASK is not None and kw > 1
            and x.shape[3] == _W_SEP_MASK.shape[3]):
        x = x * _W_SEP_MASK.astype(x.dtype)
    mode = mode or _CONV3D_MODE
    if mode == "roll":
        # 'roll' = rolling-ring kernel on packed-decoder convs only
        # (models/packed.py); measured 198.3 ms full fwd vs 209.9 direct.
        # The plane-flat trunk kernel (mode 'flat' below) LOSES both
        # isolated (layer4 89 vs 114 TF/s) and in-model (214.9 ms fwd) —
        # the current XLA conv stack is stronger than round-2's; direct
        # stays the lowering for every non-packed conv.
        mode = "direct"
    if mode == "flat":
        from ..ops.flat_conv import flat_conv3d, supports_flat_conv
        if (strides == (1, 1, 1)
                and padding == ((1, 1), (1, 1), (1, 1))
                and supports_flat_conv(x.shape, kernel.shape,
                                       x.dtype.itemsize)):
            return flat_conv3d(x, kernel)
        mode = "direct"
    if mode == "packw":
        if (strides == (1, 1, 1)
                and padding == ((1, 1), (1, 1), (1, 1))
                and tuple(kernel.shape[:3]) == (3, 3, 3)
                and x.shape[3] % 2 == 0
                and kernel.shape[-1] < 128):
            return _packw_conv3d(x, kernel)
        mode = "direct"  # full-lane Cout / odd W / strided: no lane waste
    if mode == "tapmm":
        from ..ops.tap_conv import supports_tap_conv3d, tap_conv3d
        if (strides == (1, 1, 1)
                and padding == ((1, 1), (1, 1), (1, 1))
                and supports_tap_conv3d(x.shape, kernel.shape, strides,
                                        x.dtype.itemsize)):
            return tap_conv3d(x, kernel)
        mode = "direct"  # stem k7 / strided / narrow-row shapes
    if mode == "pallas":
        from ..ops.pallas_conv import pallas_conv3d, supports_pallas_conv3d
        if (strides == (1, 1, 1)
                and padding == ((1, 1), (1, 1), (1, 1))
                and supports_pallas_conv3d(x.shape, kernel.shape, strides,
                                           x.dtype.itemsize)):
            return pallas_conv3d(x, kernel)
        mode = "direct"  # unsupported shape: stem k7/stride-2/huge weights
    if mode == "direct" or kd == 1:
        return jax.lax.conv_general_dilated(
            x, kernel, strides, list(padding),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    sd, sh, sw = strides
    (pd0, pd1), ph, pw = padding
    B, D, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (pd0, pd1), (0, 0), (0, 0), (0, 0)))
    Dp = D + pd0 + pd1
    Do = (Dp - kd) // sd + 1

    def tap(t):
        xt = jax.lax.slice_in_dim(xp, t, t + (Do - 1) * sd + 1, sd, axis=1)
        return xt.reshape(B * Do, H, W, C)

    if mode == "d2sum":
        out = None
        for t in range(kd):
            y = jax.lax.conv_general_dilated(
                tap(t), kernel[t], (sh, sw), [ph, pw],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = y if out is None else out + y
    else:  # d2cat
        xcat = jnp.concatenate([tap(t) for t in range(kd)], axis=-1)
        kcat = jnp.concatenate([kernel[t] for t in range(kd)], axis=2)
        out = jax.lax.conv_general_dilated(
            xcat, kcat, (sh, sw), [ph, pw],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(B, Do, *out.shape[1:])


class Conv3d(nn.Module):
    """3-D conv module with the decomposed TPU lowering.

    Param layout matches ``nn.Conv`` exactly (kernel DHWIO + optional bias)
    so torch-checkpoint import and Orbax checkpoints are oblivious to the
    lowering choice.
    """
    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", kaiming_normal_fan_out,
                            (*self.kernel_size, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        dtype = self.dtype or x.dtype
        out = conv3d_apply(x.astype(dtype), kernel.astype(dtype),
                           self.strides)
        if bias is not None:
            out = out + bias.astype(dtype)
        return out


class NormWrapper(nn.Module):
    """Norm selector (reference ``normal_wrapper``, ``med3d.py:10-28``).

    'bn'    — BatchNorm with running stats (the only method the model zoo
              instantiates);
    'bnt'   — BatchNorm w/o running stats (batch stats always used);
    'bntna' — same, no affine;
    'ln'    — GroupNorm(1) (layer norm over C,D,H,W);
    'lnna'  — same, no affine;
    'in'    — GroupNorm(C) (instance norm).
    'sbn'   — alias of 'bn': under GSPMD jit the batch-stat reduction is
              already cross-replica (SyncBatchNorm semantics).
    """
    method: str = "bn"
    momentum: float = 0.9   # torch BatchNorm3d momentum=0.1 → flax 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool, return_affine: bool = False):
        m = self.method
        if return_affine:
            # folded eval affine (mul, add) as logical per-channel f32
            # vectors, for conv-epilogue / packed-layout fusion.  Declares
            # the identical variable tree via the _PackedBN twin (same
            # param/batch_stats names, shapes and inits as nn.BatchNorm);
            # x is only consulted for the channel count (pass a dummy).
            assert m in ("bn", "sbn"), m
            from .packed import _PackedBN
            return _PackedBN(momentum=self.momentum, epsilon=self.epsilon,
                             dtype=self.dtype, name="bn")(x, train, True)
        if m in ("bn", "sbn"):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=self.momentum, epsilon=self.epsilon,
                                dtype=self.dtype, name="bn")(x)
        if m in ("bnt", "bntna"):
            return nn.BatchNorm(use_running_average=False,
                                momentum=self.momentum, epsilon=self.epsilon,
                                use_bias=m == "bnt", use_scale=m == "bnt",
                                dtype=self.dtype, name="bn")(x)
        if m in ("ln", "lnna"):
            return nn.GroupNorm(num_groups=1, epsilon=self.epsilon,
                                use_bias=m == "ln", use_scale=m == "ln",
                                dtype=self.dtype, name="gn")(x)
        if m == "in":
            return nn.GroupNorm(num_groups=x.shape[-1], epsilon=self.epsilon,
                                dtype=self.dtype, name="gn")(x)
        raise NotImplementedError(m)


def conv3d(features: int, kernel: int | Tuple[int, int, int], stride=1,
           dilation=1, bias=False, name=None, dtype=None):
    """3-D conv with torch-style symmetric padding.

    torch pads with ``padding=dilation`` for k=3 dilated convs
    (``med3d.py:91-100``) and ``padding=3`` for the k=7 stem; the general
    rule used throughout the reference is pad = dilation * (k-1) // 2.

    Dilated convs (the trunk's layer3/layer4) lower through space-to-batch
    (:class:`DilatedConv3d`): XLA's direct dilated-conv path on TPU is
    pathologically slow (measured 8-2600x slower at the model's shapes),
    while d^3 interleaved sub-grid dense convs ride the MXU.
    """
    if isinstance(kernel, int):
        kernel = (kernel,) * 3
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(dilation, int):
        dilation = (dilation,) * 3
    if any(d > 1 for d in dilation):
        assert all(s == 1 for s in stride), "dilated convs are stride-1 here"
        return DilatedConv3d(features, kernel, dilation[0], bias, name=name,
                             dtype=dtype)
    if (_CONV3D_MODE != "direct" or _W_SEP_MASK is not None) \
            and kernel[0] > 1:
        # merged-layer convs must route through conv3d_apply (the separator
        # re-zero hook lives there), whatever the lowering mode
        return Conv3d(features, kernel_size=kernel, strides=stride,
                      use_bias=bias, name=name, dtype=dtype)
    padding = [(d * (k - 1) // 2, d * (k - 1) // 2)
               for k, d in zip(kernel, dilation)]
    return nn.Conv(features, kernel_size=kernel, strides=stride,
                   padding=padding, kernel_dilation=dilation, use_bias=bias,
                   kernel_init=kaiming_normal_fan_out, name=name, dtype=dtype)


def space_to_batch_3d(x, d: int):
    """(B, D, H, W, C) → (B·d³, D/d, H/d, W/d, C): the d³ interleaved
    sub-grids of a dilation-d conv, folded into the batch dim (batch-major,
    so a data-sharded batch stays shardable).  Requires d | D,H,W."""
    B, D, H, W, C = x.shape
    xs = x.reshape(B, D // d, d, H // d, d, W // d, d, C)
    xs = xs.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return xs.reshape(B * d * d * d, D // d, H // d, W // d, C)


def batch_to_space_3d(x, d: int):
    """Inverse of :func:`space_to_batch_3d`."""
    Bd, Dd, Hd, Wd, C = x.shape
    B = Bd // (d * d * d)
    xs = x.reshape(B, d, d, d, Dd, Hd, Wd, C)
    xs = xs.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return xs.reshape(B, Dd * d, Hd * d, Wd * d, C)


class DilatedConv3d(nn.Module):
    """Stride-1 dilated 3-D conv via space-to-batch.

    out[x] = Σ_k w[k]·in[x + d·(k−1)] couples only voxels on the same
    residue class mod d per axis, so the conv decomposes into d³ independent
    dense 3³ convs over interleaved sub-grids (batched together → one big
    MXU-friendly conv).  Spatial dims are zero-padded up to multiples of d
    and the output cropped back — identical numerics to torch's
    ``Conv3d(dilation=d, padding=d)`` (the padded voxels read the same
    zeros the conv padding would).

    Param layout matches ``nn.Conv`` (kernel DHWIO + optional bias) so the
    torch-checkpoint importer is oblivious to the lowering.
    """
    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    dilation: int = 2
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        kd, kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", kaiming_normal_fan_out,
                            (*self.kernel_size, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)

        B, D, H, W, C = x.shape
        pads = [(-s) % d for s in (D, H, W)]
        if any(pads):
            x = jnp.pad(x, [(0, 0), (0, pads[0]), (0, pads[1]),
                            (0, pads[2]), (0, 0)])
        xs = space_to_batch_3d(x, d)
        out = conv3d_apply(
            xs, kernel, (1, 1, 1),
            (((kd - 1) // 2, (kd - 1) // 2),
             ((kh - 1) // 2, (kh - 1) // 2),
             ((kw - 1) // 2, (kw - 1) // 2)))
        out = batch_to_space_3d(out, d)
        if any(pads):
            out = out[:, :D, :H, :W, :]
        if bias is not None:
            out = out + bias.astype(dtype)
        return out


def max_pool_k3s2p1_slices(x):
    """k=3 s=2 p=1 max-pool as shifted-view maxes (no ``reduce_window``).

    For even extents, output index ``i`` covers inputs ``2i-1, 2i, 2i+1``:
    split each axis into (even, odd) halves via a free reshape, shift the
    odd half by one, and take a 3-way max.  W uses the lane-pair form
    ((W/2, 2C) reshape) so no strided lane access appears.  Pure
    pad/slice/max.  Exact vs ``nn.max_pool`` for even D/H/W; measured
    NEUTRAL vs ``reduce_window`` on chip at the stem shape
    (maxpool_probe2.py: 31.8 vs 31.0 ms chained, 12.3 vs 9.3 resident) —
    kept as the building block for packed-layout pooling, not as a
    default.
    """
    b, d, h, w, c = x.shape
    assert d % 2 == 0 and h % 2 == 0 and w % 2 == 0
    minf = jnp.asarray(-jnp.inf, x.dtype)

    def axis_pool(y, axis):
        # view (..., n, ...) as (..., n//2, 2, ...), max(odd[i-1], ev, od)
        n = y.shape[axis]
        shp = y.shape[:axis] + (n // 2, 2) + y.shape[axis + 1:]
        v = y.reshape(shp)
        ev = jax.lax.index_in_dim(v, 0, axis + 1, keepdims=False)
        od = jax.lax.index_in_dim(v, 1, axis + 1, keepdims=False)
        pad = [(0, 0)] * ev.ndim
        pad[axis] = (1, 0)
        od_prev = jax.lax.pad(
            od, minf, [(lo, 0, 0) for lo, _ in pad])[
                tuple(slice(0, s) for s in ev.shape)]
        return jnp.maximum(od_prev, jnp.maximum(ev, od))

    y = axis_pool(x, 1)          # D
    y = axis_pool(y, 2)          # H
    # W via the lane-pair view: (W/2, 2C) is a free reshape
    p = y.reshape(b, d // 2, h // 2, w // 2, 2 * c)
    ev, od = p[..., :c], p[..., c:]
    od_prev = jnp.concatenate(
        [jnp.full(od.shape[:3] + (1, c), minf, od.dtype), od[:, :, :, :-1]],
        axis=3)
    return jnp.maximum(od_prev, jnp.maximum(ev, od))


def max_pool_3d_k3s2p1(x, train: bool = False):
    """torch ``MaxPool3d(kernel_size=3, stride=2, padding=1)``
    (``med3d.py:206``) on NDHWC activations.

    Under conv mode 'roll' (the Pallas perf mode), large EVAL activations
    route to the plane-streaming kernel (``ops/maxpool_kernel.py``): XLA's
    ``reduce_window`` measures 10.6 ms at the deployment stem shape
    against a ~1.5 ms roofline (``benchmarks/tail_probe.py``).  Training
    keeps the XLA lowering (the kernel is forward-only; reduce_window's
    select-and-scatter VJP is what the backward needs anyway)."""
    if _CONV3D_MODE == "roll" and not train:
        from ..ops.maxpool_kernel import (max_pool_k3s2p1_pallas,
                                          supports_maxpool_pallas)
        from ..parallel.mesh import mesh_fast_path_ok, shard_map_data
        from . import packed as _packed
        n = 1
        for s in x.shape[1:]:
            n *= s
        if (n >= _packed._ROLL_MIN_ELEMS
                and mesh_fast_path_ok(x.shape[0])
                and supports_maxpool_pallas(x.shape, x.dtype.itemsize)):
            return shard_map_data(max_pool_k3s2p1_pallas, x)
    return nn.max_pool(x, window_shape=(3, 3, 3), strides=(2, 2, 2),
                       padding=[(1, 1)] * 3)


def downsample_shortcut_a(x, planes: int, stride: int):
    """Shortcut type 'A' (``med3d.py:103-112``): ``avg_pool3d(k=1, stride)``
    == strided subsample, then zero-pad channels up to ``planes``."""
    if stride != 1:
        x = x[:, ::stride, ::stride, ::stride, :]
    pad_c = planes - x.shape[-1]
    if pad_c > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad_c)])
    return x


class DownsampleB(nn.Module):
    """Shortcut type 'B' (``med3d.py:250-260``): 1x1x1 conv (stride s, no
    bias) + BatchNorm on the residual branch.  Torch state-dict names
    ``downsample.0`` (conv) / ``downsample.1`` (BN) map to
    ``downsample/conv`` / ``downsample/norm`` here (``torch_import.py``)."""
    planes: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv3d(self.planes, 1, self.stride, name="conv",
                   dtype=self.dtype)(x)
        return NormWrapper(dtype=self.dtype, name="norm")(x, train)


class BasicBlock(nn.Module):
    """Two 3x3x3 convs + identity shortcut (``med3d.py:115-144``)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    use_downsample: bool = False
    dtype: Optional[Dtype] = None
    shortcut_type: str = "A"
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = conv3d(self.planes, 3, self.stride, self.dilation,
                     name="conv1", dtype=self.dtype)(x)
        out = NormWrapper(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = conv3d(self.planes, 3, 1, self.dilation, name="conv2",
                     dtype=self.dtype)(out)
        out = NormWrapper(dtype=self.dtype, name="bn2")(out, train)
        if self.use_downsample:
            if self.shortcut_type == "A":
                residual = downsample_shortcut_a(x, self.planes, self.stride)
            else:
                residual = DownsampleB(self.planes, self.stride,
                                       dtype=self.dtype,
                                       name="downsample")(x, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1-3-1 bottleneck, expansion 4 (``med3d.py:147-184``)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    use_downsample: bool = False
    dtype: Optional[Dtype] = None
    shortcut_type: str = "A"
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = conv3d(self.planes, 1, name="conv1", dtype=self.dtype)(x)
        out = NormWrapper(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = conv3d(self.planes, 3, self.stride, self.dilation, name="conv2",
                     dtype=self.dtype)(out)
        out = NormWrapper(dtype=self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = conv3d(self.planes * 4, 1, name="conv3", dtype=self.dtype)(out)
        out = NormWrapper(dtype=self.dtype, name="bn3")(out, train)
        if self.use_downsample:
            if self.shortcut_type == "A":
                residual = downsample_shortcut_a(x, self.planes * 4,
                                                 self.stride)
            else:
                residual = DownsampleB(self.planes * 4, self.stride,
                                       dtype=self.dtype,
                                       name="downsample")(x, train)
        return nn.relu(out + residual)


def crop_concat(t1, t2):
    """Center-crop ``t2`` spatially to ``t1`` and concat channels
    (``med3d.py:39-48``; offset = ceil((b-a)/2) per axis).  NDHWC."""
    slices = [slice(None)]
    for a, b in zip(t1.shape[1:4], t2.shape[1:4]):
        off = -((a - b) // 2)  # == ceil((b-a)/2)
        slices.append(slice(off, a + off))
    slices.append(slice(None))
    return jnp.concatenate([t1, t2[tuple(slices)]], axis=-1)


class UpsampleConvBlock(nn.Module):
    """Trilinear x2 upsample + crop-concat + N conv-BN-ReLU stages
    (``med3d.py:50-89``; always called with align_corners=True trilinear
    upsample and dropout=0)."""
    base_chs: Sequence[int]
    scale_factor: int = 2
    conv_ksize: int = 3
    conv_bias: bool = True
    dropout: float = 0.0
    norm_method: str = "bn"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs, cats, train: bool):
        # MXU-path upsample: dense interpolation matmuls instead of
        # gather/lerp (2x faster decoder blocks on TPU, see ops/resize.py)
        from ..ops.resize import resize_linear_matmul
        d, h, w = inputs.shape[1:4]
        up = resize_linear_matmul(inputs, (d * self.scale_factor,
                                           h * self.scale_factor,
                                           w * self.scale_factor),
                                  (1, 2, 3), align_corners=True)
        up = up.astype(inputs.dtype)
        x = crop_concat(up, cats)
        for idx, ch in enumerate(self.base_chs):
            x = conv3d(ch, self.conv_ksize, bias=self.conv_bias,
                       name=f"conv{idx}", dtype=self.dtype)(x)
            x = NormWrapper(self.norm_method, dtype=self.dtype,
                            name=f"norm{idx}")(x, train)
            x = nn.relu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
