"""W-pair channel packing for the decoder: 64-channel convs at 128 lanes.

Measured on the v5e chip (``benchmarks/exp_conv_decomp.py``): XLA's direct
3-D conv runs at 15.3 TFLOP/s on the decoder's 64-channel activations
(half-empty MXU lanes + 2x HBM layout padding of bf16 (16,128) tiles) but
70.4 TFLOP/s at 128 channels.  Packing two adjacent W positions into the
channel dim fixes both: activations become (B, D, H, W/2, 2C) — and because
the layout is channel-minor, packing is a *pure reshape* (the flat order
``w*C + c`` equals ``w'*(2C) + p*C + c`` for ``w = 2w' + p``).

A logical stride-1 pad-1 k=3 conv becomes a conv on the packed layout with
a structured (3,3,3,2Ci,2Co) kernel: output parity q at packed position w'
reads input parities p at packed offsets u with ``2u + p = q + kw - 1``:

    q=0:  (u=-1,p=1)<-kw0   (u=0,p=0)<-kw1   (u=0,p=1)<-kw2
    q=1:  (u=0,p=0)<-kw0    (u=0,p=1)<-kw1   (u=1,p=0)<-kw2

Half the packed kernel is structurally zero (2x logical FLOPs) — but 2x
FLOPs at 70 TFLOP/s beats 1x at 15.  The packed modules declare the SAME
parameter names and logical shapes as their unpacked twins, so checkpoints,
torch import, and the registry are oblivious.

Reference modules being accelerated: ``UpsampleConvBlock5d`` + decoder
(``med3d.py:50-89, 215-229``).
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import crop_concat, kaiming_normal_fan_out

Dtype = Any


def pack_w(x: jax.Array) -> jax.Array:
    """(..., W, C) → (..., W/2, 2C); a pure reshape in channel-minor layout."""
    assert x.shape[-2] % 2 == 0, f"W must be even to pack, got {x.shape}"
    return x.reshape(*x.shape[:-2], x.shape[-2] // 2, 2 * x.shape[-1])


def unpack_w(x: jax.Array) -> jax.Array:
    """(..., W/2, 2C) → (..., W, C); inverse of :func:`pack_w`."""
    assert x.shape[-1] % 2 == 0
    return x.reshape(*x.shape[:-2], x.shape[-2] * 2, x.shape[-1] // 2)


def build_packed_kernel_k3(k: jax.Array) -> jax.Array:
    """(3,3,3,Ci,Co) logical kernel → (3,3,3,2Ci,2Co) packed-domain kernel."""
    kd, kh, kw, ci, co = k.shape
    assert kw == 3, kw
    kp = jnp.zeros((kd, kh, 3, 2 * ci, 2 * co), k.dtype)
    table = [  # (q, u_idx, p, kw_tap): 2(u_idx-1) + p == q + kw_tap - 1
        (0, 0, 1, 0), (0, 1, 0, 1), (0, 1, 1, 2),
        (1, 1, 0, 0), (1, 1, 1, 1), (1, 2, 0, 2),
    ]
    for q, u, p, t in table:
        kp = kp.at[:, :, u, p * ci:(p + 1) * ci,
                   q * co:(q + 1) * co].set(k[:, :, t])
    return kp


def build_packed_kernel_k1(k: jax.Array) -> jax.Array:
    """(1,1,1,Ci,Co) → (1,1,1,2Ci,2Co) block-diagonal packed kernel."""
    _, _, _, ci, co = k.shape
    kp = jnp.zeros((1, 1, 1, 2 * ci, 2 * co), k.dtype)
    for p in (0, 1):
        kp = kp.at[0, 0, 0, p * ci:(p + 1) * ci,
                   p * co:(p + 1) * co].set(k[0, 0, 0])
    return kp


def _s2d_axis_extent(f: int):
    """Kernel extent + left offset on one s2d axis with block factor ``f``.

    Output j (0 <= j < f/2) tap k (0..6) reads raw offset r = 2j + k - 3
    relative to the block start: r in [-3, f+1], so the block-index range
    floor(r/f) is {-2..1} for f = 2 and {-1..1} for f >= 4."""
    return (4, 2) if f == 2 else (3, 1)


@functools.lru_cache(maxsize=8)
def _s2d_stem_map(factors=(2, 2, 2)) -> "np.ndarray":
    """(343, S) 0/1 matrix mapping the logical 7^3 stem kernel onto a
    space-to-depth (Ed,Eh,Ew, fd*fh*fw, nj*F) kernel for block factors
    (fd, fh, fw).  The classic (2,2,2) case is the (4,4,4,8,F) mapping
    (logical tap k reads block offset floor((k-3)/2), parity (k-3) mod 2);
    larger W/H factors raise the MXU contraction dim Cin = fd*fh*fw from 8
    to 32/64 at the cost of structurally-zero tap positions (measured
    tradeoff — see DEVNOTES stem probe)."""
    import numpy as np
    fd, fh, fw = factors
    (ed, od), (eh, oh), (ew, ow) = map(_s2d_axis_extent, factors)
    nj = (fd // 2) * (fh // 2) * (fw // 2)
    m = np.zeros((343, ed, eh, ew, fd * fh * fw, nj), np.float32)
    for jd in range(fd // 2):
        for jh in range(fh // 2):
            for jw in range(fw // 2):
                jidx = (jd * (fh // 2) + jh) * (fw // 2) + jw
                for kd in range(7):
                    rd = 2 * jd + kd - 3
                    for kh in range(7):
                        rh = 2 * jh + kh - 3
                        for kw in range(7):
                            rw = 2 * jw + kw - 3
                            cin = ((rd % fd) * fh + rh % fh) * fw + rw % fw
                            m[(kd * 7 + kh) * 7 + kw,
                              rd // fd + od, rh // fh + oh, rw // fw + ow,
                              cin, jidx] = 1.0
    return m.reshape(343, -1)


# s2d block factors for the stem conv.  (2,2,2) is the exact classic
# mapping; larger factors trade structurally-zero taps for a deeper MXU
# contraction (Cin 8 -> 32/64).  Chip A/B (benchmarks/stem_probe.py, B=4
# bf16 at deployment size): (2,2,2) 23.0 ms, (2,4,4) 23.5, (4,4,4) 21.7,
# (4,4,2) 23.2, (2,2,8) 16.5 — only the W factor (the lane dim) moves the
# needle; (2,2,8) is the default, with an exact per-axis fallback to 2
# when a dim is not divisible.
_STEM_S2D_FACTORS = (2, 2, 8)


def set_stem_s2d_factors(factors) -> None:
    """Override the stem conv's s2d block factors (chip A/B hook)."""
    global _STEM_S2D_FACTORS
    factors = tuple(int(f) for f in factors)
    assert len(factors) == 3 and all(f in (2, 4, 8) for f in factors)
    _STEM_S2D_FACTORS = factors


def get_stem_s2d_factors():
    return _STEM_S2D_FACTORS


def stem_quad_supported(shape, features: int = 64,
                        itemsize: int = 2) -> bool:
    """Gate for the quad-layout stem->pool path (``StemConvS2D`` with
    ``quad_output=True`` feeding ``ops.maxpool_kernel.max_pool_quads``).

    Requires the (2, 2, 8) s2d factors (quad lanes ARE that path's native
    conv output), a 1-channel input with pool-compatible logical dims
    (stem output D and H even => input d % 4 == h % 4 == 0), the roll-mode
    size floor, and the pool kernel's VMEM gate."""
    if len(shape) != 5 or shape[-1] != 1:
        return False
    if _STEM_S2D_FACTORS != (2, 2, 8):
        return False
    b, d, h, w, _ = shape
    if d % 4 or h % 4 or w % 8:
        return False
    n = (d // 2) * (h // 2) * (w // 2) * features
    if n < _ROLL_MIN_ELEMS:
        return False
    from ..ops.maxpool_kernel import supports_maxpool_quads
    return supports_maxpool_quads((b, d // 2, h // 2, w // 8, 4 * features),
                                  itemsize)


class StemConvS2D(nn.Module):
    """The k=7 stride-2 stem conv via space-to-depth.

    A stride-2 conv on a 1-channel volume leaves the MXU contraction dim at
    343·1; packing 2^3 input voxels into 8 channels turns it into a
    stride-1 (4,4,4) conv with contraction 512 on a volume of 1/8 the
    positions — numerically identical (the mapped kernel reads exactly the
    same taps; padding (2,1) reproduces the logical pad-3 zeros).  Param
    layout stays the logical (7,7,7,Cin,features) ``nn.Conv`` shape, so
    checkpoints and torch import are oblivious.  Falls back to the direct
    conv for odd spatial dims or Cin > 1.

    ``quad_output=True`` (gate with :func:`stem_quad_supported`) returns
    the NATIVE (2,2,8)-factor conv output (B, D/2, H/2, W/8, 4F) — quad
    lanes ``j*F + f`` holding logical ``w = 4*wq + j`` — skipping the
    unshuffle so the 528 MB stem activation is never relaid out to 64
    lanes (that materialize costs +11 ms at the deployment shape,
    ``benchmarks/maxpool_probe{,3}.py``); the caller feeds it straight to
    ``ops.maxpool_kernel.max_pool_quads``.

    ``pair_output=True`` forces the (2, 2, 4) factors, whose NATIVE conv
    output (B, D/2, H/2, W/4, 2F) with lanes ``jw*F + f`` (logical
    ``w = 2*wp + jw``) IS the decoder's W-pair packed layout: bitwise
    ``pack_w(stem_ndhwc)`` with no unshuffle/retiling at all, at HALF the
    gross FLOPs of the (2,2,8) form (K = 4*4*3*16 = 768 vs 1536 per
    output channel) and full 128 output lanes.
    """
    features: int
    dtype: Optional[Dtype] = None
    quad_output: bool = False
    pair_output: bool = False

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        import jax.numpy as jnp

        from .blocks import conv3d_apply
        cin = x.shape[-1]
        kernel = self.param("kernel", kaiming_normal_fan_out,
                            (7, 7, 7, cin, self.features))
        if return_params:
            # raw logical weights for an external fused lowering
            # (ops/stem_kernel.py); x is only consulted for Cin
            return kernel
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        if cin != 1 or any(s % 2 for s in x.shape[1:4]):
            assert not (self.quad_output or self.pair_output), \
                "gate with stem_quad_supported / w % 4 == 0"
            return conv3d_apply(x, kernel, (2, 2, 2),
                                ((3, 3), (3, 3), (3, 3)), mode="direct")
        b, d, h, w, _ = x.shape
        if self.pair_output:
            assert w % 4 == 0, "pair_output needs w % 4 == 0"
            fd, fh, fw = 2, 2, 4
        else:
            fd, fh, fw = (f if s % f == 0 else 2 for f, s in
                          zip(_STEM_S2D_FACTORS, (d, h, w)))
        if self.quad_output:
            assert (fd, fh, fw) == (2, 2, 8), \
                "quad_output requires the (2,2,8) factors to apply"
        (ed, od), (eh, oh), (ew, ow) = map(_s2d_axis_extent, (fd, fh, fw))
        nj = (fd // 2) * (fh // 2) * (fw // 2)
        xg = x.reshape(b, d // fd, fd, h // fh, fh, w // fw, fw)
        xg = xg.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
            b, d // fd, h // fh, w // fw, fd * fh * fw)
        m = jnp.asarray(_s2d_stem_map((fd, fh, fw)), dtype)
        kp = jnp.einsum("ks,ko->so", m,
                        kernel.reshape(343, self.features)).reshape(
                            ed, eh, ew, fd * fh * fw, nj * self.features)
        y = jax.lax.conv_general_dilated(
            xg, kp, (1, 1, 1),
            [(od, ed - 1 - od), (oh, eh - 1 - oh), (ow, ew - 1 - ow)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.quad_output:
            return y                  # (B, D/2, H/2, W/8, 4F) quad lanes
        if self.pair_output:
            return y                  # (B, D/2, H/2, W/4, 2F) pair lanes
        if nj == 1:
            return y
        if fd == 2 and fh == 2:
            # W-only packing: channel c = jw*F + f and logical half-W index
            # w2 = wb*(fw//2) + jw, so (Wb, nj*F) -> (w//2, F) is the SAME
            # linear order — a plain reshape.  The general transpose below
            # is algebraically identical here (it only moves singleton
            # dims); on chip the two compile to the same program
            # (maxpool_probe2.py: barrier-materialize 24.1 vs 24.2 ms), so
            # this branch is clarity, not perf.
            return y.reshape(b, d // 2, h // 2, w // 2, self.features)
        y = y.reshape(b, d // fd, h // fh, w // fw,
                      fd // 2, fh // 2, fw // 2, self.features)
        return y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
            b, d // 2, h // 2, w // 2, self.features)


def _roll_mode_supported(xp_shape, kernel_shape, itemsize: int) -> bool:
    """True when conv mode 'roll' is active and the rolling-ring kernel
    (``ops/roll_conv.py``) supports this packed conv shape.

    Beyond the kernel's capability gate, require a large spatial extent:
    measured on the v5e (DEVNOTES round 3), the kernel beats XLA on the
    half-resolution stages (64x112x72 packed, >=66M input elements) but
    loses on the quarter-resolution us1 stage (32x56x36, 8M — DMA-bound,
    5.5 ms vs XLA's ~2.6), so small stages keep the XLA lowering.

    Under a multi-device mesh (``parallel.mesh.set_active_mesh``) the
    kernel runs per data shard via ``shard_map_data`` — the gate then also
    requires a data-pure mesh and a divisible batch
    (``mesh_fast_path_ok``); per-SHARD shapes differ from the global shape
    only in B, which no tile plan consults, so the shape gate itself is
    shard-invariant."""
    from .blocks import get_conv3d_mode
    if get_conv3d_mode() != "roll":
        return False
    b, d, h, wh, c2 = xp_shape
    if d * h * wh * c2 < _ROLL_MIN_ELEMS:
        return False
    from ..parallel.mesh import mesh_fast_path_ok
    if not mesh_fast_path_ok(b):
        return False
    from ..ops.roll_conv import supports_roll_conv
    return supports_roll_conv(tuple(xp_shape), tuple(kernel_shape), itemsize)


# Floor for routing a packed conv site through the rolling-ring Pallas
# kernels (per-sample packed elems).  Round-5 chip A/B
# (benchmarks/train_layer_pack_probe.py, B=4 bf16): 2M (layer1 + the
# layer2 identity tail engage) 491.5 ms/step vs 32M (decoder only)
# 525.3 — the layer2-tail dgrad/wgrad is the win, layer1 a wash; eval
# fwd measured neutral for both (DEVNOTES round 3b).  Tests patch this
# to 0 for tiny shapes.
_ROLL_MIN_ELEMS = 2 * 2 ** 20


class PackedConv3(nn.Module):
    """k=3 s=1 conv applied in the packed domain.  Param layout (kernel
    DHWIO at the LOGICAL channel counts + optional bias) matches
    ``nn.Conv``/``conv3d`` exactly.  ``return_params=True`` creates the
    parameters and hands them to the caller instead of computing (used by
    the fused conv+BN+ReLU eval path in ``PackedUpsampleConvBlock``)."""
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xp, return_params: bool = False):
        ci = xp.shape[-1] // 2
        kernel = self.param("kernel", kaiming_normal_fan_out,
                            (3, 3, 3, ci, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if return_params:
            return kernel, bias
        dtype = self.dtype or xp.dtype
        if _roll_mode_supported(xp.shape, kernel.shape,
                                jnp.dtype(dtype).itemsize):
            from ..ops.roll_conv import roll_conv_packed
            from ..parallel.mesh import shard_map_data
            out = shard_map_data(roll_conv_packed, xp.astype(dtype),
                                 kernel.astype(dtype))
        else:
            kp = build_packed_kernel_k3(kernel.astype(dtype))
            out = jax.lax.conv_general_dilated(
                xp.astype(dtype), kp, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if bias is not None:
            out = out + jnp.tile(bias.astype(dtype), 2)
        return out


class _PackedBN(nn.Module):
    """BatchNorm on packed activations with the LOGICAL per-channel stats:
    packed-channel moments are combined across the two parities, so the
    result (and the running statistics) are bit-comparable to unpacked
    ``nn.BatchNorm`` up to float reassociation.  Variable tree matches
    ``nn.BatchNorm`` (params scale/bias, batch_stats mean/var of shape (C,))."""
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xp, train: bool, return_affine: bool = False):
        c2 = xp.shape[-1]
        c = c2 // 2
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (c,), jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (c,), jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if return_affine:
            # eval-mode y = x*mul + add from the running stats, as logical
            # per-channel f32 vectors (caller folds into a conv epilogue;
            # xp is only consulted for the channel count)
            mul = (scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
                   ).astype(jnp.float32)
            add = (bias - ra_mean.value * mul).astype(jnp.float32)
            return mul, add
        if train:
            xf = xp.astype(jnp.float32)
            m_p = jnp.mean(xf, axis=(0, 1, 2, 3))        # per packed channel
            e2_p = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3))
            mean = 0.5 * (m_p[:c] + m_p[c:])
            var = 0.5 * (e2_p[:c] + e2_p[c:]) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        dtype = self.dtype or xp.dtype
        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(jnp.float32)
        add = (bias - mean * mul).astype(jnp.float32)
        y = xp.astype(jnp.float32) * jnp.tile(mul, 2) + jnp.tile(add, 2)
        return y.astype(dtype)


class PackedNormWrapper(nn.Module):
    """Packed-domain ``NormWrapper`` (only the 'bn' method the model zoo
    uses); nests the child as ``bn`` so the variable tree is identical."""
    method: str = "bn"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xp, train: bool, return_affine: bool = False):
        assert self.method in ("bn", "sbn"), self.method
        return _PackedBN(dtype=self.dtype, name="bn")(xp, train,
                                                      return_affine)


def packed_stage(conv: PackedConv3, norm: PackedNormWrapper, xp, train: bool):
    """One decoder stage ``relu(bn(conv(xp)))`` on packed activations.

    In eval mode under conv mode 'roll' (and a kernel-supported shape) the
    whole stage runs as ONE Pallas pass — the BN running-stats affine and
    the conv bias fold into the rolling-ring kernel's epilogue, so the
    conv output never round-trips HBM between conv, BN and ReLU.
    Reference stage: conv+BN+ReLU in ``med3d.py:50-89``."""
    ch = conv.features
    dtype = conv.dtype or xp.dtype
    kshape = (3, 3, 3, xp.shape[-1] // 2, ch)
    if ((not train) and conv.use_bias
            and _roll_mode_supported(xp.shape, kshape,
                                     jnp.dtype(dtype).itemsize)):
        from ..ops.roll_conv import roll_conv_affine_relu
        from ..parallel.mesh import shard_map_data
        kernel, bias = conv(xp, return_params=True)
        dummy = jnp.zeros((1, 1, 1, 1, 2 * ch), xp.dtype)
        mul, add = norm(dummy, train, return_affine=True)   # logical (ch,)
        shift = bias.astype(jnp.float32) * mul + add
        return shard_map_data(roll_conv_affine_relu, xp.astype(dtype),
                              kernel.astype(dtype),
                              jnp.tile(mul, 2), jnp.tile(shift, 2))
    return nn.relu(norm(conv(xp), train))


class PackedBasicBlock(nn.Module):
    """W-pair packed twin of ``blocks.BasicBlock`` for the stride-1,
    dilation-1, identity-shortcut case (the trunk's layer1).  Parameter
    tree (conv1/bn1/conv2/bn2, logical shapes) matches the unpacked block
    exactly; the residual add is positionally local because packing is a
    pure reshape.  Eval mode under conv mode 'roll' fuses conv+BN(+ReLU)
    into the rolling-ring kernel's epilogue (the second conv keeps the
    relu for after the residual).  Reference block: ``med3d.py:115-144``.
    """
    planes: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xp, train: bool, return_params: bool = False):
        conv1 = PackedConv3(self.planes, use_bias=False, dtype=self.dtype,
                            name="conv1")
        bn1 = PackedNormWrapper(dtype=self.dtype, name="bn1")
        conv2 = PackedConv3(self.planes, use_bias=False, dtype=self.dtype,
                            name="conv2")
        bn2 = PackedNormWrapper(dtype=self.dtype, name="bn2")
        dtype = self.dtype or xp.dtype
        if return_params:
            # declare the identical variable tree, hand the raw kernels +
            # folded eval affines to an external fused lowering
            # (ops/layer1_kernel.py)
            dummy = jnp.zeros((1, 1, 1, 1, 2 * self.planes), xp.dtype)
            k1, _ = conv1(xp, return_params=True)
            m1, a1 = bn1(dummy, False, return_affine=True)
            k2, _ = conv2(xp, return_params=True)
            m2, a2 = bn2(dummy, False, return_affine=True)
            return k1, m1, a1, k2, m2, a2
        kshape = (3, 3, 3, xp.shape[-1] // 2, self.planes)
        if ((not train) and _roll_mode_supported(
                xp.shape, kshape, jnp.dtype(dtype).itemsize)):
            from ..ops.roll_conv import roll_conv_affine_relu
            from ..parallel.mesh import shard_map_data
            dummy = jnp.zeros((1, 1, 1, 1, 2 * self.planes), xp.dtype)
            k1, _ = conv1(xp, return_params=True)
            m1, a1 = bn1(dummy, False, return_affine=True)
            out = shard_map_data(roll_conv_affine_relu, xp.astype(dtype),
                                 k1.astype(dtype),
                                 jnp.tile(m1, 2), jnp.tile(a1, 2))
            k2, _ = conv2(out, return_params=True)
            m2, a2 = bn2(dummy, False, return_affine=True)
            out = shard_map_data(
                functools.partial(roll_conv_affine_relu, relu=False),
                out[..., :2 * self.planes], k2.astype(dtype),
                jnp.tile(m2, 2), jnp.tile(a2, 2))
            return nn.relu(out[..., :2 * self.planes]
                           + xp.astype(out.dtype))
        out = nn.relu(bn1(conv1(xp), train))
        out = bn2(conv2(out), train)
        return nn.relu(out + xp.astype(out.dtype))


def supports_packed_layer(xp_shape, planes: int, itemsize: int = 2) -> bool:
    """Static gate for running a whole residual layer in the packed
    domain (layer1): conv mode 'roll', min activation size, and kernel
    support for the packed conv shape."""
    from .blocks import get_conv3d_mode
    if get_conv3d_mode() != "roll":
        return False
    return _roll_mode_supported(xp_shape, (3, 3, 3, xp_shape[-1] // 2,
                                           planes), itemsize)


def supports_fused_layer(xp_shape, planes: int, n_blocks: int,
                         itemsize: int = 2) -> bool:
    """Static gate for the whole-layer1 VMEM-resident kernel
    (``ops/layer1_kernel.py``): conv mode 'roll' (A/B consistency with
    the streaming kernels) + the kernel's shape/VMEM gate.  No size
    floor — residency is exactly the small-activation regime where the
    streaming kernels lose (trunk prefix truth: layer1 18.2 ms on XLA
    vs a ~6 ms roofline, DEVNOTES round 3d)."""
    from .blocks import get_conv3d_mode
    if get_conv3d_mode() != "roll":
        return False
    from ..parallel.mesh import mesh_fast_path_ok
    if not mesh_fast_path_ok(xp_shape[0]):
        return False
    from ..ops.layer1_kernel import supports_fused_layer1
    return supports_fused_layer1(tuple(xp_shape), planes, n_blocks,
                                 itemsize)


def supports_fused_pool_layer(x_shape, planes: int, n_blocks: int,
                              itemsize: int = 2) -> bool:
    """Static gate for the pool+layer1 single-pass kernel
    (``ops/layer1_kernel.py::fused_pool_layer1``): conv mode 'roll' + the
    kernel's shape/VMEM gate on the PRE-POOL NDHWC stem activation."""
    from .blocks import get_conv3d_mode
    if get_conv3d_mode() != "roll":
        return False
    from ..parallel.mesh import mesh_fast_path_ok
    if not mesh_fast_path_ok(x_shape[0]):
        return False
    from ..ops.layer1_kernel import supports_fused_pool_layer1
    return supports_fused_pool_layer1(tuple(x_shape), planes, n_blocks,
                                      itemsize)


def supports_fused_heads(xp_shape, ch: int, n_heads: int,
                         itemsize: int = 2) -> bool:
    """Static-shape gate for the us3+heads fused tail (eval, conv mode
    'roll'): ``xp_shape`` is the PACKED us3 input shape (B, D, H, Wh, 2C)."""
    from .blocks import get_conv3d_mode
    if get_conv3d_mode() != "roll":
        return False
    b, d, h, wh, c2 = xp_shape
    if d * h * wh * c2 < _ROLL_MIN_ELEMS:
        return False
    from ..parallel.mesh import mesh_fast_path_ok
    if not mesh_fast_path_ok(b):
        return False
    from ..ops.roll_conv import supports_roll_heads
    return supports_roll_heads(xp_shape, (3, 3, 3, c2 // 2, ch), n_heads,
                               itemsize)


def packed_stage_heads(conv: PackedConv3, norm: PackedNormWrapper, xp,
                       head_w, head_b, interpret: bool = False):
    """The us3 stage PLUS the 1x1x1 task heads + sigmoid as ONE Pallas
    pass (eval only; gate with :func:`supports_fused_heads`).

    The 32-channel us3 activation is consumed only by the heads
    (``med3d.py:226-233``), so the fused kernel never materializes it in
    HBM — conv, BN affine, ReLU, head matmul, bias and sigmoid all happen
    in VMEM and only the f32 dense maps (B, D, H, W, n_heads) are written.
    ``head_w``: (ch, n_heads) logical head weights; ``head_b``: (n_heads,).
    """
    ch = conv.features
    dtype = conv.dtype or xp.dtype
    kernel, bias = conv(xp, return_params=True)
    dummy = jnp.zeros((1, 1, 1, 1, 2 * ch), xp.dtype)
    mul, add = norm(dummy, False, return_affine=True)      # logical (ch,)
    shift = bias.astype(jnp.float32) * mul + add
    from ..ops.roll_conv import roll_conv_heads_sigmoid
    from ..parallel.mesh import shard_map_data
    out = shard_map_data(
        functools.partial(roll_conv_heads_sigmoid, interpret=interpret),
        xp.astype(dtype), kernel.astype(dtype),
        jnp.tile(mul, 2), jnp.tile(shift, 2), head_w, head_b)
    return unpack_w(out)


class PackedUpsampleConvBlock(nn.Module):
    """Packed-domain twin of ``UpsampleConvBlock``: upsample + crop-concat
    unpacked (matmul resize), then the conv/BN/ReLU stages at 2C lanes."""
    base_chs: Sequence[int]
    scale_factor: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs, cats, train: bool, cats_mode: str = "ndhwc"):
        from ..ops.resize import resize_linear_matmul
        d, h, w = inputs.shape[1:4]
        up = resize_linear_matmul(inputs, (d * self.scale_factor,
                                           h * self.scale_factor,
                                           w * self.scale_factor),
                                  (1, 2, 3), align_corners=True)
        up = up.astype(inputs.dtype)
        if cats_mode in ("quad", "pair"):
            # ``cats`` is the stem in the quad-lane (B, D, H, W/4, 4C) or
            # W-pair (B, D, H, W/2, 2C) layout: the W-pair view is the
            # same linear order (for quad, via one reshape; for pair,
            # as-is), and the packed concat interleaves per parity so the
            # result is bit-identical to pack_w(concat([up, cats_ndhwc],
            # -1)).  No crop: the gates guarantee up.shape == stem.shape.
            cq = (cats if cats_mode == "pair"
                  else cats.reshape(*cats.shape[:3], cats.shape[3] * 2,
                                    cats.shape[4] // 2))
            assert up.shape[1:4] == (cq.shape[1], cq.shape[2],
                                     2 * cq.shape[3]), (up.shape, cats.shape)
            cu, cc = up.shape[-1], cq.shape[-1] // 2
            uq = pack_w(up.astype(cq.dtype))
            x = jnp.concatenate([uq[..., :cu], cq[..., :cc],
                                 uq[..., cu:], cq[..., cc:]], axis=-1)
        else:
            x = pack_w(crop_concat(up, cats))
        for idx, ch in enumerate(self.base_chs):
            x = packed_stage(
                PackedConv3(ch, dtype=self.dtype, name=f"conv{idx}"),
                PackedNormWrapper(dtype=self.dtype, name=f"norm{idx}"),
                x, train)
        return unpack_w(x)


