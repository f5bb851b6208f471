"""3-D ResNet model zoo: dilated encoder + U-Net decoder + task heads.

Parity targets:
- ``ResNetSegCls``  (``med3d.py:187-285``) — dense logits per task + global
  average-pooled classification logits;
- ``ResNetSegReg``  (``med3d.py:288-388``) — sigmoid dense maps + lung-masked
  lesion-fraction regressions (the dRAM model);
- ``ResNet``        (``med3d.py:427-501``) — plain classifier baseline.

Architecture (all variants): conv1 k7 s2 → maxpool k3 s2 → layer1 (64, s1)
→ layer2 (128, s2) → layer3 (256, s1, dil 2) → layer4 (512, s1, dil 4); the
Seg variants add us1 (x2 up + concat layer1 + 2 convs), us2 (x2 up + concat
stem + 2 convs), us3 (conv 64→32) and per-task 1x1x1 heads at 1/2 input
resolution.

Layout is NDHWC (channels-last) — the idiomatic TPU layout; inputs are
(B, D, H, W, 1) and lung masks (B, D, H, W, 1).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Type, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked_pool import lung_masked_fraction
from .blocks import (
    BasicBlock,
    Bottleneck,
    NormWrapper,
    UpsampleConvBlock,
    conv3d,
    max_pool_3d_k3s2p1,
)

Dtype = Any


def remat_scopes(remat) -> frozenset:
    """Normalise the ``remat`` model attribute into a set of scopes.

    ``True``/"all" checkpoints every residual block and decoder stage;
    ``False``/``None``/"none" nothing; a comma string selects scopes from
    {layer1..layer4, decoder} — e.g. ``"layer1,layer2,decoder"`` recomputes
    only the large stem-/half-resolution activations and keeps the
    FLOP-heavy, small-activation layer3/4 in HBM (selective checkpointing:
    trade the least recompute for the most memory)."""
    if remat is True or remat == "all":
        return frozenset({"layer1", "layer2", "layer3", "layer4", "decoder"})
    if not remat or remat == "none":
        return frozenset()
    return frozenset(s.strip() for s in str(remat).split(",") if s.strip())


# Quarantined stem-layout experiments (quad / pair) live in
# models/experimental.py — exact and tested, but measured OFF three ways
# (the DEVNOTES "stem-region law").  Re-exported here so the A/B probes'
# and tests' import surface is stable.
from .experimental import (  # noqa: E402  (re-export)
    set_pair_stem_enable,
    set_quad_stem_enable,
    use_pair_stem,
    use_quad_stem,
)


class _Trunk(nn.Module):
    """Shared encoder trunk; returns (stem, layer1, layer4) activations.

    ``remat`` checkpoints residual blocks (``jax.checkpoint`` through
    ``nn.remat``) so the backward pass recomputes block activations instead
    of keeping them in HBM — required to train batch ≥ 2 volumes per v5e
    chip at the deployment input size.  Accepts the selective-scope forms
    of :func:`remat_scopes`.

    ``quad_stem=True`` (gate with :func:`use_quad_stem`) keeps the stem
    activation in the s2d conv's NATIVE quad-lane layout (B, D/2, H/2,
    W/8, 256): BN+ReLU fold onto the 256-lane tensor and the max-pool
    runs as the quad-resident Pallas kernel — the 64-lane NDHWC
    materialize (+11 ms) and the pool's input relayout (+6 ms) never
    happen (``benchmarks/maxpool_probe3.py``).  The returned ``stem`` is
    then quad-shaped; the packed decoder consumes it directly.
    """
    block: Type[nn.Module]
    layers: Sequence[int]
    dtype: Optional[Dtype] = None
    remat: Any = False
    shortcut_type: str = "A"
    quad_stem: bool = False
    pair_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        from .packed import StemConvS2D, supports_fused_pool_layer
        if self.pair_stem or self.quad_stem:
            # quarantined layouts, opt-in A/B only (models/experimental.py)
            from .experimental import experimental_stem
            x, x1, xp = experimental_stem(self, x, train)
        else:
            x = StemConvS2D(64, name="conv1", dtype=self.dtype)(x)
            x = NormWrapper(dtype=self.dtype, name="bn1")(x, train)
            x = nn.relu(x)                            # /2
            itemsize = jnp.dtype(self.dtype or x.dtype).itemsize
            if ((not train) and self.block is BasicBlock
                    and supports_fused_pool_layer(x.shape, 64,
                                                  self.layers[0], itemsize)):
                # eval: maxpool + the whole layer1 residual stack in ONE
                # Pallas pass — the pooled activation never touches HBM
                # (ops/layer1_kernel.py::fused_pool_layer1)
                x1 = self._layer(x, 64, self.layers[0], 1, 1, "layer1",
                                 train, prepool=True)
                xp = None
            else:
                xp = max_pool_3d_k3s2p1(x, train)     # /4
        if xp is not None:
            x1 = self._layer(xp, 64, self.layers[0], 1, 1, "layer1", train)
        x2 = self._layer(x1, 128, self.layers[1], 2, 1, "layer2", train)
        x3 = self._layer(x2, 256, self.layers[2], 1, 2, "layer3", train)
        x4 = self._layer(x3, 512, self.layers[3], 1, 4, "layer4", train)
        return x, x1, x4

    def _layer(self, x, planes, blocks, stride, dilation, name, train,
               prepool=False):
        exp = self.block.expansion
        if prepool:
            # x is the PRE-POOL stem activation — NDHWC (prepool=True) or
            # W-pair packed (prepool="pair"); the caller verified
            # supports_fused_pool_layer — pool + residual stack run as one
            # VMEM-resident Pallas pass.  The dummy packed input only
            # provides shapes for param collection (DCE'd under jit).
            from ..ops.layer1_kernel import (fused_pool_layer1,
                                             fused_pool_layer1_pair)
            from .packed import PackedBasicBlock, unpack_w
            pair = prepool == "pair"
            dtype = self.dtype or x.dtype
            b, d, h, w, _ = x.shape
            wq = w // 2 if pair else w // 4       # pooled packed W
            dummy = jnp.zeros((b, d // 2, h // 2, wq, 2 * planes),
                              dtype)
            ks, mls, ads = [], [], []
            for i in range(blocks):
                k1, m1, a1, k2, m2, a2 = PackedBasicBlock(
                    planes, dtype=self.dtype, name=f"{name}_{i}")(
                        dummy, train, return_params=True)
                ks += [k1.astype(dtype), k2.astype(dtype)]
                mls += [m1, m2]
                ads += [a1, a2]
            from ..parallel.mesh import shard_map_data
            fn = fused_pool_layer1_pair if pair else fused_pool_layer1
            return unpack_w(shard_map_data(fn, x.astype(dtype),
                                           ks, mls, ads))
        # stride-1 dilation-1 identity-shortcut BasicBlock layers (layer1)
        # run whole-layer W-pair packed under conv mode 'roll': 64-channel
        # convs at 128 lanes through the rolling-ring kernel, BN/ReLU/
        # residual positionally local (models/packed.py::PackedBasicBlock,
        # identical variable tree).
        from .packed import (PackedBasicBlock, pack_w, supports_fused_layer,
                             supports_packed_layer, unpack_w)
        wpair = (stride == 1 and dilation == 1 and self.block is BasicBlock
                 and x.shape[-1] == planes * exp and x.shape[3] % 2 == 0)
        if wpair:
            xp_shape = x.shape[:3] + (x.shape[3] // 2, 2 * x.shape[-1])
            itemsize = jnp.dtype(self.dtype or x.dtype).itemsize
            # eval: the whole residual stack in ONE VMEM-resident Pallas
            # kernel (ops/layer1_kernel.py) — intermediate activations
            # never touch HBM (trunk prefix truth: XLA layer1 18.2 ms vs
            # ~6 ms roofline, DEVNOTES round 3d)
            if (not train) and supports_fused_layer(xp_shape, planes,
                                                    blocks, itemsize):
                from ..ops.layer1_kernel import fused_layer1
                dtype = self.dtype or x.dtype
                xp = pack_w(x.astype(dtype))
                ks, mls, ads = [], [], []
                for i in range(blocks):
                    k1, m1, a1, k2, m2, a2 = PackedBasicBlock(
                        planes, dtype=self.dtype, name=f"{name}_{i}")(
                            xp, train, return_params=True)
                    ks += [k1.astype(dtype), k2.astype(dtype)]
                    mls += [m1, m2]
                    ads += [a1, a2]
                from ..parallel.mesh import shard_map_data
                return unpack_w(shard_map_data(fused_layer1, xp,
                                               ks, mls, ads))
            wpair = supports_packed_layer(xp_shape, planes, itemsize)
        if wpair:
            pb_cls = (nn.remat(PackedBasicBlock, static_argnums=(2,))
                      if name in remat_scopes(self.remat)
                      else PackedBasicBlock)
            xp = pack_w(x)
            for i in range(blocks):
                xp = pb_cls(planes, dtype=self.dtype,
                            name=f"{name}_{i}")(xp, train)
            return unpack_w(xp)
        block_cls = (nn.remat(self.block, static_argnums=(2,))
                     if name in remat_scopes(self.remat) else self.block)
        # Dilated layers run ENTIRELY in the space-to-batch domain when the
        # spatial dims divide the dilation: one pack/unpack for the whole
        # layer instead of per conv (DilatedConv3d), eliminating dozens of
        # relayouts of the 33-66 MB layer3/4 activations.  Exact because
        # every per-block op is sub-grid-local: stride-1 convs couple only
        # same-residue voxels, BN statistics reduce over the same global
        # voxel set (batch-folded), ReLU/residual/shortcut-pad/1x1-convs
        # are pointwise.  Non-divisible shapes keep the per-conv lowering
        # (whole-layer zero-padding would leak non-zero pad values between
        # stacked convs).
        from . import blocks as _blocks
        from .blocks import (batch_to_space_3d, merge_w_subgrids,
                             space_to_batch_3d, unmerge_w_subgrids,
                             w_sep_mask)
        packed = (dilation > 1 and stride == 1
                  and all(s % dilation == 0 for s in x.shape[1:4]))
        eff_dil = 1 if packed else dilation
        if packed:
            x = space_to_batch_3d(x, dilation)
        # eval-only subgrid W-merge (see blocks.py): k subgrids side by side
        # with zero separators amortise the 8-sublane round-up of the tiny
        # subgrid W extents; separator re-zero before each conv keeps the
        # numerics exactly equal to the per-subgrid lowering
        km = min(_blocks.get_sgmerge_k(), dilation ** 3)
        merged = (packed and not train and km > 1
                  and dilation ** 3 % km == 0)
        w_sub = x.shape[3]
        if merged:
            x = merge_w_subgrids(x, km)
            _blocks._W_SEP_MASK = w_sep_mask(w_sub, km)
        try:
            need_ds = stride != 1 or x.shape[-1] != planes * exp
            x = block_cls(planes, stride, eff_dil, use_downsample=need_ds,
                          dtype=self.dtype, shortcut_type=self.shortcut_type,
                          name=f"{name}_0")(x, train)
            # eval: the stride-1 identity-shortcut TAIL (layer2 blocks
            # 1..n-1, 2.6 MB/item packed at the deployment shape) runs as
            # one VMEM-resident Pallas pass, same kernel as layer1 at 256
            # lanes.  Real-dilation layers (packed s2b domain) keep the
            # per-block path.
            tail = blocks - 1
            if ((not train) and tail >= 1 and dilation == 1
                    and self.block is BasicBlock and x.shape[3] % 2 == 0):
                xp_shape = x.shape[:3] + (x.shape[3] // 2, 2 * x.shape[-1])
                itemsize = jnp.dtype(self.dtype or x.dtype).itemsize
                if supports_fused_layer(xp_shape, planes, tail, itemsize):
                    from ..ops.layer1_kernel import fused_layer1
                    dtype = self.dtype or x.dtype
                    xp = pack_w(x.astype(dtype))
                    ks, mls, ads = [], [], []
                    for i in range(1, blocks):
                        k1, m1, a1, k2, m2, a2 = PackedBasicBlock(
                            planes, dtype=self.dtype, name=f"{name}_{i}")(
                                xp, train, return_params=True)
                        ks += [k1.astype(dtype), k2.astype(dtype)]
                        mls += [m1, m2]
                        ads += [a1, a2]
                    from ..parallel.mesh import shard_map_data
                    return unpack_w(shard_map_data(fused_layer1, xp,
                                                   ks, mls, ads))
            for i in range(1, blocks):
                x = block_cls(planes, 1, eff_dil, use_downsample=False,
                              dtype=self.dtype, name=f"{name}_{i}")(x, train)
        finally:
            if merged:
                _blocks._W_SEP_MASK = None
        if merged:
            x = unmerge_w_subgrids(x, km, w_sub)
        if packed:
            x = batch_to_space_3d(x, dilation)
        return x


class _Decoder(nn.Module):
    """U-Net-ish decoder: us1/us2/us3 (``med3d.py:215-229``).

    ``packed=True`` runs the conv/BN stages in the W-pair packed channel
    domain (``models/packed.py``) — same variable tree, ~2.3x faster
    64-channel convs on TPU (full lanes, no bf16 layout padding).  Requires
    even W at each decoder stage (always true for the /8-divisible model
    input contract)."""
    dtype: Optional[Dtype] = None
    remat: Any = False
    packed: bool = False
    cats_mode: str = "ndhwc"  # ``stem`` layout: ndhwc | quad | pair

    @nn.compact
    def __call__(self, x4, x1, stem, train: bool, fused_heads=None):
        do_remat = "decoder" in remat_scopes(self.remat)
        if self.packed:
            from .packed import (PackedConv3, PackedNormWrapper,
                                 PackedUpsampleConvBlock, pack_w,
                                 packed_stage, packed_stage_heads, unpack_w)
            up_cls = (nn.remat(PackedUpsampleConvBlock,
                               static_argnums=(3, 4))
                      if do_remat else PackedUpsampleConvBlock)
            xup1 = up_cls([64, 64], dtype=self.dtype,
                          name="us1")(x4, x1, train, "ndhwc")
            xup2 = up_cls([64, 64], dtype=self.dtype,
                          name="us2")(xup1, stem, train, self.cats_mode)
            if fused_heads is not None:
                # eval tail fusion (caller guarantees kernel support): the
                # f32 sigmoid dense maps come straight out of the us3 pass
                hw, hb = fused_heads
                return packed_stage_heads(
                    PackedConv3(32, dtype=self.dtype, name="us3_conv"),
                    PackedNormWrapper(dtype=self.dtype, name="us3_bn"),
                    pack_w(xup2), hw, hb)
            x = packed_stage(
                PackedConv3(32, dtype=self.dtype, name="us3_conv"),
                PackedNormWrapper(dtype=self.dtype, name="us3_bn"),
                pack_w(xup2), train)
            return unpack_w(x)
        up_cls = (nn.remat(UpsampleConvBlock, static_argnums=(3,))
                  if do_remat else UpsampleConvBlock)
        xup1 = up_cls([64, 64], dtype=self.dtype,
                      name="us1")(x4, x1, train)
        xup2 = up_cls([64, 64], dtype=self.dtype,
                      name="us2")(xup1, stem, train)
        x = conv3d(32, 3, bias=True, name="us3_conv", dtype=self.dtype)(xup2)
        x = NormWrapper(dtype=self.dtype, name="us3_bn")(x, train)
        return nn.relu(x)


class ResNetSegCls(nn.Module):
    """Classification variant (``med3d.py:187-285``): per-task dense logits
    + globally average-pooled classification logits."""
    block: Type[nn.Module] = BasicBlock
    layers: Sequence[int] = (3, 4, 6, 3)
    n_classes: Sequence[int] = (6, 3)
    dtype: Optional[Dtype] = None
    remat: Any = False
    shortcut_type: str = "A"
    packed_decoder: bool = False

    @nn.compact
    def __call__(self, x, lungs=None, train: bool = False):
        quad = use_quad_stem(x.shape, train, self.packed_decoder,
                             self.dtype or x.dtype)
        pair = (not quad) and use_pair_stem(x.shape, train,
                                            self.packed_decoder,
                                            self.dtype or x.dtype,
                                            self.layers[0])
        cats = "quad" if quad else ("pair" if pair else "ndhwc")
        stem, x1, x4 = _Trunk(self.block, self.layers, self.dtype,
                              self.remat, self.shortcut_type, quad, pair,
                              name="trunk")(x, train)
        xup3 = _Decoder(self.dtype, self.remat, self.packed_decoder, cats,
                        name="decoder")(x4, x1, stem, train)
        dense_outs = [conv3d(n, 1, bias=True, name=f"fc{i}",
                             dtype=self.dtype)(xup3)
                      for i, n in enumerate(self.n_classes)]
        cls_outs = [jnp.mean(d.astype(jnp.float32), axis=(1, 2, 3))
                    for d in dense_outs]
        return dense_outs, cls_outs


class _Conv1ParamTwin(nn.Module):
    """Parameter twin of a ``conv3d(n, 1, bias=True)`` 1x1x1 head: declares
    variables with identical names, shapes and initializers as the nn.Conv
    it stands in for (so checkpoints/torch import see the same tree), but
    returns the raw (kernel, bias) for the fused-head kernel path."""
    features: int
    cin: int

    @nn.compact
    def __call__(self):
        from .blocks import kaiming_normal_fan_out
        k = self.param("kernel", kaiming_normal_fan_out,
                       (1, 1, 1, self.cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class ResNetSegReg(nn.Module):
    """dRAM regression variant (``med3d.py:288-388``): sigmoid dense maps +
    lung-masked lesion fractions (CLE, PSE)."""
    block: Type[nn.Module] = BasicBlock
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Optional[Dtype] = None
    remat: Any = False
    shortcut_type: str = "A"
    packed_decoder: bool = False

    @nn.compact
    def __call__(self, x, lungs=None, train: bool = False):
        quad = use_quad_stem(x.shape, train, self.packed_decoder,
                             self.dtype or x.dtype)
        pair = (not quad) and use_pair_stem(x.shape, train,
                                            self.packed_decoder,
                                            self.dtype or x.dtype,
                                            self.layers[0])
        cats = "quad" if quad else ("pair" if pair else "ndhwc")
        stem, x1, x4 = _Trunk(self.block, self.layers, self.dtype,
                              self.remat, self.shortcut_type, quad, pair,
                              name="trunk")(x, train)
        # eval tail fusion: us3+BN+ReLU+heads+sigmoid in one Pallas pass
        # (models/packed.py::packed_stage_heads).  Decided from the STATIC
        # input shape so both branches declare the identical variable tree.
        from .packed import supports_fused_heads
        b, d, h, w = x.shape[:4]
        itemsize = jnp.dtype(self.dtype or x.dtype).itemsize
        fuse = (not train and self.packed_decoder
                and d % 2 == 0 and h % 2 == 0 and w % 4 == 0
                and supports_fused_heads((b, d // 2, h // 2, w // 4, 128),
                                         32, 2, itemsize))
        if fuse:
            heads = [_Conv1ParamTwin(1, 32, name=f"fc{i}")()
                     for i in range(2)]
            hw = jnp.concatenate([k.reshape(32, 1) for k, _ in heads], -1)
            hb = jnp.concatenate([bb for _, bb in heads])
            dense = _Decoder(self.dtype, self.remat, self.packed_decoder,
                             cats, name="decoder")(x4, x1, stem, train,
                                                   fused_heads=(hw, hb))
            dense_outs = [dense[..., 0:1], dense[..., 1:2]]
        else:
            xup3 = _Decoder(self.dtype, self.remat, self.packed_decoder,
                            cats, name="decoder")(x4, x1, stem, train)
            dense_outs = [
                jax.nn.sigmoid(
                    conv3d(1, 1, bias=True, name=f"fc{i}",
                           dtype=self.dtype)(xup3).astype(jnp.float32))
                for i in range(2)]
        if lungs is None:
            lungs = jnp.ones(x.shape[:1] + dense_outs[0].shape[1:4] + (1,),
                             jnp.float32)
        reg_outs = [lung_masked_fraction(d, lungs)[:, 0] for d in dense_outs]
        return dense_outs, reg_outs


class ResNet(nn.Module):
    """Plain classifier baseline (``med3d.py:427-501``): trunk + 1x1x1 conv
    head + global average pool; returns (logits, dense_predictions)."""
    block: Type[nn.Module] = BasicBlock
    layers: Sequence[int] = (3, 4, 6, 3)
    n_classes: int = 6
    dtype: Optional[Dtype] = None
    remat: Any = False
    shortcut_type: str = "A"

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, _, x4 = _Trunk(self.block, self.layers, self.dtype,
                          self.remat, self.shortcut_type,
                          name="trunk")(x, train)
        dense = conv3d(self.n_classes, 1, bias=True, name="fc",
                       dtype=self.dtype)(x4)
        logits = jnp.mean(dense.astype(jnp.float32), axis=(1, 2, 3))
        return logits, dense
