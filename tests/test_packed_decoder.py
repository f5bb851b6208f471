"""W-pair packed decoder (models/packed.py): exactness oracles.

The packed modules must be bit-comparable (up to float reassociation) with
their unpacked twins on the SAME parameters: conv outputs, BatchNorm
normalization AND running-statistic updates, and the full decoder block.
"""
import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from bodyct_dram_emph_subtype_tpu.models.packed import (
    PackedConv3,
    build_packed_kernel_k1,
    build_packed_kernel_k3,
    pack_w,
    unpack_w,
)


def _conv3d(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 3, 4, 6, 5).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unpack_w(pack_w(x))),
                                  np.asarray(x))
    # packing is a pure reshape of the flat buffer
    np.testing.assert_array_equal(
        np.asarray(pack_w(x)).ravel(), np.asarray(x).ravel())


def test_packed_kernel_k3_equals_logical_conv(rng):
    x = jnp.asarray(rng.randn(2, 5, 6, 8, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 3, 7).astype(np.float32))
    want = _conv3d(x, k)
    got = unpack_w(_conv3d(pack_w(x), build_packed_kernel_k3(k)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_kernel_k1_equals_logical_conv(rng):
    def conv1(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(0, 0)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    x = jnp.asarray(rng.randn(2, 4, 5, 6, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 1, 4, 9).astype(np.float32))
    want = conv1(x, k)
    got = unpack_w(conv1(pack_w(x), build_packed_kernel_k1(k)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_module_param_tree(rng):
    """PackedConv3 declares nn.Conv-compatible params (logical shapes)."""
    xp = pack_w(jnp.asarray(rng.randn(1, 4, 6, 8, 5).astype(np.float32)))
    mod = PackedConv3(11)
    v = mod.init(jax.random.PRNGKey(0), xp)
    assert v["params"]["kernel"].shape == (3, 3, 3, 5, 11)
    assert v["params"]["bias"].shape == (11,)


def test_packed_bn_matches_flax_batchnorm(rng):
    """Packed-domain BN: normalization and running-stat update equal flax
    ``nn.BatchNorm`` on the unpacked tensor (combined-parity moments)."""
    from bodyct_dram_emph_subtype_tpu.models.packed import _PackedBN

    x = jnp.asarray((3 + 2 * rng.randn(2, 4, 6, 8, 5)).astype(np.float32))

    ref_bn = nn.BatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5)
    rv = ref_bn.init(jax.random.PRNGKey(0), x)
    want, want_mut = ref_bn.apply(rv, x, mutable=["batch_stats"])

    packed_bn = _PackedBN()
    pv = packed_bn.init(jax.random.PRNGKey(0), pack_w(x), train=True)
    got_p, got_mut = packed_bn.apply(pv, pack_w(x), train=True,
                                     mutable=["batch_stats"])
    got = unpack_w(got_p)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_mut["batch_stats"]["mean"]),
        np.asarray(want_mut["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_mut["batch_stats"]["var"]),
        np.asarray(want_mut["batch_stats"]["var"]), rtol=1e-4, atol=1e-5)

    # eval mode uses the running stats identically
    ev_ref = ref_bn.bind({"params": rv["params"],
                          "batch_stats": want_mut["batch_stats"]})
    want_eval = nn.BatchNorm(use_running_average=True).apply(
        {"params": rv["params"],
         "batch_stats": want_mut["batch_stats"]}, x)
    got_eval = unpack_w(packed_bn.apply(
        {"params": pv["params"],
         "batch_stats": got_mut["batch_stats"]}, pack_w(x), train=False))
    np.testing.assert_allclose(np.asarray(got_eval), np.asarray(want_eval),
                               rtol=1e-4, atol=1e-5)


def test_packed_model_forward_and_train_match_unpacked(rng):
    """Full model: packed_decoder=True on the SAME params matches the
    unpacked model, in eval AND train mode (batch-stats updates too)."""
    from bodyct_dram_emph_subtype_tpu.models.resnet3d import ResNetSegReg

    x = jnp.asarray(rng.randn(2, 16, 32, 32, 1).astype(np.float32))
    lungs = jnp.ones_like(x)
    m0 = ResNetSegReg(layers=(1, 1, 1, 1))
    m1 = ResNetSegReg(layers=(1, 1, 1, 1), packed_decoder=True)
    v = m0.init(jax.random.PRNGKey(0), x, lungs, train=False)
    assert (jax.tree_util.tree_structure(
        m1.init(jax.random.PRNGKey(0), x, lungs, train=False))
        == jax.tree_util.tree_structure(v))

    d0, r0 = m0.apply(v, x, lungs, train=False)
    d1, r1 = m1.apply(v, x, lungs, train=False)
    np.testing.assert_allclose(np.asarray(d1[0]), np.asarray(d0[0]),
                               rtol=1e-4, atol=1e-5)

    (_, mut0) = m0.apply(v, x, lungs, train=True, mutable=["batch_stats"])
    (_, mut1) = m1.apply(v, x, lungs, train=True, mutable=["batch_stats"])
    for a, b in zip(jax.tree.leaves(mut0), jax.tree.leaves(mut1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_packed_model_roll_mode_matches_direct(rng):
    """Conv mode 'roll' (rolling-ring Pallas kernel, interpret mode) on the
    packed model == mode 'direct' on the same params, in eval mode (fused
    conv+BN+ReLU epilogue from running stats) and train mode (plain roll
    conv, batch-stats updates).  layers=(1, 2, 1, 1) at D=32 engages the
    eval resident paths: fused pool+layer1 AND the layer2 identity tail
    (256 lanes)."""
    from jax.experimental.pallas import tpu as pltpu

    from bodyct_dram_emph_subtype_tpu.models import packed as packed_mod
    from bodyct_dram_emph_subtype_tpu.models.blocks import set_conv3d_mode
    from bodyct_dram_emph_subtype_tpu.models.resnet3d import ResNetSegReg

    x = jnp.asarray(rng.randn(1, 32, 32, 32, 1).astype(np.float32))
    lungs = jnp.ones_like(x)
    m = ResNetSegReg(layers=(1, 2, 1, 1), packed_decoder=True)
    v = m.init(jax.random.PRNGKey(0), x, lungs, train=False)
    d0, r0 = m.apply(v, x, lungs, train=False)
    (_, mut0) = m.apply(v, x, lungs, train=True, mutable=["batch_stats"])
    min_elems = packed_mod._ROLL_MIN_ELEMS
    try:
        set_conv3d_mode("roll")
        packed_mod._ROLL_MIN_ELEMS = 0   # tiny test shapes must take roll
        with pltpu.force_tpu_interpret_mode():
            d1, r1 = m.apply(v, x, lungs, train=False)
            (_, mut1) = m.apply(v, x, lungs, train=True,
                                mutable=["batch_stats"])
    finally:
        set_conv3d_mode("direct")
        packed_mod._ROLL_MIN_ELEMS = min_elems
    np.testing.assert_allclose(np.asarray(d1[0]), np.asarray(d0[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1[0]), np.asarray(r0[0]),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(mut0), jax.tree.leaves(mut1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_s2d_stem_conv_matches_direct(rng):
    """Space-to-depth stem conv == direct k7 s2 conv (same params), and the
    odd-dims fallback is exact."""
    from bodyct_dram_emph_subtype_tpu.models.packed import StemConvS2D

    def direct(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2, 2), [(3, 3)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    mod = StemConvS2D(6)
    x = jnp.asarray(rng.randn(2, 16, 20, 24, 1).astype(np.float32))
    v = mod.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(mod.apply(v, x)),
                               np.asarray(direct(x, v["params"]["kernel"])),
                               rtol=1e-4, atol=1e-5)
    x_odd = jnp.asarray(rng.randn(1, 15, 20, 24, 1).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(mod.apply(v, x_odd)),
        np.asarray(direct(x_odd, v["params"]["kernel"])))


def test_fused_heads_model_path_matches_unfused(rng):
    """The eval tail fusion (us3+BN+ReLU+heads+sigmoid in one Pallas pass,
    ``resnet3d.py`` fused-heads branch) produces the same dense maps and
    regressions as the unfused direct path on the same params, and both
    branches declare the IDENTICAL variable tree (same names, shapes and
    init values) so checkpoints are interchangeable."""
    from jax.experimental.pallas import tpu as pltpu

    from bodyct_dram_emph_subtype_tpu.models import packed as packed_mod
    from bodyct_dram_emph_subtype_tpu.models.blocks import set_conv3d_mode
    from bodyct_dram_emph_subtype_tpu.models.resnet3d import ResNetSegReg

    x = jnp.asarray(rng.randn(1, 16, 32, 32, 1).astype(np.float32) * 0.2)
    lungs = jnp.asarray((rng.rand(1, 8, 16, 16, 1) > 0.3).astype(np.float32))
    m = ResNetSegReg(layers=(1, 1, 1, 1), packed_decoder=True)
    v = m.init(jax.random.PRNGKey(0), x, lungs, train=False)
    d0, r0 = m.apply(v, x, lungs, train=False)

    min_elems = packed_mod._ROLL_MIN_ELEMS
    try:
        set_conv3d_mode("roll")
        packed_mod._ROLL_MIN_ELEMS = 0
        with pltpu.force_tpu_interpret_mode():
            d1, r1 = m.apply(v, x, lungs, train=False)
            v2 = m.init(jax.random.PRNGKey(0), x, lungs, train=False)
    finally:
        set_conv3d_mode("direct")
        packed_mod._ROLL_MIN_ELEMS = min_elems
    for i in range(2):
        np.testing.assert_allclose(np.asarray(d1[i]), np.asarray(d0[i]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r1[i]), np.asarray(r0[i]),
                                   rtol=1e-4, atol=1e-5)
    assert jax.tree.structure(v2) == jax.tree.structure(v)
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_s2d_stem_factor_variants_match_direct(rng):
    """Every s2d block-factor variant of the stem conv (Cin 8/32/64 forms)
    computes the exact same k7 s2 conv, and non-divisible dims fall back
    to the classic (2,2,2) mapping."""
    from bodyct_dram_emph_subtype_tpu.models.packed import (
        StemConvS2D, get_stem_s2d_factors, set_stem_s2d_factors)

    def direct(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2, 2), [(3, 3)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    mod = StemConvS2D(6)
    x = jnp.asarray(rng.randn(1, 8, 16, 16, 1).astype(np.float32))
    v = mod.init(jax.random.PRNGKey(0), x)
    ref = direct(x, v["params"]["kernel"])
    saved = get_stem_s2d_factors()
    try:
        for f in [(2, 4, 4), (4, 4, 4), (2, 2, 8), (4, 4, 2)]:
            set_stem_s2d_factors(f)
            np.testing.assert_allclose(np.asarray(mod.apply(v, x)),
                                       np.asarray(ref),
                                       rtol=1e-4, atol=1e-5, err_msg=str(f))
        # dims not divisible by the factors: exact classic fallback
        set_stem_s2d_factors((4, 4, 4))
        x2 = jnp.asarray(rng.randn(1, 6, 10, 10, 1).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(mod.apply(v, x2)),
            np.asarray(direct(x2, v["params"]["kernel"])),
            rtol=1e-4, atol=1e-5)
    finally:
        set_stem_s2d_factors(saved)


def test_pair_output_stem_is_packed_stem(rng):
    """``StemConvS2D(pair_output=True)`` returns the (2,2,4)-factor native
    conv output, which IS ``pack_w(stem_ndhwc)`` (128-lane W-pair layout,
    zero unshuffle) up to tap-summation rounding."""
    from bodyct_dram_emph_subtype_tpu.models.packed import (
        StemConvS2D, get_stem_s2d_factors, pack_w, set_stem_s2d_factors)

    mod = StemConvS2D(6)
    x = jnp.asarray(rng.randn(2, 8, 12, 16, 1).astype(np.float32))
    v = mod.init(jax.random.PRNGKey(0), x)
    saved = get_stem_s2d_factors()
    try:
        set_stem_s2d_factors((2, 2, 2))
        ref = pack_w(mod.apply(v, x))
    finally:
        set_stem_s2d_factors(saved)
    pair = StemConvS2D(6, pair_output=True).apply(v, x)
    assert pair.shape == ref.shape
    np.testing.assert_allclose(np.asarray(pair), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_packed_layer1_matches_unpacked(rng):
    """Whole-layer W-pair packed layer1 (PackedBasicBlock, roll mode) ==
    the unpacked BasicBlock layer on the same params, eval AND train
    (incl. batch-stats updates), with an identical variable tree."""
    from jax.experimental.pallas import tpu as pltpu

    from bodyct_dram_emph_subtype_tpu.models import packed as packed_mod
    from bodyct_dram_emph_subtype_tpu.models.blocks import set_conv3d_mode
    from bodyct_dram_emph_subtype_tpu.models.resnet3d import ResNetSegReg

    x = jnp.asarray(rng.randn(1, 16, 32, 32, 1).astype(np.float32) * 0.2)
    lungs = jnp.ones((1, 8, 16, 16, 1), jnp.float32)
    m = ResNetSegReg(layers=(2, 1, 1, 1), packed_decoder=True)
    v = m.init(jax.random.PRNGKey(0), x, lungs, train=False)
    d0, r0 = m.apply(v, x, lungs, train=False)
    (_, mut0) = m.apply(v, x, lungs, train=True, mutable=["batch_stats"])

    min_elems = packed_mod._ROLL_MIN_ELEMS
    try:
        set_conv3d_mode("roll")
        packed_mod._ROLL_MIN_ELEMS = 0
        with pltpu.force_tpu_interpret_mode():
            d1, r1 = m.apply(v, x, lungs, train=False)
            (_, mut1) = m.apply(v, x, lungs, train=True,
                                mutable=["batch_stats"])
            v2 = m.init(jax.random.PRNGKey(0), x, lungs, train=False)
    finally:
        set_conv3d_mode("direct")
        packed_mod._ROLL_MIN_ELEMS = min_elems
    for i in range(2):
        np.testing.assert_allclose(np.asarray(d1[i]), np.asarray(d0[i]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r1[i]), np.asarray(r0[i]),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(mut0), jax.tree.leaves(mut1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    assert jax.tree.structure(v2) == jax.tree.structure(v)


def test_quad_stem_pool_path_matches_direct(rng):
    """The quad-layout stem->pool path (StemConvS2D quad_output ->
    folded BN/ReLU on 256 lanes -> max_pool_quads -> packed decoder
    concat) == the direct-mode model on the same params, with an
    IDENTICAL variable tree (checkpoint compatibility)."""
    from jax.experimental.pallas import tpu as pltpu

    from bodyct_dram_emph_subtype_tpu.models import packed as packed_mod
    from bodyct_dram_emph_subtype_tpu.models.blocks import set_conv3d_mode
    from bodyct_dram_emph_subtype_tpu.models.resnet3d import (
        ResNetSegReg, set_quad_stem_enable, use_quad_stem)

    from bodyct_dram_emph_subtype_tpu.ops.stem_kernel import (
        supports_fused_stem)

    # (1,16,...) takes the fused stem kernel; (1,8,...) the quad
    # StemConvS2D + max_pool_quads fallback (d < 16)
    for dd, fused in [(16, True), (8, False)]:
        x = jnp.asarray(
            rng.randn(1, dd, 32, 32, 1).astype(np.float32) * 0.2)
        lungs = jnp.asarray(
            (rng.rand(1, dd // 2, 16, 16, 1) > 0.3).astype(np.float32))
        assert supports_fused_stem(x.shape) == fused
        m = ResNetSegReg(layers=(1, 1, 1, 1), packed_decoder=True)
        v = m.init(jax.random.PRNGKey(0), x, lungs, train=False)
        d0, r0 = m.apply(v, x, lungs, train=False)

        min_elems = packed_mod._ROLL_MIN_ELEMS
        try:
            set_conv3d_mode("roll")
            set_quad_stem_enable(True)
            packed_mod._ROLL_MIN_ELEMS = 0
            assert use_quad_stem(x.shape, False, True, jnp.float32)
            with pltpu.force_tpu_interpret_mode():
                d1, r1 = m.apply(v, x, lungs, train=False)
                v2 = m.init(jax.random.PRNGKey(0), x, lungs, train=False)
        finally:
            set_conv3d_mode("direct")
            set_quad_stem_enable(False)
            packed_mod._ROLL_MIN_ELEMS = min_elems
        for i in range(2):
            np.testing.assert_allclose(np.asarray(d1[i]), np.asarray(d0[i]),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(r1[i]), np.asarray(r0[i]),
                                       rtol=1e-4, atol=1e-5)
        assert jax.tree.structure(v2) == jax.tree.structure(v)
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
            assert a.shape == b.shape
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pair_stem_pool_path_matches_direct(rng):
    """The pair-output stem path (StemConvS2D pair_output -> folded
    BN/ReLU on 128 lanes -> fused_pool_layer1_pair -> packed decoder
    pair concat) == the direct-mode model on the same params, with an
    IDENTICAL variable tree (checkpoint compatibility)."""
    from jax.experimental.pallas import tpu as pltpu

    from bodyct_dram_emph_subtype_tpu.models import packed as packed_mod
    from bodyct_dram_emph_subtype_tpu.models.blocks import set_conv3d_mode
    from bodyct_dram_emph_subtype_tpu.models.resnet3d import (
        ResNetSegReg, set_pair_stem_enable, use_pair_stem)

    x = jnp.asarray(rng.randn(1, 16, 32, 32, 1).astype(np.float32) * 0.2)
    lungs = jnp.asarray(
        (rng.rand(1, 8, 16, 16, 1) > 0.3).astype(np.float32))
    m = ResNetSegReg(layers=(2, 1, 1, 1), packed_decoder=True)
    v = m.init(jax.random.PRNGKey(0), x, lungs, train=False)
    d0, r0 = m.apply(v, x, lungs, train=False)

    min_elems = packed_mod._ROLL_MIN_ELEMS
    try:
        set_conv3d_mode("roll")
        set_pair_stem_enable(True)
        packed_mod._ROLL_MIN_ELEMS = 0
        assert use_pair_stem(x.shape, False, True, jnp.float32, 2)
        assert not use_pair_stem(x.shape, True, True, jnp.float32, 2)
        assert not use_pair_stem(x.shape, False, False, jnp.float32, 2)
        with pltpu.force_tpu_interpret_mode():
            d1, r1 = m.apply(v, x, lungs, train=False)
            v2 = m.init(jax.random.PRNGKey(0), x, lungs, train=False)
    finally:
        set_conv3d_mode("direct")
        set_pair_stem_enable(False)
        packed_mod._ROLL_MIN_ELEMS = min_elems
    for i in range(2):
        np.testing.assert_allclose(np.asarray(d1[i]), np.asarray(d0[i]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r1[i]), np.asarray(r0[i]),
                                   rtol=1e-4, atol=1e-5)
    assert jax.tree.structure(v2) == jax.tree.structure(v)
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_max_pool_quads_matches_reduce_window(rng):
    """max_pool_quads on the quad-lane view == reduce_window on NDHWC,
    output in the W-pair packed layout."""
    from jax.experimental.pallas import tpu as pltpu

    from bodyct_dram_emph_subtype_tpu.ops.maxpool_kernel import (
        max_pool_quads, supports_maxpool_quads)

    for shape in [(1, 4, 8, 8, 32), (2, 6, 10, 12, 32)]:
        b, d, h, w, c = shape
        assert supports_maxpool_quads((b, d, h, w // 4, 4 * c))
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        ref = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
        with pltpu.force_tpu_interpret_mode():
            got = max_pool_quads(x.reshape(b, d, h, w // 4, 4 * c))
        np.testing.assert_array_equal(
            np.asarray(unpack_w(got)), np.asarray(ref))
