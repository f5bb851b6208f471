"""Pallas kernel tests (interpret mode on the CPU mesh)."""
import numpy as np

import jax.numpy as jnp

from bodyct_dram_emph_subtype_tpu.ops.masked_pool import lung_masked_fraction
from bodyct_dram_emph_subtype_tpu.ops.pallas_kernels import (
    lung_masked_fraction_pallas,
    masked_sums_pallas,
)


def test_masked_sums_matches_jnp(rng):
    dense = rng.rand(2, 6, 16, 128, 2).astype(np.float32)
    lung = (rng.rand(2, 6, 16, 128, 1) > 0.4).astype(np.float32)
    num, den = masked_sums_pallas(jnp.asarray(dense), jnp.asarray(lung),
                                  interpret=True)
    want_num = (dense * lung).sum(axis=(1, 2, 3))
    want_den = lung.sum(axis=(1, 2, 3, 4))
    np.testing.assert_allclose(np.asarray(num), want_num, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(den), want_den, rtol=1e-6)


def test_fraction_matches_reference_op(rng):
    dense = rng.rand(1, 4, 8, 128, 1).astype(np.float32)
    lung = (rng.rand(1, 4, 8, 128, 1) > 0.3).astype(np.float32)
    got = lung_masked_fraction_pallas(jnp.asarray(dense), jnp.asarray(lung),
                                      interpret=True)
    want = lung_masked_fraction(jnp.asarray(dense), jnp.asarray(lung))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_pallas_conv3d_matches_direct(rng):
    """Pallas im2col conv (interpret mode on CPU) == direct XLA 3-D conv,
    including the custom-VJP backward."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from bodyct_dram_emph_subtype_tpu.ops.pallas_conv import (
        _direct_conv3d, pallas_conv3d)

    x = jnp.asarray(rng.randn(2, 4, 14, 12, 6).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 6, 16).astype(np.float32))
    ref = _direct_conv3d(x, k)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_conv3d(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss_pl(x, k):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(pallas_conv3d(x, k) ** 2)

    g_pl = jax.grad(loss_pl, argnums=(0, 1))(x, k)
    g_ref = jax.grad(lambda x, k: jnp.sum(_direct_conv3d(x, k) ** 2),
                     argnums=(0, 1))(x, k)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-2)


def test_tap_conv3d_matches_direct(rng):
    """Tap-matmul conv (interpret mode on CPU) == direct XLA 3-D conv,
    including the custom-VJP backward and the odd-H boundary tiles."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from bodyct_dram_emph_subtype_tpu.ops.tap_conv import (
        _direct_conv3d, supports_tap_conv3d, tap_conv3d)

    x = jnp.asarray(rng.randn(2, 4, 8, 24, 6).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 6, 16).astype(np.float32))
    assert supports_tap_conv3d(x.shape, k.shape, (1, 1, 1), 4)
    ref = _direct_conv3d(x, k)
    with pltpu.force_tpu_interpret_mode():
        out = tap_conv3d(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss_pl(x, k):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(tap_conv3d(x, k) ** 2)

    g_pl = jax.grad(loss_pl, argnums=(0, 1))(x, k)
    g_ref = jax.grad(lambda x, k: jnp.sum(_direct_conv3d(x, k) ** 2),
                     argnums=(0, 1))(x, k)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-2)


def test_tap_conv3d_weight_streaming(rng):
    """The output-channel-chunked (weight-streaming) plan matches the
    unchunked kernel and the direct conv."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from bodyct_dram_emph_subtype_tpu.ops.tap_conv import (
        _direct_conv3d, _tap_conv3d_impl)

    x = jnp.asarray(rng.randn(1, 3, 8, 26, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 8, 32).astype(np.float32))
    ref = _direct_conv3d(x, k)
    with pltpu.force_tpu_interpret_mode():
        out = _tap_conv3d_impl(x, k, plan=(4, 2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def test_gates():
        from bodyct_dram_emph_subtype_tpu.ops.tap_conv import (
            supports_tap_conv3d)
        # strided / non-3^3 / narrow rows all refuse
        assert not supports_tap_conv3d((1, 4, 8, 24, 8), (3, 3, 3, 8, 16),
                                       (2, 2, 2))
        assert not supports_tap_conv3d((1, 4, 8, 24, 8), (1, 1, 1, 8, 16),
                                       (1, 1, 1))
        assert not supports_tap_conv3d((1, 4, 8, 9, 8), (3, 3, 3, 8, 16),
                                       (1, 1, 1))
    test_gates()


def test_roll_conv_matches_direct(rng):
    """Rolling-ring packed conv (interpret mode) == direct conv in the
    packed domain, across single- and multi-W-tile plans, plus the VJP."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from bodyct_dram_emph_subtype_tpu.models.packed import pack_w
    from bodyct_dram_emph_subtype_tpu.ops.roll_conv import (
        _direct_packed_reference, _roll_conv_impl, roll_conv_packed,
        supports_roll_conv)

    # single tile; tiny channels keep interpret mode fast, so the shape
    # sits below the 128-lane deployment gate (sub-lane-tile packed inputs
    # fail Mosaic on real hardware — us3's dgrad) and the impl is driven
    # directly
    x = jnp.asarray(rng.randn(2, 5, 6, 16, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 6).astype(np.float32))
    xp = pack_w(x)
    assert not supports_roll_conv(xp.shape, k.shape, 4)
    assert supports_roll_conv((4, 64, 112, 72, 128), (3, 3, 3, 64, 64))
    ref = _direct_packed_reference(xp, k)
    with pltpu.force_tpu_interpret_mode():
        out = roll_conv_packed(xp, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # multiple W tiles (Wh=40 -> five tiles of 8)
    x2 = jnp.asarray(rng.randn(1, 4, 6, 80, 4).astype(np.float32))
    k2 = jnp.asarray(rng.randn(3, 3, 3, 4, 4).astype(np.float32))
    xp2 = pack_w(x2)
    ref2 = _direct_packed_reference(xp2, k2)
    with pltpu.force_tpu_interpret_mode():
        out2 = _roll_conv_impl(xp2, k2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-4, atol=1e-4)

    # Wh not a multiple of 8 (W=36 -> Wh=18 -> padded plan on WhP=24)
    x3 = jnp.asarray(rng.randn(1, 4, 6, 36, 4).astype(np.float32))
    k3 = jnp.asarray(rng.randn(3, 3, 3, 4, 4).astype(np.float32))
    xp3 = pack_w(x3)
    ref3 = _direct_packed_reference(xp3, k3)
    with pltpu.force_tpu_interpret_mode():
        out3 = _roll_conv_impl(xp3, k3)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3),
                               rtol=1e-4, atol=1e-4)

    # fused affine + ReLU epilogue (eval-mode BN folded into scale/shift)
    from bodyct_dram_emph_subtype_tpu.ops.roll_conv import \
        roll_conv_affine_relu
    sc = jnp.asarray(rng.rand(12).astype(np.float32) + 0.5)
    sh = jnp.asarray(rng.randn(12).astype(np.float32))
    ref_f = jnp.maximum(ref * sc + sh, 0.0)
    with pltpu.force_tpu_interpret_mode():
        out_f = roll_conv_affine_relu(xp, k, sc, sh)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               rtol=1e-4, atol=1e-4)

    def loss_pl(xp, k):
        return jnp.sum(roll_conv_packed(xp, k) ** 2)

    # the whole grad call sits inside interpret mode: the custom-VJP bwd
    # (which now runs the rolling-ring kernel for dgrad) is traced during
    # the backward pass, outside the forward's trace context
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss_pl, argnums=(0, 1))(xp, k)

    # full-lane shape so the bwd takes the Pallas dgrad branch (tiny
    # shapes above fall back to XLA via the 128-lane gate)
    xl = jnp.asarray(rng.randn(1, 4, 5, 6, 128).astype(np.float32) * 0.1)
    kl = jnp.asarray(rng.randn(3, 3, 3, 64, 64).astype(np.float32) * 0.05)
    assert supports_roll_conv(xl.shape, kl.shape, 4)
    with pltpu.force_tpu_interpret_mode():
        gl = jax.grad(loss_pl, argnums=(0, 1))(xl, kl)
    gl_ref = jax.grad(
        lambda xp, k: jnp.sum(_direct_packed_reference(xp, k) ** 2),
        argnums=(0, 1))(xl, kl)
    for a, b in zip(gl, gl_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
    g_ref = jax.grad(
        lambda xp, k: jnp.sum(_direct_packed_reference(xp, k) ** 2),
        argnums=(0, 1))(xp, k)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-2)

    # us3-class backward: the conv's OUTPUT grad has 2x32 = 64 packed
    # lanes (half a lane tile — Mosaic-fatal on chip); the bwd must take
    # the LANE-PADDED roll dgrad (round 5: _pad_pair_lanes + zeroed
    # kernel rows, exact) and match the direct VJP
    x64 = jnp.asarray(rng.randn(1, 4, 5, 12, 128).astype(np.float32) * 0.1)
    k64 = jnp.asarray(rng.randn(3, 3, 3, 64, 32).astype(np.float32) * 0.05)
    # the OUTPUT grad of this conv has 64 lanes — the plain roll dgrad
    # is gated (sub-lane tile), the padded path must serve it
    assert not supports_roll_conv(
        (1, 4, 5, 12, 64), (3, 3, 3, 32, 64), 4)
    with pltpu.force_tpu_interpret_mode():
        g64 = jax.grad(loss_pl, argnums=(0, 1))(x64, k64)
    g64_ref = jax.grad(
        lambda xp, k: jnp.sum(_direct_packed_reference(xp, k) ** 2),
        argnums=(0, 1))(x64, k64)
    for a, b in zip(g64, g64_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-2)


def test_flat_conv3d_matches_direct(rng):
    """Plane-flat im2col conv (interpret mode) == XLA direct conv at
    layer3/4-like s2b shapes (full-lane channels, tiny planes), incl. the
    O-chunked weight-streaming path and the VJP."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from bodyct_dram_emph_subtype_tpu.ops.flat_conv import (
        _direct_reference, _flat_conv_impl, flat_conv3d, supports_flat_conv)

    # layer4-like subgrid geometry, scaled down in N
    x = jnp.asarray(rng.randn(2, 4, 7, 9, 128).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 128, 128).astype(np.float32))
    assert supports_flat_conv(x.shape, k.shape, 4)
    ref = _direct_reference(x, k)
    with pltpu.force_tpu_interpret_mode():
        out = flat_conv3d(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # O-chunking: a tight budget forces OC=128 over two chunks
    k2 = jnp.asarray(rng.randn(3, 3, 3, 128, 256).astype(np.float32))
    ref2 = _direct_reference(x, k2)
    with pltpu.force_tpu_interpret_mode():
        out2 = _flat_conv_impl(x, k2, vmem_budget=4 * 1024 * 1024)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-4, atol=1e-4)

    # layer3-like geometry (even H/W mix, D=8)
    x3 = jnp.asarray(rng.randn(1, 8, 6, 5, 128).astype(np.float32))
    ref3 = _direct_reference(x3, k)
    with pltpu.force_tpu_interpret_mode():
        out3 = _flat_conv_impl(x3, k)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3),
                               rtol=1e-4, atol=1e-4)

    # gates: non-3^3 kernel, non-128-multiple channels, huge planes refuse
    assert not supports_flat_conv((2, 4, 7, 9, 128), (1, 1, 1, 128, 128))
    assert not supports_flat_conv((2, 4, 7, 9, 64), (3, 3, 3, 64, 128))
    assert not supports_flat_conv((2, 16, 28, 36, 128), (3, 3, 3, 128, 128))

    def loss_pl(x, k):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(flat_conv3d(x, k) ** 2)

    g_pl = jax.grad(loss_pl, argnums=(0, 1))(x, k)
    g_ref = jax.grad(
        lambda x, k: jnp.sum(_direct_reference(x, k) ** 2),
        argnums=(0, 1))(x, k)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-2)


def test_roll_conv_wgrad_matches_xla(rng):
    """Rolling-ring wgrad kernel (interpret mode) == XLA's weight-gradient
    contraction of the packed conv, across single- and multi-W-tile plans
    and batch > 1 (the accumulator must integrate over the whole grid)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from bodyct_dram_emph_subtype_tpu.models.packed import pack_w
    from bodyct_dram_emph_subtype_tpu.ops.roll_conv import (
        _direct_packed_reference, _wgrad_plan, roll_conv_wgrad,
        supports_roll_wgrad)

    # deployment gate: full-lane operands qualify, sub-lane ones don't.
    # The us1_conv1-class (C=576 compact) qualifies at the 52 MB default
    # budget (its 10.6 MB accumulator fits); the crowd-out exclusion
    # still fires under the old 20 MB budget.
    assert supports_roll_wgrad((4, 64, 112, 72, 128), (3, 3, 3, 64, 64))
    assert supports_roll_wgrad((4, 64, 112, 72, 256), (3, 3, 3, 128, 64))
    assert not supports_roll_wgrad((4, 64, 112, 72, 128), (3, 3, 3, 64, 32))
    assert supports_roll_wgrad((4, 32, 56, 36, 1152), (3, 3, 3, 576, 64))
    assert _wgrad_plan((4, 32, 56, 36, 1152), 64, 2,
                       vmem_budget=20 * 1024 * 1024) is None

    for (b, d, h, w, c, o) in ((2, 4, 5, 12, 64, 64),    # single W tile
                               (1, 3, 4, 32, 64, 64),    # two W tiles
                               (2, 3, 4, 20, 64, 64),    # Wh=10 -> padded
                               (1, 3, 4, 16, 192, 64)):  # compact C%64 edge
        x = jnp.asarray(rng.randn(b, d, h, w, c).astype(np.float32) * 0.1)
        g = jnp.asarray(rng.randn(b, d, h, w, o).astype(np.float32) * 0.1)
        xp, gp = pack_w(x), pack_w(g)
        dk_ref = jax.grad(lambda k: jnp.sum(
            _direct_packed_reference(xp, k) * gp))(
                jnp.zeros((3, 3, 3, c, o), jnp.float32))
        with pltpu.force_tpu_interpret_mode():
            dk = roll_conv_wgrad(xp, gp, (3, 3, 3, c, o))
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                                   rtol=1e-3, atol=1e-3,
                                   err_msg=f"{(b, d, h, w, c, o)}")


def test_roll_conv_compact_patch_scheme(rng):
    """The compact K=4C patch scheme (lane-rolled edge block, 75%-useful
    weight matrices) must equal the wide K=6C scheme and the direct conv —
    forward, fused-affine, dgrad and the wgrad fold-back."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from bodyct_dram_emph_subtype_tpu.models.packed import pack_w
    from bodyct_dram_emph_subtype_tpu.ops import roll_conv as rc

    x = jnp.asarray(rng.randn(1, 4, 6, 16, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 4).astype(np.float32))
    xp = pack_w(x)
    ref = rc._direct_packed_reference(xp, k)

    g = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))
    dk_ref = jax.grad(lambda kk: jnp.sum(
        rc._direct_packed_reference(xp, kk) * g))(k)

    outs = {}
    wgrads = {}
    try:
        for scheme in ("wide", "compact"):
            rc.set_roll_patch_scheme(scheme)
            with pltpu.force_tpu_interpret_mode():
                outs[scheme] = rc._roll_conv_impl(xp, k)
                wgrads[scheme] = rc.roll_conv_wgrad(xp, g, k.shape)
    finally:
        rc.set_roll_patch_scheme("auto")
    for scheme in ("wide", "compact"):
        np.testing.assert_allclose(np.asarray(outs[scheme]), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(wgrads[scheme]),
                                   np.asarray(dk_ref), rtol=1e-3, atol=1e-3)


def test_roll_heads_sigmoid_matches_composition(rng):
    """Fused us3-tail kernel (conv+affine+ReLU+1x1 heads+bias+sigmoid in
    one Pallas pass) == the op-by-op composition, across both patch
    schemes, a multi-tile plan and a non-8-multiple Wh."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from bodyct_dram_emph_subtype_tpu.models.packed import unpack_w
    from bodyct_dram_emph_subtype_tpu.ops import roll_conv as rc

    C, O, HN = 4, 6, 2
    k = jnp.asarray(rng.randn(3, 3, 3, C, O).astype(np.float32) * 0.2)
    sc = jnp.asarray(rng.rand(2 * O).astype(np.float32) + 0.5)
    sh = jnp.asarray(rng.randn(2 * O).astype(np.float32) * 0.2)
    hw = jnp.asarray(rng.randn(O, HN).astype(np.float32) * 0.3)
    hb = jnp.asarray(rng.randn(HN).astype(np.float32) * 0.1)

    def compose(xp):
        conv = rc._direct_packed_reference(xp, k).astype(jnp.float32)
        act = jnp.maximum(conv * sc.reshape(1, 1, 1, 1, -1)
                          + sh.reshape(1, 1, 1, 1, -1), 0.0)
        logit = jnp.einsum("...c,ch->...h", unpack_w(act), hw,
                           preferred_element_type=jnp.float32) + hb
        return jax.nn.sigmoid(logit)

    assert rc.supports_roll_heads((4, 64, 112, 72, 128), (3, 3, 3, 64, 32),
                                  2)
    assert not rc.supports_roll_heads((4, 1, 112, 72, 128),
                                      (3, 3, 3, 64, 32), 2)  # D < 2

    for shape, scheme in [((2, 5, 6, 8, 2 * C), "wide"),
                          ((2, 5, 6, 8, 2 * C), "compact"),
                          ((1, 4, 6, 40, 2 * C), "auto"),   # 5 W tiles
                          ((1, 4, 6, 18, 2 * C), "auto")]:  # padded WhP
        xp = jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.3)
        try:
            rc.set_roll_patch_scheme(scheme)
            with pltpu.force_tpu_interpret_mode():
                fused = rc.roll_conv_heads_sigmoid(xp, k, sc, sh, hw, hb)
        finally:
            rc.set_roll_patch_scheme("auto")
        np.testing.assert_allclose(np.asarray(unpack_w(fused)),
                                   np.asarray(compose(xp)),
                                   rtol=1e-5, atol=1e-6)


def test_maxpool_slices_matches_reduce_window(rng):
    """Shifted-view slices max-pool (``blocks.max_pool_k3s2p1_slices``) ==
    XLA reduce_window k3 s2 p1 for even extents, f32 and bf16."""
    import jax
    import jax.numpy as jnp

    from bodyct_dram_emph_subtype_tpu.models.blocks import (
        max_pool_k3s2p1_slices)

    for shape in [(1, 4, 8, 8, 5), (2, 6, 10, 12, 32), (1, 8, 14, 20, 96)]:
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dt)
            ref = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
                [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
            got = max_pool_k3s2p1_slices(x)
            np.testing.assert_array_equal(np.asarray(got, np.float32),
                                          np.asarray(ref, np.float32))


def test_maxpool_kernel_matches_reduce_window(rng):
    """Plane-streaming max-pool kernel (interpret mode) == XLA
    reduce_window k3 s2 p1, across shapes with boundary windows."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from bodyct_dram_emph_subtype_tpu.ops.maxpool_kernel import (
        max_pool_k3s2p1_pallas, supports_maxpool_pallas)

    assert supports_maxpool_pallas((4, 64, 112, 144, 64))
    assert not supports_maxpool_pallas((1, 4, 7, 8, 32))   # odd H
    assert not supports_maxpool_pallas((1, 4, 8, 10, 32))  # W % 4
    # bf16 exercises the bitcast lane-roll path (the i32 view keeps the
    # LANE count — rolling by c//2 instead of c shifted channels by half
    # a block, caught on-chip round 3; interpret agrees with the chip
    # here, so the bf16 case guards it)
    for dtype in (jnp.float32, jnp.bfloat16):
        for shape in [(1, 4, 8, 8, 32), (2, 6, 10, 12, 32),
                      (1, 8, 14, 20, 96)]:
            x = jnp.asarray(rng.randn(*shape).astype(np.float32))
            x = x.astype(dtype)
            ref = jax.lax.reduce_window(
                x, -jnp.inf if dtype == jnp.float32 else
                jnp.bfloat16(-jnp.inf), jax.lax.max,
                (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
                [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
            with pltpu.force_tpu_interpret_mode():
                got = max_pool_k3s2p1_pallas(x)
            np.testing.assert_array_equal(
                np.asarray(got, np.float32), np.asarray(ref, np.float32),
                err_msg=f"{shape} {dtype}")


def test_roll_conv_compact_half_tile_class(rng):
    """Compact scheme with C % 64 == 0 but C % 128 != 0 (the us1_conv1
    class: the edge block's lane roll crosses tiles at a half-tile
    offset) == direct packed conv, forward and wgrad."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from bodyct_dram_emph_subtype_tpu.ops import roll_conv as rc

    C, O = 192, 8
    xp = jnp.asarray(rng.randn(1, 4, 6, 8, 2 * C).astype(np.float32) * 0.2)
    k = jnp.asarray(rng.randn(3, 3, 3, C, O).astype(np.float32) * 0.1)
    assert rc._use_compact(2 * C)
    ref = rc._direct_packed_reference(xp, k)
    with pltpu.force_tpu_interpret_mode():
        out = rc._roll_conv_impl(xp, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    g = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))
    dk_ref = jax.grad(lambda kk: jnp.sum(
        rc._direct_packed_reference(xp, kk) * g))(k)
    with pltpu.force_tpu_interpret_mode():
        dk = rc.roll_conv_wgrad(xp, g, k.shape)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-3, atol=1e-3)


def test_fused_stem_pool_matches_direct(rng):
    """fused_stem_pool (conv+BN+ReLU+maxpool in one Pallas pass,
    ops/stem_kernel.py) == direct k7 s2 conv -> affine -> relu ->
    reduce_window on the same params (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from bodyct_dram_emph_subtype_tpu.models.packed import unpack_w
    from bodyct_dram_emph_subtype_tpu.ops.stem_kernel import (
        fused_stem_pool, supports_fused_stem)

    assert supports_fused_stem((4, 128, 224, 288, 1))
    assert not supports_fused_stem((1, 16, 32, 30, 1))  # W % 8
    assert not supports_fused_stem((1, 18, 32, 32, 1))  # D % 4

    k = jnp.asarray(rng.randn(7, 7, 7, 1, 64).astype(np.float32) * 0.05)
    mul = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    add = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)

    # Wq = 4 (even) and Wq = 7 (odd, like the deployment 36-is-not-8-
    # aligned case) — the flat pool's roll masks key on j % Wq
    for shape in ((2, 16, 24, 32, 1), (1, 16, 32, 56, 1)):
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        y = jax.lax.conv_general_dilated(
            x, k, (2, 2, 2), [(3, 3)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        y = jax.nn.relu(y * mul + add)
        ref_pool = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])

        with pltpu.force_tpu_interpret_mode():
            stem_q, pooled = fused_stem_pool(x, k, mul, add,
                                             dtype=jnp.float32)
        # quad stem -> NDHWC: (Wq, 4F) -> (W/2, F) is the same linear
        # order
        b, d2, h2, wq, o = stem_q.shape
        stem_n = stem_q.reshape(b, d2, h2, wq * 4, o // 4)
        np.testing.assert_allclose(np.asarray(stem_n), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(unpack_w(pooled)),
                                   np.asarray(ref_pool),
                                   rtol=1e-4, atol=1e-5)


def test_fused_pool_layer1_matches_pool_block_stack(rng):
    """fused_pool_layer1 (k3 s2 p1 max-pool streamed into the VMEM-resident
    residual stack, ops/layer1_kernel.py) == max_pool + conv/affine/relu/
    residual composition on the same params (interpret mode).  Covers
    Wq % 8 != 0 (padded quad DMA) and Wq % 8 == 0 (WT > WqP zero-extend)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from bodyct_dram_emph_subtype_tpu.models.packed import unpack_w
    from bodyct_dram_emph_subtype_tpu.ops.layer1_kernel import (
        fused_pool_layer1, supports_fused_pool_layer1)

    # deployment stem shape fits bf16; f32 does not; odd depth is out
    assert supports_fused_pool_layer1((4, 64, 112, 144, 64), 64, 3, 2)
    assert not supports_fused_pool_layer1((4, 64, 112, 144, 64), 64, 3, 4)
    assert not supports_fused_pool_layer1((4, 63, 112, 144, 64), 64, 3, 2)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    C = 64
    # D=8 -> D2=4 even (fat 9-slot two-plane pool steps); D=10 -> D2=5
    # odd (classic 5-slot single-plane rotation)
    for (B, D, H, W, NB) in ((1, 8, 8, 24, 2), (2, 8, 6, 32, 1),
                             (1, 10, 8, 24, 1)):
        # post-ReLU semantics: the kernel's pool boundary fill is 0
        x = jnp.asarray(np.abs(rng.randn(B, D, H, W, C))
                        .astype(np.float32) * 0.3)
        ks = [jnp.asarray(rng.randn(3, 3, 3, C, C).astype(np.float32) * .05)
              for _ in range(2 * NB)]
        ms = [jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
              for _ in range(2 * NB)]
        ads = [jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
               for _ in range(2 * NB)]
        y = nn.max_pool(x, window_shape=(3, 3, 3), strides=(2, 2, 2),
                        padding=[(1, 1)] * 3)
        for i in range(NB):
            h = jax.nn.relu(conv(y, ks[2 * i]) * ms[2 * i] + ads[2 * i])
            h = conv(h, ks[2 * i + 1]) * ms[2 * i + 1] + ads[2 * i + 1]
            y = jax.nn.relu(h + y)
        assert supports_fused_pool_layer1(x.shape, C, NB, 4)
        with pltpu.force_tpu_interpret_mode():
            outp = fused_pool_layer1(x, ks, ms, ads)
        np.testing.assert_allclose(np.asarray(unpack_w(outp)),
                                   np.asarray(y), rtol=1e-4, atol=5e-4,
                                   err_msg=f"{(B, D, H, W, NB)}")
        # bf16 exercises the bitcast lane-roll path of the pool stage
        with pltpu.force_tpu_interpret_mode():
            outb = fused_pool_layer1(x.astype(jnp.bfloat16),
                                     ks, ms, ads)
        np.testing.assert_allclose(
            np.asarray(unpack_w(outb), np.float32), np.asarray(y),
            rtol=0.12, atol=0.08, err_msg=f"bf16 {(B, D, H, W, NB)}")
        # pair-packed input wrapper (pair-output stem): identical program
        from bodyct_dram_emph_subtype_tpu.models.packed import pack_w
        from bodyct_dram_emph_subtype_tpu.ops.layer1_kernel import \
            fused_pool_layer1_pair
        with pltpu.force_tpu_interpret_mode():
            outpair = fused_pool_layer1_pair(pack_w(x), ks, ms, ads)
        np.testing.assert_array_equal(np.asarray(outpair), np.asarray(outp))


def test_fused_layer1_matches_block_stack(rng):
    """fused_layer1 (whole residual stack resident in VMEM,
    ops/layer1_kernel.py) == conv/affine/relu/residual composition on
    the same params (interpret mode).  Covers Wh % 8 == 0 (the stored
    layout needs the extra packed column) and Wh % 8 != 0, NB = 2/3."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from bodyct_dram_emph_subtype_tpu.models.packed import pack_w, unpack_w
    from bodyct_dram_emph_subtype_tpu.ops.layer1_kernel import (
        fused_layer1, supports_fused_layer1)

    # deployment shape fits the bf16 budget; f32 at that size does not
    assert supports_fused_layer1((4, 32, 56, 36, 128), 64, 3, 2)
    assert not supports_fused_layer1((4, 32, 56, 36, 128), 64, 3, 4)
    assert not supports_fused_layer1((4, 32, 56, 36, 64), 32, 3, 2)
    # the layer2 identity tail: 256 lanes at the post-stride deployment
    # shape (3 of resnet34's 4 layer2 blocks)
    assert supports_fused_layer1((4, 16, 28, 18, 256), 128, 3, 2)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    # C=64 is layer1 (128 packed lanes); C=128 is the layer2 identity
    # tail (256 lanes, two lane tiles through the edge roll)
    for (B, D, H, W, C, NB) in ((2, 8, 16, 20, 64, 2), (1, 8, 16, 16, 64, 3),
                                (1, 8, 10, 12, 128, 2)):
        x = jnp.asarray(rng.randn(B, D, H, W, C).astype(np.float32) * 0.3)
        ks = [jnp.asarray(rng.randn(3, 3, 3, C, C).astype(np.float32) * .05)
              for _ in range(2 * NB)]
        ms = [jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
              for _ in range(2 * NB)]
        ads = [jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
               for _ in range(2 * NB)]
        y = x
        for i in range(NB):
            h = jax.nn.relu(conv(y, ks[2 * i]) * ms[2 * i] + ads[2 * i])
            h = conv(h, ks[2 * i + 1]) * ms[2 * i + 1] + ads[2 * i + 1]
            y = jax.nn.relu(h + y)
        xp = pack_w(x)
        assert supports_fused_layer1(xp.shape, C, NB, 4)
        with pltpu.force_tpu_interpret_mode():
            outp = fused_layer1(xp, ks, ms, ads)
        np.testing.assert_allclose(np.asarray(unpack_w(outp)),
                                   np.asarray(y), rtol=1e-4, atol=5e-4)
