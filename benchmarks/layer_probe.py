#!/usr/bin/env python
"""Layer-level bisection of the current best forward (packed + roll).

DEVNOTES round-3: full fwd 198.3 ms @ B=4 bf16, but the per-LAYER splits
are unknown under the 2026 XLA stack (round-2 splits are stale, and the
sgmerge probe showed in-model layer3/4 already run 117-150 TF/s).  This
times each trunk layer, each decoder stage, the upsample matmuls and the
head/tail separately so the next kernel goes where the ms are.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TARGET = (128, 224, 288)
B = 4


def _time(fn, *args, n=6, trials=3):
    out = fn(*args)
    np.asarray(out)
    best = 1e9
    for _ in range(trials):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.time() - t0) / n * 1e3)
    return best


def main():
    global TARGET, B
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke test at toy shapes")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        TARGET, B = (32, 32, 32), 1
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.models import blocks
    from bodyct_dram_emph_subtype_tpu.models.blocks import BasicBlock
    from bodyct_dram_emph_subtype_tpu.models.packed import (
        PackedUpsampleConvBlock, StemConvS2D, pack_w)
    from bodyct_dram_emph_subtype_tpu.models.resnet3d import _Trunk
    from bodyct_dram_emph_subtype_tpu.ops.resize import resize_linear_matmul
    blocks.set_conv3d_mode("roll")

    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    def randn(*shape, dtype=bf, scale=0.05):
        return jnp.asarray(
            rng.randn(*shape).astype(np.float32) * scale, dtype)

    def make_params(mod, *args, **kw):
        shapes = jax.eval_shape(
            functools.partial(mod.init, **kw), jax.random.PRNGKey(0), *args)
        return jax.tree.map(
            lambda s: jnp.asarray(
                rng.randn(*s.shape).astype(np.float32) * 0.02, s.dtype),
            shapes)

    HALF = tuple(t // 2 for t in TARGET)      # 64,112,144
    QUART = tuple(t // 4 for t in TARGET)     # 32,56,72
    EIGHTH = tuple(t // 8 for t in TARGET)    # 16,28,36

    results = {}

    # --- trunk: stem + per-layer ---
    trunk = _Trunk(BasicBlock, (3, 4, 6, 3), dtype=bf)

    x_in = randn(B, *TARGET, 1, dtype=jnp.float32)
    stem_mod = StemConvS2D(64, dtype=bf)
    v_stem = make_params(stem_mod, x_in)

    @jax.jit
    def stem_fn(v, x):
        return jnp.sum(stem_mod.apply(v, x).astype(jnp.float32)).reshape(1)

    results["stem_conv"] = _time(stem_fn, v_stem, x_in)
    print(json.dumps({"case": "stem_conv", "ms": round(results['stem_conv'],
                                                       1)}), flush=True)

    # per-layer timings via the trunk's own _layer method bound inside a
    # tiny module so nn scoping works
    from flax import linen as nn

    layer_specs = [
        ("layer1", HALF and QUART, 64, 3, 1, 1, (B, *QUART, 64)),
        ("layer2", None, 128, 4, 2, 1, (B, *QUART, 64)),
        ("layer3", None, 256, 6, 1, 2, (B, *EIGHTH, 128)),
        ("layer4", None, 512, 3, 1, 4, (B, *EIGHTH, 256)),
    ]

    for name, _, planes, nblocks, stride, dil, in_shape in layer_specs:
        class OneLayer(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = False):
                return _Trunk._layer(
                    self, x, planes, nblocks, stride, dil, name, train)
            remat = False
            dtype = bf
            block = BasicBlock
            shortcut_type = "A"
        mod = OneLayer()
        xin = randn(*in_shape)
        v = make_params(mod, xin, train=False)

        @jax.jit
        def layer_fn(v, x, _mod=mod):
            return jnp.sum(_mod.apply(v, x, False).astype(
                jnp.float32)).reshape(1)

        ms = _time(layer_fn, v, xin)
        results[name] = ms
        print(json.dumps({"case": name, "ms": round(ms, 1)}), flush=True)

    # --- decoder stages (packed, roll) ---
    x4 = randn(B, *EIGHTH, 512)
    x1 = randn(B, *QUART, 64)
    stem_act = randn(B, *HALF, 64)

    us1 = PackedUpsampleConvBlock([64, 64], dtype=bf)
    v1 = make_params(us1, x4, x1, train=False)

    @jax.jit
    def us1_fn(v, a, b):
        return jnp.sum(us1.apply(v, a, b, False).astype(
            jnp.float32)).reshape(1)

    ms = _time(us1_fn, v1, x4, x1)
    results["us1"] = ms
    print(json.dumps({"case": "us1(packed)", "ms": round(ms, 1)}), flush=True)

    xup1 = randn(B, *QUART, 64)
    us2 = PackedUpsampleConvBlock([64, 64], dtype=bf)
    v2 = make_params(us2, xup1, stem_act, train=False)

    @jax.jit
    def us2_fn(v, a, b):
        return jnp.sum(us2.apply(v, a, b, False).astype(
            jnp.float32)).reshape(1)

    ms = _time(us2_fn, v2, xup1, stem_act)
    results["us2"] = ms
    print(json.dumps({"case": "us2(packed)", "ms": round(ms, 1)}), flush=True)

    # us3 stage + heads + sigmoid + masked pooling tail, as the model runs it
    from bodyct_dram_emph_subtype_tpu.models.packed import (
        PackedConv3, PackedNormWrapper, packed_stage, unpack_w)

    class Us3Heads(nn.Module):
        @nn.compact
        def __call__(self, xup2):
            x = packed_stage(PackedConv3(32, dtype=bf, name="us3_conv"),
                             PackedNormWrapper(dtype=bf, name="us3_bn"),
                             pack_w(xup2), False)
            x = unpack_w(x)
            dense = [jax.nn.sigmoid(
                blocks.conv3d(1, 1, bias=True, name=f"fc{i}",
                              dtype=bf)(x).astype(jnp.float32))
                for i in range(2)]
            return dense[0], dense[1]

    xup2 = randn(B, *HALF, 64)
    us3h = Us3Heads()
    v3 = make_params(us3h, xup2)

    @jax.jit
    def us3_fn(v, a):
        d0, d1 = us3h.apply(v, a)
        return (jnp.sum(d0) + jnp.sum(d1)).reshape(1)

    ms = _time(us3_fn, v3, xup2)
    results["us3_heads"] = ms
    print(json.dumps({"case": "us3+heads+sigmoid", "ms": round(ms, 1)}),
          flush=True)

    # --- map upsample tail (2 maps half->full res + mask + sums) ---
    dense = randn(B, *HALF, 1, dtype=jnp.float32)
    ess = jnp.ones((B, *TARGET, 1), jnp.float32)

    @jax.jit
    def tail_fn(d, ess):
        cle = resize_linear_matmul(d, TARGET, (1, 2, 3),
                                   align_corners=True) * ess
        pse = resize_linear_matmul(d, TARGET, (1, 2, 3),
                                   align_corners=True) * ess
        return (jnp.sum(cle) + jnp.sum(pse)).reshape(1)

    ms = _time(tail_fn, dense, ess)
    results["map_tail"] = ms
    print(json.dumps({"case": "map_upsample_tail", "ms": round(ms, 1)}),
          flush=True)

    total = sum(results.values())
    print(json.dumps({"case": "SUM", "ms": round(total, 1)}), flush=True)


if __name__ == "__main__":
    main()
