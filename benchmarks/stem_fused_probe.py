#!/usr/bin/env python
"""Chained decomposition of the fused stem kernel (tap-stacked variant).

In-model A/B (fwd_r3d_probe): quad_off 167.7, quad_on(tap-stacked) 179.2,
quad_on(in-kernel patch copies) 169.0.  This separates where the time
goes: the kernel itself, the XLA-side x12 tap stacking, and the
unfused reference region.

  A  fused_stem_pool -> sum(stem) + sum(pooled)         (whole kernel)
  C  _stack_taps(xg) -> barrier -> sum                  (x12 build alone)
  B  conv_native + bnrelu -> barrier -> quadpool -> sums (unfused region)
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TARGET = (128, 224, 288)
B = 4
N = 5


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.models.packed import (
        _s2d_axis_extent, _s2d_stem_map)
    from bodyct_dram_emph_subtype_tpu.ops import maxpool_kernel as mk
    from bodyct_dram_emph_subtype_tpu.ops import stem_kernel as sk

    bf = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32) * 0.1)
    kernel = jnp.asarray(rng.randn(7, 7, 7, 1, 64).astype(np.float32) * .05)
    scale = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)

    fd, fh, fw = 2, 2, 8
    (ed, od), (eh, oh), (ew, ow) = map(_s2d_axis_extent, (fd, fh, fw))
    m = jnp.asarray(_s2d_stem_map((fd, fh, fw)), bf)
    kp = jnp.einsum("ks,ko->so", m, kernel.astype(bf).reshape(343, 64)
                    ).reshape(ed, eh, ew, fd * fh * fw, 4 * 64)

    def conv_native(x):
        b, d, h, w, _ = x.shape
        xg = x.astype(bf).reshape(b, d // fd, fd, h // fh, fh, w // fw, fw)
        xg = xg.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
            b, d // fd, h // fh, w // fw, fd * fh * fw)
        return jax.lax.conv_general_dilated(
            xg, kp, (1, 1, 1),
            [(od, ed - 1 - od), (oh, eh - 1 - oh), (ow, ew - 1 - ow)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    s4 = jnp.tile(jnp.asarray(scale, bf), 4)
    b4 = jnp.tile(jnp.asarray(bias, bf), 4)

    def xg_of(x):
        b, d, h, w, _ = x.shape
        xg = x.astype(bf).reshape(b, d // 2, 2, h // 2, 2, w // 8, 8)
        return xg.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
            b, d // 2, h // 2, w // 8, 32)

    def timed(f, *args):
        out = f(*args)
        jax.tree.map(np.asarray, out)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                out = f(*args)
            jax.tree.map(np.asarray, out)
            best = min(best, (time.time() - t0) / 3 * 1e3)
        return best / N

    def chain(fn):
        def run(x):
            def body(i, acc):
                return acc + fn(x + i.astype(x.dtype))
            return jax.lax.fori_loop(0, N, body, 0.0).reshape(1)
        return jax.jit(run)

    def s32(y):
        return jnp.sum(y.astype(jnp.float32))

    cases = [
        ("A fused_stem_pool", chain(lambda v: (
            lambda sp: s32(sp[0]) + s32(sp[1]))(
                sk.fused_stem_pool(v, kernel, scale, bias)))),
        ("C stack_taps alone", chain(lambda v: s32(
            jax.lax.optimization_barrier(sk._stack_taps(xg_of(v)))))),
        ("B unfused conv+bnrelu+mat+quadpool", chain(lambda v: (
            lambda y: s32(y) + s32(mk.max_pool_quads(y)))(
                jax.lax.optimization_barrier(
                    jax.nn.relu(conv_native(v) * s4 + b4))))),
    ]
    for nm, f in cases:
        print(json.dumps({"case": nm, "ms": round(timed(f, x), 1)}),
              flush=True)


if __name__ == "__main__":
    main()
