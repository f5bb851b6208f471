#!/usr/bin/env python
"""Chip A/B: fused us3+heads tail kernel and maxpool formulations.

Round-3 layer bisection: us3+heads 22.7 ms isolated (B=4 bf16) against a
~6 ms roofline, and the stem maxpool (untimed there) measures 10.5 ms
against ~0.8 ms of HBM traffic.  This times:
- us3+heads unfused (packed_stage + unpack + 2 head convs + sigmoid)
- the fused roll_conv_heads_sigmoid kernel
- maxpool k3 s2 p1: XLA reduce_window 3D, separable (3 passes), and the
  W-pair lane formulation (pool D/H on the packed layout, then a 3-way
  lane max for W).
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
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        TARGET, B = (16, 16, 16), 1
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.models import blocks
    from bodyct_dram_emph_subtype_tpu.models import packed as packed_mod
    from bodyct_dram_emph_subtype_tpu.ops.roll_conv import (
        roll_conv_affine_relu, roll_conv_heads_sigmoid)

    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    HALF = tuple(t // 2 for t in TARGET)
    D2, H2, W2 = HALF
    Wh = W2 // 2

    xp = jnp.asarray(rng.randn(B, D2, H2, Wh, 128).astype(np.float32) * 0.2,
                     bf)
    k = jnp.asarray(rng.randn(3, 3, 3, 64, 32).astype(np.float32) * 0.05, bf)
    sc = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    sh = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    hw = jnp.asarray(rng.randn(32, 2).astype(np.float32) * 0.2, bf)
    hb = jnp.asarray(rng.randn(2).astype(np.float32) * 0.1)
    hk = [jnp.asarray(rng.randn(1, 1, 1, 32, 1).astype(np.float32) * 0.2, bf)
          for _ in range(2)]

    if args.tiny:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            a = roll_conv_heads_sigmoid(xp, k, sc, sh, hw, hb)
        print(json.dumps({"case": "tiny fused smoke", "shape": list(a.shape)}),
              flush=True)

    @jax.jit
    def unfused(xp):
        act = roll_conv_affine_relu(xp, k, sc, sh)   # fused us3 stage
        x = packed_mod.unpack_w(act[..., :64])
        outs = []
        for i in range(2):
            y = jax.lax.conv_general_dilated(
                x, hk[i], (1, 1, 1), [(0, 0)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            outs.append(jax.nn.sigmoid((y + hb[i]).astype(jnp.float32)))
        return sum(jnp.sum(o) for o in outs).reshape(1)

    if not args.tiny:
        print(json.dumps({"case": "us3+heads/unfused",
                          "ms": round(_time(unfused, xp), 1)}), flush=True)

        @jax.jit
        def fused(xp):
            out = roll_conv_heads_sigmoid(xp, k, sc, sh, hw, hb)
            return jnp.sum(out).reshape(1)

        print(json.dumps({"case": "us3+heads/fused",
                          "ms": round(_time(fused, xp), 1)}), flush=True)

    # ---- maxpool formulations on the stem activation ----
    y = jnp.asarray(rng.randn(B, D2, H2, W2, 64).astype(np.float32), bf)

    def rw(x, axis):
        win = [1, 1, 1, 1, 1]
        st = [1, 1, 1, 1, 1]
        pad = [(0, 0)] * 5
        win[axis] = 3
        st[axis] = 2
        pad[axis] = (1, 1)
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     tuple(win), tuple(st), pad)

    @jax.jit
    def mp3d(y):
        o = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
        return jnp.sum(o.astype(jnp.float32)).reshape(1)

    @jax.jit
    def mpsep(y):
        o = rw(rw(rw(y, 1), 2), 3)
        return jnp.sum(o.astype(jnp.float32)).reshape(1)

    @jax.jit
    def mppair(y):
        o = rw(rw(y, 1), 2)                       # D, H separable passes
        b, d, h, w, c = o.shape
        p = o.reshape(b, d, h, w // 2, 2 * c)     # free W-pair reshape
        ev, od = p[..., :c], p[..., c:]
        od_prev = jnp.pad(od, ((0, 0),) * 3 + ((1, 0), (0, 0)),
                          constant_values=-jnp.inf)[:, :, :, :w // 2]
        o = jnp.maximum(jnp.maximum(ev, od), od_prev)
        return jnp.sum(o.astype(jnp.float32)).reshape(1)

    if args.tiny:
        a, b_, c_ = mp3d(y), mpsep(y), mppair(y)
        assert np.allclose(a, b_) and np.allclose(a, c_), (a, b_, c_)
        print(json.dumps({"case": "maxpool parity", "ok": True}), flush=True)

    for name, fn in [("mp3d", mp3d), ("mpsep", mpsep), ("mppair", mppair)]:
        print(json.dumps({"case": f"maxpool/{name}",
                          "ms": round(_time(fn, y), 1)}), flush=True)


if __name__ == "__main__":
    main()
