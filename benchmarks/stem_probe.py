#!/usr/bin/env python
"""Stem-conv s2d factor A/B on chip.

The round-3 layer bisection measured the (2,2,2)-s2d stem at 22.9 ms
(B=4 bf16, ~8 TF/s gross) — Cin = 8 starves the MXU contraction.  Larger
block factors raise Cin to 32/64 at the cost of structurally-zero taps
(gross FLOPs x2.24-x5 of the logical 181 GFLOP); which point wins is a
hardware question.  Also times the stem maxpool (untimed in layer_probe).
"""
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
    import argparse
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

    from bodyct_dram_emph_subtype_tpu.models.packed import (
        StemConvS2D, set_stem_s2d_factors)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32) * 0.05)
    mod = StemConvS2D(64, dtype=jnp.bfloat16)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    for f in [(2, 2, 2), (2, 4, 4), (4, 4, 4), (4, 4, 2), (2, 2, 8)]:
        set_stem_s2d_factors(f)

        @jax.jit
        def fn(v, x):
            return jnp.sum(mod.apply(v, x).astype(jnp.float32)).reshape(1)

        ms = _time(fn, v, x)
        gross = {(2, 2, 2): 1.49, (2, 4, 4): 3.36, (4, 4, 4): 5.04,
                 (4, 4, 2): 3.36, (2, 2, 8): 4.48}[f]
        print(json.dumps({"case": f"stem{f}", "ms": round(ms, 1),
                          "gross_tfs": round(0.181 * gross * B / ms, 1)}),
              flush=True)
    set_stem_s2d_factors((2, 2, 2))

    # maxpool k3 s2 on the stem output (untimed in layer_probe)
    half = tuple(t // 2 for t in TARGET)
    y = jnp.asarray(rng.randn(B, *half, 64).astype(np.float32),
                    jnp.bfloat16)

    @jax.jit
    def mp(y):
        o = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
        return jnp.sum(o.astype(jnp.float32)).reshape(1)

    print(json.dumps({"case": "maxpool", "ms": round(_time(mp, y), 1)}),
          flush=True)


if __name__ == "__main__":
    main()
