#!/usr/bin/env python
"""Chip probe: us1_conv1 (576 -> 64 @ QUART, packed) through the rolling
ring kernel with the compact scheme relaxed to C % 64 == 0, vs the
current packed-XLA lowering (measured 17.8 ms/iter chained).

The compact edge block lane-rolls by C within a 2C vector; for C = 576
that is a 288-lane i32 roll (bitcast) — integral, but crossing lane tiles
at a half-tile offset, so whether Mosaic lowers it cheaply is a hardware
question.  VMEM plan needs ~18.8 MB (ring WT=8 + 5.3 MB weights).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TARGET = (128, 224, 288)
B = 4
N = 10


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.ops import roll_conv as rc

    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    QUART = tuple(t // 4 for t in TARGET)

    def randn(*shape, scale=0.05):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale, bf)

    rc._compact_ok = lambda c2: (c2 // 2) % 64 == 0   # relax to C=576
    rc.set_roll_vmem_budget(20 * 1024 * 1024)

    xq1 = randn(B, QUART[0], QUART[1], QUART[2] // 2, 1152)
    k = randn(3, 3, 3, 576, 64, scale=0.02)
    sc = jnp.ones((128,), jnp.float32)
    sh = jnp.zeros((128,), jnp.float32)
    wt = rc._plan(xq1.shape, 64, 2)
    print(json.dumps({"case": "plan", "wt": wt}), flush=True)
    if wt is None:
        return

    def f(x):
        def body(i, acc):
            y = rc.roll_conv_affine_relu(x + i.astype(x.dtype), k, sc, sh)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, 0.0).reshape(1)

    g = jax.jit(f)
    try:
        out = g(xq1)
        np.asarray(out)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": "us1_conv1 roll compact",
                          "error": type(e).__name__,
                          "msg": str(e)[:300]}), flush=True)
        return
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(3):
            out = g(xq1)
        np.asarray(out)
        best = min(best, (time.time() - t0) / 3 * 1e3)
    print(json.dumps({"case": "us1_conv1 roll compact",
                      "ms_per_iter": round(best / N, 2)}), flush=True)


if __name__ == "__main__":
    main()
