#!/usr/bin/env python
"""Round 3c follow-up: stem reshape-unshuffle + all-slices maxpool on chip.

Baselines from maxpool_probe.py: A stem->sum 13.0, B stem->barrier->sum
24.2 (materialize +11.2!), C stem->pallas_pool->sum 31.4,
D stem->reduce_window->sum 31.0, E pallas pool resident 12.9,
F reduce_window resident 9.3.  New cases (stem now uses the free-reshape
unshuffle; pool is the shifted-view slices formulation):

  B2 stem(reshape) -> barrier -> sum     (vs B: transpose-copy hypothesis)
  E2 slices pool on resident bf16 input  (vs E/F)
  C2 stem(reshape) -> slices pool -> sum (vs C/D: the real composition)
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
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from flax import linen as nn

    from bodyct_dram_emph_subtype_tpu.models import blocks
    from bodyct_dram_emph_subtype_tpu.models.blocks import (
        NormWrapper, max_pool_k3s2p1_slices)
    from bodyct_dram_emph_subtype_tpu.models.packed import StemConvS2D

    blocks.set_conv3d_mode("roll")
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32) * 0.1)

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = StemConvS2D(64, name="conv1", dtype=bf)(x)
            x = NormWrapper(dtype=bf, name="bn1")(x, False)
            return nn.relu(x)

    stem = Stem()
    v = jax.jit(lambda k: stem.init(k, x[:1]))(jax.random.PRNGKey(0))

    def timed(f, *args):
        out = f(*args)
        np.asarray(out)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                out = f(*args)
            np.asarray(out)
            best = min(best, (time.time() - t0) / 3 * 1e3)
        return best / N

    def chain(tail):
        def run(v, x):
            def body(i, acc):
                y = stem.apply(v, x + i.astype(x.dtype))
                return acc + tail(y)
            return jax.lax.fori_loop(0, N, body, 0.0).reshape(1)
        return jax.jit(run)

    def s32(y):
        return jnp.sum(y.astype(jnp.float32))

    cases = [
        ("B2 stem(reshape)->barrier->sum",
         chain(lambda y: s32(jax.lax.optimization_barrier(y)))),
        ("C2 stem(reshape)->slices_pool->sum",
         chain(lambda y: s32(max_pool_k3s2p1_slices(y)))),
    ]
    for nm, f in cases:
        print(json.dumps({"case": nm, "ms": round(timed(f, v, x), 1)}),
              flush=True)

    act = jnp.asarray(
        rng.randn(B, 64, 112, 144, 64).astype(np.float32), dtype=bf)

    def run(a):
        def body(i, acc):
            y = max_pool_k3s2p1_slices(a + i.astype(a.dtype))
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, 0.0).reshape(1)

    print(json.dumps({"case": "E2 slices_pool(resident)",
                      "ms": round(timed(jax.jit(run), act), 1)}),
          flush=True)


if __name__ == "__main__":
    main()
