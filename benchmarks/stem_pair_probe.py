#!/usr/bin/env python
"""Pair-output stem conv A/B (chained, drowns the dispatch floor).

The round-3 stem sweep (``stem_probe.py``) never measured s2d factors
(2, 2, 4) — whose NATIVE conv output IS the decoder's W-pair packed
layout (128 lanes, zero unshuffle) at HALF the gross FLOPs of the winning
(2, 2, 8) form (K = 768 vs 1536 per output channel).  If the conv itself
holds its TF/s rate, the stem region sheds both the 64-lane materialize
penalty (+11 ms, ``maxpool_probe2.py``) and the decoder skip's pack.

Cases (B=4 bf16, deployment size, N=10 inside one jit, minus baseline):
  stem228+bnrelu      — today's production stem (64-lane NDHWC out)
  stem228+bnrelu+pack — plus the decoder skip's pack_w (what us2 pays)
  stem224_pair+bnrelu — native pair-packed stem (128-lane out)
  stem224+bnrelu+unpack — pair stem + unpack to NDHWC (pool-compat check)
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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    global TARGET, B
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        TARGET, B = (16, 16, 16), 1
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.models.packed import (
        StemConvS2D, pack_w, set_stem_s2d_factors, unpack_w)

    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32) * 0.05, bf)
    mod = StemConvS2D(64, dtype=bf)
    mod_pair = StemConvS2D(64, dtype=bf, pair_output=True)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    mul = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    add = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)

    def bnrelu(y, reps):
        m = jnp.tile(mul, reps)
        a = jnp.tile(add, reps)
        return jnp.maximum(y.astype(jnp.float32) * m + a, 0.0).astype(bf)

    def timed(name, op):
        @jax.jit
        def f(v, x):
            def body(i, acc):
                y = op(v, x + i.astype(x.dtype))
                return acc + jnp.sum(y.astype(jnp.float32))
            return jax.lax.fori_loop(0, N, body, 0.0).reshape(1)

        out = f(v, x)
        np.asarray(out)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                out = f(v, x)
            np.asarray(out)
            best = min(best, (time.time() - t0) / 3 * 1e3)
        print(json.dumps({"case": name, "ms_per_iter": round(best / N, 2)}),
              flush=True)

    timed("baseline(add+sum input)", lambda v, x: x)

    set_stem_s2d_factors((2, 2, 8))
    timed("stem228+bnrelu", lambda v, x: bnrelu(mod.apply(v, x), 1))
    timed("stem228+bnrelu+pack",
          lambda v, x: pack_w(bnrelu(mod.apply(v, x), 1)))
    timed("stem224_pair+bnrelu",
          lambda v, x: bnrelu(mod_pair.apply(v, x), 2))
    timed("stem224_pair+bnrelu+unpack",
          lambda v, x: unpack_w(bnrelu(mod_pair.apply(v, x), 2)))
    set_stem_s2d_factors((2, 2, 8))


if __name__ == "__main__":
    main()
