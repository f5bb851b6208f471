#!/usr/bin/env python
"""Chained whole-trunk and whole-decoder timings (roll mode, eval).

The decoder-piece split (decoder_split_probe) sums to ~67 ms and the
floor-adjusted layer probe gives ~72 ms of trunk, but the full model
forward measures 174.7 — this probes where the unaccounted ~35 ms lives
(s2b relayouts, BN/ReLU glue, crop pads) by chaining the trunk and the
decoder as single ops.
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
    from bodyct_dram_emph_subtype_tpu.models.blocks import BasicBlock
    from bodyct_dram_emph_subtype_tpu.models.resnet3d import _Decoder, _Trunk

    blocks.set_conv3d_mode("roll")
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    HALF = tuple(t // 2 for t in TARGET)
    QUART = tuple(t // 4 for t in TARGET)
    EIGHTH = tuple(t // 8 for t in TARGET)

    def randn(*shape, scale=0.1, dtype=bf):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale,
                           dtype)

    def timed(name, fn, v, *xs):
        f = jax.jit(fn)
        out = f(v, *xs)
        np.asarray(out)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                out = f(v, *xs)
            np.asarray(out)
            best = min(best, (time.time() - t0) / 3 * 1e3)
        print(json.dumps({"case": name, "ms_per_iter": round(best / N, 1)}),
              flush=True)

    # whole trunk
    trunk = _Trunk(BasicBlock, (3, 4, 6, 3), dtype=bf)
    x = randn(B, *TARGET, 1, dtype=jnp.float32)
    v_t = jax.jit(lambda k: trunk.init(k, x[:1], False))(
        jax.random.PRNGKey(0))

    def trunk_chain(v, x):
        def body(i, acc):
            stem, x1, x4 = trunk.apply(v, x + i.astype(x.dtype), False)
            return (acc + jnp.sum(stem.astype(jnp.float32))
                    + jnp.sum(x1.astype(jnp.float32))
                    + jnp.sum(x4.astype(jnp.float32)))
        return jax.lax.fori_loop(0, N, body, 0.0).reshape(1)

    timed("trunk(whole)", trunk_chain, v_t, x)

    # whole decoder (packed) + fused heads tail off (plain xup3 tail)
    dec = _Decoder(dtype=bf, packed=True)
    x4 = randn(B, *EIGHTH, 512)
    x1 = randn(B, *QUART, 64)
    stem = randn(B, *HALF, 64)
    v_d = jax.jit(lambda k: dec.init(k, x4[:1], x1[:1], stem[:1], False))(
        jax.random.PRNGKey(0))

    def dec_chain(v, x4, x1, stem):
        def body(i, acc):
            y = dec.apply(v, x4 + i.astype(x4.dtype), x1, stem, False)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, 0.0).reshape(1)

    timed("decoder(whole, unfused tail)", dec_chain, v_d, x4, x1, stem)


if __name__ == "__main__":
    main()
