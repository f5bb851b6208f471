#!/usr/bin/env python
"""Stage bisection of the CURRENT best forward (packed decoder + roll).

Times trunk-only, packed decoder-only (roll kernels), and the map-upsample
tail separately at deployment shapes so kernel effort goes where the ms
are (DEVNOTES: the round-2 splits predate the current XLA stack).
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
    np.asarray(out[(0,) * out.ndim])
    best = 1e9
    for _ in range(trials):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out[(0,) * out.ndim])
        best = min(best, (time.time() - t0) / n * 1e3)
    return best


def main():
    import functools

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    from bodyct_dram_emph_subtype_tpu.models import blocks
    from bodyct_dram_emph_subtype_tpu.models.blocks import BasicBlock
    from bodyct_dram_emph_subtype_tpu.models.resnet3d import _Decoder, _Trunk
    blocks.set_conv3d_mode("roll")

    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    def randn(*shape, dtype=bf, scale=0.05):
        return jnp.asarray(
            rng.randn(*shape).astype(np.float32) * scale, dtype)

    def make_params(mod, *args):
        shapes = jax.eval_shape(
            functools.partial(mod.init, train=False), jax.random.PRNGKey(0),
            *args)
        return jax.tree.map(
            lambda s: jnp.asarray(
                rng.randn(*s.shape).astype(np.float32) * 0.02, s.dtype),
            shapes)

    x = randn(B, *TARGET, 1, dtype=jnp.float32)

    trunk = _Trunk(BasicBlock, (3, 4, 6, 3), dtype=bf)
    vt = make_params(trunk, x)

    @jax.jit
    def trunk_fn(v, x):
        stem, x1, x4 = trunk.apply(v, x, False)
        return (jnp.sum(stem.astype(jnp.float32))
                + jnp.sum(x1.astype(jnp.float32))
                + jnp.sum(x4.astype(jnp.float32))).reshape(1)

    ms = _time(trunk_fn, vt, x)
    print(json.dumps({"case": "trunk_roll", "ms": round(ms, 1)}), flush=True)

    HALF = tuple(t // 2 for t in TARGET)
    QUART = tuple(t // 4 for t in TARGET)
    EIGHTH = tuple(t // 8 for t in TARGET)
    x4 = randn(B, *EIGHTH, 512)
    x1 = randn(B, *QUART, 64)
    stem = randn(B, *HALF, 64)

    dec = _Decoder(dtype=bf, packed=True)
    vd = make_params(dec, x4, x1, stem)

    @jax.jit
    def dec_fn(v, a, b, c):
        out = dec.apply(v, a, b, c, False)
        return jnp.sum(out.astype(jnp.float32)).reshape(1)

    ms = _time(dec_fn, vd, x4, x1, stem)
    print(json.dumps({"case": "decoder_packed_roll", "ms": round(ms, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
