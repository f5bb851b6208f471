#!/usr/bin/env python
"""Chained maxpool diagnosis at the stem shape (B=4, 64x112x144, 64ch).

The trunk prefix probe charges 18.4 ms to "+maxpool" against a ~1 ms HBM
roofline.  Candidate explanations, separated here with the chained
in-program pattern (N reps inside one jit, baseline-subtracted):

  A  stem+bn+relu -> sum                   (fusion keeps 528 MB off HBM)
  B  stem+bn+relu -> barrier -> sum        (delta vs A = materialize cost)
  C  stem+bn+relu -> pallas pool -> sum
  D  stem+bn+relu -> reduce_window -> sum
  E  producer -> pallas pool on bf16 input (pool alone, net of producer)
  F  producer -> reduce_window             (same harness)
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
    from bodyct_dram_emph_subtype_tpu.models.blocks import NormWrapper
    from bodyct_dram_emph_subtype_tpu.models.packed import StemConvS2D
    from bodyct_dram_emph_subtype_tpu.ops.maxpool_kernel import (
        max_pool_k3s2p1_pallas)

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

    def xla_pool(y):
        return nn.max_pool(y, window_shape=(3, 3, 3), strides=(2, 2, 2),
                           padding=[(1, 1)] * 3)

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
        ("A stem->sum", chain(s32)),
        ("B stem->barrier->sum",
         chain(lambda y: s32(jax.lax.optimization_barrier(y)))),
        ("C stem->pallas_pool->sum",
         chain(lambda y: s32(max_pool_k3s2p1_pallas(y)))),
        ("D stem->reduce_window->sum", chain(lambda y: s32(xla_pool(y)))),
    ]
    for nm, f in cases:
        print(json.dumps({"case": nm, "ms": round(timed(f, v, x), 1)}),
              flush=True)

    # E/F: pool alone on a resident bf16 activation (producer = +i cast,
    # which must materialize since the pool consumes it)
    act = jnp.asarray(
        rng.randn(B, 64, 112, 144, 64).astype(np.float32), dtype=bf)

    def chain2(pool):
        def run(a):
            def body(i, acc):
                y = pool(a + i.astype(a.dtype))
                return acc + jnp.sum(y.astype(jnp.float32))
            return jax.lax.fori_loop(0, N, body, 0.0).reshape(1)
        return jax.jit(run)

    print(json.dumps({"case": "E pallas_pool(resident)",
                      "ms": round(timed(chain2(max_pool_k3s2p1_pallas),
                                        act), 1)}), flush=True)
    print(json.dumps({"case": "F reduce_window(resident)",
                      "ms": round(timed(chain2(xla_pool), act), 1)}),
          flush=True)


if __name__ == "__main__":
    main()
