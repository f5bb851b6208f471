#!/usr/bin/env python
"""Who pays for the stem skip under quad layout? (chained, resident inputs)

fwd_r3d_probe.py: quad_on LOST in-model (170.8 vs 167.8 ms) although the
stem->pool region alone wins 19.8 vs 31.4 (maxpool_probe3.py).  The other
stem consumer is the decoder us2 concat — measure it per layout:

  M1 pack_w(crop_concat(up, stem_ndhwc))         [today's composition]
  M2 quad packed concat (PackedUpsampleConvBlock cats_quad branch)
  M3 stem_quad -> pair reshape alone             [standalone relayout]
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = 4
N = 5


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.models.blocks import crop_concat
    from bodyct_dram_emph_subtype_tpu.models.packed import pack_w

    bf = jnp.bfloat16
    rng = np.random.RandomState(0)
    up = jnp.asarray(rng.randn(B, 64, 112, 144, 64).astype(np.float32),
                     dtype=bf)
    stem_n = jnp.asarray(rng.randn(B, 64, 112, 144, 64).astype(np.float32),
                         dtype=bf)
    stem_q = jnp.asarray(rng.randn(B, 64, 112, 36, 256).astype(np.float32),
                         dtype=bf)

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

    def chain(fn):
        def run(a, b):
            def body(i, acc):
                return acc + jnp.sum(
                    fn(a + i.astype(a.dtype), b).astype(jnp.float32))
            return jax.lax.fori_loop(0, N, body, 0.0).reshape(1)
        return jax.jit(run)

    def m1(u, s):
        return pack_w(crop_concat(u, s))

    def m2(u, s):
        cq = s.reshape(*s.shape[:3], s.shape[3] * 2, s.shape[4] // 2)
        uq = pack_w(u)
        return jnp.concatenate([uq[..., :64], cq[..., :64],
                                uq[..., 64:], cq[..., 64:]], axis=-1)

    def m3(u, s):
        del u
        return s.reshape(*s.shape[:3], s.shape[3] * 2, s.shape[4] // 2)

    for nm, fn, a, b in [("M1 ndhwc concat", m1, up, stem_n),
                         ("M2 quad concat", m2, up, stem_q),
                         ("M3 quad->pair reshape", m3, up, stem_q)]:
        print(json.dumps({"case": nm, "ms": round(timed(chain(fn), a, b),
                                                  1)}), flush=True)


if __name__ == "__main__":
    main()
