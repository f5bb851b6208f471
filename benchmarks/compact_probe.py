#!/usr/bin/env python
"""Chip A/B: roll-kernel patch schemes (wide K=6C vs compact K=4C).

The compact scheme lane-rolls the two odd-parity edge taps into one
dense-ish 2C block, cutting the per-(dd,dh) matmul K from 6C to 4C
(50% -> 75% useful MXU work) at the cost of 2 lane-rolls + 1 select per
depth tap.  Measures the decoder's three roll-served convs isolated at
B=4 bf16 deployment shapes, both schemes, plus dgrad and wgrad.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = 4


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.ops import roll_conv as rc

    rng = np.random.RandomState(0)

    def timeit(f, *args, n=6, trials=3):
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
        best = 1e9
        for _ in range(trials):
            t0 = time.time()
            for _ in range(n):
                out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
            best = min(best, (time.time() - t0) / n * 1e3)
        return best

    cases = [  # (name, packed shape, C, O)
        ("us2_conv1", (B, 64, 112, 72, 256), 128, 64),
        ("us2_conv2", (B, 64, 112, 72, 128), 64, 64),
        ("us1_conv2", (B, 32, 56, 36, 128), 64, 64),
        ("us3_conv", (B, 64, 112, 72, 128), 64, 32),
    ]
    for name, shape, c, o in cases:
        xp = jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.1,
                         jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, 3, c, o).astype(np.float32) * 0.05,
                        jnp.bfloat16)
        g_shape = shape[:-1] + (2 * o,)
        g = jnp.asarray(rng.randn(*g_shape).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        flops = 2 * 27 * c * o * B * shape[1] * shape[2] * (2 * shape[3])
        for scheme in ("wide", "compact"):
            rc.set_roll_patch_scheme(scheme)
            if not rc.supports_roll_conv(shape, k.shape, 2):
                print(json.dumps({"case": f"{name}/{scheme}",
                                  "skip": "gate"}), flush=True)
                continue
            fwd = jax.jit(lambda a, b: rc._roll_conv_impl(a, b))
            ms = timeit(fwd, xp, k)
            print(json.dumps({"case": f"{name}/{scheme}/fwd",
                              "ms": round(ms, 2),
                              "tf_s": round(flops / ms / 1e9, 1)}),
                  flush=True)
            if rc.supports_roll_wgrad(shape, k.shape, 2):
                wg = jax.jit(lambda a, b: rc.roll_conv_wgrad(a, b, k.shape))
                ms = timeit(wg, xp, g)
                print(json.dumps({"case": f"{name}/{scheme}/wgrad",
                                  "ms": round(ms, 2),
                                  "tf_s": round(flops / ms / 1e9, 1)}),
                      flush=True)
        rc.set_roll_patch_scheme("auto")


if __name__ == "__main__":
    main()
