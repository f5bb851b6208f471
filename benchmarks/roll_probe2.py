#!/usr/bin/env python
"""Round-3b: roll_conv on the newly supported decoder shapes + epilogue."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = 4
ITERS = 8
TRIALS = 3


def timeit(fn, args, name, flops):
    out = fn(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.time()
        for _ in range(ITERS):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.time() - t0) / ITERS)
    print(json.dumps({"case": name, "ms": round(best * 1e3, 2),
                      "tflops_per_s_useful": round(flops / best / 1e12, 1)}),
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bodyct_dram_emph_subtype_tpu.models.packed import pack_w
    from bodyct_dram_emph_subtype_tpu.ops.roll_conv import (
        _plan, roll_conv_packed, roll_conv_affine_relu)

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    r = np.random.RandomState(0)
    bf = jnp.bfloat16

    def randn(*shape, scale=0.05):
        return jnp.asarray(r.randn(*shape).astype(np.float32) * scale, bf)

    @jax.jit
    def roll(xp, k):
        return jnp.sum(roll_conv_packed(xp, k).astype(jnp.float32))

    @jax.jit
    def roll_fused(xp, k, sc, sh):
        return jnp.sum(roll_conv_affine_relu(xp, k, sc, sh)
                       .astype(jnp.float32))

    cases = [
        ("us3_conv", (64, 112, 144), 64, 32),
        ("us1_conv2", (32, 56, 72), 64, 64),
        ("us2_conv2_fused", (64, 112, 144), 64, 64),
    ]
    for name, (D, H, W), ci, co in cases:
        xp = pack_w(randn(B, D, H, W, ci))
        k = randn(3, 3, 3, ci, co, scale=0.02)
        flops = 2 * B * D * H * W * 27 * ci * co
        print(json.dumps({"case": name,
                          "plan_wt": _plan(xp.shape, co, 2)}), flush=True)
        try:
            if name.endswith("_fused"):
                sc = jnp.asarray(r.rand(2 * co).astype(np.float32) + 0.5)
                sh = jnp.asarray(r.randn(2 * co).astype(np.float32))
                timeit(roll_fused, (xp, k, sc, sh), f"roll_{name}", flops)
            else:
                timeit(roll, (xp, k), f"roll_{name}", flops)
        except Exception as e:
            print(json.dumps({"case": f"roll_{name}",
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
        del xp, k


if __name__ == "__main__":
    sys.stdout.reconfigure(line_buffering=True)
    main()
