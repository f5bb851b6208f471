#!/usr/bin/env python
"""tap_conv3d vs direct XLA conv on the real TPU chip at model shapes.

One process, serial compiles (remote-compile tunnel), checksum fetch as the
timing barrier, best-of-trials; one JSON line per case as it completes
(write straight to stdout with flush — DEVNOTES benchmarking rules).
"""
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
    rec = {"case": name, "ms": round(best * 1e3, 2),
           "tflops_per_s": round(flops / best / 1e12, 1)}
    print(json.dumps(rec), flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from bodyct_dram_emph_subtype_tpu.ops.tap_conv import (
        _direct_conv3d, _plan, tap_conv3d)

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    r = np.random.RandomState(0)
    bf = jnp.bfloat16

    def randn(*shape, scale=0.05):
        return jnp.asarray(r.randn(*shape).astype(np.float32) * scale, bf)

    @jax.jit
    def tap(x, k):
        return jnp.sum(tap_conv3d(x, k).astype(jnp.float32))

    @jax.jit
    def direct(x, k):
        return jnp.sum(_direct_conv3d(x, k).astype(jnp.float32))

    cases = [
        # (name, (D,H,W), Cin, Cout)
        ("us2_conv1", (64, 112, 144), 128, 64),
        ("us2_conv2", (64, 112, 144), 64, 64),
        ("us1_conv1", (32, 56, 72), 576, 64),
        ("us3_conv", (64, 112, 144), 64, 32),
        ("layer1_conv", (32, 56, 72), 64, 64),
        ("layer2_conv", (16, 28, 36), 128, 128),
    ]
    for name, (D, H, W), ci, co in cases:
        x = randn(B, D, H, W, ci)
        k = randn(3, 3, 3, ci, co, scale=0.02)
        flops = 2 * B * D * H * W * 27 * ci * co
        plan = _plan(x.shape, co, 2)
        print(json.dumps({"case": name, "plan": plan}), flush=True)
        try:
            timeit(tap, (x, k), f"tap_{name}", flops)
        except Exception as e:
            print(json.dumps({"case": f"tap_{name}",
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
        if name in ("us2_conv2",):   # one direct baseline for sanity
            timeit(direct, (x, k), f"direct_{name}", flops)
        del x, k


if __name__ == "__main__":
    sys.stdout.reconfigure(line_buffering=True)
    main()
