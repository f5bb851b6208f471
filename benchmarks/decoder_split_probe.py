#!/usr/bin/env python
"""Chained decoder-piece timings (drowns the 5-15 ms dispatch floor).

Each case runs N=10 iterations INSIDE one jit program (inputs varied by a
cheap +i to defeat CSE); per-iteration time = (program - baseline)/N.
Pallas kernels have fixed schedules, so these isolated numbers transfer
in-model (the XLA cases are still subject to the isolated-conv trap).
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

    from bodyct_dram_emph_subtype_tpu.models.blocks import crop_concat
    from bodyct_dram_emph_subtype_tpu.models.packed import (
        build_packed_kernel_k3, pack_w)
    from bodyct_dram_emph_subtype_tpu.ops.resize import resize_linear_matmul
    from bodyct_dram_emph_subtype_tpu.ops.roll_conv import (
        roll_conv_affine_relu, roll_conv_heads_sigmoid)

    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    HALF = tuple(t // 2 for t in TARGET)      # 64,112,144
    QUART = tuple(t // 4 for t in TARGET)     # 32,56,72

    def randn(*shape, scale=0.1):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale, bf)

    def timed(name, make_fn, x):
        f = jax.jit(make_fn)
        out = f(x)
        np.asarray(out)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                out = f(x)
            np.asarray(out)
            best = min(best, (time.time() - t0) / 3 * 1e3)
        print(json.dumps({"case": name, "ms_per_iter":
                          round(best / N, 2)}), flush=True)

    def chain(op):
        def f(x):
            def body(i, acc):
                y = op(x + i.astype(x.dtype))
                return acc + jnp.sum(y.astype(jnp.float32))
            return jax.lax.fori_loop(0, N, body, 0.0).reshape(1)
        return f

    # baseline: the chain scaffolding on the biggest input
    timed("baseline(add+sum 528MB)", chain(lambda x: x), randn(B, *HALF, 64))

    import os
    SKIP = int(os.environ.get("DEC_SKIP", "0"))

    sc = jnp.ones((128,), jnp.float32)
    sh = jnp.zeros((128,), jnp.float32)
    k2 = randn(3, 3, 3, 64, 64, scale=0.05)
    xp2 = randn(B, HALF[0], HALF[1], HALF[2] // 2, 128)

    if not SKIP:
        # us2_conv1: packed roll, C=128 -> 64 @ HALF  (WT=24 plan)
        xp1 = randn(B, HALF[0], HALF[1], HALF[2] // 2, 256)
        k1 = randn(3, 3, 3, 128, 64, scale=0.05)
        timed("us2_conv1 roll", chain(
            lambda x: roll_conv_affine_relu(x, k1, sc, sh)), xp1)

        # us2_conv2: packed roll, C=64 -> 64 @ HALF
        timed("us2_conv2 roll", chain(
            lambda x: roll_conv_affine_relu(x, k2, sc, sh)), xp2)

        # us3+heads fused tail
        k3 = randn(3, 3, 3, 64, 32, scale=0.05)
        sc3 = jnp.ones((64,), jnp.float32)
        sh3 = jnp.zeros((64,), jnp.float32)
        hw = randn(32, 2, scale=0.2)
        hb = jnp.zeros((2,), jnp.float32)
        timed("us3+heads fused", chain(
            lambda x: roll_conv_heads_sigmoid(x, k3, sc3, sh3, hw, hb)), xp2)

        # us2 upsample: matmul trilinear QUART -> HALF on 64 ch
        xq = randn(B, *QUART, 64)
        timed("us2 upsample matmul", chain(
            lambda x: resize_linear_matmul(x, HALF, (1, 2, 3),
                                           align_corners=True)), xq)

    # crop_concat of two HALF 64-ch tensors (as the packed block does);
    # the second operand derives from x (a closure constant would ship
    # 528 MB inside the compile RPC -> HTTP 413)
    timed("crop_concat+pack", chain(
        lambda x: pack_w(crop_concat(x, x + 1))), randn(B, *HALF, 64))

    # us1_conv1: packed-domain XLA conv 576 -> 64 @ QUART
    xq1 = randn(B, QUART[0], QUART[1], QUART[2] // 2, 1152)
    kp = build_packed_kernel_k3(randn(3, 3, 3, 576, 64, scale=0.02))
    timed("us1_conv1 packed XLA", chain(
        lambda x: jax.lax.conv_general_dilated(
            x, kp, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))), xq1)

    # us1_conv2 roll with the new WT=40 plan
    xq2 = randn(B, QUART[0], QUART[1], QUART[2] // 2, 128)
    timed("us1_conv2 roll WT40", chain(
        lambda x: roll_conv_affine_relu(x, k2, sc, sh)), xq2)

    # us1 upsample: matmul trilinear EIGHTH -> QUART on 512 ch
    x8 = randn(B, *(t // 8 for t in TARGET), 512)
    timed("us1 upsample matmul", chain(
        lambda x: resize_linear_matmul(x, QUART, (1, 2, 3),
                                       align_corners=True)), x8)


if __name__ == "__main__":
    main()
