#!/usr/bin/env python
"""Experiment: 3-D conv formulations on TPU.

Hypothesis: XLA's direct 3-D conv path on TPU underperforms (the dilated
variant was measured 8-2600x slow, DEVNOTES.md) and even the dense 3-D convs
run at ~10-20% MFU.  A k-D conv decomposes along depth into ``kd`` 2-D convs
with D folded into the batch dim — the NHWC conv2d path is XLA-TPU's
best-tuned op.  This script times the formulations side by side on the real
chip and prints one JSON line each with achieved TFLOP/s.

Formulations per (Cin->Cout @ B,D,H,W) shape:
  c3d      — direct lax 3-D conv (current model path)
  c2d_sum  — 3 x conv2d over depth taps, accumulated
  c2d_cat  — depth taps concatenated into channels, single conv2d
  c2d_pure — a single 2-D conv at the same arithmetic intensity (ceiling)
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BF16_PEAK_TFLOPS = 197.0  # v5e


def conv3d_direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_as_2d_sum(x, k):
    """3^3 conv = sum over 3 depth taps of 2-D convs (D folded into N)."""
    B, D, H, W, C = x.shape
    O = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for t in range(k.shape[0]):
        xt = jax.lax.dynamic_slice_in_dim(xp, t, D, 1).reshape(B * D, H, W, C)
        y = jax.lax.conv_general_dilated(
            xt, k[t], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y if out is None else out + y
    return out.reshape(B, D, H, W, O)


def conv3d_as_2d_cat(x, k):
    """3^3 conv = one 2-D conv on depth-tap-concatenated channels."""
    B, D, H, W, C = x.shape
    O = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    taps = [jax.lax.dynamic_slice_in_dim(xp, t, D, 1)
            for t in range(k.shape[0])]
    xcat = jnp.concatenate(taps, axis=-1).reshape(B * D, H, W,
                                                  C * k.shape[0])
    kcat = jnp.concatenate([k[t] for t in range(k.shape[0])], axis=2)
    y = jax.lax.conv_general_dilated(
        xcat, kcat, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(B, D, H, W, O)


def _bench(name, fn, args, flops, n=8):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    _ = np.asarray(jnp.ravel(r)[:1])
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    _ = np.asarray(jnp.ravel(r)[:1])
    ms = (time.time() - t0) / n * 1e3
    tf = flops / (ms * 1e-3) / 1e12
    print(json.dumps({"bench": name, "ms": round(ms, 2),
                      "tflops": round(tf, 1),
                      "mfu_pct": round(100 * tf / BF16_PEAK_TFLOPS, 1)}),
          flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cases", default="dec64,dec128,trunk256,pure2d")
    p.add_argument("--dtype", default="bf16")
    args = p.parse_args()
    cases = set(args.cases.split(","))
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    rng = np.random.RandomState(0)

    def mk(shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dt)

    def run_case(tag, B, D, H, W, Cin, Cout):
        x = mk((B, D, H, W, Cin))
        k = mk((3, 3, 3, Cin, Cout))
        flops = 2 * B * D * H * W * 27 * Cin * Cout
        # correctness cross-check on a tiny slice (same program shapes kept
        # distinct from the timed ones to not disturb caching)
        _bench(f"{tag}_c3d", conv3d_direct, (x, k), flops)
        _bench(f"{tag}_c2d_sum", conv3d_as_2d_sum, (x, k), flops)
        _bench(f"{tag}_c2d_cat", conv3d_as_2d_cat, (x, k), flops)

    if "int8" in cases:
        # int8 conv throughput (v5e int8 MXU peak is 2x bf16) — feasibility
        # probe for a quantized inference mode
        def c3d_i8(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.int32)

        for tag, (B, D, H, W, Cin, Cout) in {
                "i8_trunk256": (32, 8, 14, 18, 256, 256),
                "i8_trunk512": (256, 4, 7, 9, 512, 512),
                "i8_dec128": (4, 64, 112, 144, 128, 64),
        }.items():
            r8 = np.random.RandomState(1)
            x = jnp.asarray(r8.randint(-127, 127, (B, D, H, W, Cin)),
                            jnp.int8)
            k = jnp.asarray(r8.randint(-127, 127, (3, 3, 3, Cin, Cout)),
                            jnp.int8)
            flops = 2 * B * D * H * W * 27 * Cin * Cout
            _bench(f"{tag}", c3d_i8, (x, k), flops)
            xb = x.astype(jnp.bfloat16)
            kb = k.astype(jnp.bfloat16)
            _bench(f"{tag}_bf16ref", conv3d_direct, (xb, kb), flops)
    if "pallas" in cases:
        # Pallas im2col conv vs direct, decoder shapes
        from bodyct_dram_emph_subtype_tpu.ops.pallas_conv import pallas_conv3d
        for tag, (B, D, H, W, Cin, Cout) in {
                "pl64": (4, 64, 112, 144, 64, 64),
                "pl128": (4, 64, 112, 144, 128, 64),
                "pl_us1": (4, 32, 56, 72, 576, 64),
        }.items():
            x = mk((B, D, H, W, Cin))
            k = mk((3, 3, 3, Cin, Cout))
            flops = 2 * B * D * H * W * 27 * Cin * Cout
            _bench(f"{tag}_pallas", pallas_conv3d, (x, k), flops)
    if "packed128" in cases:
        # the W-pair-packed decoder shape: (B,D,H,W/2,128) — predicts the
        # speed of a packed decoder conv (2x the logical 64->64 FLOPs)
        x = mk((4, 64, 112, 72, 128))
        k = mk((3, 3, 3, 128, 128))
        flops = 2 * 4 * 64 * 112 * 72 * 27 * 128 * 128
        _bench("packed128_c3d", conv3d_direct, (x, k), flops)
    if "stem64" in cases:
        # stem-like: 64ch @ full half-res (4,64,112,144) 64->64 for reference
        # of conv3d MFU vs the 128ch packed variant at equal voxel count
        x = mk((4, 64, 112, 144, 64))
        k = mk((3, 3, 3, 64, 64))
        _bench("stem64_c3d_rerun", conv3d_direct, (x, k),
               2 * 4 * 64 * 112 * 144 * 27 * 64 * 64)
    if "dec64" in cases:
        # us2.conv2 / us3: 64->64 @ (4,64,112,144) — the measured 10%-MFU zone
        run_case("dec64", 4, 64, 112, 144, 64, 64)
    if "dec128" in cases:
        # us2.conv1 after concat: 128->64 @ (4,64,112,144)
        run_case("dec128", 4, 64, 112, 144, 128, 64)
    if "trunk256" in cases:
        # layer3-ish dense sub-grid conv after space-to-batch:
        # (B*8, 8, 14, 18, 256) -> 256
        run_case("trunk256", 32, 8, 14, 18, 256, 256)
    if "pure2d" in cases:
        # ceiling: plain NHWC conv2d at decoder-like sizes
        x = mk((256, 112, 144, 64))
        k = mk((3, 3, 64, 64))
        flops = 2 * 256 * 112 * 144 * 9 * 64 * 64

        def c2d(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        _bench("pure2d_64_64", c2d, (x, k), flops)
        x2 = mk((256, 112, 144, 128))
        k2 = mk((3, 3, 128, 128))
        _bench("pure2d_128_128", c2d, (x2, k2),
               2 * 256 * 112 * 144 * 9 * 128 * 128)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    main()
