#!/usr/bin/env python
"""Decoder-stage bisection probe on the real TPU chip.

Times each decoder component at the deployment shapes (B=4, bf16, input
128x224x288 -> half-res decoder at 64x112x144) plus candidate lane-packed
conv formulations:

- conv_plain   : 3x3x3 64->64 as lowered today (C_out=64 half-fills the
                 128-lane MXU).
- conv_packw   : kernel (3,3,4), stride (1,1,2), 2*C_out packed output
                 channels (both W-parities computed in one conv -> full
                 lanes, 4/3x FLOPs) + reshape back to unpacked layout.
- conv_packres : packed-resident 3x3x3 conv on (B,D,H,W/2,2C) activations
                 with a 1/2-dense zero-structured kernel (2x FLOPs, no
                 relayout between convs).

Methodology per DEVNOTES.md: one process (programs compile sequentially via
the remote-compile tunnel), chained dispatches, checksum fetch at the end of
each trial, best-of-trials.  Prints one JSON line per case as it completes.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = 4
HALF = (64, 112, 144)      # decoder resolution (input 128x224x288 / 2)
QUART = (32, 56, 72)
EIGHTH = (16, 28, 36)
ITERS = 8
TRIALS = 3


def timeit(fn, args, name, flops=None):
    import jax

    out = fn(*args)
    np.asarray(out)  # force compile + execution
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.time()
        for _ in range(ITERS):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.time() - t0) / ITERS)
    rec = {"case": name, "ms": round(best * 1e3, 2)}
    if flops:
        rec["tflops_per_s"] = round(flops / best / 1e12, 1)
    print(json.dumps(rec), flush=True)
    return best


def pack_w_kernel(kernel):
    """(3,3,3,Ci,Co) -> (3,3,4,Ci,2Co): parity-0 output uses W-taps 0..2,
    parity-1 uses 1..3 (zero elsewhere)."""
    import jax.numpy as jnp
    kd, kh, kw, ci, co = kernel.shape
    z = jnp.zeros((kd, kh, 1, ci, co), kernel.dtype)
    k0 = jnp.concatenate([kernel, z], axis=2)
    k1 = jnp.concatenate([z, kernel], axis=2)
    return jnp.concatenate([k0, k1], axis=-1)


def packres_kernel(kernel):
    """(3,3,3,Ci,Co) -> (3,3,3,2Ci,2Co) acting on W-parity-packed
    activations (channel = parity*C + c)."""
    import numpy as _np
    kd, kh, kw, ci, co = kernel.shape
    k = np.asarray(kernel, np.float32)
    out = _np.zeros((kd, kh, 3, 2 * ci, 2 * co), _np.float32)
    # out parity o at packed tap t+j-1 reads in position 2t+o+(d-1), d=0..2
    # packed input (pos t+p, parity q) where o+d-1 = 2p+q - ... solve:
    # in_w = 2t + (o + d - 1); packed pos = t + (o+d-1+2)//2 - 1, parity
    # = (o+d-1) mod 2.
    for o in range(2):
        for d in range(3):
            w = o + d - 1           # in_w offset from 2t
            p = (w + 2) // 2 - 1    # packed tap offset in {-1,0,1}
            q = (w + 2) % 2         # parity of input
            out[:, :, p + 1, q * ci:(q + 1) * ci, o * co:(o + 1) * co] = \
                k[:, :, d]
    return out


def main():
    import jax
    import jax.numpy as jnp

    from bodyct_dram_emph_subtype_tpu.models.blocks import UpsampleConvBlock
    from bodyct_dram_emph_subtype_tpu.models.resnet3d import _Decoder
    from bodyct_dram_emph_subtype_tpu.ops.resize import resize_linear_matmul

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    r = np.random.RandomState(0)
    bf = jnp.bfloat16

    def randn(*shape, dtype=bf, scale=0.05):
        return jnp.asarray(r.randn(*shape).astype(np.float32) * scale, dtype)

    D, H, W = HALF
    x4 = randn(B, *EIGHTH, 512)
    x1 = randn(B, *QUART, 64)
    stem = randn(B, *HALF, 64)
    xa = randn(B, D, H, W, 64)            # us2-conv1-like activation
    xp = randn(B, D, H, W // 2, 128)      # packed-resident activation
    k64 = randn(3, 3, 3, 64, 64, dtype=bf, scale=0.02)
    k128_64 = randn(3, 3, 3, 128, 64, dtype=bf, scale=0.02)

    dn = ("NDHWC", "DHWIO", "NDHWC")
    vox = B * D * H * W

    # --- plain conv 64->64 (today's lowering) ---
    @jax.jit
    def conv_plain(x, k):
        out = jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn)
        return jnp.sum(out.astype(jnp.float32))

    timeit(conv_plain, (xa, k64), "conv_plain_64_64",
           flops=2 * vox * 27 * 64 * 64)

    # --- packed-W conv 64->64 ---
    @jax.jit
    def conv_packw(x, k):
        kp = pack_w_kernel(k)
        out = jax.lax.conv_general_dilated(
            x, kp, (1, 1, 2), [(1, 1), (1, 1), (1, 2)],
            dimension_numbers=dn)
        out = out.reshape(B, D, H, W, 64)
        return jnp.sum(out.astype(jnp.float32))

    timeit(conv_packw, (xa, k64), "conv_packw_64_128p",
           flops=2 * vox * 27 * 64 * 64)

    # --- packed-W conv 128->64 (us2-conv0-like) ---
    xcat = randn(B, D, H, W, 128)
    @jax.jit
    def conv_packw2(x, k):
        kp = pack_w_kernel(k)
        out = jax.lax.conv_general_dilated(
            x, kp, (1, 1, 2), [(1, 1), (1, 1), (1, 2)],
            dimension_numbers=dn)
        out = out.reshape(B, D, H, W, 64)
        return jnp.sum(out.astype(jnp.float32))

    timeit(conv_packw2, (xcat, k128_64), "conv_packw_128_128p",
           flops=2 * vox * 27 * 128 * 64)

    # --- packed-resident conv (2x FLOPs, no relayout) ---
    kpr = jnp.asarray(packres_kernel(np.asarray(k64, np.float32)), bf)
    @jax.jit
    def conv_packres(x, k):
        out = jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn)
        return jnp.sum(out.astype(jnp.float32))

    timeit(conv_packres, (xp, kpr), "conv_packres_128_128",
           flops=2 * vox * 27 * 64 * 64)  # useful flops

    # --- upsample matmul 64ch quart->half ---
    @jax.jit
    def upsample64(x):
        out = resize_linear_matmul(x, HALF, (1, 2, 3), align_corners=True)
        return jnp.sum(out.astype(jnp.float32))

    timeit(upsample64, (x1,), "upsample_matmul_64ch")

    # --- full-res dRAM map upsample (fp32, 1ch) ---
    dmap = randn(B, D, H, W, 1, dtype=jnp.float32)
    ess = randn(B, 2 * D, 2 * H, 2 * W, 1, dtype=jnp.float32)
    @jax.jit
    def mapup(d, e):
        out = resize_linear_matmul(d, (2 * D, 2 * H, 2 * W), (1, 2, 3),
                                   align_corners=True) * e
        return jnp.sum(out)

    timeit(mapup, (dmap, ess), "mapup_fullres_fp32")

    # --- decoder stages via flax (params built host-side, no init compile) ---
    def make_params(mod, *args):
        shapes = jax.eval_shape(
            functools.partial(mod.init, train=False), jax.random.PRNGKey(0),
            *args)
        return jax.tree.map(
            lambda s: jnp.asarray(
                r.randn(*s.shape).astype(np.float32) * 0.02, s.dtype),
            shapes)

    us = UpsampleConvBlock([64, 64], dtype=bf, name="us1")
    vus1 = make_params(us, x4, x1)

    @jax.jit
    def us1_fn(v, a, b):
        out = us.apply(v, a, b, False)
        return jnp.sum(out.astype(jnp.float32))

    timeit(us1_fn, (vus1, x4, x1), "us1_block")

    xup1 = randn(B, *QUART, 64)
    vus2 = make_params(us, xup1, stem)

    @jax.jit
    def us2_fn(v, a, b):
        out = us.apply(v, a, b, False)
        return jnp.sum(out.astype(jnp.float32))

    timeit(us2_fn, (vus2, xup1, stem), "us2_block")

    dec = _Decoder(dtype=bf)
    vdec = make_params(dec, x4, x1, stem)

    @jax.jit
    def dec_fn(v, a, b, c):
        out = dec.apply(v, a, b, c, False)
        return jnp.sum(out.astype(jnp.float32))

    timeit(dec_fn, (vdec, x4, x1, stem), "decoder_full")


if __name__ == "__main__":
    sys.stdout.reconfigure(line_buffering=True)
    main()
