#!/usr/bin/env python
"""Chip probe (round 5): us3 backward via LANE-PADDED roll kernels.

The us3 conv's backward operand g has 2x32 = 64 packed lanes — a
sub-lane-tile Mosaic still crashes on (re-confirmed round 5).  Dodge:
zero-pad each parity block 32->64 (lanes 128) and zero the matching
kernel rows/cols — exact, and the padded shape's measured twin
(us2_conv2 dgrad, 64ch at the same spatial size) runs 11.5 ms vs the
25.4 ms XLA us3 dgrad.  Measures dgrad and wgrad, padded-roll vs XLA.
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

    from bodyct_dram_emph_subtype_tpu.models.packed import pack_w
    from bodyct_dram_emph_subtype_tpu.ops import roll_conv as rc

    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    D, H, W, O, C = 64, 112, 144, 32, 64   # us3: conv C=64 -> O=32
    g = pack_w(jnp.asarray(
        rng.randn(B, D, H, W, O).astype(np.float32) * 0.05).astype(bf))
    xp = pack_w(jnp.asarray(
        rng.randn(B, D, H, W, C).astype(np.float32) * 0.05).astype(bf))
    kernel = jnp.asarray(
        rng.randn(3, 3, 3, C, O).astype(np.float32) * 0.02).astype(bf)
    kt = jnp.flip(kernel, (0, 1, 2)).swapaxes(3, 4)   # (3,3,3,O,C)

    def pad_pair(a):
        o = a.shape[-1] // 2
        z = jnp.zeros(a.shape[:-1] + (o,), a.dtype)
        return jnp.concatenate([a[..., :o], z, a[..., o:], z], axis=-1)

    def timeit(f, *args):
        # completion barrier via a TINY slice fetch — np.asarray of the
        # full array would time the 0.5 GB device->host download instead
        def fence(out):
            a = jax.tree_util.tree_leaves(out)[0]
            np.asarray(a[(0,) * (a.ndim - 1)][:4])
        out = f(*args)
        fence(out)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(8):
                out = f(*args)
            fence(out)
            best = min(best, (time.time() - t0) / 8 * 1e3)
        return best, out

    # ---- dgrad: dx = conv(g, kt) in packed domain ----
    ktp = jnp.concatenate(
        [kt, jnp.zeros((3, 3, 3, O, C), kt.dtype)], axis=3)  # in O->2O
    dg_pad = jax.jit(lambda g, ktp: rc._roll_conv_impl(pad_pair(g), ktp))
    dg_xla = jax.jit(lambda g, kt: rc._direct_packed_reference(g, kt))
    try:
        ms_pad, out_pad = timeit(dg_pad, g, ktp)
        ms_xla, out_xla = timeit(dg_xla, g, kt)
        err = float(jnp.max(jnp.abs(
            out_pad.astype(jnp.float32) - out_xla.astype(jnp.float32))))
        print(json.dumps({"case": "us3_dgrad", "pad_roll_ms": round(ms_pad, 2),
                          "xla_ms": round(ms_xla, 2), "max_err": err}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": "us3_dgrad", "error": type(e).__name__,
                          "msg": str(e)[:300]}), flush=True)

    # ---- wgrad: dw = d/dk sum(conv(xp, k) * g) ----
    ok = rc.supports_roll_wgrad(xp.shape, (3, 3, 3, C, 2 * O),
                                xp.dtype.itemsize)
    print(json.dumps({"wgrad_padded_supported": bool(ok)}), flush=True)
    wg_xla = jax.jit(lambda xp, g: jax.grad(lambda k: jnp.sum(
        (rc._direct_packed_reference(xp, k) * g).astype(jnp.float32)))(
            kernel))
    try:
        ms_xla, dw_xla = timeit(wg_xla, xp, g)
        row = {"case": "us3_wgrad", "xla_ms": round(ms_xla, 2)}
        if ok:
            wg_pad = jax.jit(lambda xp, g: rc.roll_conv_wgrad(
                xp, pad_pair(g), (3, 3, 3, C, 2 * O))[..., :O])
            ms_pad, dw_pad = timeit(wg_pad, xp, g)
            err = float(jnp.max(jnp.abs(
                dw_pad.astype(jnp.float32) - dw_xla.astype(jnp.float32))))
            rel = err / float(jnp.max(jnp.abs(dw_xla.astype(jnp.float32))))
            row.update(pad_roll_ms=round(ms_pad, 2), max_err=err,
                       rel_err=round(rel, 6))
        print(json.dumps(row), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": "us3_wgrad", "error": type(e).__name__,
                          "msg": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
