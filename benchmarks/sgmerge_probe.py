#!/usr/bin/env python
"""Chip probe: subgrid-merged layouts for the s2b trunk convs.

Whole-layer space-to-batch gives layer3 (B*8, 8, 14, 18, 256) and layer4
(B*64, 4, 7, 9, 512).  The W extents (18 / 9) round up to 24 / 16
sublanes — 25% / 44% structural padding on every conv tile.  Merging k
subgrids along W with 2 zero separator columns amortises the round-up
(e.g. layer3 k=8: W' = 8*18+7*2 = 158 -> 160, ~1% waste) and gives XLA
fewer, larger tiles.  Correct for eval when separator columns are
re-zeroed before each conv (3-wide taps never reach across a 2-column
zero gap).

Isolated conv timings per layout; the in-model decision follows the
isolated-conv-trap rule (verify in-model before adopting).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _time(fn, *args, n=10, trials=3):
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
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    rng = np.random.RandomState(0)
    # (name, base subgrid batch/geometry, channels, merge-k list)
    cases = [
        ("layer3", 32, (8, 14, 18), 256, (1, 2, 4, 8)),
        ("layer4", 256, (4, 7, 9), 512, (1, 4, 8, 16)),
    ]
    for name, nb, (d, h, w), c, ks in cases:
        k = jnp.asarray(
            rng.randn(3, 3, 3, c, c).astype(np.float32)).astype(jnp.bfloat16)
        # useful FLOPs exclude separator columns
        flops = 2 * nb * d * h * w * 27 * c * c
        for kk in ks:
            n2 = nb // kk
            w2 = kk * w + 2 * (kk - 1)
            x = jnp.asarray(rng.randn(n2, d, h, w2, c).astype(
                np.float32)).astype(jnp.bfloat16)
            f = jax.jit(conv)
            try:
                ms = _time(f, x, k)
                print(json.dumps({
                    "case": f"{name}_wmerge{kk}", "shape": [n2, d, h, w2, c],
                    "ms": round(ms, 2),
                    "useful_tf": round(flops / ms / 1e9, 1)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"case": f"{name}_wmerge{kk}",
                                  "error": type(e).__name__,
                                  "msg": str(e)[:160]}), flush=True)
        # H-merge comparison at one k (separators on the 8-free H dim)
        kk = 2
        h2 = kk * h + 2 * (kk - 1)
        x = jnp.asarray(rng.randn(nb // kk, d, h2, w, c).astype(
            np.float32)).astype(jnp.bfloat16)
        try:
            ms = _time(jax.jit(conv), x, k)
            print(json.dumps({
                "case": f"{name}_hmerge{kk}", "shape": [nb // kk, d, h2, w, c],
                "ms": round(ms, 2),
                "useful_tf": round(flops / ms / 1e9, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": f"{name}_hmerge{kk}",
                              "error": type(e).__name__}), flush=True)

    # --- in-model-like eval block chains: conv+affine+relu x2 + residual ---
    # merged case re-zeroes separator columns before every conv (the exact
    # correctness requirement); measures whether the layout win survives
    # the full chain incl. mask multiplies (the isolated-conv trap check)
    def make_chain(nblk, c, k, mask=None):
        def chain(x, ks, ss, bs):
            for i in range(nblk):
                res = x
                for j in range(2):
                    if mask is not None:
                        x = x * mask
                    x = conv(x, ks[2 * i + j])
                    x = x * ss[2 * i + j] + bs[2 * i + j]
                    x = jnp.maximum(x, 0.0) if j == 0 else x
                x = jnp.maximum(x + res, 0.0)
            return x
        return chain

    for name, nb, (d, h, w), c, nblk, kk in (
            ("layer3", 32, (8, 14, 18), 256, 6, 8),
            ("layer4", 256, (4, 7, 9), 512, 3, 8)):
        ks = jnp.asarray(rng.randn(2 * nblk, 3, 3, 3, c, c).astype(
            np.float32) * 0.02).astype(jnp.bfloat16)
        ss = jnp.ones((2 * nblk, 1, 1, 1, 1, c), jnp.bfloat16)
        bs = jnp.zeros((2 * nblk, 1, 1, 1, 1, c), jnp.bfloat16)
        flops = 2 * nblk * 2 * nb * d * h * w * 27 * c * c
        x = jnp.asarray(rng.randn(nb, d, h, w, c).astype(
            np.float32)).astype(jnp.bfloat16)
        f = jax.jit(make_chain(nblk, c, None))
        ms = _time(f, x, ks, ss, bs, n=4)
        print(json.dumps({"case": f"{name}_chain_asis", "ms": round(ms, 2),
                          "useful_tf": round(flops / ms / 1e9, 1)}),
              flush=True)

        w2 = kk * w + 2 * (kk - 1)
        maskv = np.ones((1, 1, 1, w2, 1), np.float32)
        for j in range(1, kk):
            maskv[:, :, :, j * (w + 2) - 2:j * (w + 2), :] = 0.0
        mask = jnp.asarray(maskv).astype(jnp.bfloat16)
        xm = jnp.asarray(rng.randn(nb // kk, d, h, w2, c).astype(
            np.float32)).astype(jnp.bfloat16)
        f = jax.jit(make_chain(nblk, c, None, mask=mask))
        try:
            ms = _time(f, xm, ks, ss, bs, n=4)
            print(json.dumps({"case": f"{name}_chain_wmerge{kk}",
                              "ms": round(ms, 2),
                              "useful_tf": round(flops / ms / 1e9, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": f"{name}_chain_wmerge{kk}",
                              "error": type(e).__name__,
                              "msg": str(e)[:160]}), flush=True)

    # --- full packed+roll forward with the merge enabled in-model ---
    from bodyct_dram_emph_subtype_tpu.models import blocks, get_model_by_name
    TARGET = (128, 224, 288)
    B = 4
    blocks.set_conv3d_mode("roll")
    blocks.set_sgmerge_k(8)
    model = get_model_by_name("med3ddram", dtype=jnp.bfloat16,
                              packed_decoder=True)
    x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
    v = jax.jit(lambda kk: model.init(kk, x0, x0, train=False))(
        jax.random.PRNGKey(0))
    xb = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32))
    lb = jnp.ones((B, *TARGET, 1), jnp.float32)
    fwd = jax.jit(lambda v, x, l: model.apply(v, x, l, train=False))

    def run(v, x, l):
        d, _ = fwd(v, x, l)
        return d[0]

    try:
        ms = _time(run, v, xb, lb, n=5)
        print(json.dumps({"bench": "fwd_packed_roll_sgmerge8",
                          "ms": round(ms, 1), "batch": B}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": "fwd_packed_roll_sgmerge8",
                          "error": type(e).__name__, "msg": str(e)[:200]}),
              flush=True)


if __name__ == "__main__":
    main()
