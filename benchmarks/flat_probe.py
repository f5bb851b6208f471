#!/usr/bin/env python
"""Chip probe: plane-flat im2col kernel vs XLA direct at layer3/4 shapes.

The s2b trunk layers carry 8.2 of the model's 9.5 trunk TFLOP
(reference ``med3d.py:207-213``); their post-s2b conv shapes at B=4 are
layer3 (32, 8, 14, 18, 256) and layer4 (256, 4, 7, 9, 512).  Measures the
isolated kernels AND the full packed+roll forward (the isolated-conv trap
means only the in-model number decides the default).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TARGET = (128, 224, 288)


def _time(fn, *args, n=10, trials=3):
    out = fn(*args)
    np.asarray(jax_block(out))
    best = 1e9
    for _ in range(trials):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax_block(out))
        best = min(best, (time.time() - t0) / n * 1e3)
    return best


def jax_block(out):
    while isinstance(out, (tuple, list)):
        out = out[0]
    return out[(0,) * (out.ndim - 1)]


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    from bodyct_dram_emph_subtype_tpu.ops.flat_conv import (
        _direct_reference, flat_conv3d, supports_flat_conv)

    rng = np.random.RandomState(0)
    cases = [
        ("layer3", (32, 8, 14, 18, 256), 256),
        ("layer4", (256, 4, 7, 9, 512), 512),
    ]
    for name, shape, o in cases:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(
            rng.randn(3, 3, 3, shape[-1], o).astype(np.float32)).astype(jnp.bfloat16)
        ok = supports_flat_conv(x.shape, k.shape, 2)
        flops = 2 * np.prod(shape) * 27 * o
        row = {"case": name, "supported": bool(ok)}
        try:
            if ok:
                f = jax.jit(flat_conv3d)
                ms = _time(f, x, k)
                row.update(flat_ms=round(ms, 2),
                           flat_tf=round(flops / ms / 1e9, 1))
            d = jax.jit(_direct_reference)
            ms_d = _time(d, x, k)
            row.update(direct_ms=round(ms_d, 2),
                       direct_tf=round(flops / ms_d / 1e9, 1))
        except Exception as e:  # noqa: BLE001
            row.update(error=type(e).__name__, msg=str(e)[:160])
        print(json.dumps(row), flush=True)

    # full packed forward, roll mode (now includes flat_conv on layer3/4)
    from bodyct_dram_emph_subtype_tpu.models import blocks, get_model_by_name
    blocks.set_conv3d_mode("roll")
    model = get_model_by_name("med3ddram", dtype=jnp.bfloat16,
                              packed_decoder=True)
    x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
    v = jax.jit(lambda kk: model.init(kk, x0, x0, train=False))(
        jax.random.PRNGKey(0))
    B = 4
    xb = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32))
    lb = jnp.ones((B, *TARGET, 1), jnp.float32)
    fwd = jax.jit(lambda v, x, l: model.apply(v, x, l, train=False))
    try:
        ms = _time(fwd, v, xb, lb, n=5)
        print(json.dumps({"bench": "fwd_packed_roll+flat", "ms": round(ms, 1),
                          "batch": B}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": "fwd_packed_roll+flat",
                          "error": type(e).__name__, "msg": str(e)[:200]}),
              flush=True)


if __name__ == "__main__":
    main()
