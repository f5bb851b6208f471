#!/usr/bin/env python
"""Chip probe: roll-kernel dgrad instances at the decoder's backward shapes.

Isolates which (if any) dgrad kernel shape breaks Mosaic after the train
compile failed with an opaque HTTP 500, and times the survivors vs the
unpacked XLA dgrad.
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
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    from bodyct_dram_emph_subtype_tpu.models.packed import pack_w
    from bodyct_dram_emph_subtype_tpu.ops.roll_conv import (
        _direct_packed_reference, _plan, _roll_conv_impl, supports_roll_conv)

    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    # (name, unpacked grad spatial, Cout of fwd conv -> dgrad input ch,
    #  Cin of fwd conv -> dgrad output ch)
    cases = [
        ("us1_conv1", (32, 56, 72), 64, 576),
        ("us1_conv2", (32, 56, 72), 64, 64),
        ("us2_conv1", (64, 112, 144), 64, 128),
        ("us2_conv2", (64, 112, 144), 64, 64),
        ("us3_conv", (64, 112, 144), 32, 64),
    ]
    for name, (D, H, W), o, c in cases:
        g = pack_w(jnp.asarray(
            rng.randn(B, D, H, W, o).astype(np.float32) * 0.05).astype(bf))
        kt = jnp.asarray(
            rng.randn(3, 3, 3, o, c).astype(np.float32) * 0.02).astype(bf)
        ok = supports_roll_conv(g.shape, kt.shape, 2)
        row = {"case": f"dgrad_{name}", "plan_wt": _plan(g.shape, c, 2),
               "supported": bool(ok)}
        try:
            if ok:
                f = jax.jit(lambda g, kt: _roll_conv_impl(g, kt))
                out = f(g, kt)
                np.asarray(out[0, 0, 0, :4])
                best = 1e9
                for _ in range(3):
                    t0 = time.time()
                    for _ in range(8):
                        out = f(g, kt)
                    np.asarray(out[0, 0, 0, :4])
                    best = min(best, (time.time() - t0) / 8 * 1e3)
                row["roll_ms"] = round(best, 2)
            d = jax.jit(lambda g, kt: _direct_packed_reference(g, kt))
            out = d(g, kt)
            np.asarray(out[0, 0, 0, :4])
            bestd = 1e9
            for _ in range(3):
                t0 = time.time()
                for _ in range(8):
                    out = d(g, kt)
                np.asarray(out[0, 0, 0, :4])
                bestd = min(bestd, (time.time() - t0) / 8 * 1e3)
            row["xla_ms"] = round(bestd, 2)
        except Exception as e:  # noqa: BLE001
            row["error"] = type(e).__name__
            row["msg"] = str(e)[:160]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
