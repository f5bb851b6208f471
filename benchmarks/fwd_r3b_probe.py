#!/usr/bin/env python
"""Whole-model forward A/B for the round-3b eval-path changes.

Micro-timings on the dev tunnel carry a 5-15 ms per-dispatch floor that
swings by window (DEVNOTES), so the only trustworthy comparison is the
full forward (~190 ms scale).  Cases: roll/compact with {maxpool kernel
on/off} x {stem factors (2,2,8)/(2,2,2)}; fused us3+heads is on in all
roll cases (model default under conv mode 'roll').
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TARGET = (128, 224, 288)
B = 4


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    global TARGET, B

    import jax
    import jax.numpy as jnp
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        TARGET, B = (32, 32, 32), 1
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.models import blocks, get_model_by_name
    from bodyct_dram_emph_subtype_tpu.models.packed import set_stem_s2d_factors
    from bodyct_dram_emph_subtype_tpu.ops import maxpool_kernel as mpk

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32))
    lungs = jnp.ones((B, *TARGET, 1), jnp.float32)

    real_gate = mpk.supports_maxpool_pallas
    cases = [
        ("mp=pallas stem=228", True, (2, 2, 8)),
        ("mp=xla    stem=228", False, (2, 2, 8)),
        ("mp=pallas stem=222", True, (2, 2, 2)),
    ]
    for name, mp_on, stem in cases:
        blocks.set_conv3d_mode("roll")
        set_stem_s2d_factors(stem)
        mpk.supports_maxpool_pallas = (real_gate if mp_on
                                       else lambda *a, **k: False)
        try:
            model = get_model_by_name("med3ddram", dtype=jnp.bfloat16,
                                      packed_decoder=True)
            v = jax.jit(lambda k: model.init(
                k, x[:1], lungs[:1], train=False))(jax.random.PRNGKey(0))

            @jax.jit
            def fwd(v, x, l):
                dense, regs = model.apply(v, x, l, train=False)
                return regs[0].sum().reshape(1) + regs[1].sum().reshape(1)

            out = fwd(v, x, lungs)
            np.asarray(out)
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                for _ in range(6):
                    out = fwd(v, x, lungs)
                np.asarray(out)
                best = min(best, (time.time() - t0) / 6 * 1e3)
            print(json.dumps({
                "case": name, "ms": round(best, 1),
                "compute_vols_per_s": round(B / best * 1e3, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": name, "error": type(e).__name__,
                              "msg": str(e)[:200]}), flush=True)
        finally:
            mpk.supports_maxpool_pallas = real_gate
            set_stem_s2d_factors((2, 2, 8))
            blocks.set_conv3d_mode("direct")


if __name__ == "__main__":
    main()
