#!/usr/bin/env python
"""Chip A/B: full packed forward under roll patch schemes vs XLA direct.

The compact K=4C scheme won every isolated decoder-conv case
(benchmarks/compact_probe.py); this measures what it buys in-model —
full med3ddram forward at deployment shape, B=4 bf16 — and converts to
compute-only vol/s/chip (the BENCH metric's numerator).
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TARGET = (128, 224, 288)
B = 4


def main():
    global TARGET, B
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

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
    from bodyct_dram_emph_subtype_tpu.ops.roll_conv import \
        set_roll_patch_scheme

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32))
    lungs = jnp.ones((B, *TARGET, 1), jnp.float32)

    for mode, scheme in (("roll", "wide"), ("roll", "compact"),
                         ("direct", "wide")):
        blocks.set_conv3d_mode(mode)
        set_roll_patch_scheme(scheme)
        try:
            model = get_model_by_name(
                "med3ddram", dtype=jnp.bfloat16,
                packed_decoder=(mode == "roll"))
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
                "case": f"fwd/{mode}/{scheme}", "ms": round(best, 1),
                "compute_vols_per_s": round(B / best * 1e3, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": f"fwd/{mode}/{scheme}",
                              "error": type(e).__name__}), flush=True)
        finally:
            set_roll_patch_scheme("auto")
            blocks.set_conv3d_mode("direct")


if __name__ == "__main__":
    main()
