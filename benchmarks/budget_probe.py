#!/usr/bin/env python
"""Roll-kernel plan budget A/B: 20 MB (round-3b tuning) vs 52 MB.

The layer1 resident kernel proved 64 MB scoped VMEM compiles and runs
on the v5e, so the streaming kernels can afford whole-W single-tile
plans: us1_conv1 (C=576, Wh=36) moves WT 8 -> 40 (kills the 5x halo
re-read behind its 69 TF/s), us2_conv1 (C=128, Wh=72) moves WT 24 -> 72.
Whole-model forward at both budgets, same window.
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
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.models import (blocks,
                                                     get_model_by_name)
    from bodyct_dram_emph_subtype_tpu.ops import roll_conv as rc

    # report the plans each budget picks for the hot shapes
    shapes = {
        "us1_conv1": ((B, 32, 56, 36, 1152), 64),
        "us2_conv1": ((B, 64, 112, 72, 256), 64),
        "us2_conv2": ((B, 64, 112, 72, 128), 64),
        "us1_conv2": ((B, 32, 56, 36, 128), 64),
    }
    for mb in (20, 52):
        rc.set_roll_vmem_budget(mb * 1024 * 1024)
        plans = {k: rc._plan(s, o, 2) for k, (s, o) in shapes.items()}
        print(json.dumps({"budget_mb": mb, "plans": plans}), flush=True)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32))
    lungs = jnp.ones((B, *TARGET, 1), jnp.float32)

    for mb in (20, 52):
        blocks.set_conv3d_mode("roll")
        rc.set_roll_vmem_budget(mb * 1024 * 1024)
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
                "budget_mb": mb, "ms": round(best, 1),
                "compute_vols_per_s": round(B / best * 1e3, 2)}),
                flush=True)
        except Exception as e:  # noqa: BLE001 — report, keep probing
            print(json.dumps({"budget_mb": mb,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
        finally:
            blocks.set_conv3d_mode("direct")
            rc.set_roll_vmem_budget(20 * 1024 * 1024)


if __name__ == "__main__":
    main()
