#!/usr/bin/env python
"""Whole-model forward A/B: QUART roll enablement + VMEM plan budget.

Same-window in-model comparison (micro-timings carry a 5-15 ms dispatch
floor on the dev tunnel):
- base: current defaults (stem 228, pallas maxpool, fused heads, roll)
- qrt:  _ROLL_MIN_ELEMS 32M -> 8M: packed layer1 (PackedBasicBlock) and
  us1_conv2 take the rolling-ring kernel with the new WT=40 plans
- bud:  plan budget 11 -> 18 MB: us2_conv1 moves WT 8 -> 24
- both
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
    from bodyct_dram_emph_subtype_tpu.models import packed as packed_mod
    from bodyct_dram_emph_subtype_tpu.ops import roll_conv as rc

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32))
    lungs = jnp.ones((B, *TARGET, 1), jnp.float32)
    M8 = 8 * 2 ** 20
    M32 = 32 * 2 ** 20

    for name, min_elems, budget in [
            ("base", M32, 11), ("qrt", M8, 11),
            ("bud18", M32, 18), ("qrt+bud18", M8, 18)]:
        blocks.set_conv3d_mode("roll")
        packed_mod._ROLL_MIN_ELEMS = min_elems
        rc.set_roll_vmem_budget(budget * 1024 * 1024)
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
            packed_mod._ROLL_MIN_ELEMS = M32
            rc.set_roll_vmem_budget(11 * 1024 * 1024)
            blocks.set_conv3d_mode("direct")


if __name__ == "__main__":
    main()
