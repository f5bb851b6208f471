#!/usr/bin/env python
"""Whole-model forward A/B: roll-kernel tap-patch buffers 1 vs 2 vs 3.

With one patch buffer the VPU patch build (plane copy + edge-block
rolls, ~17 us/plane at the us2_conv1 shape) and the MXU matmuls
(~36 us/plane) fully serialize on the WAR hazard; rotating buffers let
Mosaic overlap the streams.  Extra buffers also inflate the plan
budget (us2_conv1 patch is 8.4 MB), so plans may pick smaller WT —
the whole-model number is the verdict.
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

    from bodyct_dram_emph_subtype_tpu.models import blocks, get_model_by_name
    from bodyct_dram_emph_subtype_tpu.ops import roll_conv as rc

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32))
    lungs = jnp.ones((B, *TARGET, 1), jnp.float32)

    for nb in (1, 2, 3):
        blocks.set_conv3d_mode("roll")
        rc.set_roll_patch_bufs(nb)
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
                "patch_bufs": nb, "ms": round(best, 1),
                "compute_vols_per_s": round(B / best * 1e3, 2)}),
                flush=True)
        except Exception as e:  # noqa: BLE001 — report, keep probing
            print(json.dumps({"patch_bufs": nb,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
        finally:
            blocks.set_conv3d_mode("direct")
            rc.set_roll_patch_bufs(1)


if __name__ == "__main__":
    main()
