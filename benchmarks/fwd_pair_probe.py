#!/usr/bin/env python
"""Whole-model forward A/B: pair-output stem path on vs off.

The (2,2,4)-factor stem conv's native output IS the W-pair packed stem
(half the gross FLOPs of the production (2,2,8) form, 128-lane
materialize, no us2 skip pack) — ``stem_pair_probe.py`` measures the
region in isolation; this measures the in-model delta that decides the
default (``resnet3d.set_pair_stem_enable``).
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
    from bodyct_dram_emph_subtype_tpu.models import resnet3d as r3d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32))
    lungs = jnp.ones((B, *TARGET, 1), jnp.float32)

    for name, pair in [("pair_off", False), ("pair_on", True)]:
        blocks.set_conv3d_mode("roll")
        r3d.set_pair_stem_enable(pair)
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
            print(json.dumps({"case": name, "ms": round(best, 1),
                              "vols_per_sec": round(B / best * 1e3, 2)}),
                  flush=True)
        finally:
            r3d.set_pair_stem_enable(False)
            blocks.set_conv3d_mode("direct")


if __name__ == "__main__":
    main()
