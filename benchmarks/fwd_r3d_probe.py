#!/usr/bin/env python
"""Whole-model forward A/B: quad-layout stem->pool path on vs off.

maxpool_probe3.py chained truths at the stem shape (B=4 bf16): current
stem+bn+relu+pool region ~31.4 ms; the quad composition (native 256-lane
conv output, folded BN/ReLU, quad-resident pool) measures 19.8.  This
verifies the in-model delta (stem also feeds the decoder skip, so the
materialize may shift stages).
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

    for name, quad in [("quad_off", False), ("quad_on", True)]:
        blocks.set_conv3d_mode("roll")
        r3d.set_quad_stem_enable(quad)
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
        finally:
            blocks.set_conv3d_mode("direct")
            r3d.set_quad_stem_enable(True)


if __name__ == "__main__":
    main()
