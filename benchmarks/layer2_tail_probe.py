#!/usr/bin/env python
"""Whole-model forward A/B: layer2 identity-tail resident kernel on vs off.

resnet34's layer2 is one stride-2 block + three stride-1 identity blocks
at (16, 28, 36) x 128 ch — 2.6 MB/item packed, whole-tail VMEM-resident
at 256 lanes through the generalized layer1 kernel.  Trunk prefix truth
(round 3d) charged layer2 +5.6 ms against a ~3 ms roofline; the tail is
3/4 of that work.  The off arm keeps layer1 resident + the per-block
XLA path for layer2.
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

    from bodyct_dram_emph_subtype_tpu.models import (blocks, packed,
                                                     get_model_by_name)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32))
    lungs = jnp.ones((B, *TARGET, 1), jnp.float32)
    real_gate = packed.supports_fused_layer

    def no_tail(xp_shape, planes, n_blocks, itemsize=2):
        if planes != 64:                 # keep layer1 resident
            return False
        return real_gate(xp_shape, planes, n_blocks, itemsize)

    for name in ("l2_tail_off", "l2_tail_on"):
        blocks.set_conv3d_mode("roll")
        packed.supports_fused_layer = (
            real_gate if name == "l2_tail_on" else no_tail)
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
                "config": name, "ms": round(best, 1),
                "compute_vols_per_s": round(B / best * 1e3, 2)}),
                flush=True)
        except Exception as e:  # noqa: BLE001 — report, keep probing
            print(json.dumps({"config": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
        finally:
            blocks.set_conv3d_mode("direct")
            packed.supports_fused_layer = real_gate


if __name__ == "__main__":
    main()
