#!/usr/bin/env python
"""Whole-model forward A/B: pool+layer1 single-pass kernel on vs off.

fused_pool_layer1 streams the post-ReLU stem through the k3 s2 p1 pool
directly into the VMEM-resident layer1 volume — the pooled activation
(66 MB/batch) and its pack/pad relayouts never touch HBM, and the
in-model pool dispatch (~6.8 ms, trunk prefix truth round 3d) collapses
to streaming DMA.  The off arm is the round-3d state: Pallas plane pool
-> pack_w -> pad -> bulk-DMA fused_layer1.
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
    real_gate = packed.supports_fused_pool_layer

    for name in ("pool_fuse_off", "pool_fuse_on"):
        blocks.set_conv3d_mode("roll")
        packed.supports_fused_pool_layer = (
            real_gate if name == "pool_fuse_on" else
            lambda *a, **k: False)
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
            packed.supports_fused_pool_layer = real_gate


if __name__ == "__main__":
    main()
