#!/usr/bin/env python
"""Chip probe: B=4 bf16 roll train step at plan budget 20 MB vs 52 MB.

The forward A/B (budget_probe.py) showed 52 MB moves the hot streaming
plans to whole-W tiles (us1_conv1 WT 8 -> 40, us2_conv1 24 -> 72) for a
small fwd win (156.0 -> 155.4 ms).  The budget also governs the wgrad
plans, so the training step needs its own verdict before the default
moves.
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
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    from bodyct_dram_emph_subtype_tpu.models import blocks, get_model_by_name
    from bodyct_dram_emph_subtype_tpu.ops import roll_conv as rc
    from bodyct_dram_emph_subtype_tpu.train import (
        TrainState, make_optimizer, make_reg_train_step)

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(B, *TARGET).astype(np.float32)),
        "lung_mask": jnp.ones((B, *TARGET), jnp.float32),
        "em_mask": jnp.asarray(
            (rng.rand(B, *TARGET) > 0.9).astype(np.float32)),
        "cls_label": jnp.asarray(rng.randint(0, 6, B), jnp.int32),
        "pse_label": jnp.asarray(rng.randint(0, 3, B), jnp.int32),
    }
    sargs = (jnp.asarray(1e-4), jnp.ones(6) / 6, jnp.ones(3) / 3,
             jax.random.PRNGKey(1))

    blocks.set_conv3d_mode("roll")
    try:
        for mb in (52, 64, 76):
            rc.set_roll_vmem_budget(mb * 1024 * 1024)
            try:
                model = get_model_by_name("med3ddram", dtype=jnp.bfloat16,
                                          remat=False,
                                          packed_decoder=True)
                x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
                v = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
                    jax.random.PRNGKey(0))
                tx = make_optimizer()
                state = TrainState.create(dict(v), tx)
                step = make_reg_train_step(model, tx, num_data_shards=1,
                                           donate=True)
                state, m, _ = step(state, batch, *sargs)
                _ = float(m["loss"])
                samples = []
                for _ in range(3):
                    t0 = time.time()
                    for _ in range(5):
                        state, m, _ = step(state, batch, *sargs)
                    _ = float(m["loss"])
                    samples.append((time.time() - t0) / 5 * 1e3)
                ms = min(samples)
                print(json.dumps({"budget_mb": mb, "ms": round(ms, 1),
                                  "vols_per_s": round(B / (ms / 1e3), 2)}),
                      flush=True)
                del state, step, v
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"budget_mb": mb, "error": type(e).__name__,
                                  "msg": str(e)[:200]}), flush=True)
    finally:
        blocks.set_conv3d_mode("direct")
        rc.set_roll_vmem_budget(20 * 1024 * 1024)


if __name__ == "__main__":
    main()
