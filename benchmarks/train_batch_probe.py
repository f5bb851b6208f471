#!/usr/bin/env python
"""Chip probe: no-remat packed roll train step at B=6/B=8.

With remat off, fixed per-step costs (optimizer update, RNG, loss
reductions) amortise over a larger batch — checks whether B>4 clears
6 vol/s/chip or OOMs.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TARGET = (128, 224, 288)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    from bodyct_dram_emph_subtype_tpu.models import blocks, get_model_by_name
    from bodyct_dram_emph_subtype_tpu.train import (
        TrainState, make_optimizer, make_reg_train_step)
    blocks.set_conv3d_mode("roll")

    rng = np.random.RandomState(0)
    for B in (6, 8):
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
        try:
            model = get_model_by_name("med3ddram", dtype=jnp.bfloat16,
                                      remat=False, packed_decoder=True)
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
                for _ in range(4):
                    state, m, _ = step(state, batch, *sargs)
                _ = float(m["loss"])
                samples.append((time.time() - t0) / 4 * 1e3)
            ms = min(samples)
            print(json.dumps({"batch": B, "ms": round(ms, 1),
                              "vols_per_s": round(B / (ms / 1e3), 2)}),
                  flush=True)
            del state, step, v, batch
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"batch": B, "error": type(e).__name__,
                              "msg": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
