#!/usr/bin/env python
"""Chip probe (round 5): does engaging the W-pair packed layer1/layer2
residual path IN TRAINING move the train step?

The packed-layer train path (``PackedBasicBlock`` under conv mode 'roll')
is gated off by ``_ROLL_MIN_ELEMS = 32M``; layer1's packed activation is
8.26M elements and layer2's tail 2.06M, so neither engages.  Eval measured
the packed layer1 neutral (DEVNOTES round 3b) — but training adds the
dgrad/wgrad, where the rolling-ring kernels beat XLA 1.5-2x at decoder
shapes (dgrad probe, round 3).  A/B: default floor vs 8M (layer1 only) vs
2M (layer1 + layer2 tail).
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
    from bodyct_dram_emph_subtype_tpu.models import packed as packed_mod
    from bodyct_dram_emph_subtype_tpu.train import (
        TrainState, make_optimizer, make_reg_train_step)
    blocks.set_conv3d_mode("roll")

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

    default = packed_mod._ROLL_MIN_ELEMS
    losses = {}
    try:
        for label, floor in ((f"default{default >> 20}M", default),
                             ("floor8M", 8 * 2 ** 20),
                             ("floor2M", 2 * 2 ** 20)):
            packed_mod._ROLL_MIN_ELEMS = floor
            try:
                model = get_model_by_name("med3ddram", dtype=jnp.bfloat16,
                                          packed_decoder=True)
                x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
                v = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
                    jax.random.PRNGKey(0))
                tx = make_optimizer()
                state = TrainState.create(dict(v), tx)
                step = make_reg_train_step(model, tx, num_data_shards=1,
                                           donate=True)
                state, m, _ = step(state, batch, *sargs)
                losses[label] = float(m["loss"])
                samples = []
                for _ in range(3):
                    t0 = time.time()
                    for _ in range(5):
                        state, m, _ = step(state, batch, *sargs)
                    _ = float(m["loss"])
                    samples.append((time.time() - t0) / 5 * 1e3)
                ms = min(samples)
                print(json.dumps({
                    "case": label, "ms": round(ms, 1),
                    "vols_per_s": round(B / (ms / 1e3), 2),
                    "loss": round(losses[label], 5)}), flush=True)
                del state, step, v
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"case": label,
                                  "error": type(e).__name__,
                                  "msg": str(e)[:300]}), flush=True)
    finally:
        packed_mod._ROLL_MIN_ELEMS = default


if __name__ == "__main__":
    main()
