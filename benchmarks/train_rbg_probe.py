#!/usr/bin/env python
"""Chip A/B: full no-remat packed 'roll' train step, threefry vs rbg noise.

Round-3 state: the B=4 bf16 no-remat packed step is 687.7 ms with the
matmul crop-and-resize; the augmentation's remaining ~25 ms is the
elementwise chain, suspected to be dominated by the per-sample threefry
N(0,1) draw (33 M voxels x B).  'rbg' hoists one XLA RngBitGenerator
draw for the whole batch (the TPU hardware RNG path).  This probe times
the full train step under both settings — the rest of the step is
identical, so the delta IS the RNG cost.  Also reports the step with the
rolling-ring wgrad kernel active (it engages automatically under conv
mode 'roll'; this is its first full-step chip measurement).
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
    from bodyct_dram_emph_subtype_tpu.train import (
        TrainState, make_optimizer, make_reg_train_step)
    from bodyct_dram_emph_subtype_tpu.transforms.batch_augment import \
        set_noise_rng

    blocks.set_conv3d_mode("roll")
    r = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(r.randn(B, *TARGET).astype(np.float32)),
        "lung_mask": jnp.ones((B, *TARGET), jnp.float32),
        "em_mask": jnp.asarray((r.rand(B, *TARGET) > 0.9).astype(np.float32)),
        "cls_label": jnp.asarray(r.randint(0, 6, B), jnp.int32),
        "pse_label": jnp.asarray(r.randint(0, 3, B), jnp.int32),
    }
    sargs = (jnp.asarray(1e-4), jnp.ones(6) / 6, jnp.ones(3) / 3,
             jax.random.PRNGKey(1))

    for impl in ("rbg", "threefry"):
        set_noise_rng(impl)
        model = get_model_by_name("med3ddram", dtype=jnp.bfloat16,
                                  remat=False, packed_decoder=True)
        x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
        v = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
            jax.random.PRNGKey(0))
        tx = make_optimizer()
        state = TrainState.create(dict(v), tx)
        step = make_reg_train_step(model, tx, num_data_shards=1, donate=True)
        state, m, _ = step(state, batch, *sargs)
        loss = float(m["loss"])
        samples = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(5):
                state, m, _ = step(state, batch, *sargs)
            _ = float(m["loss"])
            samples.append((time.time() - t0) / 5 * 1e3)
        ms = min(samples)
        print(json.dumps({"noise_rng": impl, "ms_per_step": round(ms, 1),
                          "vols_per_sec": round(B / ms * 1e3, 2),
                          "loss0": round(loss, 4)}), flush=True)
    set_noise_rng("threefry")


if __name__ == "__main__":
    main()
