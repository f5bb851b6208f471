#!/usr/bin/env python
"""Chip probe: B=4 bf16 packed train step WITHOUT remat + augmentation cost.

remat=False was never tried at B=4 since the packed decoder landed (the
round-1 OOM came from bf16 lane padding on unpacked decoder temps).  If
the full activation set fits HBM, all recompute disappears.  Also times
the fused device augmentation alone (its crop_and_resize is a full-volume
trilinear gather — a candidate for the matmul-resize formulation).
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
    from bodyct_dram_emph_subtype_tpu.train import (
        TrainState, make_optimizer, make_reg_train_step)
    from bodyct_dram_emph_subtype_tpu.train.steps import _augment_batch
    blocks.set_conv3d_mode("roll")   # measured 762 vs 893 ms with remat

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, *TARGET).astype(np.float32))
    lungs = jnp.ones((B, *TARGET), jnp.float32)
    ems = jnp.asarray((rng.rand(B, *TARGET) > 0.9).astype(np.float32))

    f = jax.jit(_augment_batch)
    try:
        out = f(images, lungs, ems, jax.random.PRNGKey(0))
        np.asarray(out[0][0, 0, 0, :4])
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for i in range(6):
                out = f(images, lungs, ems, jax.random.PRNGKey(i))
            np.asarray(out[0][0, 0, 0, :4])
            best = min(best, (time.time() - t0) / 6 * 1e3)
        print(json.dumps({"case": "augment_batch", "ms": round(best, 1)}),
              flush=True)
        del out
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": "augment_batch",
                          "error": type(e).__name__}), flush=True)

    batch = {
        "image": images, "lung_mask": lungs, "em_mask": ems,
        "cls_label": jnp.asarray(rng.randint(0, 6, B), jnp.int32),
        "pse_label": jnp.asarray(rng.randint(0, 3, B), jnp.int32),
    }
    sargs = (jnp.asarray(1e-4), jnp.ones(6) / 6, jnp.ones(3) / 3,
             jax.random.PRNGKey(1))

    for remat in (False,):
        try:
            model = get_model_by_name("med3ddram", dtype=jnp.bfloat16,
                                      remat=remat, packed_decoder=True)
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
            print(json.dumps({"remat": str(remat), "ms": round(ms, 1),
                              "vols_per_s": round(B / (ms / 1e3), 2)}),
                  flush=True)
            del state, step, v
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"remat": str(remat),
                              "error": type(e).__name__,
                              "msg": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
