#!/usr/bin/env python
"""Experiment: dRAM train-step memory/throughput configs on the real chip.

Round-1 blocker: B=4 bf16 training OOMs from XLA layout padding (2-4x) on
the decoder temps (DEVNOTES.md).  Levers probed here, one jit program per
config (each new program costs minutes of remote compile — run in
background):

  --config donate      B=4 bf16, remat blocks + state donation
  --config d2sum       same + depth-decomposed conv lowering
  --config b2          B=2 bf16 baseline (round-1 best: 682 ms/step)

Prints one JSON line per config: {"config":..., "ok":..., "ms_per_step":...,
"vols_per_sec_per_chip":...}; OOMs are caught and reported.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TARGET = (128, 224, 288)


def run_config(name, batch, conv_mode, donate, packed=False, remat=True):
    import jax
    import jax.numpy as jnp

    from bodyct_dram_emph_subtype_tpu.models import blocks, get_model_by_name
    from bodyct_dram_emph_subtype_tpu.train import (
        TrainState, make_optimizer, make_reg_train_step)

    blocks.set_conv3d_mode(conv_mode)
    model = get_model_by_name("med3ddram", dtype=jnp.bfloat16, remat=remat,
                              packed_decoder=packed)
    x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
    v = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
        jax.random.PRNGKey(0))
    tx = make_optimizer()
    state = TrainState.create(dict(v), tx)
    step = make_reg_train_step(model, tx, num_data_shards=1, donate=donate)

    rng = np.random.RandomState(0)
    batch_data = {
        "image": jnp.asarray(rng.randn(batch, *TARGET).astype(np.float32)),
        "lung_mask": jnp.ones((batch, *TARGET), jnp.float32),
        "em_mask": jnp.asarray(
            (rng.rand(batch, *TARGET) > 0.9).astype(np.float32)),
        "cls_label": jnp.asarray(rng.randint(0, 6, batch), jnp.int32),
        "pse_label": jnp.asarray(rng.randint(0, 3, batch), jnp.int32),
    }
    sargs = (jnp.asarray(1e-4), jnp.ones(6) / 6, jnp.ones(3) / 3,
             jax.random.PRNGKey(1))
    out = {"config": name, "batch": batch, "conv_mode": conv_mode,
           "donate": donate}
    try:
        state, m, _ = step(state, batch_data, *sargs)
        _ = float(m["loss"])  # forces completion through the relay
        n = 5
        t0 = time.time()
        for _ in range(n):
            state, m, _ = step(state, batch_data, *sargs)
        _ = float(m["loss"])
        ms = (time.time() - t0) / n * 1e3
        out.update(ok=True, ms_per_step=round(ms, 1),
                   vols_per_sec_per_chip=round(batch / (ms / 1e3), 2),
                   loss=float(m["loss"]))
    except Exception as e:  # noqa: BLE001 — report OOMs as data
        out.update(ok=False, error=type(e).__name__, detail=str(e)[:200])
    print(json.dumps(out), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="donate,d2sum,b2")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")

    table = {
        "donate": dict(batch=4, conv_mode="direct", donate=True),
        "d2sum": dict(batch=4, conv_mode="d2sum", donate=True),
        "d2cat": dict(batch=4, conv_mode="d2cat", donate=True),
        "b2": dict(batch=2, conv_mode="direct", donate=True),
        "b2_d2sum": dict(batch=2, conv_mode="d2sum", donate=True),
        "b8_d2sum": dict(batch=8, conv_mode="d2sum", donate=True),
        # W-pair packed decoder: no 2x bf16 layout padding on decoder
        # temps — the round-1 OOM cause — and faster 128-lane convs
        "packed4": dict(batch=4, conv_mode="direct", donate=True,
                        packed=True),
        "packed2": dict(batch=2, conv_mode="direct", donate=True,
                        packed=True),
        "packed8": dict(batch=8, conv_mode="direct", donate=True,
                        packed=True),
        # selective remat (round-3): keep the FLOP-heavy small-activation
        # layer3/4 in HBM, recompute only the big stem-/half-res scopes
        "remat_early4": dict(batch=4, conv_mode="direct", donate=True,
                             packed=True, remat="layer1,layer2,decoder"),
        "remat_dec4": dict(batch=4, conv_mode="direct", donate=True,
                           packed=True, remat="decoder"),
        "remat_none4": dict(batch=4, conv_mode="direct", donate=True,
                            packed=True, remat="none"),
        "remat_early2": dict(batch=2, conv_mode="direct", donate=True,
                             packed=True, remat="layer1,layer2,decoder"),
        # packw conv lowering in the train step (forward + remat recompute
        # both benefit; backward runs the transposed packw conv)
        "remat_early_packw4": dict(batch=4, conv_mode="packw", donate=True,
                                   packed=False,
                                   remat="layer1,layer2,decoder"),
    }
    for name in args.configs.split(","):
        run_config(name, **table[name])


if __name__ == "__main__":
    main()
