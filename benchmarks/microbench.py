#!/usr/bin/env python
"""Microbenchmarks for the framework's hot pieces on real TPU hardware.

Prints one JSON line per measurement.  Use these to localize regressions —
the headline end-to-end number lives in ``bench.py``.

  python benchmarks/microbench.py --which fwd,preprocess,upsample,train

Timing on the axon relay: ``block_until_ready`` can return early, so every
measurement ends with a small host fetch that forces completion.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TARGET = (128, 224, 288)
PAD = (160, 288, 384)


def _bench(name, fn, *args, n=4, extra=None):
    import jax
    import jax.numpy as jnp
    r = fn(*args)
    jax.block_until_ready(r)
    _ = np.asarray(jnp.ravel(jax.tree.leaves(r)[0])[:1])
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    _ = np.asarray(jnp.ravel(jax.tree.leaves(r)[0])[:1])
    ms = (time.time() - t0) / n * 1e3
    print(json.dumps({"bench": name, "ms": round(ms, 1), **(extra or {})}))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--which", default="fwd,preprocess,upsample")
    parser.add_argument("--batch", default=4, type=int)
    parser.add_argument("--arch", default="med3ddram")
    parser.add_argument("--packed", action="store_true",
                        help="W-pair packed decoder (models/packed.py)")
    parser.add_argument("--conv_mode", default=None,
                        help="global conv lowering (e.g. packw)")
    args = parser.parse_args()
    which = set(args.which.split(","))
    if args.conv_mode:
        from bodyct_dram_emph_subtype_tpu.models import blocks
        blocks.set_conv3d_mode(args.conv_mode)
    B = args.batch

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")

    from bodyct_dram_emph_subtype_tpu.models import get_model_by_name
    from bodyct_dram_emph_subtype_tpu.ops.preprocess import fused_preprocess
    
    rng = np.random.RandomState(0)

    if "fwd" in which:
        model = get_model_by_name(args.arch, dtype=jnp.bfloat16,
                                  packed_decoder=args.packed)
        x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
        v = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
            jax.random.PRNGKey(0))
        x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32))
        l = jnp.ones((B, *TARGET, 1), jnp.float32)
        fwd = jax.jit(lambda v, x, l: model.apply(v, x, l, train=False)[1])
        tag = "_packed" if args.packed else ""
        if args.conv_mode:
            tag += f"_{args.conv_mode}"
        _bench(f"{args.arch}_fwd{tag}", fwd, v, x, l,
               extra={"batch": B, "input": list(TARGET)})

    if "preprocess" in which:
        img = jnp.asarray(rng.randint(-1100, -700,
                                      (B, *PAD)).astype(np.int16))
        lung = jnp.ones((B, *PAD), jnp.int8)
        sizes = jnp.tile(jnp.asarray(PAD, jnp.int32), (B, 1))
        pre = jax.jit(lambda i, l, s: fused_preprocess(
            i, l, s, target_size=TARGET, em_threshold=-910.0))
        _bench("fused_preprocess", pre, img, lung, sizes,
               extra={"batch": B, "pad": list(PAD)})

    if "upsample" in which:
        from bodyct_dram_emph_subtype_tpu.ops.resize import resize_linear_matmul
        d = jnp.zeros((B, 64, 112, 144, 1), jnp.float32)
        e = jnp.ones((B, *TARGET, 1), jnp.float32)
        up = jax.jit(lambda d, e: resize_linear_matmul(
            d, TARGET, (1, 2, 3), align_corners=True) * e)
        _bench("dram_upsample_mask_matmul", up, d, e, extra={"batch": B})

    if "stages" in which:
        # trunk-only forward; decoder cost ≈ full fwd − trunk
        from bodyct_dram_emph_subtype_tpu.models.blocks import BasicBlock
        from bodyct_dram_emph_subtype_tpu.models.resnet3d import _Trunk
        trunk = _Trunk(BasicBlock, (3, 4, 6, 3), jnp.bfloat16)
        x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
        tv = jax.jit(lambda k: trunk.init(k, x0, train=False))(
            jax.random.PRNGKey(0))
        x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32))
        tf_ = jax.jit(lambda v, x: trunk.apply(v, x, train=False)[2])
        _bench("trunk_only_fwd", tf_, tv, x, extra={"batch": B})

    if "train" in which:
        from bodyct_dram_emph_subtype_tpu.train import (
            TrainState, make_optimizer, make_reg_train_step)
        model = get_model_by_name(args.arch, remat=True)
        x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
        v = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
            jax.random.PRNGKey(0))
        tx = make_optimizer()
        state = TrainState.create(dict(v), tx)
        step = make_reg_train_step(model, tx, num_data_shards=1)
        Bt = min(B, 2)  # one-chip HBM budget for fp32 training
        batch = {
            "image": jnp.asarray(rng.randn(Bt, *TARGET).astype(np.float32)),
            "lung_mask": jnp.ones((Bt, *TARGET), jnp.float32),
            "em_mask": jnp.asarray(
                (rng.rand(Bt, *TARGET) > 0.9).astype(np.float32)),
            "cls_label": jnp.asarray(rng.randint(0, 6, Bt), jnp.int32),
            "pse_label": jnp.asarray(rng.randint(0, 3, Bt), jnp.int32),
        }
        sargs = (jnp.asarray(1e-4), jnp.ones(6) / 6, jnp.ones(3) / 3,
                 jax.random.PRNGKey(1))

        def run(state):
            s, m, p = step(state, batch, *sargs)
            return m["loss"]

        _bench(f"{args.arch}_train_step_remat", run, state,
               extra={"batch": Bt})


if __name__ == "__main__":
    main()
