#!/usr/bin/env python
"""Model complexity probes — FLOPs / params / memory per architecture.

Replaces the reference's two probe scripts
(``compute_computation_complexity_proposed.py`` — a profiled training fit —
and ``compute_computation_complexity_resnet.py`` — ptflops MACs for MONAI
resnets) with the XLA-native equivalent:
``jit(...).lower().compile().cost_analysis()`` gives compiler-counted FLOPs
and bytes for the exact program that runs on the TPU.

Usage:
  python tools/compute_computation_complexity.py [--archs med3d,med3ddram50]
      [--target_size 128,224,288] [--batch 1] [--cpu]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--archs", default="med3d18,med3d,med3d50,"
                        "med3ddram18,med3ddram,med3ddram50")
    parser.add_argument("--target_size", default="128,224,288")
    parser.add_argument("--batch", default=1, type=int)
    parser.add_argument("--train", action="store_true",
                        help="probe the training step instead of inference")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bodyct_dram_emph_subtype_tpu.models import get_model_by_name
    from bodyct_dram_emph_subtype_tpu.utils.cli import parse_size

    size = parse_size(args.target_size)
    shape = (args.batch, *size, 1)
    rows = []
    for arch in args.archs.split(","):
        model = get_model_by_name(arch)
        x = jnp.zeros(shape, jnp.float32)
        variables = jax.eval_shape(
            lambda k: model.init(k, x, x, train=False), jax.random.PRNGKey(0))
        n_params = sum(int(np.prod(l.shape)) for l in
                       jax.tree.leaves(variables["params"]))

        if args.train:
            # probe the full training step (fwd+bwd+update), the analog of
            # the reference's profiled-fit probe
            # (compute_computation_complexity_proposed.py)
            from bodyct_dram_emph_subtype_tpu.train import (
                TrainState, make_optimizer, make_reg_train_step,
                make_cls_train_step)
            tx = make_optimizer()
            state = jax.eval_shape(
                lambda v: TrainState.create(dict(v), tx), variables)
            make = (make_reg_train_step if "reg" in type(model).__name__.lower()
                    else make_cls_train_step)
            step = make(model, tx, 1)
            batch = {"image": jnp.zeros((args.batch, *size), jnp.float32),
                     "lung_mask": jnp.ones((args.batch, *size), jnp.float32),
                     "em_mask": jnp.zeros((args.batch, *size), jnp.float32),
                     "cls_label": jnp.zeros((args.batch,), jnp.int32),
                     "pse_label": jnp.zeros((args.batch,), jnp.int32)}
            lowered = step.lower(state, batch, jnp.asarray(1e-4),
                                 jnp.ones(6), jnp.ones(3),
                                 jax.random.PRNGKey(0))
        else:
            def fwd(v, x, l):
                return model.apply(v, x, l, train=False)

            lowered = jax.jit(fwd).lower(variables, x, x)
        try:
            cost = lowered.compile().cost_analysis()
            flops = cost.get("flops", float("nan"))
            bytes_accessed = cost.get("bytes accessed", float("nan"))
        except Exception as exc:  # cost analysis is backend-dependent
            flops, bytes_accessed = float("nan"), float("nan")
        rows.append({"arch": arch, "params_M": round(n_params / 1e6, 2),
                     "gflops": round(flops / 1e9, 1),
                     "gbytes_accessed": round(bytes_accessed / 1e9, 2),
                     "input": list(shape)})
        print(json.dumps(rows[-1]))
    return rows


if __name__ == "__main__":
    main()
