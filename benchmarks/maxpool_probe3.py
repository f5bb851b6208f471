#!/usr/bin/env python
"""Round 3c: decompose the stem->pool region (chained in-program timings).

maxpool_probe{,2}.py truths: A stem->sum 13.0, B(+barrier) 24.2,
C(+pallas pool) 31.4, D(+reduce_window) 31.0, E pool resident 12.9,
F reduce_window resident 9.3; reshape-stem and slices-pool change nothing.
This probe separates the remaining unknowns:

  G  conv only (native (...,36,256) quad output, no unshuffle) -> sum
  H  conv native + BN+ReLU (256-lane) -> barrier -> sum   (materialize @256)
  K  pallas pool on a RESIDENT pre-shaped quad input      (no input relayout)
  L  conv native + BN+ReLU -> quad pool -> unpack -> sum  (proposed path)
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TARGET = (128, 224, 288)
B = 4
N = 5


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.models.packed import (
        _s2d_axis_extent, _s2d_stem_map)
    from bodyct_dram_emph_subtype_tpu.ops import maxpool_kernel as mk

    bf = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32) * 0.1)
    kernel = jnp.asarray(rng.randn(7, 7, 7, 1, 64).astype(np.float32) * .05)
    scale = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5, bf)
    bias = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1, bf)
    fd, fh, fw = 2, 2, 8
    (ed, od), (eh, oh), (ew, ow) = map(_s2d_axis_extent, (fd, fh, fw))
    m = jnp.asarray(_s2d_stem_map((fd, fh, fw)), bf)
    kp = jnp.einsum("ks,ko->so", m, kernel.astype(bf).reshape(343, 64)
                    ).reshape(ed, eh, ew, fd * fh * fw, 4 * 64)

    def conv_native(x):
        b, d, h, w, _ = x.shape
        xg = x.astype(bf).reshape(b, d // fd, fd, h // fh, fh, w // fw, fw)
        xg = xg.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
            b, d // fd, h // fh, w // fw, fd * fh * fw)
        return jax.lax.conv_general_dilated(
            xg, kp, (1, 1, 1),
            [(od, ed - 1 - od), (oh, eh - 1 - oh), (ow, ew - 1 - ow)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        # (B, 64, 112, 36, 256), lane = jw*64 + f

    s4 = jnp.tile(scale, 4)
    b4 = jnp.tile(bias, 4)

    def bnrelu(y):
        return jax.nn.relu(y * s4 + b4)

    def pool_quads(xq):
        """Pallas pool body on an already-(B, D, H2, 2, Wq, 4C) input."""
        Bq, D, H2, _, Wq, C4 = xq.shape
        C = C4 // 4
        D2 = D // 2
        WqP = mk._round_up(Wq, 8)
        if WqP != Wq:
            xq = jnp.pad(xq, ((0, 0),) * 4 + ((0, WqP - Wq), (0, 0)),
                         constant_values=-jnp.inf)
        body = functools.partial(mk._kernel, D2=D2, H2=H2, Wq=WqP, C=C,
                                 WoP=WqP)
        out = pl.pallas_call(
            body, grid=(Bq,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((Bq, D2, H2, WqP, 2 * C),
                                           xq.dtype),
            scratch_shapes=[
                pltpu.VMEM((5, H2, 2, WqP, C4), xq.dtype),
                pltpu.VMEM((2, H2, WqP, 2 * C), xq.dtype),
                pltpu.SemaphoreType.DMA((5,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=32 * 1024 * 1024),
        )(xq)
        return out[:, :, :, :Wq]  # (B, D2, H2, Wq, 2C) W-pair packed

    def timed(f, *args):
        out = f(*args)
        np.asarray(out)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                out = f(*args)
            np.asarray(out)
            best = min(best, (time.time() - t0) / 3 * 1e3)
        return best / N

    def chain(fn):
        def run(x):
            def body(i, acc):
                return acc + fn(x + i.astype(x.dtype))
            return jax.lax.fori_loop(0, N, body, 0.0).reshape(1)
        return jax.jit(run)

    def s32(y):
        return jnp.sum(y.astype(jnp.float32))

    cases = [
        ("G conv_native->sum", chain(lambda v: s32(conv_native(v)))),
        ("H conv+bnrelu->barrier->sum",
         chain(lambda v: s32(jax.lax.optimization_barrier(
             bnrelu(conv_native(v)))))),
        ("L conv+bnrelu->quadpool->sum",
         chain(lambda v: s32(pool_quads(
             bnrelu(conv_native(v)).reshape(B, 64, 56, 2, 36, 256))))),
    ]
    for nm, f in cases:
        print(json.dumps({"case": nm, "ms": round(timed(f, x), 1)}),
              flush=True)

    # K: pool on a resident quad-shaped activation (no producer, no relayout)
    act = jnp.asarray(rng.randn(B, 64, 56, 2, 36, 256).astype(np.float32),
                      dtype=bf)

    def runk(a):
        def body(i, acc):
            return acc + jnp.sum(
                pool_quads(a + i.astype(a.dtype)).astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, 0.0).reshape(1)

    print(json.dumps({"case": "K quadpool(resident quad)",
                      "ms": round(timed(jax.jit(runk), act), 1)}),
          flush=True)


if __name__ == "__main__":
    main()
