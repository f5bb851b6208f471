#!/usr/bin/env python
"""Chained trunk PREFIX timings: stem, +maxpool, +layer1..+layer4.

Differences between consecutive prefixes give the true in-model cost of
each trunk stage (the whole trunk measures 100.1 ms vs ~72 summed from
isolated layer timings — this finds where the extra ~28 ms lives).
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
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from flax import linen as nn

    from bodyct_dram_emph_subtype_tpu.models import blocks
    from bodyct_dram_emph_subtype_tpu.models.blocks import (
        BasicBlock, NormWrapper, max_pool_3d_k3s2p1)
    from bodyct_dram_emph_subtype_tpu.models.packed import StemConvS2D
    from bodyct_dram_emph_subtype_tpu.models.resnet3d import _Trunk

    blocks.set_conv3d_mode("roll")
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.randn(B, *TARGET, 1).astype(np.float32) * 0.1)

    class Prefix(nn.Module):
        upto: int  # 0=stem+bn+relu, 1=+maxpool, 2..5=+layer1..4
        dtype = bf
        remat = False
        shortcut_type = "A"
        block = BasicBlock

        @nn.compact
        def __call__(self, x, train: bool = False):
            x = StemConvS2D(64, name="conv1", dtype=bf)(x)
            x = NormWrapper(dtype=bf, name="bn1")(x, train)
            x = nn.relu(x)
            if self.upto >= 1:
                x = max_pool_3d_k3s2p1(x, train)
            specs = [(64, 3, 1, 1, "layer1"), (128, 4, 2, 1, "layer2"),
                     (256, 6, 1, 2, "layer3"), (512, 3, 1, 4, "layer4")]
            for j, (planes, nb, st, dil, nm) in enumerate(specs):
                if self.upto >= 2 + j:
                    x = _Trunk._layer(self, x, planes, nb, st, dil, nm,
                                      train)
            return x

    names = ["stem+bn+relu", "+maxpool", "+layer1", "+layer2", "+layer3",
             "+layer4"]
    prev = 0.0
    for upto, nm in enumerate(names):
        mod = Prefix(upto)
        v = jax.jit(lambda k, _m=mod: _m.init(k, x[:1], False))(
            jax.random.PRNGKey(0))

        def chain(v, x, _m=mod):
            def body(i, acc):
                y = _m.apply(v, x + i.astype(x.dtype), False)
                return acc + jnp.sum(y.astype(jnp.float32))
            return jax.lax.fori_loop(0, N, body, 0.0).reshape(1)

        f = jax.jit(chain)
        out = f(v, x)
        np.asarray(out)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                out = f(v, x)
            np.asarray(out)
            best = min(best, (time.time() - t0) / 3 * 1e3)
        ms = best / N
        print(json.dumps({"case": nm, "ms": round(ms, 1),
                          "delta": round(ms - prev, 1)}), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
