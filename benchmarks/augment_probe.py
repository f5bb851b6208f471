#!/usr/bin/env python
"""Chip probe: cost of the fused device augmentation inside the train step.

The chain's crop_and_resize runs a trilinear gather over the full
128x224x288 volume for image + 2 masks; if it dominates, the separable
matmul-resize formulation (dynamic interp matrices from the crop scalars)
is the fix.  Measures the batch augmentation alone at B=4.
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

    from bodyct_dram_emph_subtype_tpu.train.steps import _augment_batch

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, *TARGET).astype(np.float32))
    lungs = jnp.ones((B, *TARGET), jnp.float32)
    ems = jnp.asarray((rng.rand(B, *TARGET) > 0.9).astype(np.float32))

    f = jax.jit(_augment_batch)
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


if __name__ == "__main__":
    main()
