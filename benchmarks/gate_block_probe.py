#!/usr/bin/env python
"""Chip probe (round 5): gate-block size A/B for the block-gated CT
transport — device unpack cost vs block size at the bench upload shape.
Smaller blocks ship fewer bytes (less occupancy inflation: 79% at K=512
vs 64% at K=64 on the bench geometry) but gather more, shorter slices."""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = 4
UP = (128, 288, 384)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    from bodyct_dram_emph_subtype_tpu.ops.packing import (
        gate_blocks_np, gated_budget, pack10_gated_host,
        unpack10_gated_device)

    r = np.random.RandomState(0)
    n = int(np.prod(UP))
    hu = r.randint(-1100, -700, (B, *UP)).astype(np.int16)
    # ellipsoid mask-out like the bench synthetic
    zz, yy, xx = np.mgrid[:UP[0], :UP[1], :UP[2]]
    lung = ((((zz - UP[0]/2)/(UP[0]*0.48))**2
             + ((yy - UP[1]/2)/(UP[1]*0.48))**2
             + ((xx - UP[2]/2)/(UP[2]*0.48))**2) < 1)
    hu[:, ~lung] = -2048
    want = None
    for K in (512, 256, 128, 64):
        gb = gate_blocks_np((hu > -1150).reshape(B, -1), block=K)
        budget = gated_budget(gb.sum(-1), block=K)
        packed, bits = pack10_gated_host(hu, gb, budget, block=K)
        up_mb = (packed.nbytes + bits.nbytes) / B / 1e6
        f = jax.jit(lambda p, b: jnp.sum(
            unpack10_gated_device(p, b, UP, block=K), axis=(1, 2, 3)))
        pd, bd = jax.device_put(packed), jax.device_put(bits)
        out = np.asarray(f(pd, bd))
        if want is None:
            want = out
        else:
            np.testing.assert_allclose(out, want, rtol=1e-6)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(8):
                o = f(pd, bd)
            np.asarray(o)
            best = min(best, (time.time() - t0) / 8 * 1e3)
        print(json.dumps({"K": K, "unpack_sum_ms": round(best, 2),
                          "upload_MB_per_vol": round(up_mb, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
