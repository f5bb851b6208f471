#!/usr/bin/env python
"""End-to-end inference benchmark on real TPU hardware.

Measures the deployment pipeline of the flagship dRAM model (med3ddram ==
resnet34segreg, the reference's deployment default, ``processor.py:59``):

  host int16 volumes → device transfer → fused on-device preprocess
  (window/standardize/resize + −910 ess mask) → forward → dRAM maps
  upsampled + masked → lesion percentages

and reports ONE JSON line: CT volumes/sec/chip end-to-end.

``vs_baseline``: the reference publishes no throughput numbers (SURVEY.md
§6).  The comparison constant below is an *estimate* of the reference
PyTorch pipeline end-to-end on one A100: ~3.5 TFLOP/volume forward at
TF32 (~30%% MFU → ~13 vol/s compute-only), gated by the CPU
preprocessing/dataloader chain to roughly 2 vol/s in the deployment
configuration (2-CPU contract, ``Dockerfile:88-93``).  The BASELINE.json
north star (≥5x A100 e2e on a v5e-8) then corresponds to
vs_baseline ≥ 1.25 per chip.
"""
import json
import time

import numpy as np

REFERENCE_A100_E2E_VOLS_PER_SEC = 2.0

BATCH = 4
PAD_SHAPE = (160, 288, 384)          # static padded raw-CT buffer
TARGET = (128, 224, 288)             # model input (train.py:30)
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: first bench run per image pays the
    # remote compile (~minutes); later runs start hot
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bodyct_dram_emph_subtype_tpu.models import get_model_by_name
    from bodyct_dram_emph_subtype_tpu.ops.preprocess import fused_preprocess
    from bodyct_dram_emph_subtype_tpu.ops.resize import resize_linear
    from bodyct_dram_emph_subtype_tpu.ops.masked_pool import lung_masked_fraction

    rng = np.random.RandomState(0)
    n_dev = len(jax.devices())

    model = get_model_by_name("med3ddram", dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
        jax.random.PRNGKey(0))

    @jax.jit
    def pipeline(variables, raw_i16, lungs_u8, in_sizes):
        pre = fused_preprocess(raw_i16, lungs_u8, in_sizes,
                               target_size=TARGET, em_threshold=-910.0)
        x = pre["image"][..., None]
        lungs = pre["lung_mask"][..., None]
        ess = pre["em_mask"][..., None]
        dense, regs = model.apply(variables, x, lungs, train=False)
        cle = resize_linear(dense[0], TARGET, (1, 2, 3),
                            align_corners=True) * ess
        pse = resize_linear(dense[1], TARGET, (1, 2, 3),
                            align_corners=True) * ess
        lung_sum = jnp.sum(lungs, axis=(1, 2, 3, 4))
        cle_pct = jnp.sum(cle, axis=(1, 2, 3, 4)) / lung_sum
        pse_pct = jnp.sum(pse, axis=(1, 2, 3, 4)) / lung_sum
        # checksum forces full dRAM-map materialization without a huge
        # device→host fetch (maps stay in HBM, as they would for on-device
        # postprocessing)
        checksum = jnp.sum(cle) + jnp.sum(pse)
        return cle_pct, pse_pct, checksum

    def make_host_batch(seed):
        r = np.random.RandomState(seed)
        img = r.randint(-1100, -700, (BATCH, *PAD_SHAPE)).astype(np.int16)
        lung = np.zeros((BATCH, *PAD_SHAPE), np.int8)
        lung[:, 8:-8, 16:-16, 16:-16] = 1
        sizes = np.tile(np.asarray(PAD_SHAPE, np.int32), (BATCH, 1))
        sizes[:, 0] -= r.randint(0, 16, BATCH)   # varying true extents
        return img, lung, sizes

    # pre-generate host batches: the benchmark measures the TPU pipeline
    # (transfer + preprocess + forward + reduce), not numpy RNG throughput
    host_batches = [make_host_batch(it) for it in range(ITERS + 1)]

    # warmup / compile
    img, lung, sizes = host_batches[0]
    out = pipeline(variables, jax.device_put(img), jax.device_put(lung),
                   jax.device_put(sizes))
    np.asarray(out[0])  # full round trip

    t0 = time.time()
    for it in range(ITERS):
        img, lung, sizes = host_batches[it + 1]
        out = pipeline(variables, jax.device_put(img), jax.device_put(lung),
                       jax.device_put(sizes))
    np.asarray(out[0])  # forces completion of the dispatched chain
    dt = time.time() - t0
    vols_per_sec = ITERS * BATCH / dt
    per_chip = vols_per_sec / max(n_dev, 1)

    print(json.dumps({
        "metric": "ct_volumes_per_sec_per_chip_e2e",
        "value": round(per_chip, 3),
        "unit": "volumes/s/chip",
        "vs_baseline": round(per_chip / REFERENCE_A100_E2E_VOLS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
