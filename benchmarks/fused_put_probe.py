#!/usr/bin/env python
"""Probe: fused single-buffer host->device uploads vs per-array puts.

DEVNOTES round-1: interleaving ``device_put`` with dispatches costs ~2
s/iteration on the relay REGARDLESS of byte count — which is exactly the
measured e2e ceiling (4 vols / ~2 s).  Two hypotheses this probe separates:

  (a) the penalty is per-``device_put`` call  → fusing the three per-batch
      arrays (10-bit CT + lung bits) into ONE uint8 buffer cuts it 3x
  (b) the penalty is per upload/dispatch round-trip → uploading G batches
      in one buffer and dispatching G times amortizes it by G

Schedules (same window, same compiled model program):
  control3   — 3 puts/iter, interleaved          (bench.py 'interleaved')
  fused_g1   — 1 put/iter (fused buffer)
  fused_g2   — 1 put per 2 iters, device-side dynamic_slice per dispatch
  fused_g4   — 1 put per 4 iters

The fused host buffers are prebuilt outside the timed loops (a deployment
loader writes into a pinned fused buffer as it packs).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BATCH = 4
PAD_SHAPE = (160, 288, 384)
TARGET = (128, 224, 288)
ITERS = 8
TRIALS = 3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.models import blocks, get_model_by_name
    from bodyct_dram_emph_subtype_tpu.ops.packing import (pack10_host,
                                                          unpack10_device)
    from bodyct_dram_emph_subtype_tpu.ops.preprocess import fused_preprocess
    from bodyct_dram_emph_subtype_tpu.ops.resize import \
        resize_linear_matmul_transpose

    blocks.set_conv3d_mode("roll")
    model = get_model_by_name("med3ddram", dtype=jnp.bfloat16,
                              packed_decoder=True)
    x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
        jax.random.PRNGKey(0))
    n_vox = int(np.prod(PAD_SHAPE))
    n_pack = n_vox + n_vox // 4          # 10-bit pack bytes per sample
    n_lung = n_vox // 8                  # bit-packed lung bytes per sample
    chunk = BATCH * (n_pack + n_lung)    # fused bytes per model batch

    def _body(variables, raw_packed, lung_bits, in_sizes):
        raw = unpack10_device(raw_packed, PAD_SHAPE)
        bits = jnp.right_shift(lung_bits[..., None],
                               jnp.arange(8, dtype=jnp.uint8)) & 1
        lungs = bits.reshape(raw.shape[0], -1)[:, :n_vox].reshape(raw.shape)
        pre = fused_preprocess(raw, lungs, in_sizes,
                               target_size=TARGET, em_threshold=-910.0)
        x = pre["image"][..., None]
        lungs5 = pre["lung_mask"][..., None]
        ess = pre["em_mask"][..., None]
        dense, regs = model.apply(variables, x, lungs5, train=False)
        half = dense[0].shape[1:4]
        ess_w = resize_linear_matmul_transpose(ess, half, (1, 2, 3),
                                               align_corners=True)
        lung_sum = jnp.sum(lungs5, axis=(1, 2, 3, 4))
        cle_pct = jnp.sum(dense[0] * ess_w, axis=(1, 2, 3, 4)) / lung_sum
        pse_pct = jnp.sum(dense[1] * ess_w, axis=(1, 2, 3, 4)) / lung_sum
        checksum = jnp.sum(dense[0]) + jnp.sum(dense[1])
        return cle_pct, pse_pct, checksum

    @jax.jit
    def pipeline3(variables, raw_packed, lung_bits, in_sizes):
        return _body(variables, raw_packed, lung_bits, in_sizes)

    @jax.jit
    def pipeline_fused(variables, fused, in_sizes):
        raw_packed = fused[:BATCH * n_pack].reshape(BATCH, n_pack)
        lung_bits = fused[BATCH * n_pack:].reshape(BATCH, n_lung)
        return _body(variables, raw_packed, lung_bits, in_sizes)

    @jax.jit
    def slice_chunk(buf, i):
        return jax.lax.dynamic_slice(buf, (i * chunk,), (chunk,))

    def make_host_batch(seed):
        r = np.random.RandomState(seed)
        img = r.randint(-1100, -700, (BATCH, *PAD_SHAPE)).astype(np.int16)
        packed = pack10_host(img)
        lung = np.zeros((BATCH, *PAD_SHAPE), np.uint8)
        lung[:, 8:-8, 16:-16, 16:-16] = 1
        lung_bits = np.packbits(lung.reshape(BATCH, -1), axis=-1,
                                bitorder="little")
        sizes = np.tile(np.asarray(PAD_SHAPE, np.int32), (BATCH, 1))
        sizes[:, 0] -= r.randint(0, 16, BATCH)
        fused = np.concatenate([packed.ravel(), lung_bits.ravel()])
        return packed, lung_bits, sizes, fused

    host = [make_host_batch(s) for s in range(2)]
    sizes_dev = jax.device_put(host[0][2])   # constant across the probe
    # chunk indices staged on device ONCE — a jnp scalar per dispatch would
    # itself be an interleaved host->device transfer
    idx_dev = [jax.device_put(np.int32(j)) for j in range(4)]
    fused_g = {
        1: [host[0][3], host[1][3]],
        2: [np.concatenate([host[0][3], host[1][3]])],
        4: [np.concatenate([host[0][3], host[1][3]] * 2)],
    }

    # warmup / compile all programs
    out = pipeline3(variables, *[jax.device_put(a) for a in host[0][:3]])
    np.asarray(out[0])
    out = pipeline_fused(variables, jax.device_put(host[0][3]), sizes_dev)
    np.asarray(out[0])
    buf = jax.device_put(fused_g[2][0])
    out = pipeline_fused(variables, slice_chunk(buf, idx_dev[1]), sizes_dev)
    np.asarray(out[0])
    print(json.dumps({"status": "compiled"}), flush=True)

    def report(name, samples):
        print(json.dumps(
            {"bench": name,
             "vols_per_sec_best": round(max(samples), 3),
             "vols_per_sec_median": round(float(np.median(samples)), 3)}),
            flush=True)

    samples = []
    for _ in range(TRIALS):
        t0 = time.time()
        for it in range(ITERS):
            out = pipeline3(variables,
                            *[jax.device_put(a) for a in host[it % 2][:3]])
        np.asarray(out[0])
        samples.append(ITERS * BATCH / (time.time() - t0))
    report("control3", samples)

    for g in (1, 2, 4):
        bufs = fused_g[g]
        samples = []
        for _ in range(TRIALS):
            t0 = time.time()
            it = 0
            while it < ITERS:
                buf = jax.device_put(bufs[(it // g) % len(bufs)])
                for j in range(g):
                    chunk_dev = (buf if g == 1
                                 else slice_chunk(buf, idx_dev[j]))
                    out = pipeline_fused(variables, chunk_dev, sizes_dev)
                it += g
            np.asarray(out[0])
            samples.append(ITERS * BATCH / (time.time() - t0))
        report(f"fused_g{g}", samples)


if __name__ == "__main__":
    main()
