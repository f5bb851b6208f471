#!/usr/bin/env python
"""Experiment: host→device transfer scheduling strategies on the axon relay.

Round-1 finding (DEVNOTES.md): interleaving ``device_put`` with dispatches
costs ~2 s/iteration on the dev-tunnel relay regardless of byte count, which
caps bench.py's e2e at ~1.55 vol/s while compute alone does ~15.  This probes
three schedules over the same work:

  interleaved — put(batch) → dispatch → put → dispatch ...   (round-1 bench)
  puts_first  — put ALL batches → dispatch all → fetch       (batch upload)
  threaded    — a producer thread stages puts 2 batches ahead
                while the main thread dispatches (double buffering)

All schedules transfer the same bytes and run the same compiled program; the
difference is pure scheduling.  Deployment reality is 'threaded' (an input
pipeline stages the next scan while the current one computes); 'puts_first'
is the per-trial upper bound.
"""
import json
import queue
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BATCH = 4
PAD_SHAPE = (160, 288, 384)
TARGET = (128, 224, 288)
ITERS = 6
TRIALS = 3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")

    from bodyct_dram_emph_subtype_tpu.models import get_model_by_name
    from bodyct_dram_emph_subtype_tpu.ops.packing import (pack12_host,
                                                          unpack12_device)
    from bodyct_dram_emph_subtype_tpu.ops.preprocess import fused_preprocess
    from bodyct_dram_emph_subtype_tpu.ops.resize import resize_linear_matmul

    model = get_model_by_name("med3ddram", dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
        jax.random.PRNGKey(0))
    n_vox = int(np.prod(PAD_SHAPE))

    @jax.jit
    def pipeline(variables, raw_packed, lung_bits, in_sizes):
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
        checksum = jnp.sum(cle) + jnp.sum(pse)
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

    def report(name, best):
        print(json.dumps({"bench": f"link_{name}",
                          "vols_per_sec": round(best, 3)}), flush=True)

    # -- interleaved (round-1 schedule) --------------------------------
    best = 0.0
    for _ in range(TRIALS):
        t0 = time.time()
        for it in range(ITERS):
            b = host_batches[it % 2]
            out = pipeline(variables, *[jax.device_put(a) for a in b])
        np.asarray(out[0])
        best = max(best, ITERS * BATCH / (time.time() - t0))
    report("interleaved", best)

    # -- puts first ----------------------------------------------------
    best = 0.0
    for _ in range(TRIALS):
        t0 = time.time()
        staged = []
        for it in range(ITERS):
            b = host_batches[it % 2]
            staged.append([jax.device_put(a) for a in b])
        for dev in staged:
            out = pipeline(variables, *dev)
        np.asarray(out[0])
        best = max(best, ITERS * BATCH / (time.time() - t0))
    report("puts_first", best)

    # -- threaded producer (double buffer, depth 2) --------------------
    best = 0.0
    for _ in range(TRIALS):
        q: "queue.Queue" = queue.Queue(maxsize=2)

        def producer():
            for it in range(ITERS):
                b = host_batches[it % 2]
                q.put([jax.device_put(a) for a in b])

        t0 = time.time()
        th = threading.Thread(target=producer)
        th.start()
        for it in range(ITERS):
            dev = q.get()
            out = pipeline(variables, *dev)
        th.join()
        np.asarray(out[0])
        best = max(best, ITERS * BATCH / (time.time() - t0))
    report("threaded", best)


if __name__ == "__main__":
    main()
