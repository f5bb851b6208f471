#!/usr/bin/env python
"""Deployment processor stage breakdown on the chip.

Monkeypatch timers around the host stages (MHA decode, morphology/crop,
12-bit pack, un-crop resize, MHA writes) and the device dispatch, then
run the bench's synthetic cohort.  Cumulative per-category seconds
separate main-thread (loader) work from the postprocess worker thread —
with the pipeline overlap, the larger of the two is the wall-clock
gate.  (BENCH r2 captured 0.153 vol/s; round-3 pipelining unmeasured.)
"""
import functools
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TIMES = defaultdict(float)
COUNTS = defaultdict(int)


def timed(cat, fn):
    @functools.wraps(fn)
    def wrap(*a, **k):
        t0 = time.time()
        out = fn(*a, **k)
        TIMES[cat] += time.time() - t0
        COUNTS[cat] += 1
        return out
    return wrap


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.data import mha as mha_mod
    from bodyct_dram_emph_subtype_tpu.data import datasets as ds_mod
    from bodyct_dram_emph_subtype_tpu.ops import morphology as morph_mod
    from bodyct_dram_emph_subtype_tpu.ops import packing as pack_mod
    from bodyct_dram_emph_subtype_tpu.inference import processor as proc_mod

    ds_mod.read_mha = timed("mha_decode", ds_mod.read_mha)
    mha_mod.write_mha = timed("mha_write", mha_mod.write_mha)
    # datasets.py imports these at module top — patch ITS namespace
    ds_mod.binary_dilate_np = timed("dilate", morph_mod.binary_dilate_np)
    ds_mod.find_crops_np = timed("find_crops", morph_mod.find_crops_np)
    pack_mod.pack12_host = timed("pack12", pack_mod.pack12_host)
    pack_mod.pack10_gated_host = timed("pack10_gated",
                                       pack_mod.pack10_gated_host)
    proc_mod.resize_linear_matmul_np = timed(
        "host_resize", proc_mod.resize_linear_matmul_np)
    proc_mod._finalize_scan = timed("finalize_total", proc_mod._finalize_scan)
    proc_mod._device_batch_post = timed("device_post_total",
                                        proc_mod._device_batch_post)
    from bodyct_dram_emph_subtype_tpu.utils import viz as viz_mod
    proc_mod.windowing = timed("windowing", proc_mod.windowing)
    ds_mod.SubtypingInference.__getitem__ = timed(
        "dataset_getitem", ds_mod.SubtypingInference.__getitem__)
    proc_mod._RawPredictView.__getitem__ = timed(
        "rawview_getitem", proc_mod._RawPredictView.__getitem__)
    mha_mod.write_arrays_to_mha = timed("write_tree",
                                        mha_mod.write_arrays_to_mha)
    proc_mod.write_arrays_to_mha = timed("write_tree2",
                                         proc_mod.write_arrays_to_mha)

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench
    t0 = time.time()
    samples = bench.bench_processor(jax)
    wall = time.time() - t0
    print(json.dumps({"samples_vols_per_s": [round(s, 3) for s in samples],
                      "wall_s": round(wall, 1)}), flush=True)
    print(json.dumps({"cumulative_s": {k: round(v, 2)
                                       for k, v in sorted(TIMES.items())},
                      "counts": dict(COUNTS)}), flush=True)


if __name__ == "__main__":
    main()
