"""Chip-measured device-vs-host preprocess drift on the deployment path.

VERDICT r3 weak #5 / next-step #5: the opt-in device-preprocess fast path
disagreed with the torch-parity host path by up to ~2e-3 in the lesion
percentages — enough to flip a severity score at a ratio boundary, keeping
the clinical default on the slow path.  Round 4 made every discontinuous
index op exact-integer (`ops/resize.py`, `ops/preprocess.py`,
`data/host_preprocess.py`); this probe measures the REMAINING drift on the
real chip at deployment scale so the default can flip once the bound is
<1e-4.

Runs N synthetic scans through ``run_inference`` twice (device_preprocess
True/False, same weights) and prints per-scan CLE/PSE percentage diffs and
score agreement.  Usage (on the TPU, from the repo root):

    python benchmarks/drift_probe.py [--n 3] [--dtype bfloat16]
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _write_case(scan_dir, lobe_dir, uid, shape, seed):
    from bodyct_dram_emph_subtype_tpu.data.mha import write_mha
    r = np.random.RandomState(seed)
    ct = r.randint(-1200, 100, shape).astype(np.int16)
    lobe = np.zeros(shape, np.uint8)
    d, h, w = shape
    lobe[d // 8: d - d // 8, h // 6: h - h // 6, w // 6: w - w // 6] = \
        r.randint(1, 6, (d - 2 * (d // 8), h - 2 * (h // 6),
                         w - 2 * (w // 6))).astype(np.uint8)
    write_mha(str(Path(scan_dir) / f"{uid}.mha"), ct, spacing=(1.0, 0.7, 0.7))
    write_mha(str(Path(lobe_dir) / f"{uid}.mha"), lobe,
              spacing=(1.0, 0.7, 0.7))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--tiny", action="store_true",
                   help="CPU smoke config (med3ddramtiny, small volumes)")
    p.add_argument("--cpu", action="store_true",
                   help="force the host-CPU platform (the axon plugin "
                        "ignores JAX_PLATFORMS; only jax.config works)")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from bodyct_dram_emph_subtype_tpu.inference import processor as proc_mod
    from bodyct_dram_emph_subtype_tpu.inference.processor import run_inference

    # intercept the RAW f32 percentages (the results.json contract rounds
    # to 3 decimals — too coarse for a <1e-4 drift bound)
    raw = {}
    orig_finalize = proc_mod._finalize_scan

    def recording_finalize(uid, rec, **kw):
        raw[uid] = (float(rec["cle_pct"]), float(rec["pse_pct"]))
        return orig_finalize(uid, rec, **kw)

    proc_mod._finalize_scan = recording_finalize

    tmp = Path(tempfile.mkdtemp(prefix="drift_"))
    scan_dir, lobe_dir = tmp / "scans", tmp / "lobes"
    scan_dir.mkdir(), lobe_dir.mkdir()
    if args.tiny:
        shapes = [(48, 64, 80), (56, 72, 64), (40, 80, 72), (64, 64, 64)]
        kwargs = dict(model_arch="med3ddramtiny", ckp_path=None,
                      target_size=(32, 48, 64), batch_size=2, workers=1,
                      nchips=1, compute_dtype=args.dtype,
                      pad_shape=(80, 96, 112))
    else:
        shapes = [(96, 224, 224), (128, 256, 256), (112, 240, 208),
                  (144, 224, 256)]
        kwargs = dict(model_arch="med3ddram", ckp_path=None,
                      target_size=(128, 224, 288), batch_size=2, workers=2,
                      nchips=1, compute_dtype=args.dtype,
                      pad_shape=(160, 288, 384))
    for i in range(args.n):
        _write_case(scan_dir, lobe_dir, f"case{i}", shapes[i % len(shapes)],
                    seed=10 + i)
    res, raws = {}, {}
    for dev in (True, False):
        out = tmp / ("out_dev" if dev else "out_host")
        out.mkdir()
        raw.clear()
        res[dev] = {r["entity"]: r["metrics"]
                    for r in run_inference(str(scan_dir), str(lobe_dir),
                                           str(out), device_preprocess=dev,
                                           **kwargs)}
        raws[dev] = dict(raw)
    worst = 0.0
    rows = []
    for uid in sorted(res[True]):
        md, mh = res[True][uid], res[False][uid]
        d_cle = abs(raws[True][uid][0] - raws[False][uid][0])
        d_pse = abs(raws[True][uid][1] - raws[False][uid][1])
        worst = max(worst, d_cle, d_pse)
        rows.append({"uid": uid, "d_cle": d_cle, "d_pse": d_pse,
                     "cle_score_match": md["cle_severity_score"]
                     == mh["cle_severity_score"],
                     "pse_score_match": md["pse_severity_score"]
                     == mh["pse_severity_score"]})
        print(json.dumps(rows[-1]))
    print(json.dumps({"worst_percentage_drift": worst,
                      "dtype": args.dtype, "n": args.n,
                      "all_scores_match": all(r["cle_score_match"]
                                              and r["pse_score_match"]
                                              for r in rows)}))


if __name__ == "__main__":
    main()
