"""Deployment inference pipeline — the ``processor.py`` equivalent.

Parity with the reference Grand-Challenge processor (``processor.py:55-177``):

- same CLI contract (``--scan_path/--lobe_path/--output_path`` + arch/batch
  flags) and the same output tree:
  ``images/centrilobular-emphysema-heatmap/<uid>.mha``,
  ``images/paraseptal-emphysema-heatmap/<uid>.mha``,
  ``centrilobular-emphysema-score.json``,
  ``araseptal-emphysema-score.json``  (sic — the reference's typo'd filename
  is part of the deployed contract, ``processor.py:77``),
  ``results.json``;
- pipeline: paired MHA read → lung dilate ×2 → −2048 mask-out → bbox crop
  +5 mm → −910 ess mask → window/standardize/resize → batched jitted
  forward → dRAM maps upsampled (align_corners=True), masked, reduced to
  lesion percentages → host un-crop into original geometry → uint8 MHA with
  the cached ITK meta.

TPU-first differences: the model runs as one jitted NDHWC program over a
device mesh; batches are padded by wrap-around to keep one compiled shape
(deduped on output); percentages are normalised per sample (the reference
divides by the whole batch's lung volume, ``models.py:440-441`` — identical
at the deployment batch of one scan).
"""
from __future__ import annotations

import functools
import json
import logging
import queue
import threading
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Set

import jax
import numpy as np

from ..data import DataLoader, SubtypingInference, write_arrays_to_mha
from ..data.datasets import CLE_RATIO_MAP, PSE_RATIO_MAP, ratio_to_label
from ..data.host_preprocess import (depth_indices_np, preprocess_sample,
                                    resize_linear_matmul_np,
                                    resize_nearest_np, window_moments_np)
from ..models import get_model_by_name
from ..parallel.mesh import MeshSpec, get_mesh, shard_batch
from ..train.checkpoint import greedy_restore_variables
from ..train.state import TrainState, make_optimizer
from ..train.steps import make_predict_step
from ..utils.viz import windowing

logger = logging.getLogger(__name__)


class _PredictView:
    """Per-sample host preprocess for the inference dataset: drops the
    unused ``original_image``, resizes image + masks to the model size."""

    def __init__(self, dataset: SubtypingInference, target_size):
        self.dataset = dataset
        self.target_size = tuple(target_size)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index):
        sample = self.dataset[index]
        sample.pop("original_image", None)
        if "ess_mask" not in sample:
            # the lean (compute_ess=False) dataset leaves the −910 mask to
            # its consumer; same math as datasets.py (reference quirk)
            sample["ess_mask"] = np.logical_and(
                np.asarray(sample["image"]) < -910,
                np.asarray(sample["lung_mask"]))
        return preprocess_sample(sample, self.target_size)


class _RawPredictView:
    """Device-pipeline view: the host ships only the cropped raw int16 CT +
    lung mask (windowing / standardization / resize / −910 ess mask all run
    fused on the TPU).  Round-4 transport: the host takes the exact
    linspace DEPTH slices of the CT up front (``depth_indices_np`` —
    bit-identical to the device's selection), ships the standardize
    moments from exact integer sums (``window_moments_np``), and ships the
    lung NEAREST-preselected all the way to ``target_size``
    (``resize_nearest_np`` — nearest resampling is a pure index selection,
    bit-identical to the device gather).  Only ``target_d`` CT depth
    planes + target-resolution lung bits travel — ~25% fewer bytes on the
    e2e-gating link, and crop depth can never overflow the buffer.
    Combined with 10-bit window-domain CT packing this is ~30x fewer
    host→device bytes than preprocessed float32 tensors.

    Round-5 transport: the CT additionally travels LUNG-GATED — only the
    values above the window floor ship (10-bit packed, ``budget``-sized
    static stream) plus 1-bit gate planes; everything the deployment
    mask-out set to −2048 (and the pad) reconstructs to the identical
    window clamp on device (``ops/packing.py::pack10_gated_host``, exact).

    A scan whose lung crop exceeds ``up_shape`` IN-PLANE — or whose gated
    voxel count exceeds ``budget`` — does NOT abort the cohort: its index
    is recorded in :attr:`oversized` (the loader workers are threads, so
    the mutation is visible to the caller) and a dummy zero-lung item is
    emitted; the caller skips the dummy on output and re-runs just those
    scans through the host-preprocess path."""

    def __init__(self, dataset: SubtypingInference, up_shape, target_size,
                 budget: int, block: int):
        self.dataset = dataset
        self.up_shape = tuple(up_shape)   # (target_d, Hpad, Wpad)
        self.target_size = tuple(target_size)
        self.budget = int(budget)
        self.block = int(block)
        self.nblk = int(np.prod(self.up_shape)) // self.block
        self.oversized: Set[int] = set()
        self._lock = threading.Lock()

    def __len__(self):
        return len(self.dataset)

    def _dummy(self, index, d, why: str):
        with self._lock:
            self.oversized.add(index)
        logger.warning(
            "scan %s %s — will fall back to host preprocessing for this "
            "scan only", d["uid"], why)
        return {"image_raw": np.full(self.up_shape, -2048, np.int16),
                "gate_blocks": np.zeros(self.nblk, bool),
                "lung_raw": np.zeros(self.target_size, np.uint8),
                "in_sizes": np.asarray(self.up_shape, np.int32),
                "moments": np.zeros(2, np.float32),
                "uid": d["uid"], "crop_slice": d["crop_slice"],
                "original_size": d["original_size"],
                "oversized": True}

    def __getitem__(self, index):
        from ..ops.packing import WINDOW_LO, gate_blocks_np
        d = self.dataset[index]
        img = np.asarray(d["image"])  # int16 crop (datasets.py)
        if any(s > p for s, p in zip(img.shape[1:], self.up_shape[1:])):
            return self._dummy(
                index, d, f"crop {img.shape} exceeds in-plane pad "
                f"{self.up_shape[1:]}")
        idx = depth_indices_np(img.shape[0], self.up_shape[0])
        img_p = np.full(self.up_shape, -2048, np.int16)
        sl = (slice(None), slice(0, img.shape[1]), slice(0, img.shape[2]))
        img_p[sl] = img[idx]
        # the block gate computed once in the loader thread rides along so
        # the dispatch thread's pack10_gated_host never re-scans the buffer
        gb = gate_blocks_np((img_p > WINDOW_LO).reshape(1, -1),
                            block=self.block)[0]
        if int(np.count_nonzero(gb)) * self.block > self.budget:
            return self._dummy(
                index, d, f"gated voxel count exceeds budget {self.budget}")
        lung_sel = resize_nearest_np(
            np.ascontiguousarray(np.asarray(d["lung_mask"])[idx],
                                 dtype=bool).view(np.uint8),
            self.target_size[1:], (1, 2))
        return {"image_raw": img_p, "gate_blocks": gb, "lung_raw": lung_sel,
                "in_sizes": np.asarray(
                    (self.up_shape[0], img.shape[1], img.shape[2]),
                    np.int32),
                "moments": window_moments_np(img),
                "uid": d["uid"], "crop_slice": d["crop_slice"],
                "original_size": d["original_size"],
                "oversized": False}


@functools.lru_cache(maxsize=4)
def _cached_init_fn(model):
    """Jitted ``model.init`` — eager (op-by-op) init is pathologically slow
    on remote-dispatch links, and a fresh bound method per call would
    defeat the jit cache."""
    return jax.jit(functools.partial(model.init, train=False))


@functools.lru_cache(maxsize=4)
def _cached_predict_step(model, batch_lung_norm: bool = False,
                         mesh=None):
    """One jitted predict program per (model, mode, mesh) for the
    PROCESS — ``run_inference`` may be called repeatedly (services,
    benchmarks) and a fresh ``jax.jit`` closure per call would recompile
    every time.  ``mesh`` is a cache key only: the compiled program bakes
    in the active mesh's shard_map partitioning, so a different mesh must
    not reuse it."""
    return make_predict_step(model, batch_lung_norm)


@functools.lru_cache(maxsize=4)
def _cached_predict_packed(model, target_size, up_shape, mesh=None,
                           budget: Optional[int] = None,
                           block: Optional[int] = None):
    """Jitted packed-input predict program, cached per static config (same
    recompile-avoidance rationale as :func:`_cached_predict_step`).
    ``up_shape`` is the depth-preselected upload buffer shape
    ``(target_size[0], Hpad, Wpad)``; ``budget`` the block-gated CT
    stream capacity in voxels (None → ungated full-buffer transport),
    ``block`` the gate granularity (None → the packing-module default,
    so a caller that packed with the library defaults can never pair
    them with a mismatched unpack grouping)."""
    import jax
    import jax.numpy as jnp

    from ..ops.packing import (GATE_BLOCK, unpack10_device,
                               unpack10_gated_device)
    if block is None:
        block = GATE_BLOCK
    from ..ops.preprocess import fused_preprocess_preselected
    from ..ops.resize import resize_linear_matmul_transpose

    n_vox_t = int(np.prod(target_size))

    @jax.jit
    def predict_packed(state, raw_packed, gate_bits, lung_bits, in_sizes,
                       moments):
        # lung-gated window-domain 10-bit unpack: exact for everything
        # this program computes — see ops/packing.py module comment
        if budget is not None:
            raw = unpack10_gated_device(raw_packed, gate_bits, up_shape,
                                        block)
        else:
            raw = unpack10_device(raw_packed, up_shape)
        b = raw.shape[0]
        bits = jnp.right_shift(lung_bits[..., None],
                               jnp.arange(8, dtype=jnp.uint8)) & 1
        lungs = bits.reshape(b, -1)[:, :n_vox_t].reshape(
            (b, *target_size))
        pre = fused_preprocess_preselected(raw, lungs, in_sizes, moments,
                                           target_size=target_size,
                                           em_threshold=-910.0)
        x = pre["image"][..., None]
        lungs5 = pre["lung_mask"][..., None]
        ess5 = pre["em_mask"][..., None]
        dense, _ = model.apply(state.variables, x, lungs5, train=False)
        # exact predict-step percentage math (models.py:438-441) via the
        # adjoint-resize identity: sum(resize(d)*ess) == sum(d * Rᵀess),
        # so the full-res maps are never materialized (the heatmap
        # upsample happens on the host during un-crop) and the ess
        # transpose-resize is shared by both maps
        half = dense[0].shape[1:4]
        ess_w = resize_linear_matmul_transpose(ess5, half, (1, 2, 3),
                                               align_corners=True)
        cle_sum = jnp.sum(dense[0] * ess_w, axis=(1, 2, 3, 4))
        pse_sum = jnp.sum(dense[1] * ess_w, axis=(1, 2, 3, 4))
        lung_sums = jnp.sum(lungs5, axis=(1, 2, 3, 4))
        em8 = ess5[..., 0].astype(jnp.uint8).reshape(b, -1, 8)
        ess_bits = jnp.sum(
            em8 * (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)).astype(
                jnp.uint8), axis=-1).astype(jnp.uint8)
        # half maps travel f16: the dominant device->host transfer
        # halves, and f16's 2^-11 relative error on sigmoid outputs sits
        # ~8x below one uint8 heatmap count (percentages stay f32 —
        # computed above, before the cast)
        return {
            "cle_half": dense[0][..., 0].astype(jnp.float16),
            "pse_half": dense[1][..., 0].astype(jnp.float16),
            "ess_bits": ess_bits,
            "cle_pct": cle_sum / lung_sums,
            "pse_pct": pse_sum / lung_sums,
        }

    return predict_packed


class _PostprocessPipeline:
    """Single consumer thread that overlaps the host postprocess (device
    fetch, half→full upsample, un-crop, MHA/JSON writes) with the next
    batch's device step, instead of leaving the TPU idle while the host
    writes files (reference does everything serially after ``predict``,
    ``processor.py:99-158``)."""

    def __init__(self, finalize: Callable[[str, Dict[str, Any]],
                                          Dict[str, Any]]):
        self._finalize = finalize
        self._seen: Set[str] = set()
        self.results: List[Dict[str, Any]] = []
        self._q: "queue.Queue" = queue.Queue(maxsize=2)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            thunk = self._q.get()
            if thunk is None:
                return
            if self._err is None:
                try:
                    thunk(self)
                except BaseException as e:  # noqa: BLE001 — reraised in close
                    self._err = e

    def emit(self, uid: str, rec: Dict[str, Any]):
        """Worker-thread context: drop wrap-around duplicates, finalize."""
        if uid in self._seen:
            return
        self._seen.add(uid)
        self.results.append(self._finalize(uid, rec))

    def submit(self, thunk: Callable[["_PostprocessPipeline"], None]):
        if self._err is not None:
            raise self._err
        self._q.put(thunk)

    def close(self) -> List[Dict[str, Any]]:
        self._q.put(None)
        self._thread.join()
        if self._err is not None:
            raise self._err
        return self.results


class _FetchStage:
    """Dedicated device-fetch thread between dispatch and postprocess.

    The deployment decomposition (``benchmarks/processor_split_probe.py``,
    DEVNOTES round 3e) gates on the DEVICE FETCH, not host CPU — with the
    fetch inside the postprocess thread, the tunnel idles while the 1-core
    host runs its ~0.6 s/scan of upsample/write work.  This stage downloads
    results (``np.asarray`` — the only reliable completion barrier on this
    backend) on its own thread and forwards host arrays to the postprocess
    pipeline, so batch n+1's transfer rides the link while batch n's CPU
    postprocess runs (numpy/BLAS release the GIL).  ``maxsize=2`` keeps two
    device batches in flight without queueing enough async transfers to
    trip the relay's degraded mode (DEVNOTES round 1)."""

    def __init__(self, pipeline: _PostprocessPipeline):
        self._pipeline = pipeline
        self._q: "queue.Queue" = queue.Queue(maxsize=2)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if self._err is not None:
                continue
            try:
                res, post = item
                host = {k: np.asarray(v) for k, v in res.items()}
                self._pipeline.submit(functools.partial(post, host=host))
            except BaseException as e:  # noqa: BLE001 — reraised in close
                self._err = e

    def submit(self, res, post):
        if self._err is not None:
            raise self._err
        self._q.put((res, post))

    def close(self):
        self._q.put(None)
        self._thread.join()
        if self._err is not None:
            raise self._err


def _device_path(model, state, mesh, dataset, make_loader,
                 target_size, pad_shape,
                 pipeline: _PostprocessPipeline,
                 gated_frac: float = 0.8) -> List[int]:
    """Batched device-preprocess inference: lung-gated packed raw volumes
    up, half-res dense maps + bit-packed ess + exact percentages down.
    Returns the dataset indices whose crops exceeded ``pad_shape`` (or the
    gated-stream budget — handled afterwards by the host-preprocess path,
    one scan at a time).

    ``gated_frac`` sizes the static gated CT stream as a fraction of the
    upload buffer, counted in GATE BLOCKS: block occupancy runs ~64-79%
    on crop-like geometries (benchmarks/gate_block_probe.py — partially
    dead blocks ship whole), so the 0.8 default leaves a little margin
    while still cutting upload bytes ~20-35%; overflow falls back
    per-scan to host preprocessing."""
    from ..ops.packing import gated_budget, pack10_gated_host, pick_gate_block

    n_vox_t = int(np.prod(target_size))
    up_shape = (target_size[0], pad_shape[1], pad_shape[2])
    block = pick_gate_block(int(np.prod(up_shape)))
    nblk = int(np.prod(up_shape)) // block
    budget = gated_budget([int(nblk * gated_frac)], block=block)
    predict_packed = _cached_predict_packed(model, target_size, up_shape,
                                            mesh, budget, block)

    view = _RawPredictView(dataset, up_shape, target_size, budget, block)
    fetcher = _FetchStage(pipeline)
    try:
        for batch in make_loader(view):
            raw_packed, gate_bits = pack10_gated_host(
                batch["image_raw"], batch["gate_blocks"], budget,
                block=block)
            device_in = shard_batch(mesh, {
                "raw_packed": raw_packed,
                "gate_bits": gate_bits,
                "lung_bits": np.packbits(
                    batch["lung_raw"].reshape(len(batch["uid"]), -1),
                    axis=-1, bitorder="little"),
                "in_sizes": batch["in_sizes"],
                "moments": batch["moments"]})
            # async dispatch — the fetch stage downloads on its own thread
            # so the next batch's host packing AND the previous batch's
            # postprocess both overlap this device step + transfer
            res = predict_packed(state, device_in["raw_packed"],
                                 device_in["gate_bits"],
                                 device_in["lung_bits"],
                                 device_in["in_sizes"],
                                 device_in["moments"])
            batch_meta = {k: batch[k] for k in ("uid", "crop_slice",
                                                "original_size",
                                                "oversized")}
            fetcher.submit(res, functools.partial(
                _device_batch_post, batch=batch_meta,
                target_size=target_size, n_vox_t=n_vox_t))
    finally:
        fetcher.close()
    return sorted(view.oversized)


def _device_batch_post(pipe: _PostprocessPipeline, *, host, batch,
                       target_size, n_vox_t):
    for i, uid in enumerate(batch["uid"]):
        if batch["oversized"][i]:
            continue  # dummy item — re-run on the host path
        ess = np.unpackbits(host["ess_bits"][i], bitorder="little")
        ess = ess[:n_vox_t].reshape(target_size)
        rec = {}
        for name, half in (("cle", host["cle_half"][i]),
                           ("pse", host["pse_half"][i])):
            # same linear upsample the device used for the reduction —
            # host float64-indexed taps, so the written uint8 heatmaps
            # match the host-preprocess path (f16 transfer widened back)
            up = resize_linear_matmul_np(half.astype(np.float32),
                                         target_size, (0, 1, 2),
                                         align_corners=True)
            # in-place zero outside ess (== * ess for a 0/1 mask, minus
            # one full-volume f32 temporary per map on the 1-core host)
            up[ess == 0] = 0.0
            rec[f"{name}_dense"] = up
        pipe.emit(uid, {
            **rec,
            "cle_pct": float(host["cle_pct"][i]),
            "pse_pct": float(host["pse_pct"][i]),
            "crop_slice": np.asarray(batch["crop_slice"][i]),
            "original_size": np.asarray(batch["original_size"][i]),
        })


def _host_batch_post(pipe: _PostprocessPipeline, *, res, batch):
    host = {k: np.asarray(v) for k, v in res.items()}  # completion barrier
    for i, uid in enumerate(batch["uid"]):
        pipe.emit(uid, {
            "cle_dense": host["cle_dense_outs"][i],
            "pse_dense": host["pse_dense_outs"][i],
            "cle_pct": float(host["cle_precentages"][i]),
            "pse_pct": float(host["pse_precentages"][i]),
            "crop_slice": np.asarray(batch["crop_slice"][i]),
            "original_size": np.asarray(batch["original_size"][i]),
        })


def _finalize_scan(uid: str, rec: Dict[str, Any], *, dataset,
                   out_cle: Path, out_pse: Path) -> Dict[str, Any]:
    """Un-crop both dRAMs into the original scan geometry, write the uint8
    heatmap MHAs, and return the ``results.json`` entry (reference
    ``processor.py:99-158``)."""
    crop = rec["crop_slice"]
    original_size = tuple(int(s) for s in rec["original_size"])
    recon_size = tuple(int(b - a) for a, b in crop)
    paste = tuple(slice(int(a), int(b)) for a, b in crop)

    metrics = {}
    full_maps = {}
    for name, dense, pct in (("cle", rec["cle_dense"], rec["cle_pct"]),
                             ("pse", rec["pse_dense"], rec["pse_pct"])):
        up = resize_linear_matmul_np(dense, recon_size, (0, 1, 2),
                                     align_corners=True)
        # quantize the CROP, then paste into a uint8 canvas: outside the
        # crop windowing(0) == 0 == the uint8 background, so this equals
        # the reference's window-the-full-volume order exactly while never
        # materializing a full-size float32 map
        full = np.zeros(original_size, np.uint8)
        full[paste] = windowing(up, from_span=(0, 1)).astype(np.uint8)
        full_maps[name] = full
        ratio_map = CLE_RATIO_MAP if name == "cle" else PSE_RATIO_MAP
        metrics[f"{name}_severity_score"] = "{:d}".format(
            ratio_to_label(pct, ratio_map))
        metrics[f"{name}_lesion_percentage_per_lung"] = "{:.3f}".format(pct)

    meta = dataset.scan_meta_cache[uid]
    itk_kwargs = dict(
        origin=meta["origin"][::-1],
        direction=np.asarray(meta["direction"]).reshape(3, 3)[
            ::-1].flatten().tolist(),
        spacing=meta["spacing"][::-1])
    write_arrays_to_mha(out_cle, [full_maps["cle"]], [uid],
                        dtype=np.uint8, **itk_kwargs)
    write_arrays_to_mha(out_pse, [full_maps["pse"]], [uid],
                        dtype=np.uint8, **itk_kwargs)
    return {"entity": uid, "metrics": metrics, "error_messages": []}


def run_inference(scan_path: str, lobe_path: str, output_path: str,
                  model_arch: str = "med3ddram",
                  ckp_path: Optional[str] = "best.ckpt",
                  target_size=(128, 224, 288), batch_size: int = 2,
                  workers: int = 2, nchips: Optional[int] = None,
                  compute_dtype: str = "float32",
                  device_preprocess: bool = True,
                  pad_shape=(160, 288, 384),
                  gated_frac: float = 0.8,
                  state: Optional[TrainState] = None,
                  mesh=None) -> List[Dict[str, Any]]:
    """Run the full deployment pipeline; returns the results list.

    ``device_preprocess=True`` (the default since round 4): the clinical
    fast path.  Device and host preprocessing agree to <1e-5 in the lesion
    percentages at deployment scale on the chip (exact-integer resize
    index math — ``benchmarks/drift_probe.py``, DEVNOTES round 4), so the
    fast path and the torch-parity path are clinically interchangeable.

    ``device_preprocess=False``: the strict host torch-parity
    preprocessing path (the pre-round-4 default; still the reference
    oracle for parity tests).

    On the device path: the host
    ships only the target-depth linspace-selected raw CT slices (10-bit
    window-domain packed) + bit-packed lungs + exact standardize moments;
    windowing / standardize / resize / ess mask run fused on the TPU, and
    only the HALF-resolution dense maps + bit-packed ess come back (the
    full-res masking and percentage reduction happen on device with the
    exact predict-step math; the host redoes the same linear upsample for
    the heatmap reconstruction).  ~30x fewer host↔device bytes than the
    float32 path.  Scans whose lung crop exceeds ``pad_shape`` in-plane
    fall back to the host path individually (depth cannot overflow — only
    the selected planes travel); a ``target_size``/``pad_shape`` that breaks
    the packing divisibility falls back for the whole run with a warning.

    Both paths overlap host postprocessing (un-crop resize + MHA writes)
    with the next batch's device step via a consumer thread.
    """
    import jax.numpy as jnp

    out_root = Path(output_path)
    cle_json = out_root / "centrilobular-emphysema-score.json"
    pse_json = out_root / "araseptal-emphysema-score.json"  # contract typo
    results_json = out_root / "results.json"
    out_cle = out_root / "images" / "centrilobular-emphysema-heatmap"
    out_pse = out_root / "images" / "paraseptal-emphysema-heatmap"
    out_cle.mkdir(parents=True, exist_ok=True)
    out_pse.mkdir(parents=True, exist_ok=True)

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    # the bf16 high-throughput mode runs the W-pair packed decoder (same
    # variable tree as the unpacked twin, so checkpoints are oblivious);
    # under conv mode 'roll' its convs use the rolling-ring Pallas kernels.
    # The clinical float32 default keeps the reference-parity lowering.
    model = get_model_by_name(model_arch, dtype=dtype,
                              packed_decoder=dtype is not None)
    if mesh is None or isinstance(mesh, (str, MeshSpec)):
        from ..utils.cli import parse_mesh
        spec = parse_mesh(mesh)
        if spec is None:
            spec = MeshSpec(data=nchips or len(jax.devices()))
        mesh = get_mesh(spec, devices=jax.devices()[:spec.size])
    # multi-chip fast path: Pallas call sites shard_map over 'data'
    from ..parallel.mesh import set_active_mesh
    set_active_mesh(mesh)
    predict_step = _cached_predict_step(model, mesh=mesh)

    # lean per-scan host preprocess: the device pipeline computes the ess
    # mask on chip and never reads original_image; its rare per-scan host
    # fallback (_PredictView) synthesizes ess_mask from the int16 crop.
    # The EXPLICIT strict host-parity path keeps the dataset's native-
    # dtype ess (reference compares before any cast, dataset.py:79)
    dataset = SubtypingInference(scan_path, lobe_path, keep_original=False,
                                 compute_ess=not device_preprocess)
    if len(dataset) == 0:
        raise FileNotFoundError(f"no .mha scans under {scan_path}")
    view = _PredictView(dataset, target_size)

    if state is None:
        x = jnp.zeros((1, *target_size, 1), jnp.float32)
        variables = dict(_cached_init_fn(model)(jax.random.PRNGKey(0), x, x))
        state = TrainState.create(variables, make_optimizer())
        if ckp_path and Path(ckp_path).is_dir():
            # framework-native Orbax checkpoint directory (train → deploy)
            from ..train.checkpoint import CheckpointManager
            mgr = CheckpointManager(ckp_path)
            state, _, epoch = mgr.restore(jax.device_get(state))
            mgr.close()
            logger.info("restored orbax checkpoint epoch %d from %s", epoch,
                        ckp_path)
        elif ckp_path and Path(ckp_path).exists():
            variables = greedy_restore_variables(variables, ckp_path)
            state = TrainState.create(variables, make_optimizer())
            logger.info("loaded weights from %s", ckp_path)
        else:
            logger.warning("no checkpoint found at %s — random weights",
                           ckp_path)

    if mesh.shape.get("model", 1) > 1:
        # tensor parallelism: conv channels sharded over 'model'; XLA
        # inserts the activation collectives under jit
        from ..parallel.mesh import shard_params_tp
        state = shard_params_tp(mesh, state)

    def _make_loader(a_view, subset: Optional[List[int]] = None):
        gbs = batch_size * mesh.shape["data"]
        indices = (list(subset) if subset is not None
                   else list(range(len(a_view))))
        if len(indices) % gbs:
            # tile so even a single scan fills the mesh batch; duplicates
            # are dropped on output by uid
            total = int(np.ceil(len(indices) / gbs)) * gbs
            indices = list(np.resize(np.asarray(indices), total))
        return DataLoader(a_view, indices=indices, batch_size=gbs,
                          drop_last=False, num_workers=workers)

    if device_preprocess:
        n_vox_t = int(np.prod(target_size))
        n_vox_u = int(np.prod(
            (target_size[0], pad_shape[1], pad_shape[2])))
        from ..ops.packing import pick_gate_block
        if n_vox_t % 8 or n_vox_u % 8 or pick_gate_block(n_vox_u) == 0:
            # the packed device pipeline needs prod(target_size) % 8 == 0
            # (ess bit-packing) and a valid gate-block factorization of
            # the upload shape; anything else must not die in an opaque
            # reshape
            logger.warning(
                "target_size %s / pad_shape %s break the device-preprocess "
                "packing divisibility (prod(target) %% 8 == 0, gate-block "
                "factorization of the upload shape) — using host "
                "preprocessing instead",
                tuple(target_size), tuple(pad_shape))
            device_preprocess = False

    pipeline = _PostprocessPipeline(functools.partial(
        _finalize_scan, dataset=dataset, out_cle=out_cle, out_pse=out_pse))
    try:
        host_subset: Optional[List[int]] = None  # None → every scan
        if device_preprocess:
            host_subset = _device_path(model, state, mesh, dataset,
                                       _make_loader, tuple(target_size),
                                       tuple(pad_shape), pipeline,
                                       gated_frac=gated_frac)
        if host_subset is None or host_subset:
            for batch in _make_loader(view, subset=host_subset):
                device_in = shard_batch(mesh, {
                    "image": batch["image"].astype(np.float32),
                    "lung": batch["lung_mask"].astype(np.float32),
                    "ess": batch["ess_mask"].astype(np.float32)})
                res = predict_step(state, device_in["image"],
                                   device_in["lung"], device_in["ess"])
                batch_meta = {k: batch[k] for k in ("uid", "crop_slice",
                                                    "original_size")}
                pipeline.submit(functools.partial(
                    _host_batch_post, res=res, batch=batch_meta))
    finally:
        results = pipeline.close()

    # oversized scans were appended after the device-path cohort; restore
    # dataset (glob) order so results[0] stays the first scan
    order = {Path(f).stem: i for i, f in enumerate(dataset.scan_files)}
    results.sort(key=lambda r: order.get(r["entity"], len(order)))

    if jax.process_index() == 0 and results:
        with open(cle_json, "w") as f:
            f.write(json.dumps({
                "score": int(float(results[0]["metrics"]["cle_severity_score"])),
                "percentage": float(
                    results[0]["metrics"]["cle_lesion_percentage_per_lung"])}))
        with open(pse_json, "w") as f:
            f.write(json.dumps({
                "score": int(float(results[0]["metrics"]["pse_severity_score"])),
                "percentage": float(
                    results[0]["metrics"]["pse_lesion_percentage_per_lung"])}))
        with open(results_json, "w") as f:
            f.write(json.dumps(results))
    return results
