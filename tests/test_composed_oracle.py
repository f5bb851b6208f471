"""Whole-pipeline composed oracle (VERDICT r2 missing #1).

Chains the reference's OWN transform classes (``base.py``,
``intensity_transforms.py``, ``spatial_transforms.py``) + its ``med3d``
model + the ``models.py:430-450`` predict math — pure torch, no Lightning —
on a synthetic cropped scan, then runs the SAME converted weights through
our host path (``preprocess_sample`` → ``make_predict_step``) and through
``run_inference``'s full host pipeline, and compares scores, lesion
percentages, and dense maps.

This covers the one seam per-op parity tests can't: the *composition* of
the transform chain (dtype casts between stages, in-place standardize,
only-in-plane resize order) feeding the model and predict math end-to-end.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bodyct_dram_emph_subtype_tpu.data.datasets import (CLE_RATIO_MAP,
                                                        PSE_RATIO_MAP,
                                                        ratio_to_label)
from bodyct_dram_emph_subtype_tpu.data.host_preprocess import preprocess_sample
from bodyct_dram_emph_subtype_tpu.models import get_model_by_name
from bodyct_dram_emph_subtype_tpu.models.torch_import import convert_state_dict
from bodyct_dram_emph_subtype_tpu.train.state import TrainState, make_optimizer
from bodyct_dram_emph_subtype_tpu.train.steps import make_predict_step

REFERENCE = Path("/root/reference")

CROP = (40, 56, 72)       # synthetic lung-crop shape (as after bbox crop)
TARGET = (32, 48, 64)     # model input (stride-8-compatible)


def _synthetic_crop(seed=0):
    """A cropped scan dict like ``SubtypingInference.get_data`` emits
    (reference ``dataset.py:57-92``): int16 HU crop, lung mask, −910 ess."""
    rng = np.random.RandomState(seed)
    zz, yy, xx = np.mgrid[:CROP[0], :CROP[1], :CROP[2]]
    lung = ((((zz - CROP[0] / 2) / (CROP[0] * 0.42)) ** 2
             + ((yy - CROP[1] / 2) / (CROP[1] * 0.42)) ** 2
             + ((xx - CROP[2] / 2) / (CROP[2] * 0.42)) ** 2) < 1)
    ct = np.full(CROP, -2048, np.int16)  # outside dilated lung, masked out
    ct[lung] = (-870 + 90 * rng.randn(int(lung.sum()))).astype(np.int16)
    ess = np.logical_and(ct < -910, lung)
    return {"image": ct, "lung_mask": lung, "ess_mask": ess}


def _stub_missing(name, **attrs):
    """Register an empty module for a third-party import the reference's
    ``utils.py`` pulls in but this image doesn't ship (SimpleITK, cv2, …).
    No-op when the real module is importable."""
    if name in sys.modules:
        return
    try:
        __import__(name)
        return
    except ImportError:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        parent, _, child = name.rpartition(".")
        if parent and parent in sys.modules:
            setattr(sys.modules[parent], child, mod)


@pytest.mark.slow
@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_composed_reference_chain_oracle():
    import torch
    import torch.nn.functional as F

    sample = _synthetic_crop()

    # reference utils.py's unused-here heavy deps
    _stub_missing("SimpleITK")
    _stub_missing("cv2")
    _stub_missing("scipy")
    _stub_missing("scipy.ndimage")
    _stub_missing("pytorch_lightning")
    _stub_missing("pytorch_lightning.loggers", TensorBoardLogger=object)
    _stub_missing("omegaconf", OmegaConf=object)
    _stub_missing("hydra")

    # ---- reference side: its own transform classes + model + predict math
    sys.path.insert(0, str(REFERENCE))
    try:
        import med3d as ref_med3d
        from base import NumpyToTensor
        from intensity_transforms import IntensityWindow, Standardize
        from spatial_transforms import Interpolate

        torch_model = ref_med3d.resnet18segreg().eval()

        chain = [
            NumpyToTensor(),
            IntensityWindow(from_span=(-1150, -300), to_span=(0, 1),
                            output_dtype=torch.float32),
            Standardize(),
            Interpolate(TARGET, None, align_corners=True),
        ]  # the TEST/predict-phase chain, models.py:57-63
        ref_batch = {k: np.asarray(v) for k, v in sample.items()}
        for t in chain:
            ref_batch = t(ref_batch)

        with torch.no_grad():
            scans = ref_batch["image"][None, None].float()
            lungs = ref_batch["lung_mask"][None, None].float()
            ess = ref_batch["ess_mask"][None, None].float()
            dense_outs, _ = torch_model(scans, lungs)
            # predict_step math, models.py:437-441
            cle_dense = F.interpolate(dense_outs[0], size=scans.shape[-3:],
                                      mode="trilinear",
                                      align_corners=True) * ess
            pse_dense = F.interpolate(dense_outs[1], size=scans.shape[-3:],
                                      mode="trilinear",
                                      align_corners=True) * ess
            want_cle_pct = float(cle_dense.sum() / lungs.sum())
            want_pse_pct = float(pse_dense.sum() / lungs.sum())
        want_cle_map = cle_dense[0, 0].numpy()
        want_pse_map = pse_dense[0, 0].numpy()
        torch_sd = torch_model.state_dict()
    finally:
        sys.path.pop(0)

    # ---- our side: same weights, our host preprocess + predict step
    model = get_model_by_name("med3ddram18")
    x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), x0, x0, train=False))
    variables, report = convert_state_dict(torch_sd, variables)
    assert report["missing"] == 0 and report["shape_mismatch"] == 0

    pre = preprocess_sample(sample, TARGET)
    # the composed host chain must reproduce the reference chain exactly
    np.testing.assert_allclose(pre["image"],
                               ref_batch["image"].numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(pre["lung_mask"],
                                  ref_batch["lung_mask"].numpy())
    np.testing.assert_array_equal(pre["ess_mask"],
                                  ref_batch["ess_mask"].numpy())

    state = TrainState.create(variables, make_optimizer())
    step = make_predict_step(model)
    with jax.default_matmul_precision("highest"):
        res = step(state,
                   jnp.asarray(pre["image"])[None],
                   jnp.asarray(pre["lung_mask"].astype(np.float32))[None],
                   jnp.asarray(pre["ess_mask"].astype(np.float32))[None])
    got_cle_pct = float(res["cle_precentages"][0])
    got_pse_pct = float(res["pse_precentages"][0])
    got_cle_map = np.asarray(res["cle_dense_outs"][0])
    got_pse_map = np.asarray(res["pse_dense_outs"][0])

    # scores equal, percentages within 1e-5, maps within fp32-conv tolerance
    assert (ratio_to_label(got_cle_pct, CLE_RATIO_MAP)
            == ratio_to_label(want_cle_pct, CLE_RATIO_MAP))
    assert (ratio_to_label(got_pse_pct, PSE_RATIO_MAP)
            == ratio_to_label(want_pse_pct, PSE_RATIO_MAP))
    np.testing.assert_allclose(got_cle_pct, want_cle_pct, atol=1e-5)
    np.testing.assert_allclose(got_pse_pct, want_pse_pct, atol=1e-5)
    np.testing.assert_allclose(got_cle_map, want_cle_map, rtol=1e-3,
                               atol=2e-3)
    np.testing.assert_allclose(got_pse_map, want_pse_map, rtol=1e-3,
                               atol=2e-3)


@pytest.mark.slow
@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_deployment_shape_production_config_oracle():
    """The EXACT config bench/processor ship — med3ddram (resnet34segreg),
    bf16, W-pair packed decoder — at the deployment input size
    (128,224,288) vs the torch reference model (``med3d.py:369-388`` +
    ``models.py:430-450`` predict math), tolerance-based (VERDICT r4
    next-step #5).

    The conv lowering here is the XLA 'direct' mode: the Pallas 'roll'
    kernels are pinned == direct by the equivalence tests in
    ``test_parallel.py``/``test_packed_decoder.py`` (interpret mode at
    this volume size is not tractable on a 1-core host), so
    direct==oracle here composes with roll==direct there to pin the full
    production stack."""
    import torch

    shape = (128, 224, 288)
    rng = np.random.RandomState(3)
    zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
    lung = ((((zz - shape[0] / 2) / (shape[0] * 0.42)) ** 2
             + ((yy - shape[1] / 2) / (shape[1] * 0.42)) ** 2
             + ((xx - shape[2] / 2) / (shape[2] * 0.42)) ** 2) < 1)
    img = rng.randn(*shape).astype(np.float32)          # standardized-like
    ess = np.logical_and(img < -0.5, lung)

    _stub_missing("SimpleITK")
    _stub_missing("cv2")
    _stub_missing("scipy")
    _stub_missing("scipy.ndimage")
    _stub_missing("pytorch_lightning")
    _stub_missing("pytorch_lightning.loggers", TensorBoardLogger=object)
    _stub_missing("omegaconf", OmegaConf=object)
    _stub_missing("hydra")

    sys.path.insert(0, str(REFERENCE))
    try:
        import med3d as ref_med3d
        torch_model = ref_med3d.resnet34segreg().eval()
        with torch.no_grad():
            scans = torch.from_numpy(img)[None, None]
            lungs = torch.from_numpy(lung.astype(np.float32))[None, None]
            dense_outs, reg_outs = torch_model(scans, lungs)
        want_cle_map = dense_outs[0][0, 0].numpy()
        want_pse_map = dense_outs[1][0, 0].numpy()
        want_cle = float(reg_outs[0][0])
        want_pse = float(reg_outs[1][0])
        torch_sd = torch_model.state_dict()
        del torch_model, dense_outs, reg_outs
    finally:
        sys.path.pop(0)

    # production config: bf16 compute + W-pair packed decoder
    model = get_model_by_name("med3ddram", dtype=jnp.bfloat16,
                              packed_decoder=True)
    x0 = jnp.zeros((1, 16, 32, 32, 1), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), x0, x0, train=False))
    variables, report = convert_state_dict(torch_sd, variables)
    assert report["missing"] == 0 and report["shape_mismatch"] == 0

    fwd = jax.jit(lambda v, x, l: model.apply(v, x, l, train=False))
    dense, regs = fwd(variables, jnp.asarray(img)[None, ..., None],
                      jnp.asarray(lung.astype(np.float32))[None, ..., None])
    got_cle_map = np.asarray(dense[0][0, ..., 0], np.float32)
    got_pse_map = np.asarray(dense[1][0, ..., 0], np.float32)
    got_cle = float(regs[0][0])
    got_pse = float(regs[1][0])

    # bf16 convs: the lung-masked fractions (the clinical outputs) must
    # stay within bf16 accumulation noise of the fp32 torch oracle; the
    # sigmoid maps are compared in aggregate (isolated voxels can flip at
    # steep sigmoid inputs under bf16 — DEVNOTES round-3e parity notes)
    assert abs(got_cle - want_cle) < 5e-3, (got_cle, want_cle)
    assert abs(got_pse - want_pse) < 5e-3, (got_pse, want_pse)
    # map tolerance calibrated from the first full run of this test
    # (round 5): mean |Δ| measured 5.8e-3 / 4.1e-3 — bf16 rounding of
    # every conv input through a 34-layer model, against an fp32 oracle;
    # the cle/pse fractions above are the clinical contract and hold an
    # order tighter.  Voxel sign-flips (|Δ| ≈ 1 at steep sigmoid inputs)
    # must stay rare.
    for got, want in ((got_cle_map, want_cle_map),
                      (got_pse_map, want_pse_map)):
        delta = np.abs(got - want)
        assert np.mean(delta) < 1.5e-2, np.mean(delta)
        # a max-|Δ| bound is unrealistic here: among 8.2M voxels of a
        # randn input, SOME pre-sigmoid value straddles 0 closely enough
        # that a bf16 nudge saturates it to the other side (|Δ| ≈ 1,
        # observed 0.98 on the first run) — bound the RATE instead
        assert np.mean(delta > 0.5) < 5e-3, np.mean(delta > 0.5)
