"""Loss primitives of both training strategies, with exact reference math.

Parity targets:
- weighted CE on pooled logits (CLS path, reference ``models.py:248-258`` via
  ``F.cross_entropy(weight=...)`` → weighted mean normalised by Σw[y]);
- interval regression loss with power correction β·x^γ (β=0.7338, γ=0.2578)
  and hinge-squared band penalty, ×10 × per-sample class weight, **sum**
  reduction (reference ``models.py:512-521``);
- regression label bands with score-0 correction (``models.py:495-510``);
- mutual-exclusion Dice between the CLE and PSE dense maps
  (``models.py:523-526``, ``metrics.py:33-47``);
- class-balanced, mask-smoothness-weighted BCE coverage loss
  (``metrics.py:4-30``);
- lesion-fraction → severity label interval lookup, vectorised
  (``models.py:533-537``).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BETA = 0.7338
GAMMA = 0.2578


def weighted_cross_entropy(logits: jax.Array, labels: jax.Array,
                           class_weights: jax.Array) -> jax.Array:
    """torch ``F.cross_entropy(weight=w)`` parity: weighted mean with
    normaliser Σ w[y_i]."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    w = class_weights[labels]
    return jnp.sum(nll * w) / jnp.sum(w)


def generate_regression_labels(cls_targets: jax.Array, ratio_map: Dict[int, tuple],
                               tightness: float = 1.0) -> jax.Array:
    """Score → (lower, upper) lesion-fraction band; score 0 collapses to
    (0, 0) (``models.py:495-510``)."""
    n = len(ratio_map)
    lbs = np.asarray([ratio_map[i][0] for i in range(n)], np.float32)
    ubs = np.asarray([ratio_map[i][1] for i in range(n)], np.float32)
    mids = (lbs + ubs) / 2.0
    spans = (ubs - lbs) * tightness / 2.0
    lo = np.where(lbs < 1e-7, 0.0, mids - spans)
    hi = np.where(lbs < 1e-7, 0.0, mids + spans)
    bands = jnp.asarray(np.stack([lo, hi], axis=-1))
    return bands[cls_targets]


def interval_regression_loss(outs: jax.Array, reg_targets: jax.Array,
                             weight_factors: jax.Array) -> jax.Array:
    """Hinge-squared interval loss in power-corrected space, sum reduction."""
    data = jnp.concatenate([outs[:, None], reg_targets], axis=1)
    data = BETA * data ** GAMMA
    k = (0.5 * (data[:, 2] - data[:, 1])) ** 2
    unhinged = (data[:, 0] - (data[:, 2] + data[:, 1]) / 2.0) ** 2 - k
    loss = 10.0 * jax.nn.relu(unhinged) * weight_factors
    return jnp.sum(loss)


def dice_coef(y: jax.Array, y_hat: jax.Array, smooth: float) -> jax.Array:
    """Whole-batch flattened Dice (``metrics.py:33-37``)."""
    y_flat = y.reshape(-1)
    y_hat_flat = y_hat.reshape(-1)
    inter = jnp.sum(y_hat_flat * y_flat)
    return (2.0 * inter + smooth) / (jnp.sum(y_flat) + jnp.sum(y_hat_flat)
                                     + smooth)


def binary_dice(y, y_hat, smooth: float = 1e-7):
    return dice_coef(y, y_hat, smooth)


def masked_balanced_bce(y: jax.Array, y_hat: jax.Array, mask=None,
                        smoothness: float = 0.65, eps: float = 1e-6
                        ) -> jax.Array:
    """Class-balanced focal-style BCE with in-mask smoothness down-weighting.

    Exact ``metrics.py:4-30`` math, including the quirk that α is computed
    as ``1 - t.sum()/t.shape[0]`` (batch size, not voxel count) before
    clamping to [0.3, 0.7].
    """
    t = y.astype(jnp.float32)
    p = y_hat
    alpha = jnp.clip(1.0 - jnp.sum(t) / t.shape[0], 0.3, 0.7)
    pt = p * t + (1.0 - p) * (1.0 - t)
    w = alpha * t + (1.0 - alpha) * (1.0 - t)
    ptc = jnp.clip(pt, eps, 1.0 - eps)
    log_ptc = jnp.log(ptc)
    if mask is not None:
        nll = -1.0 * (smoothness * log_ptc * w * mask
                      + log_ptc * w * (1.0 - mask))
    else:
        nll = -smoothness * log_ptc * w
    return jnp.sum(nll) / jnp.sum(w)


def segmentation_losses(dense_cle: jax.Array, dense_pse: jax.Array,
                        ems: jax.Array, lungs: jax.Array
                        ) -> Tuple[jax.Array, jax.Array]:
    """(mutual-exclusion Dice, coverage BCE) pair (``models.py:523-531``)."""
    mul_loss = dice_coef(dense_cle * lungs, dense_pse * lungs, 1e-7)
    dense_p = jnp.clip(dense_cle + dense_pse, 0.0, 1.0)
    seg_loss = masked_balanced_bce(ems, dense_p, lungs, smoothness=0.85)
    return mul_loss, seg_loss


def ratio_to_label_batch(ratios: jax.Array, ratio_map: Dict[int, tuple]
                         ) -> jax.Array:
    """Vectorised interval lookup: fraction → severity score
    (``models.py:533-537``)."""
    n = len(ratio_map)
    uppers = jnp.asarray([ratio_map[i][1] for i in range(n)], jnp.float32)
    # label = first interval whose upper bound exceeds the ratio; clip keeps
    # an (impossible) ratio ≥ the top bound in the last class
    label = jnp.sum(ratios[..., None] >= uppers, axis=-1)
    return jnp.clip(label, 0, n - 1).astype(jnp.int32)
