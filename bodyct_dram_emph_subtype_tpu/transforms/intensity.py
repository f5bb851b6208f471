"""Intensity transforms (parity with reference ``intensity_transforms.py``)."""
from __future__ import annotations

import numbers
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import intensity as F
from .base import ImageOnlyTransform


class IntensityWindow(ImageOnlyTransform):
    """HU windowing: clip + rescale + dtype cast
    (reference ``intensity_transforms.py:80-101``).

    The training pipeline uses ``from_span=(-1150, -300) → (0, 1)`` float32
    (reference ``models.py:60``).
    """

    def __init__(self, from_span=(-1100, 400), to_span=(0, 255),
                 output_dtype=jnp.float32):
        super().__init__(1.0, True, freeze_param=True)
        self.from_span = self.check_range(from_span, "from_span")
        self.to_span = self.check_range(to_span, "to_span")
        self.output_dtype = output_dtype

    def apply_to_image(self, data):
        out = F.intensity_window(jnp.asarray(data), self.from_span, self.to_span)
        return out.astype(self.output_dtype)

    def get_transform_init_args_names(self):
        return ("from_span", "to_span")


class Standardize(ImageOnlyTransform):
    """Per-volume zero-mean/unit-std (reference
    ``intensity_transforms.py:104-114``)."""

    def __init__(self):
        super().__init__(1.0, True, freeze_param=True)

    def apply_to_image(self, data):
        return F.standardize(jnp.asarray(data))


class ContrastStretching(ImageOnlyTransform):
    """Sigmoid contrast stretch (reference ``intensity_transforms.py:27-77``;
    unused in the training pipeline but part of the public transform set).

    ``spatial_dimension_index >= 0`` applies the stretch independently per
    slice of that axis (the reference's channel-wise mode,
    ``intensity_transforms.py:48-57``)."""

    def __init__(self, p=0.5, always_apply=False, gamma=(1.0, 3.0),
                 middle_point=(0.3, 0.7), rescale=False,
                 spatial_dimension_index=-1):
        super().__init__(p, always_apply)
        self.gamma = gamma
        self.middle_point = middle_point
        self.rescale = rescale
        self.spatial_dimension_index = spatial_dimension_index

    def get_params(self, data_dict, rng):
        gamma = (rng.uniform(*self.gamma)
                 if not isinstance(self.gamma, numbers.Number) else self.gamma)
        middle = (rng.uniform(*self.middle_point)
                  if not isinstance(self.middle_point, numbers.Number)
                  else self.middle_point)
        return {"gamma": gamma, "middle_point": middle}

    def apply_to_image(self, data):
        data = jnp.asarray(data)
        idx = self.spatial_dimension_index
        if idx == -1:
            return F.contrast_stretching(data, self.rescale,
                                         self.params["middle_point"],
                                         self.params["gamma"])
        slices = [
            F.contrast_stretching(s, self.rescale,
                                  self.params["middle_point"],
                                  self.params["gamma"])
            for s in jnp.split(data, data.shape[idx], axis=idx)]
        return jnp.concatenate(slices, axis=idx)

    def get_transform_init_args_names(self):
        return ("gamma", "middle_point", "rescale",
                "spatial_dimension_index")


class GaussianSmooth(ImageOnlyTransform):
    """Separable gaussian blur (reference ``intensity_transforms.py:117-142``)."""

    def __init__(self, p=0.5, always_apply=False, sigma=(0.5, 2.0),
                 truncate=4.0):
        super().__init__(p, always_apply)
        self.sigma = sigma
        self.truncate = truncate

    def get_params(self, data_dict, rng):
        sigma = (rng.uniform(*self.sigma)
                 if not isinstance(self.sigma, numbers.Number) else self.sigma)
        return {"sigma": sigma}

    def apply_to_image(self, data):
        return F.gaussian_smooth(jnp.asarray(data), self.params["sigma"],
                                 self.truncate)

    def get_transform_init_args_names(self):
        return ("sigma", "truncate")


class GaussianAdditive(ImageOnlyTransform):
    """Additive gaussian noise in rescaled [0,1] space, sigma ~ U(0.03, 0.06)
    (reference ``intensity_transforms.py:145-177``; the reference spells it
    ``GaussianAddictive`` — an alias is exported for drop-in parity)."""

    def __init__(self, p=0.5, always_apply=False, sigma=(0.03, 0.06)):
        super().__init__(p, always_apply)
        self.sigma = sigma

    def get_params(self, data_dict, rng):
        sigma = (rng.uniform(*self.sigma)
                 if not isinstance(self.sigma, numbers.Number) else self.sigma)
        return {"sigma": sigma,
                "noise_seed": int(rng.randint(0, 2 ** 31 - 1))}

    def apply_to_image(self, data):
        key = jax.random.PRNGKey(self.params["noise_seed"])
        return F.gaussian_additive_noise(jnp.asarray(data), key,
                                         self.params["sigma"])

    def get_transform_init_args_names(self):
        return ("sigma",)


GaussianAddictive = GaussianAdditive  # reference spelling alias


class BoxMaskOut(ImageOnlyTransform):
    """Random box cutout (reference ``intensity_transforms.py:180-237``).

    Training uses ``n_masks=(1, 10)`` boxes at 1–6%% of each dim placed
    within the central 20–80%% region (``models.py:67``).  We sample a static
    maximum of ``n_masks[1]`` boxes with a validity mask so the device apply
    keeps one compiled shape.
    """

    def __init__(self, p: float, always_apply: bool,
                 n_masks: Union[int, Tuple[int, int]],
                 region_range=(0.2, 0.8), region_size=(0.01, 0.06),
                 assign_value: float = 0, freeze_param: bool = False):
        super().__init__(p, always_apply, freeze_param=freeze_param)
        self.region_range = self.check_positive_range(region_range, "region_range")
        self.region_size = self.check_positive_range(region_size, "region_size")
        self.n_masks = n_masks
        self.assign_value = assign_value

    def get_params(self, data_dict, rng):
        ndim = np.ndim(data_dict["image"])
        max_n = (self.n_masks[1] if isinstance(self.n_masks, (tuple, list))
                 else self.n_masks)
        n = (rng.randint(self.n_masks[0], self.n_masks[1] + 1)
             if isinstance(self.n_masks, (tuple, list)) else self.n_masks)
        centers = rng.uniform(self.region_range[0], self.region_range[1],
                              (max_n, ndim))
        sizes = rng.uniform(self.region_size[0], self.region_size[1],
                            (max_n, ndim))
        valid = np.arange(max_n) < n
        return {"n_masks": n, "mask_centers": centers, "mask_sizes": sizes,
                "valid": valid}

    def apply_to_image(self, data):
        return F.box_cutout(jnp.asarray(data),
                            jnp.asarray(self.params["mask_centers"], jnp.float32),
                            jnp.asarray(self.params["mask_sizes"], jnp.float32),
                            jnp.asarray(self.params["valid"]),
                            self.assign_value)

    def get_transform_init_args_names(self):
        return ("region_range", "region_size", "n_masks", "assign_value")
