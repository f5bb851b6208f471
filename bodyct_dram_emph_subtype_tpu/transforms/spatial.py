"""Spatial transforms (parity with reference ``spatial_transforms.py``)."""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import crop_and_resize
from ..ops.resize import interpolate_volume
from .base import DualTransform


class Interpolate(DualTransform):
    """Resize to the model input size (reference ``spatial_transforms.py:33-97``).

    ``only_in_plane=True`` (the default and the only mode the pipeline uses):
    bilinear in-plane resize to (H, W) + depth subsampling via truncated
    ``linspace`` indices; masks use nearest in-plane.
    """

    def __init__(self, target_size, scale_factor=None, align_corners=False,
                 mode=None, only_in_plane=True):
        super().__init__(p=1.0, always_apply=True, freeze_param=True)
        if target_size is None and scale_factor is None:
            raise ValueError("Either target_size or scale_factor must be given.")
        if scale_factor is not None:
            raise NotImplementedError(
                "scale_factor mode is unused by the reference pipeline")
        self.target_size = tuple(target_size)
        self.scale_factor = scale_factor
        self.align_corners = align_corners
        self.only_in_plane = only_in_plane
        self.mode = mode

    def apply_to_image(self, data):
        data = jnp.asarray(data)
        out = interpolate_volume(data, self.target_size, is_mask=False,
                                 only_in_plane=self.only_in_plane,
                                 align_corners=self.align_corners)
        # reference casts back to the original dtype (spatial_transforms.py:68)
        return out.astype(data.dtype)

    def apply_to_mask(self, data):
        data = jnp.asarray(data)
        out = interpolate_volume(data.astype(jnp.float32), self.target_size,
                                 is_mask=True, only_in_plane=self.only_in_plane)
        return out.astype(data.dtype)

    def get_transform_init_args_names(self):
        return ("target_size", "scale_factor", "align_corners", "mode",
                "only_in_plane")


class Flip(DualTransform):
    """Flip a random subset of axes (reference ``spatial_transforms.py:100-131``).

    Quirk preserved: ``dim=(lo, hi)`` samples *how many* axes to flip via
    ``randint(lo, hi)`` (exclusive hi), then picks that many distinct axes —
    the training config ``dim=(1, 3)`` flips 1 or 2 of the 3 axes
    (``models.py:69``).
    """

    def __init__(self, p, always_apply, dim: Union[int, Tuple[int, int]]):
        super().__init__(p=p, always_apply=always_apply)
        self.dim = dim

    def get_params(self, data_dict, rng):
        n_axes = rng.randint(self.dim[0], self.dim[1])
        ndim = np.ndim(data_dict["image"])
        combs = list(rng.choice(ndim, size=n_axes, replace=False))
        return {"combs": [int(c) for c in combs]}

    def _apply(self, data):
        return jnp.flip(jnp.asarray(data), axis=self.params["combs"])

    def apply_to_image(self, data):
        return self._apply(data)

    def apply_to_mask(self, data):
        return self._apply(data)

    def get_transform_init_args_names(self):
        return ("dim",)


class CropAndResize(DualTransform):
    """Random crop-and-resize-back augmentation
    (reference ``spatial_transforms.py:133-197``).

    Training samples crop center ~ U(0.45, 0.55) and crop size ~ U(0.95, 1.0)
    per axis (``models.py:70-74``), crops that normalized box and resamples it
    back to the original size through the axis-aligned grid-sample fast path.
    """

    def __init__(self, p, always_apply, crop_center: Tuple[float, float],
                 crop_size: Tuple[float, float], position_given=False,
                 mode: str = "bilinear", padding_mode: str = "zeros",
                 align_corners: Optional[bool] = None):
        super().__init__(p, always_apply)
        self.crop_center = crop_center
        self.crop_size = crop_size
        self.position_given = position_given
        self.mode = mode
        self.padding_mode = padding_mode
        self.align_corners = align_corners

    def get_params(self, data_dict, rng):
        ndim = np.ndim(data_dict["image"])
        if not self.position_given:
            center = tuple(rng.uniform(*self.crop_center) for _ in range(ndim))
            size = tuple(rng.uniform(*self.crop_size) for _ in range(ndim))
        else:
            center, size = self.crop_center, self.crop_size
        return {"crop_center": center, "crop_size": size}

    def apply_to_image(self, data):
        data = jnp.asarray(data)
        return crop_and_resize(
            data, jnp.asarray(self.params["crop_center"], jnp.float32),
            jnp.asarray(self.params["crop_size"], jnp.float32),
            is_mask=False, align_corners=bool(self.align_corners))

    def apply_to_mask(self, data):
        data = jnp.asarray(data)
        return crop_and_resize(
            data, jnp.asarray(self.params["crop_center"], jnp.float32),
            jnp.asarray(self.params["crop_size"], jnp.float32),
            is_mask=True)

    def get_transform_init_args_names(self):
        return ("crop_center", "crop_size", "position_given", "align_corners",
                "padding_mode", "mode")
