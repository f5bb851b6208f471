"""Dict-in/dict-out transform framework with explicit JAX RNG threading.

Rebuilds the reference transform protocol (``base.py:17-231``) JAX-style:

- dict-in/dict-out with key-semantic dispatch ("image"/"mask"/"box"/"points"
  substring of the key decides which apply method runs, reference
  ``base.py:119-133``);
- per-transform probability gate ``p`` / ``always_apply`` and
  ``freeze_param`` (cached params) (reference ``base.py:81-89``);
- instead of the reference's global ``random.random()`` statefulness, every
  call takes an explicit ``jax.random`` key; parameter sampling happens on
  the host (numpy) from a key-derived seed so transformed shapes stay static
  and the transforms compose with jit'd apply functions.
"""
from __future__ import annotations

import json
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def key_to_rng(key: jax.Array) -> np.random.RandomState:
    """Derive a host RNG from a JAX PRNG key (for shape-static param draws)."""
    data = np.asarray(jax.random.key_data(key)).astype(np.uint32).ravel()
    return np.random.RandomState(int(data[-1]) & 0x7FFFFFFF)


class BaseTransform:
    """Base for all transforms; see module docstring for the protocol."""

    def __init__(self, p: float = 0.5, always_apply: bool = False,
                 freeze_param: bool = False):
        self.p = p
        self.always_apply = always_apply
        self.freeze_param = freeze_param
        self.params: Dict[str, Any] = {}

    # ------------------------------------------------------------ protocol
    def __call__(self, data_dict: Dict[str, Any],
                 key: Optional[jax.Array] = None) -> Dict[str, Any]:
        if self.freeze_param:
            return self.apply_with_params(self.params, data_dict)
        rng = key_to_rng(key) if key is not None else np.random
        if self.always_apply or rng.random_sample() < self.p:
            params = self.get_params(data_dict, rng)
            return self.apply_with_params(params, data_dict)
        return data_dict

    def get_params(self, data_dict: Dict[str, Any], rng) -> Dict[str, Any]:
        return {}

    def apply_with_params(self, params: Dict[str, Any],
                          data_dict: Dict[str, Any]) -> Dict[str, Any]:
        self.params.update(params)
        res = {}
        for key, data in data_dict.items():
            if self._is_array_like(data):
                res[key] = self.apply_function_on_key(key, data)
            else:
                res[key] = data
        return res

    @staticmethod
    def _is_array_like(data: Any) -> bool:
        return isinstance(data, (np.ndarray, jax.Array))

    def apply_function_on_key(self, key: str, data: Any):
        if "image" in key:
            return self.apply_to_image(data)
        if "mask" in key:
            return self.apply_to_mask(data)
        if "box" in key:
            return self.apply_to_box(data)
        if "points" in key:
            return self.apply_to_point_cloud(data)
        return data

    # ------------------------------------------------------- apply methods
    def apply_to_image(self, data: Any):
        raise NotImplementedError(
            f"apply_to_image not implemented in {type(self).__name__}")

    def apply_to_mask(self, data: Any):
        raise NotImplementedError(
            f"apply_to_mask not implemented in {type(self).__name__}")

    def apply_to_box(self, data: Any):
        raise NotImplementedError(
            f"apply_to_box not implemented in {type(self).__name__}")

    def apply_to_point_cloud(self, data: Any):
        raise NotImplementedError(
            f"apply_to_point_cloud not implemented in {type(self).__name__}")

    # -------------------------------------------------------- serialization
    def __repr__(self):
        return json.dumps(self.to_dict(), indent=4, default=str)

    def to_dict(self) -> Dict[str, Any]:
        state = {"__class_fullname__": f"{type(self).__module__}.{type(self).__name__}",
                 "always_apply": self.always_apply, "p": self.p}
        state.update({k: getattr(self, k)
                      for k in self.get_transform_init_args_names()})
        state.update({"randomized_params": self.params})
        return state

    def get_transform_init_args_names(self) -> Tuple[str, ...]:
        return tuple()

    # --------------------------------------------------------- validators
    @staticmethod
    def check_range(value, name):
        if not (isinstance(value, (tuple, list)) and len(value) == 2
                and value[0] <= value[1]):
            raise ValueError(f"{name} must be an ordered (lo, hi) pair")
        return tuple(value)

    @staticmethod
    def check_positive_range(value, name):
        if not (isinstance(value, (tuple, list)) and len(value) == 2
                and 0 <= value[0] <= value[1]):
            raise ValueError(f"{name} must be an ordered non-negative pair")
        return tuple(value)


class ImageOnlyTransform(BaseTransform):
    """Applies only to keys containing 'image' (reference
    ``intensity_transforms.py:15-24``)."""

    def apply_function_on_key(self, key: str, data: Any):
        if "image" in key:
            return self.apply_to_image(data)
        return data


class DualTransform(BaseTransform):
    """Applies to 'image' and 'mask' keys (reference
    ``spatial_transforms.py:17-30``)."""

    def apply_function_on_key(self, key: str, data: Any):
        if "image" in key:
            return self.apply_to_image(data)
        if "mask" in key:
            return self.apply_to_mask(data)
        return data


class Compose:
    """Sequential composition; splits the RNG key across member transforms."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, data_dict: Dict[str, Any],
                 key: Optional[jax.Array] = None) -> Dict[str, Any]:
        keys = (jax.random.split(key, len(self.transforms))
                if key is not None else [None] * len(self.transforms))
        for transform, k in zip(self.transforms, keys):
            data_dict = transform(data_dict, k)
        return data_dict

    def __repr__(self):
        inner = ",\n".join(repr(t) for t in self.transforms)
        return f"Compose([\n{inner}\n])"


class ToDevice(BaseTransform):
    """numpy → device array (analog of the reference ``NumpyToTensor``,
    ``base.py:208-218``)."""

    def __init__(self):
        super().__init__(1.0, True)

    def apply_with_params(self, params, data_dict):
        return {k: (jax.numpy.asarray(v) if isinstance(v, np.ndarray) else v)
                for k, v in data_dict.items()}

    def __call__(self, data_dict, key=None):
        return self.apply_with_params({}, data_dict)


class ToHost(BaseTransform):
    """device array → numpy (analog of ``TensorToNumpy``, ``base.py:221-231``)."""

    def __init__(self):
        super().__init__(1.0, True)

    def __call__(self, data_dict, key=None):
        return {k: (np.asarray(v) if isinstance(v, jax.Array) else v)
                for k, v in data_dict.items()}
