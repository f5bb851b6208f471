"""Small CLI helpers shared by the entry points."""
from __future__ import annotations

import os
import re
from typing import Tuple


def apply_platform_env() -> None:
    """Honor ``JAX_PLATFORMS`` from the environment explicitly.

    Some PJRT plugin installs register their backend from ``sitecustomize``
    and win platform selection regardless of the env var; the config knob
    applied after import is the reliable override.  No-op when the var is
    unset (normal TPU operation), essential for running the entry points as
    subprocesses on the virtual CPU mesh (tests)."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax
        jax.config.update("jax_platforms", platforms)


def parse_size(value) -> Tuple[int, ...]:
    """Parse a size triple from CLI text: '(128,224,288)', '128,224,288',
    or '128 224 288'.  (The reference declares ``type=tuple`` which only
    works for the default value, ``train.py:30``.)"""
    if isinstance(value, (tuple, list)):
        return tuple(int(v) for v in value)
    nums = re.findall(r"-?\d+", str(value))
    if not nums:
        raise ValueError(f"cannot parse size from {value!r}")
    return tuple(int(n) for n in nums)


def parse_mesh(value):
    """Parse a mesh layout string like ``data=2,spatial=2,model=2`` into a
    :class:`~bodyct_dram_emph_subtype_tpu.parallel.mesh.MeshSpec`.

    Beyond-reference capability made user-reachable: the reference only
    ever data-parallelises (``--ngpus``, DDP); here the same CLI can also
    shard the volume's H axis ('spatial', XLA halo-exchanged convs) and the
    conv channels ('model', tensor parallelism)."""
    from ..parallel.mesh import MeshSpec

    if value is None or isinstance(value, MeshSpec):
        return value
    axes = {"data": 1, "spatial": 1, "model": 1}
    for part in str(value).split(","):
        part = part.strip()
        if not part:
            continue
        m = re.fullmatch(r"(data|spatial|model)\s*=\s*(\d+)", part)
        if not m:
            raise ValueError(
                f"cannot parse mesh axis {part!r} (expected e.g. "
                f"'data=2,spatial=2,model=2')")
        axes[m.group(1)] = int(m.group(2))
    return MeshSpec(**axes)
