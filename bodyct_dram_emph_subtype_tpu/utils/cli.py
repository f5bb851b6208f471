"""Small CLI helpers shared by the entry points."""
from __future__ import annotations

import re
from typing import Tuple


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
