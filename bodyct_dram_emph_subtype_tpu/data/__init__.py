"""Data layer (the reference's L3 + its SimpleITK I/O, rebuilt first-party)."""
from .csv_utils import read_csv_in_dict
from .datasets import (
    CLE_RATIO_MAP,
    COPDGeneSubtyping,
    LABEL_TO_CLE,
    LABEL_TO_PSE,
    PSE_RATIO_MAP,
    SubtypingInference,
    ratio_to_label,
)
from .loader import DataLoader, default_collate
from .mha import MhaImage, read_mha, write_arrays_to_mha, write_mha
from .samplers import (
    SubtypingStratifiedSampler,
    balanced_class_weights,
    shard_indices,
)

__all__ = [
    "CLE_RATIO_MAP", "COPDGeneSubtyping", "DataLoader", "LABEL_TO_CLE",
    "LABEL_TO_PSE", "MhaImage", "PSE_RATIO_MAP", "SubtypingInference",
    "SubtypingStratifiedSampler", "balanced_class_weights", "default_collate",
    "ratio_to_label", "read_csv_in_dict", "read_mha", "shard_indices",
    "write_arrays_to_mha", "write_mha",
]
