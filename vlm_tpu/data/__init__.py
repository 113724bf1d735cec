"""Datasets layer: disk-layout datasets, label parsers, factory, composition.

Mirrors the capability surface of the reference's ``datasets_vlm`` package
(see SURVEY.md §2 items 10-15) with TPU-first bulk-metadata accessors used by
the batched input pipeline.
"""

from .base_dataset import BASE_PATH, BaseDataset
from .dataset_factory import DatasetFactory, aggregate_counts_from_datasets
from .face_dataset import FaceDataset
from .mivia_par_dataset import MiviaParDataset
from .multitask_dataset import (MISSING_LABEL, BalancedMultiTaskDataset,
                                MultiTaskDataset)

__all__ = [
    "BASE_PATH", "BaseDataset", "DatasetFactory",
    "aggregate_counts_from_datasets", "FaceDataset", "MiviaParDataset",
    "MISSING_LABEL", "BalancedMultiTaskDataset", "MultiTaskDataset",
]
