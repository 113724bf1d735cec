"""Datasets layer: disk-layout datasets, label parsers, factory, composition.

Mirrors the capability surface of the reference's ``datasets_vlm`` package
(see SURVEY.md §2 items 10-15) with TPU-first bulk-metadata accessors used by
the batched input pipeline.
"""

from .augment import train_augmentation
from .base_dataset import BASE_PATH, BaseDataset
from .dataset_factory import DatasetFactory, aggregate_counts_from_datasets
from .face_dataset import FaceDataset
from .mivia_par_dataset import MiviaParDataset
from .multitask_dataset import (MISSING_LABEL, BalancedMultiTaskDataset,
                                MultiTaskDataset)
from .native_loader import load_batch, native_available
from .pipeline import prefetch_batches
from .tokenizer import ByteTokenizer, HFTokenizer, load_tokenizer

__all__ = [
    "train_augmentation", "BASE_PATH", "BaseDataset", "DatasetFactory",
    "aggregate_counts_from_datasets", "FaceDataset", "MiviaParDataset",
    "MISSING_LABEL", "BalancedMultiTaskDataset", "MultiTaskDataset",
    "load_batch", "native_available", "prefetch_batches", "ByteTokenizer",
    "HFTokenizer", "load_tokenizer",
]
