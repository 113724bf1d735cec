"""Batch loaders for probe training — torch-free replacements for the
reference's ``DataLoader(collate_fn=collate_keep_pil)`` usage
(`/root/reference/probing/train/singletask_trainer.py:129-152`).

Two loaders:

- :class:`ImageBatchLoader`: yields ``(list[PIL.Image], list[label_dict])``
  from a dataset implementing ``__getitem__``/``__len__``, with optional
  shuffle or weighted sampler;
- :class:`ArrayBatchLoader`: yields ``(x [B,D], y [B])`` numpy slices of a
  cached feature tensor — the ``TensorDataset`` analogue.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterator, List, Tuple

import numpy as np


@dataclasses.dataclass
class Batch:
    """Typed training batch: declares its target representation instead of
    leaving consumers to sniff shapes (the reference's `_accumulate`
    try/except idiom, base_trainer.py:234-246, masked real format bugs).

    ``kind``:
      - ``"dicts"``: ``targets`` is ``list[dict[task, label]]`` (image
        loaders; -1/None = missing);
      - ``"array"``: ``targets`` is a dense ``np.ndarray`` of labels for a
        single task (cached-feature loaders).

    Unpacks like the 2-tuple it replaces: ``inputs, targets = batch``.
    """
    inputs: Any
    targets: Any
    kind: str = "dicts"

    def __iter__(self):
        yield self.inputs
        yield self.targets

    def valid_counts(self, tasks: List[str]) -> Dict[str, int]:
        """Per-task count of valid (label != -1) samples."""
        if self.kind == "array":
            y = np.asarray(self.targets)
            n = int((y != -1).sum()) if y.ndim else 1
            return {k: n for k in tasks}
        counts: Dict[str, int] = {}
        for k in tasks:
            counts[k] = sum(
                1 for t in self.targets
                if t.get(k, -1) is not None and int(t.get(k, -1)) != -1)
        return counts


class ImageBatchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 sampler=None, seed: int = 0, drop_last: bool = False,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.sampler = sampler
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)

    def _order(self):
        if self.sampler is not None:
            return list(self.sampler)
        if self.shuffle:
            return self._rng.permutation(len(self.dataset)).tolist()
        return list(range(len(self.dataset)))

    def _load(self, idxs) -> Batch:
        images, targets = [], []
        for i in idxs:
            img, tgt = self.dataset[i]
            images.append(img)
            targets.append(tgt)
        return Batch(images, targets, kind="dicts")

    def __iter__(self) -> Iterator[Batch]:
        order = self._order()
        bs = self.batch_size
        chunks = [order[s:s + bs] for s in range(0, len(order), bs)]
        if self.drop_last and chunks and len(chunks[-1]) < bs:
            chunks.pop()
        if self.prefetch > 0:
            # Host PIL decode for batch i+1 overlaps the device step for
            # batch i (the DataLoader-workers analogue).
            from ...data.pipeline import prefetch_batches
            yield from prefetch_batches(chunks, self._load,
                                        depth=self.prefetch)
        else:
            for idxs in chunks:
                yield self._load(idxs)

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else \
            len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size


class ArrayBatchLoader:
    def __init__(self, x: np.ndarray, y: np.ndarray, batch_size: int,
                 shuffle: bool = False, seed: int = 0):
        assert len(x) == len(y)
        self.x = x
        self.y = y
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        order = self._rng.permutation(len(self.x)) if self.shuffle \
            else np.arange(len(self.x))
        bs = self.batch_size
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            yield Batch(self.x[idx], self.y[idx], kind="array")

    def __len__(self):
        return (len(self.x) + self.batch_size - 1) // self.batch_size
