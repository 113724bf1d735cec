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

from typing import Iterator, Tuple

import numpy as np


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

    def _load(self, idxs) -> Tuple[list, list]:
        images, targets = [], []
        for i in idxs:
            img, tgt = self.dataset[i]
            images.append(img)
            targets.append(tgt)
        return images, targets

    def __iter__(self) -> Iterator[Tuple[list, list]]:
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
            yield self.x[idx], self.y[idx]

    def __len__(self):
        return (len(self.x) + self.batch_size - 1) // self.batch_size
