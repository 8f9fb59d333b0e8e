"""Datasets and batch iteration (ref /root/reference/data_loader.py).

No torch DataLoader: batches are plain lists of [N,3] int32 numpy arrays
(device-side collation happens inside the jitted step via ops.build).  The
whole-dataset RAM cache matches the reference (data_loader.py:74-84); an
infinite repeating iterator covers the InfSampler use case — without the
reference's shuffle=False crash (data_loader.py:24-28)."""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np

from pcgcv2_tpu.data.io import load_coords


class PCDataset:
    """Point-cloud files (.h5 / .ply) with in-RAM caching."""

    def __init__(self, files: Sequence[str], cache: bool = True):
        self.files = list(files)
        self._cache = {} if cache else None

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        coords = load_coords(self.files[idx]).astype(np.int32)
        if self._cache is not None:
            self._cache[idx] = coords
        return coords


def iterate_batches(
    dataset: PCDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    repeat: bool = False,
    drop_last: bool = False,
) -> Iterator[List[np.ndarray]]:
    """Yield lists of coord arrays (one list = one collated batch)."""
    rng = np.random.RandomState(seed)
    epoch = 0
    while True:
        order = np.arange(len(dataset))
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order), batch_size):
            idxs = order[i : i + batch_size]
            if drop_last and len(idxs) < batch_size:
                continue
            yield [dataset[int(j)] for j in idxs]
        epoch += 1
        if not repeat:
            return
