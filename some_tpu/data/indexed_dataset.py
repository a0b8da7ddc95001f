"""Random-access binarized dataset store (HDF5).

File format is identical to the reference's indexed dataset
(reference: utils/indexed_datasets.py:10-77): ``{prefix}.data`` is an HDF5
file with one group per item index ("0", "1", ...) and one dataset per
attribute, plus a sibling ``{prefix}.lengths`` numpy file with per-item frame
counts. Reference-binarized data therefore loads directly.

Items are returned as plain numpy dicts — the host data plane stays
framework-free; device placement happens at the train/infer step boundary.
"""
from __future__ import annotations

import pathlib
from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover - h5py is present in the target image
    h5py = None


class IndexedDataset:
    """Lazy-opening reader; safe to hand to forked/spawned workers."""

    def __init__(self, path: pathlib.Path | str, prefix: str):
        self.path = pathlib.Path(path) / f"{prefix}.data"
        if not self.path.exists():
            raise FileNotFoundError(f"IndexedDataset not found: {self.path}")
        self._file = None

    def _ensure_open(self):
        if self._file is None:
            if h5py is None:
                raise RuntimeError("h5py is required to read indexed datasets")
            self._file = h5py.File(self.path, "r")
        return self._file

    def __len__(self) -> int:
        return len(self._ensure_open())

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        f = self._ensure_open()
        if index < 0 or index >= len(f):
            raise IndexError(f"index {index} out of range")
        group = f[str(index)]
        return {
            key: (value[()].item() if value.shape == () else np.asarray(value[()]))
            for key, value in group.items()
        }

    def attr_length(self, index: int, key: str) -> int:
        """Leading-axis length of one attribute, from HDF5 shape metadata
        only (no data read) — used for cross-rank shape agreement in
        multi-host training."""
        f = self._ensure_open()
        ds = f[f"{index}/{key}"]
        return int(ds.shape[0]) if ds.shape else 0

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class IndexedDatasetWriter:
    """Sequential writer; call finalize() (or use as context manager)."""

    def __init__(self, path: pathlib.Path | str, prefix: str,
                 allowed_attrs: Optional[Sequence[str]] = None):
        if h5py is None:
            raise RuntimeError("h5py is required to write indexed datasets")
        pathlib.Path(path).mkdir(parents=True, exist_ok=True)
        self.path = pathlib.Path(path) / f"{prefix}.data"
        self.prefix = prefix
        self.allowed_attrs = set(allowed_attrs) if allowed_attrs is not None else None
        self._file = h5py.File(self.path, "w")
        self._count = 0

    def add_item(self, item: Dict[str, np.ndarray]) -> int:
        idx = self._count
        self._count += 1
        for key, value in item.items():
            if value is None:
                continue
            if self.allowed_attrs is not None and key not in self.allowed_attrs:
                continue
            self._file.create_dataset(f"{idx}/{key}", data=value)
        return idx

    def finalize(self):
        if self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finalize()


def save_lengths(path: pathlib.Path | str, prefix: str, lengths: List[int]) -> None:
    with open(pathlib.Path(path) / f"{prefix}.lengths", "wb") as f:
        np.save(f, lengths)


def load_lengths(path: pathlib.Path | str, prefix: str) -> np.ndarray:
    return np.load(pathlib.Path(path) / f"{prefix}.lengths")
