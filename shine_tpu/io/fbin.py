"""big-ann-benchmarks binary vector file I/O.

Format: ``[n: u32][dim: u32][n*dim elements]`` with the element dtype implied
by the file extension — ``.fbin`` float32, ``.u8bin`` uint8, ``.i8bin`` int8,
``.bin`` uint32 (ground truth ids). Matches the reference reader
(/root/reference/src/io/read_data.hh:21-33) including the byte→float widening
done by its deserializer (/root/reference/src/io/deserializer.hh:23-44).
"""

from __future__ import annotations

import os

import numpy as np

_EXT_DTYPE = {
    ".fbin": np.float32,
    ".u8bin": np.uint8,
    ".i8bin": np.int8,
    ".bin": np.uint32,
}


def _dtype_for(path: str) -> np.dtype:
    for ext, dt in _EXT_DTYPE.items():
        if path.endswith(ext):
            return np.dtype(dt)
    raise ValueError(f"cannot infer dtype from extension of {path!r}")


def read_bin_header(path: str) -> tuple[int, int]:
    """Return (n, dim) without reading the payload."""
    with open(path, "rb") as f:
        hdr = np.fromfile(f, dtype=np.uint32, count=2)
    if hdr.size != 2:
        raise ValueError(f"{path}: truncated header")
    return int(hdr[0]), int(hdr[1])


def read_bin(
    path: str,
    *,
    max_rows: int | None = None,
    row_filter: tuple[int, int] | None = None,
    widen: bool = True,
) -> np.ndarray:
    """Read a big-ann binary file into an (n, dim) array.

    row_filter=(shard, num_shards) keeps rows with ``id % num_shards ==
    shard`` — the reference's round-robin partitioning of base vectors
    across compute nodes (/root/reference/src/io/read_data.hh:57-77).
    widen=True converts integer element types to float32.
    """
    dt = _dtype_for(path)
    n, dim = read_bin_header(path)
    count = n * dim
    data = np.memmap(path, dtype=dt, mode="r", offset=8, shape=(n, dim))
    if row_filter is not None:
        shard, num_shards = row_filter
        data = data[shard::num_shards]
    if max_rows is not None:
        data = data[:max_rows]
    out = np.asarray(data)
    if widen and out.dtype != np.float32 and not path.endswith(".bin"):
        out = out.astype(np.float32)
    del count
    return out


def write_bin(path: str, arr: np.ndarray) -> None:
    dt = _dtype_for(path)
    arr = np.ascontiguousarray(arr, dtype=dt)
    if arr.ndim != 2:
        raise ValueError("expected a 2-D array")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        np.asarray(arr.shape, dtype=np.uint32).tofile(f)
        arr.tofile(f)
