"""1-D row-block partitioning + ghost discovery (host side, vectorized numpy).

The reference's ownership model (SURVEY.md section 2.10): each shard owns a
contiguous global row range computed by near-equal chunking
(reference spmv/read_petsc.cpp:20-36 ``owner_ranges``); any column index
outside the owned range is a ghost, appended as a tail after the owned
entries (reference spmv/L2GMap.h:28-31). This module computes those ranges,
discovers each shard's ghost set, and renumbers columns into local+tail
numbering — all as vectorized numpy (SURVEY.md section 7 risk 5: per-element
maps would be the assembly bottleneck at 100M rows).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from spmv_tpu.formats.csr import CSRHost


def owner_ranges(global_size: int, num_shards: int) -> np.ndarray:
    """Near-equal contiguous ranges: (num_shards+1,) int64 prefix array.

    Matches the reference's chunking (read_petsc.cpp:20-36): the first
    ``global_size % num_shards`` shards get one extra row.
    """
    base, rem = divmod(global_size, num_shards)
    sizes = np.full(num_shards, base, dtype=np.int64)
    sizes[:rem] += 1
    return np.concatenate([[0], np.cumsum(sizes)])


def owner_of(ranges: np.ndarray, global_idx: np.ndarray) -> np.ndarray:
    """Owning shard of each global index (vectorized upper_bound, the same
    lookup as reference spmv/L2GMap.cpp:375-381)."""
    return np.searchsorted(ranges, np.asarray(global_idx), side="right") - 1


@dataclasses.dataclass
class ShardCSR:
    """One shard's rows in local column numbering.

    local:       CSR block whose columns are owned locals [0, nlocal)
    remote:      CSR block whose columns index the ghost list [0, nghosts)
    ghosts:      sorted global column indices of ghosts
    row_range:   (r0, r1) owned global rows
    col_range:   (c0, c1) owned global cols
    diagonal:    dense diagonal (present only when symmetric)
    symmetric:   lower-triangle-only storage active
    """

    local: CSRHost
    remote: CSRHost
    ghosts: np.ndarray
    row_range: tuple[int, int]
    col_range: tuple[int, int]
    diagonal: np.ndarray | None = None
    symmetric: bool = False

    @property
    def nlocal(self) -> int:
        return self.row_range[1] - self.row_range[0]

    @property
    def nghosts(self) -> int:
        return len(self.ghosts)


def partition_csr(
    a: CSRHost,
    num_shards: int,
    symmetric: bool = False,
) -> list[ShardCSR]:
    """Split a global square CSR into row-block shards with local/remote
    column separation — the local/remote matrix split that enables comm/
    compute overlap (reference spmv/Matrix.h:116-117, Matrix.cpp:498-511).

    With ``symmetric=True``, each shard keeps only entries with
    global col <= global row of its owned rows: the in-range strict lower
    triangle goes to ``local``, the diagonal to ``diagonal``, and
    out-of-range (col < row_range start) entries to ``remote`` — mirroring
    the classification rules of reference spmv/Matrix.cpp:337-349.
    """
    if a.nrows != a.ncols:
        raise ValueError("partition_csr requires a square global matrix")
    ranges = owner_ranges(a.nrows, num_shards)
    shards = []
    for s in range(num_shards):
        r0, r1 = int(ranges[s]), int(ranges[s + 1])
        rows_slice = a.extract_rows(r0, r1)
        nloc = r1 - r0
        lens = rows_slice.row_nnz()
        rows_l = np.repeat(np.arange(nloc, dtype=np.int64), lens)
        cols_g = rows_slice.colind.astype(np.int64)
        vals = rows_slice.values

        diag = None
        if symmetric:
            rows_g = rows_l + r0
            on_diag = cols_g == rows_g
            diag = np.zeros(nloc, dtype=vals.dtype)
            diag[rows_l[on_diag]] = vals[on_diag]
            keep = cols_g < rows_g  # strict lower triangle only
            rows_l, cols_g, vals = rows_l[keep], cols_g[keep], vals[keep]

        is_local = (cols_g >= r0) & (cols_g < r1)
        ghosts = np.unique(cols_g[~is_local])
        local = CSRHost.from_coo(
            rows_l[is_local], cols_g[is_local] - r0, vals[is_local],
            nloc, nloc, sum_duplicates=False,
        )
        ghost_pos = np.searchsorted(ghosts, cols_g[~is_local])
        remote = CSRHost.from_coo(
            rows_l[~is_local], ghost_pos, vals[~is_local],
            nloc, max(len(ghosts), 1), sum_duplicates=False,
        )
        shards.append(
            ShardCSR(
                local=local,
                remote=remote,
                ghosts=ghosts,
                row_range=(r0, r1),
                col_range=(r0, r1),
                diagonal=diag,
                symmetric=symmetric,
            )
        )
    return shards
