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


def classify_shard(
    rows_l: np.ndarray | None,
    cols_g: np.ndarray,
    vals: np.ndarray,
    row_range: tuple[int, int],
    col_range: tuple[int, int],
    symmetric: bool = False,
    rowptr: np.ndarray | None = None,
) -> ShardCSR:
    """Classify one shard's triplets (local row index, GLOBAL column) into
    the local/remote blocks + ghost list + (symmetric) diagonal — the
    classification rules of reference spmv/Matrix.cpp:320-408, vectorized.

    With ``symmetric=True`` (requires col_range == row_range), only entries
    with global col <= global row are kept: the in-range strict lower
    triangle goes to ``local``, the diagonal to ``diagonal``, out-of-range
    entries to ``remote`` (reference spmv/Matrix.cpp:337-349).

    ``rowptr`` (fast path): when the entries are a CANONICAL CSR slice
    (grouped by ascending row per ``rowptr``, columns ascending within each
    row — e.g. ``CSRHost.extract_rows`` of a ``_sorted_unique`` matrix),
    masked subsequences stay canonical, so both blocks are built directly
    with boolean masks + prefix sums — no sort anywhere. This is the
    assembly hot path: the triplet path below re-sorts all nnz through
    ``from_coo`` (~13 s of the 51M-nnz headline assembly; the fast path
    measures ~4x cheaper same-run). Results are bitwise-identical
    (``tests/test_partition.py::test_classify_fast_path_bitwise``).
    ``rows_l`` may be None when ``rowptr`` is given (it is derived only if
    the symmetric masks need it).
    """
    r0, r1 = row_range
    c0, c1 = col_range
    nloc = r1 - r0
    cols_g = np.asarray(cols_g, dtype=np.int64)

    if rowptr is not None:
        rowptr = np.asarray(rowptr, dtype=np.int64)
        diag = None
        if symmetric:
            if (c0, c1) != (r0, r1):
                raise ValueError("symmetric storage requires row/col "
                                 "partitions to coincide (square matrix)")
            if rows_l is None:
                rows_l = np.repeat(np.arange(nloc, dtype=np.int64),
                                   np.diff(rowptr))
            else:
                rows_l = np.asarray(rows_l, dtype=np.int64)
            rows_g = rows_l + r0
            on_diag = cols_g == rows_g
            diag = np.zeros(nloc, dtype=vals.dtype)
            # duplicates on the diagonal sum (assembly semantics)
            np.add.at(diag, rows_l[on_diag], vals[on_diag])
            keep = cols_g < rows_g  # strict lower triangle only
            cs = np.zeros(len(cols_g) + 1, np.int64)
            cs[1:] = np.cumsum(keep)
            rowptr = cs[rowptr]
            cols_g, vals = cols_g[keep], vals[keep]
        is_local = (cols_g >= c0) & (cols_g < c1)
        cs = np.zeros(len(cols_g) + 1, np.int64)
        cs[1:] = np.cumsum(is_local)
        loc_ptr = cs[rowptr]
        local = CSRHost(loc_ptr, cols_g[is_local] - c0, vals[is_local],
                        max(c1 - c0, 1))
        rem_cols = cols_g[~is_local]
        ghosts = np.unique(rem_cols)
        remote = CSRHost(rowptr - loc_ptr, np.searchsorted(ghosts, rem_cols),
                         vals[~is_local], max(len(ghosts), 1))
        # masked subsequences of a canonical slice are canonical
        local._sorted_unique = True
        remote._sorted_unique = True
        return ShardCSR(
            local=local, remote=remote, ghosts=ghosts,
            row_range=(r0, r1), col_range=(c0, c1),
            diagonal=diag, symmetric=symmetric,
        )

    rows_l = np.asarray(rows_l, dtype=np.int64)
    diag = None
    if symmetric:
        if (c0, c1) != (r0, r1):
            raise ValueError("symmetric storage requires row/col partitions "
                             "to coincide (square matrix)")
        rows_g = rows_l + r0
        on_diag = cols_g == rows_g
        diag = np.zeros(nloc, dtype=vals.dtype)
        # duplicates on the diagonal sum (assembly semantics)
        np.add.at(diag, rows_l[on_diag], vals[on_diag])
        keep = cols_g < rows_g  # strict lower triangle only
        rows_l, cols_g, vals = rows_l[keep], cols_g[keep], vals[keep]

    is_local = (cols_g >= c0) & (cols_g < c1)
    ghosts = np.unique(cols_g[~is_local])
    ncol_local = c1 - c0
    local = CSRHost.from_coo(
        rows_l[is_local], cols_g[is_local] - c0, vals[is_local],
        nloc, max(ncol_local, 1), sum_duplicates=False,
    )
    ghost_pos = np.searchsorted(ghosts, cols_g[~is_local])
    remote = CSRHost.from_coo(
        rows_l[~is_local], ghost_pos, vals[~is_local],
        nloc, max(len(ghosts), 1), sum_duplicates=False,
    )
    return ShardCSR(
        local=local,
        remote=remote,
        ghosts=ghosts,
        row_range=(r0, r1),
        col_range=(c0, c1),
        diagonal=diag,
        symmetric=symmetric,
    )


def partition_csr(
    a: CSRHost,
    num_shards: int,
    symmetric: bool = False,
) -> list[ShardCSR]:
    """Split a global CSR into row-block shards with local/remote column
    separation — the local/remote matrix split that enables comm/compute
    overlap (reference spmv/Matrix.h:116-117, Matrix.cpp:498-511).

    Rectangular matrices partition rows and columns independently
    (near-equal chunking on each side); x is column-partitioned, y
    row-partitioned. ``symmetric=True`` requires square.
    """
    row_ranges = owner_ranges(a.nrows, num_shards)
    col_ranges = (row_ranges if a.nrows == a.ncols
                  else owner_ranges(a.ncols, num_shards))
    canonical = getattr(a, "_sorted_unique", False)
    shards = []
    for s in range(num_shards):
        r0, r1 = int(row_ranges[s]), int(row_ranges[s + 1])
        rows_slice = a.extract_rows(r0, r1)
        if canonical:
            # canonical CSR slice: the no-sort mask/prefix-sum path
            shards.append(
                classify_shard(
                    None, rows_slice.colind, rows_slice.values,
                    (r0, r1), (int(col_ranges[s]), int(col_ranges[s + 1])),
                    symmetric=symmetric, rowptr=rows_slice.rowptr,
                )
            )
            continue
        lens = rows_slice.row_nnz()
        rows_l = np.repeat(np.arange(r1 - r0, dtype=np.int64), lens)
        shards.append(
            classify_shard(
                rows_l, rows_slice.colind, rows_slice.values,
                (r0, r1), (int(col_ranges[s]), int(col_ranges[s + 1])),
                symmetric=symmetric,
            )
        )
    return shards
