"""Bandwidth-reduction reordering (reverse Cuthill-McKee) + permutation.

The reference runs arbitrary CSR through vendor kernels (cuSPARSE,
reference spmv/cuda/csr_kernels.cuda.cu:106-151) and never reorders. On TPU
the fast SpMV formulations are window-local (DIA diagonals, the windowed
gather-ELL kernel), so concentrating nonzeros near the diagonal is a
first-class assembly step: RCM here typically shrinks an unstructured
matrix's bandwidth by orders of magnitude, which directly shrinks the
kernels' x-windows (and for near-banded matrices unlocks the DIA path).

All host-side, vectorized numpy: per-BFS-level frontier expansion uses
repeat/cumsum multi-slice gathers, no per-node Python loops.
"""
from __future__ import annotations

import numpy as np

from spmv_tpu.formats.csr import CSRHost


def bandwidth(a: CSRHost) -> int:
    """max |col - row| over stored entries (0 for diagonal/empty)."""
    if a.nnz == 0:
        return 0
    rows = np.repeat(np.arange(a.nrows, dtype=np.int64), a.row_nnz())
    return int(np.abs(a.colind.astype(np.int64) - rows).max())


def _neighbors_of(a: CSRHost, frontier: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated adjacency of all frontier nodes (vectorized multi-slice):
    returns (neighbor cols, index of the frontier parent per neighbor)."""
    starts = a.rowptr[frontier].astype(np.int64)
    cnt = (a.rowptr[frontier + 1] - a.rowptr[frontier]).astype(np.int64)
    total = int(cnt.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    shift = np.repeat(starts - np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
    nbr = a.colind[np.arange(total, dtype=np.int64) + shift].astype(np.int64)
    parent = np.repeat(np.arange(len(frontier), dtype=np.int64), cnt)
    return nbr, parent


def reverse_cuthill_mckee(a: CSRHost) -> np.ndarray:
    """RCM ordering of a structurally symmetric square matrix's graph.

    Returns ``order`` such that new row i is old row ``order[i]``. Matrices
    with non-symmetric structure still get a valid permutation (BFS runs on
    the out-edges); symmetrize first (A + A^T pattern) for best bandwidth.
    """
    if a.nrows != a.ncols:
        raise ValueError("RCM needs a square matrix")
    n = a.nrows
    deg = a.row_nnz().astype(np.int64)
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    deg_sorted = np.argsort(deg, kind="stable")  # start nodes: min degree
    ptr = 0
    while pos < n:
        while visited[deg_sorted[ptr]]:
            ptr += 1
        start = deg_sorted[ptr]
        visited[start] = True
        order[pos] = start
        pos += 1
        frontier = np.array([start], dtype=np.int64)
        while True:
            nbr, parent = _neighbors_of(a, frontier)
            mask = ~visited[nbr] if len(nbr) else np.empty(0, bool)
            nbr, parent = nbr[mask], parent[mask]
            if len(nbr) == 0:
                break
            # classic CM tie-breaking: group by parent's position in the
            # frontier, then ascending degree; first occurrence wins
            k = np.lexsort((deg[nbr], parent))
            nbr = nbr[k]
            _, first = np.unique(nbr, return_index=True)
            new = nbr[np.sort(first)]
            visited[new] = True
            order[pos : pos + len(new)] = new
            pos += len(new)
            frontier = new
    return order[::-1].copy()  # the "reverse" in RCM


def permute_symmetric(a: CSRHost, order: np.ndarray) -> CSRHost:
    """B[i, j] = A[order[i], order[j]] — simultaneous row+col permutation
    (preserves symmetry/SPD-ness, so CG on B solves the permuted system)."""
    inv = np.empty(len(order), dtype=np.int64)
    inv[order] = np.arange(len(order), dtype=np.int64)
    rows = np.repeat(np.arange(a.nrows, dtype=np.int64), a.row_nnz())
    return CSRHost.from_coo(
        inv[rows], inv[a.colind.astype(np.int64)], a.values,
        a.nrows, a.ncols, sum_duplicates=False,
    )


def rcm_reorder(a: CSRHost) -> tuple[CSRHost, np.ndarray]:
    """Convenience: symmetrize the pattern, compute RCM on it, and return
    (permuted matrix, order). ``order`` maps new->old; apply to vectors with
    x_new = x_old[order], and undo with y_old = y_new[inverse]."""
    if a.nrows != a.ncols:
        raise ValueError("rcm_reorder needs a square matrix")
    rows = np.repeat(np.arange(a.nrows, dtype=np.int64), a.row_nnz())
    cols = a.colind.astype(np.int64)
    sym = CSRHost.from_coo(
        np.concatenate([rows, cols]),
        np.concatenate([cols, rows]),
        np.ones(2 * a.nnz, dtype=np.float32),
        a.nrows, a.ncols, sum_duplicates=True,
    )
    order = reverse_cuthill_mckee(sym)
    return permute_symmetric(a, order), order
