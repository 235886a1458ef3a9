"""Ecosystem interop: scipy.sparse and jax.experimental.sparse bridges.

The reference's interop boundary is Eigen — every assembly path stages
through ``Eigen::SparseMatrix`` (reference spmv/Matrix.cpp:415-479,
spmv/read_petsc.cpp:126-209), so any Eigen user can hand it a matrix.
The Python-ecosystem equivalents are scipy.sparse (the host staging
format everyone already has) and jax.experimental.sparse's BCOO (the
JAX-native COO users may hold on device). Both bridge to/from
:class:`~spmv_tpu.formats.csr.CSRHost`, the universal import format all
device formats convert from.

Imports of scipy / jax.experimental.sparse are deferred to call time so
the package itself never requires them.
"""
from __future__ import annotations

import numpy as np

from spmv_tpu.formats.csr import CSRHost

__all__ = ["from_scipy", "to_scipy", "from_bcoo", "to_bcoo"]


def from_scipy(m) -> CSRHost:
    """Convert any 2-D ``scipy.sparse`` matrix/array to :class:`CSRHost`.

    Accepts every scipy sparse container (csr/csc/coo/lil/dok/dia/bsr,
    matrix or array API). Duplicates are summed and columns sorted per
    row (the canonical form every downstream converter assumes).
    """
    import scipy.sparse as sp

    if not sp.issparse(m):
        raise TypeError(f"expected a scipy.sparse matrix, got {type(m)!r}")
    if m.ndim != 2:
        raise ValueError(f"expected a 2-D sparse matrix, got shape {m.shape}")
    c = m.tocsr()
    # canonicalize: downstream conversions assume sorted, duplicate-free
    c.sum_duplicates()  # also sorts indices (scipy guarantees)
    out = CSRHost(
        rowptr=np.asarray(c.indptr, dtype=np.int64),
        colind=np.asarray(c.indices, dtype=np.int32),
        values=np.asarray(c.data),
        ncols=int(c.shape[1]),
    )
    out._sorted_unique = True
    return out


def to_scipy(a: CSRHost):
    """Convert a :class:`CSRHost` to ``scipy.sparse.csr_array``."""
    import scipy.sparse as sp

    return sp.csr_array(
        (a.values.copy(), a.colind.astype(np.int64), a.rowptr.astype(np.int64)),
        shape=a.shape,
    )


def from_bcoo(m) -> CSRHost:
    """Convert a 2-D ``jax.experimental.sparse.BCOO`` (or BCSR) to
    :class:`CSRHost`.

    Batch/dense dimensions are not supported (a distributed operator's
    batching axis is the mesh, not a format axis here). Duplicate
    indices are summed; padded/out-of-range entries (BCOO uses
    index==shape padding after e.g. ``bcoo_sum_duplicates``) are dropped.
    """
    from jax.experimental import sparse as jsparse

    if isinstance(m, jsparse.BCSR):
        m = m.to_bcoo()
    if not isinstance(m, jsparse.BCOO):
        raise TypeError(f"expected a jax BCOO/BCSR matrix, got {type(m)!r}")
    if m.n_batch or m.n_dense or len(m.shape) != 2:
        raise ValueError(
            "only plain 2-D BCOO (n_batch=0, n_dense=0) is supported; "
            f"got shape {m.shape}, n_batch={m.n_batch}, n_dense={m.n_dense}"
        )
    idx = np.asarray(m.indices)
    vals = np.asarray(m.data)
    nrows, ncols = int(m.shape[0]), int(m.shape[1])
    keep = (idx[:, 0] < nrows) & (idx[:, 1] < ncols)  # drop BCOO padding
    return CSRHost.from_coo(
        idx[keep, 0], idx[keep, 1], vals[keep], nrows, ncols
    )


def to_bcoo(a: CSRHost):
    """Convert a :class:`CSRHost` to ``jax.experimental.sparse.BCOO``
    (indices already unique and row-major sorted)."""
    from jax.experimental import sparse as jsparse

    rows = np.repeat(
        np.arange(a.nrows, dtype=np.int32), a.row_nnz()
    )
    indices = np.stack([rows, a.colind.astype(np.int32)], axis=1)
    return jsparse.BCOO(
        (a.values, indices),
        shape=a.shape,
        indices_sorted=getattr(a, "_sorted_unique", False),
        unique_indices=getattr(a, "_sorted_unique", False),
    )
