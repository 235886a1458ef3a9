"""Host-side CSR container (numpy), the universal import format.

Plays the role of the reference's Eigen::SparseMatrix staging buffers used
during assembly (reference spmv/Matrix.cpp:415-479, spmv/read_petsc.cpp:126-209).
All device formats are converted from this.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CSRHost:
    """A host (numpy) CSR matrix with int32 indices.

    rowptr: (nrows+1,) int32/int64
    colind: (nnz,) int32
    values: (nnz,) float dtype
    ncols:  number of columns (may exceed max colind + 1)
    """

    rowptr: np.ndarray
    colind: np.ndarray
    values: np.ndarray
    ncols: int

    def __post_init__(self) -> None:
        self.rowptr = np.asarray(self.rowptr)
        self.colind = np.asarray(self.colind, dtype=np.int32)
        self.values = np.asarray(self.values)
        if self.rowptr.ndim != 1 or self.colind.ndim != 1 or self.values.ndim != 1:
            raise ValueError("rowptr/colind/values must be 1-D")
        if self.colind.shape != self.values.shape:
            raise ValueError("colind and values must have equal length")
        if self.rowptr[0] != 0 or self.rowptr[-1] != len(self.values):
            raise ValueError("rowptr must start at 0 and end at nnz")
        if np.any(np.diff(self.rowptr) < 0):
            raise ValueError("rowptr must be non-decreasing")
        if len(self.colind) and (self.colind.min() < 0 or self.colind.max() >= self.ncols):
            raise ValueError("column index out of range")

    @property
    def nrows(self) -> int:
        return len(self.rowptr) - 1

    @property
    def nnz(self) -> int:
        return len(self.values)

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def shape(self) -> tuple[int, int]:
        return (self.nrows, self.ncols)

    def row_nnz(self) -> np.ndarray:
        return np.diff(self.rowptr).astype(np.int32)

    @classmethod
    def from_coo(
        cls,
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        nrows: int,
        ncols: int,
        sum_duplicates: bool = True,
    ) -> "CSRHost":
        """Build CSR from triplets (rows sorted stably; duplicates summed).

        Native tier (f32/f64 values): counting scatter by row + per-row
        stable sort — O(nnz), bitwise-identical to the numpy lexsort
        tier below (same stability, same f64 duplicate accumulation
        order); the global lexsort dominates assembly at scale."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)
        if vals.dtype in (np.float32, np.float64) and nrows >= 0:
            from spmv_tpu.native.lib import get_lib

            lib = get_lib()
            if lib is not None:
                import ctypes

                i64p = ctypes.POINTER(ctypes.c_int64)
                i32p = ctypes.POINTER(ctypes.c_int32)
                rows_c = np.ascontiguousarray(rows)
                cols_c = np.ascontiguousarray(cols)
                vals_c = np.ascontiguousarray(vals)
                fp = (ctypes.POINTER(ctypes.c_double)
                      if vals.dtype == np.float64
                      else ctypes.POINTER(ctypes.c_float))
                fn = (lib.spmv_from_coo_f64 if vals.dtype == np.float64
                      else lib.spmv_from_coo_f32)
                rowptr = np.empty(nrows + 1, np.int64)
                out_cols = np.empty(max(len(rows_c), 1), np.int32)
                out_vals = np.empty(max(len(rows_c), 1), vals.dtype)
                m = fn(rows_c.ctypes.data_as(i64p),
                       cols_c.ctypes.data_as(i64p),
                       vals_c.ctypes.data_as(fp),
                       ctypes.c_int64(len(rows_c)),
                       ctypes.c_int64(nrows),
                       rowptr.ctypes.data_as(i64p),
                       out_cols.ctypes.data_as(i32p),
                       out_vals.ctypes.data_as(fp),
                       ctypes.c_int32(1 if sum_duplicates else 0))
                if m >= 0:
                    out = cls(rowptr=rowptr, colind=out_cols[:m].copy(),
                              values=out_vals[:m].copy(), ncols=ncols)
                    out._sorted_unique = bool(sum_duplicates)
                    return out
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        if sum_duplicates and len(rows):
            key_new = np.empty(len(rows), dtype=bool)
            key_new[0] = True
            key_new[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
            group = np.cumsum(key_new) - 1
            rows = rows[key_new]
            cols = cols[key_new]
            if np.iscomplexobj(vals):
                vals = (np.bincount(group, weights=vals.real)
                        + 1j * np.bincount(group, weights=vals.imag)
                        ).astype(vals.dtype)
            else:
                vals = np.bincount(group, weights=vals).astype(vals.dtype)
        rowptr = np.zeros(nrows + 1, dtype=np.int64)
        np.add.at(rowptr, rows + 1, 1)
        rowptr = np.cumsum(rowptr)
        out = cls(rowptr=rowptr, colind=cols.astype(np.int32), values=vals,
                  ncols=ncols)
        # lexsorted (+ summed) triplets are strictly column-increasing per
        # row — downstream conversions skip their canonicality scan
        # (a full-nnz pass that costs ~10 s at 100M rows on this host)
        out._sorted_unique = bool(sum_duplicates)
        return out

    @classmethod
    def from_dense(cls, dense: np.ndarray) -> "CSRHost":
        dense = np.asarray(dense)
        rows, cols = np.nonzero(dense)
        return cls.from_coo(rows, cols, dense[rows, cols], dense.shape[0], dense.shape[1])

    def to_dense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=self.values.dtype)
        rows = np.repeat(np.arange(self.nrows), self.row_nnz())
        np.add.at(out, (rows, self.colind), self.values)
        return out

    def matvec(self, x: np.ndarray) -> np.ndarray:
        """Sequential oracle SpMV — the test reference, mirroring the dense
        row-loop oracle of reference tests/test_spmv.cpp:72-80 (bincount is
        the vectorized segment-sum; row order within a row is preserved by
        construction, summation order may differ from a literal row loop by
        ULPs only)."""
        rows = np.repeat(np.arange(self.nrows), self.row_nnz())
        acc_t = (np.complex128 if (np.iscomplexobj(self.values)
                                   or np.iscomplexobj(x)) else np.float64)
        prod = self.values.astype(acc_t) * np.asarray(x, dtype=acc_t)[self.colind]
        if acc_t is np.complex128:
            out = (np.bincount(rows, weights=prod.real, minlength=self.nrows)
                   + 1j * np.bincount(rows, weights=prod.imag,
                                      minlength=self.nrows))
        else:
            out = np.bincount(rows, weights=prod, minlength=self.nrows)
        return out.astype(np.result_type(self.values, x))

    def transpose(self) -> "CSRHost":
        rows = np.repeat(np.arange(self.nrows), self.row_nnz())
        return CSRHost.from_coo(
            self.colind, rows, self.values, self.ncols, self.nrows, sum_duplicates=False
        )

    def extract_rows(self, start: int, stop: int) -> "CSRHost":
        """Row slice [start, stop) keeping global column indices."""
        lo, hi = self.rowptr[start], self.rowptr[stop]
        rowptr = (self.rowptr[start : stop + 1] - lo).astype(np.int64)
        out = CSRHost(rowptr, self.colind[lo:hi], self.values[lo:hi], self.ncols)
        # a row slice of a canonical (sorted, duplicate-free) matrix stays
        # canonical — propagate so downstream can take the no-sort paths
        out._sorted_unique = getattr(self, "_sorted_unique", False)
        return out

    def split_lower_diag(self) -> tuple["CSRHost", np.ndarray]:
        """Return (strict lower triangle, dense diagonal vector).

        The symmetric storage optimization: keep only L and D of A = L+D+L^T
        (reference spmv/Matrix.cpp:337-349, spmv/csr_kernels.cpp:26-51).
        """
        rows = np.repeat(np.arange(self.nrows), self.row_nnz())
        diag = np.zeros(min(self.nrows, self.ncols), dtype=self.values.dtype)
        on_diag = rows == self.colind
        diag[rows[on_diag]] = self.values[on_diag]
        keep = rows > self.colind
        lower = CSRHost.from_coo(
            rows[keep], self.colind[keep], self.values[keep], self.nrows, self.ncols,
            sum_duplicates=False,
        )
        return lower, diag


def csr_matmul(a: CSRHost, b: CSRHost, native: bool = True) -> CSRHost:
    """C = A @ B on host CSR, f64 values out. Two tiers: a native Gustavson
    SpGEMM (dense accumulator, O(flops), no global sorts — AMG setup at 1M
    rows spent 48 of 82 s in the numpy tier) and the vectorized numpy ESC
    fallback (expand every (A nonzero) x (matching B row), lexsort,
    compress). Accumulation order differs between tiers by ULPs only.
    Intended for setup-time products (AMG triple products, explicit split
    operators G A G^T for preconditioned CA-CG) on stencil-width rows."""
    if a.ncols != b.nrows:
        raise ValueError(f"shape mismatch: ({a.nrows},{a.ncols}) @ "
                         f"({b.nrows},{b.ncols})")
    if (native and not np.iscomplexobj(a.values)
            and not np.iscomplexobj(b.values)):
        from spmv_tpu.native.lib import get_lib

        lib = get_lib()
        if lib is not None:
            import ctypes

            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            f64p = ctypes.POINTER(ctypes.c_double)
            a_rp = np.ascontiguousarray(a.rowptr, np.int64)
            a_ci = np.ascontiguousarray(a.colind, np.int32)
            a_v = np.ascontiguousarray(a.values, np.float64)
            b_rp = np.ascontiguousarray(b.rowptr, np.int64)
            b_ci = np.ascontiguousarray(b.colind, np.int32)
            b_v = np.ascontiguousarray(b.values, np.float64)
            # ESC expansion bound >= nnz(C)
            cap = int((b_rp[a_ci.astype(np.int64) + 1]
                       - b_rp[a_ci.astype(np.int64)]).sum())
            c_rp = np.empty(a.nrows + 1, np.int64)
            c_ci = np.empty(max(cap, 1), np.int32)
            c_v = np.empty(max(cap, 1), np.float64)
            m = lib.spmv_spgemm_f64(
                a_rp.ctypes.data_as(i64p), a_ci.ctypes.data_as(i32p),
                a_v.ctypes.data_as(f64p), ctypes.c_int64(a.nrows),
                b_rp.ctypes.data_as(i64p), b_ci.ctypes.data_as(i32p),
                b_v.ctypes.data_as(f64p), ctypes.c_int64(b.ncols),
                c_rp.ctypes.data_as(i64p), c_ci.ctypes.data_as(i32p),
                c_v.ctypes.data_as(f64p), ctypes.c_int64(cap))
            if m >= 0:
                out = CSRHost(c_rp, c_ci[:m].copy(), c_v[:m].copy(),
                              b.ncols)
                out._sorted_unique = True
                return out
    lens_a = a.row_nnz().astype(np.int64)
    rows_a = np.repeat(np.arange(a.nrows, dtype=np.int64), lens_a)
    cols_a = a.colind.astype(np.int64)
    rep = (b.rowptr[cols_a + 1] - b.rowptr[cols_a]).astype(np.int64)
    total = int(rep.sum())
    out_rows = np.repeat(rows_a, rep)
    grp_off = np.zeros(len(rep), np.int64)
    np.cumsum(rep[:-1], out=grp_off[1:])
    inner = (np.arange(total, dtype=np.int64) - np.repeat(grp_off, rep)
             + np.repeat(b.rowptr[cols_a], rep))
    out_vals = np.repeat(a.values.astype(np.float64), rep) * b.values[inner]
    return CSRHost.from_coo(out_rows, b.colind[inner].astype(np.int64),
                            out_vals, a.nrows, b.ncols)
