"""DIA SpMV: y = alpha * A @ x + beta * y for banded matrices.

The stencil fast path: SpMV over diagonal storage is a static set of shifted
elementwise multiply-adds — no gather, no indices read from memory at all.
XLA fuses the whole thing into one streaming pass over ``a.data``, which is
the HBM-roofline-optimal formulation for the Laplacian benchmarks
(BASELINE.md). Compare the reference, which runs even stencil matrices
through general CSR (reference demos/CreateA.cpp + spmv/csr_kernels.cpp).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from spmv_tpu.formats.dia import DiaMatrix


def spmv_dia(
    a: DiaMatrix,
    x: jax.Array,
    alpha=1.0,
    beta=0.0,
    y: jax.Array | None = None,
    method: str = "auto",
) -> jax.Array:
    """Apply a DIA matrix. x must have length >= a.ncols. Returns length
    a.nrows_pad (rows >= a.nrows zero-padded, as in spmv_ell).

    method: "auto" uses the Pallas kernel on TPU when the layout supports it
    (see spmv_dia_pallas), else the fused-XLA formulation; "xla"/"pallas"
    force a path.
    """
    if method != "xla":
        from spmv_tpu.ops.spmv_dia_pallas import (
            dia_pallas_supported,
            spmv_dia_pallas,
        )

        use_pallas = method == "pallas" or (
            jax.default_backend() == "tpu" and dia_pallas_supported(a, x)
        )
        if use_pallas:
            out = spmv_dia_pallas(a, x)
            if y is None:
                return alpha * out
            npad_ = a.nrows_pad
            yp_ = y if y.shape[0] == npad_ else jnp.pad(
                y[:npad_], (0, max(0, npad_ - y.shape[0]))
            )
            return alpha * out + beta * yp_
    npad = a.nrows_pad
    omin = min(min(a.offsets), 0)
    # symmetric storage implies the mirrored (positive) offsets too
    omax = max(max(a.offsets), (-omin) if a.symmetric else 0)
    # Window of x covering every diagonal's reach, one pad, static slices after.
    span = npad + omax - omin
    xw = jnp.zeros(span, dtype=x.dtype)
    take = min(x.shape[0], a.ncols)
    xw = jax.lax.dynamic_update_slice(xw, x[:take], (-omin,))
    data = a.data_flat
    dpad = jnp.pad(data, ((0, 0), (0, -omin))) if (a.symmetric and omin < 0) else data
    out = None
    for d, off in enumerate(a.offsets):
        term = data[d] * jax.lax.dynamic_slice(xw, (off - omin,), (npad,))
        out = term if out is None else out + term
        if a.symmetric and off < 0:
            # transpose of diagonal `off` = diagonal -off with shifted data:
            # y[i] += A[i-off, i] * x[i-off] = d_off[i-off] * x[i-off]
            s = -off
            out = out + (
                jax.lax.dynamic_slice(dpad[d], (s,), (npad,))
                * jax.lax.dynamic_slice(xw, (s - omin,), (npad,))
            )
    if y is None:
        return alpha * out
    yp = y if y.shape[0] == npad else jnp.pad(y[:npad], (0, max(0, npad - y.shape[0])))
    return alpha * out + beta * yp
