"""Sparse matrix-vector products in ELL layout.

The multi-RHS SpMV is the hot kernel of the PCG solve (reference
equivalent: SuperLU factorization inside scipy.spsolve, solver.py:773).
Two implementations:

* ``ell_matvec`` — pure XLA: one gather + weighted reduction.  XLA fuses
  this well and it is the portable default (CPU tests, TPU fallback).
* ``ell_matvec_pallas`` — a Pallas TPU kernel that blocks rows and keeps
  the (padded) multivector resident in VMEM, avoiding the (N, K, R)
  gather temporary that the XLA path materializes.

Both compute  y = diag * x + OffDiag @ x  where the ELL arrays hold the
off-diagonal entries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def ell_matvec(cols: jnp.ndarray, vals: jnp.ndarray, diag: jnp.ndarray,
               x: jnp.ndarray) -> jnp.ndarray:
    """XLA ELL SpMV.

    cols/vals: (N, K); diag: (N,); x: (N, R) or (N,).
    """
    if x.ndim == 1:
        gathered = x[cols]                      # (N, K)
        off = (vals * gathered).sum(axis=1)
        return diag * x + off
    gathered = x[cols]                          # (N, K, R)
    off = jnp.einsum("nk,nkr->nr", vals, gathered)
    return diag[:, None] * x + off


def _pallas_kernel(cols_ref, vals_ref, diag_ref, x_ref, out_ref):
    """One row-block: out = diag * x_rows + sum_k vals[:,k] * x[cols[:,k]].

    x_ref holds the FULL multivector (N_pad, R) in VMEM; cols/vals/diag
    are the current row block.
    """
    cols = cols_ref[:]                    # (BN, K)
    vals = vals_ref[:]                    # (BN, K)
    x = x_ref[:]                          # (N_pad, R)
    block = cols_ref.shape[0]
    k = cols_ref.shape[1]
    i = jax.lax.broadcasted_iota(jnp.int32, (block,), 0)
    import jax.experimental.pallas as pl  # local import keeps CPU paths light

    row_start = pl.program_id(0) * block
    acc = diag_ref[:][:, None] * x[pl.dslice(None)][row_start + i, :]
    for kk in range(k):
        acc = acc + vals[:, kk][:, None] * x[cols[:, kk], :]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("block_rows",))
def ell_matvec_pallas(cols, vals, diag, x, block_rows: int = 512):
    """Pallas TPU ELL SpMV.  Requires the multivector (N, R) to fit VMEM
    after padding; callers fall back to ``ell_matvec`` otherwise."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = cols.shape
    r = x.shape[1]
    n_pad = ((n + block_rows - 1) // block_rows) * block_rows
    pad = n_pad - n
    cols_p = jnp.pad(cols, ((0, pad), (0, 0)))
    vals_p = jnp.pad(vals, ((0, pad), (0, 0)))
    diag_p = jnp.pad(diag, (0, pad))
    x_p = jnp.pad(x, ((0, pad), (0, 0)))

    def kernel(cols_ref, vals_ref, diag_ref, x_ref, out_ref):
        cols_b = cols_ref[:]
        vals_b = vals_ref[:]
        xfull = x_ref[:]
        acc = diag_ref[:][:, None] * jax.lax.dynamic_slice(
            xfull, (pl.program_id(0) * block_rows, 0), (block_rows, r)
        )
        for kk in range(k):
            acc = acc + vals_b[:, kk][:, None] * xfull[cols_b[:, kk], :]
        out_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, k), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0)),
            pl.BlockSpec((block_rows,), lambda i: (i,)),
            pl.BlockSpec(x_p.shape, lambda i: (0, 0)),  # full x each block
        ],
        out_specs=pl.BlockSpec((block_rows, r), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, r), x.dtype),
    )(cols_p, vals_p, diag_p, x_p)
    return out[:n]
