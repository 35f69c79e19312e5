"""Sparse matrix-vector products in ELL layout.

The multi-RHS SpMV is the hot kernel of the PCG solve (reference
equivalent: SuperLU factorization inside scipy.spsolve, solver.py:773).
Two implementations:

* ``ell_matvec`` — pure XLA: one gather + weighted reduction.  XLA fuses
  this well and it is the portable default (CPU tests, TPU fallback).
* ops.spmv_pallas — experimental Pallas variants (windowed/banded
  gathers); current Mosaic rejects large-extent sublane gathers, so the
  XLA path remains the production kernel (findings documented there).

Both paths compute  y = diag * x + OffDiag @ x  where the ELL arrays hold the
off-diagonal entries.
"""

from __future__ import annotations

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
