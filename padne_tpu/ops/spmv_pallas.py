"""Pallas TPU ELL SpMV experiments.

The XLA gather path (ops.spmv.ell_matvec) costs ~3.5 ns per index on
TPU v5e regardless of RHS width — a fixed per-index overhead far from
HBM speed of light.  This module explores Mosaic-level alternatives:

* `make_vmem_spmv`: row blocks stream through the grid while the whole
  multivector x stays resident in VMEM; per-slot gathers run as
  take_along_axis on the VMEM buffer.
* RCM reordering utilities to bound bandwidth for a future
  windowed-DMA variant (1M+ rows).

STATUS (measured on TPU v5e, jax 0.9 Mosaic): large-extent gathers
along the sublane axis do NOT lower — jnp.take rejects vector indices
("shape mismatch"), take_along_axis under x64 traces int64 (unsupported
in Mosaic) and under 32-bit tracing fails lowering (AssertionError) for
blocks gathering across >tile sublane extents.  A production kernel
needs per-index DMA orchestration (PrefetchScalarGridSpec + scalar
-driven make_async_copy) or a lane-major layout with per-tile
dynamic_gather — planned follow-up.  Until then ops.spmv.ell_matvec
(XLA gather, ~3.5 ns/index, flat in RHS width) is the production path.

All functions degrade to None on unsupported configurations; callers
fall back to the XLA path.
"""

from __future__ import annotations

import numpy as np


def rcm_permutation(n: int, edges: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of the edge graph (bandwidth
    reduction).  Returns perm mapping new index -> old index."""
    import scipy.sparse
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    if len(edges) == 0:
        return np.arange(n, dtype=np.int64)
    a = scipy.sparse.coo_matrix(
        (np.ones(len(edges) * 2, dtype=np.int8),
         (np.concatenate([edges[:, 0], edges[:, 1]]),
          np.concatenate([edges[:, 1], edges[:, 0]]))),
        shape=(n, n),
    ).tocsr()
    return np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True),
                      dtype=np.int64)


def permute_ell(ell, perm: np.ndarray):
    """Apply a symmetric row/column permutation to an EllMatrix.
    perm maps new index -> old index.  Returns (permuted_ell, inv)."""
    from . import assembly

    n = len(ell.diag)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    cols = inv[ell.cols.astype(np.int64)][perm]
    vals = ell.vals[perm]
    diag = ell.diag[perm]
    return assembly.EllMatrix(
        cols=cols.astype(np.int32), vals=vals, diag=diag
    ), inv


def ell_bandwidth(cols: np.ndarray) -> int:
    n = len(cols)
    rows = np.arange(n)[:, None]
    return int(np.abs(cols.astype(np.int64) - rows).max(initial=0))


def make_vmem_spmv(n: int, K: int, R: int, dtype, block_rows: int = 1024):
    """Pallas ELL SpMV with x resident in VMEM.

    Returns f(cols, vals, diag, x) on PADDED inputs of shape
    (n_pad, K)/(n_pad,)/(n_pad, R), or None when unsupported.
    """
    try:
        import jax
        import jax.numpy as jnp
        import jax.experimental.pallas as pl
    except Exception:  # pragma: no cover
        return None

    BN = block_rows
    n_pad = ((n + BN - 1) // BN) * BN
    vmem_bytes = n_pad * R * np.dtype(dtype).itemsize
    if vmem_bytes > 8 * 1024 * 1024:
        return None
    nblocks = n_pad // BN

    def kernel(cols_ref, vals_ref, diag_ref, xself_ref, xfull_ref, out_ref):
        acc = diag_ref[...][:, None] * xself_ref[...]
        x = xfull_ref[...]
        for k in range(K):
            idx = jnp.broadcast_to(
                cols_ref[:, k].astype(jnp.int32)[:, None], (BN, R)
            )
            g = jnp.take_along_axis(x, idx, axis=0, mode="promise_in_bounds")
            acc += vals_ref[:, k][:, None] * g
        out_ref[...] = acc

    f = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((BN, K), lambda i: (i, 0)),
            pl.BlockSpec((BN, K), lambda i: (i, 0)),
            pl.BlockSpec((BN,), lambda i: (i,)),
            pl.BlockSpec((BN, R), lambda i: (i, 0)),
            pl.BlockSpec((n_pad, R), lambda i: (0, 0)),  # full x, resident
        ],
        out_specs=pl.BlockSpec((BN, R), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, R), dtype),
    )

    def apply(cols, vals, diag, x):
        return f(cols, vals, diag, x, x)

    return apply, n_pad
