"""Pallas TPU ELL SpMV experiments.

The XLA gather path (ops.spmv.ell_matvec) costs ~3.5 ns per index on
TPU v5e regardless of RHS width — a fixed per-index overhead far from
HBM speed of light.  This module explores Mosaic-level alternatives:

* `make_vmem_spmv`: row blocks stream through the grid while the whole
  multivector x stays resident in VMEM; per-slot gathers run as
  take_along_axis on the VMEM buffer.
* RCM reordering utilities to bound bandwidth for a future
  windowed-DMA variant (1M+ rows).

STATUS (measured on TPU v5e, jax 0.9 Mosaic, axon remote compile):
* Sublane gathers do NOT lower: jnp.take rejects vector indices
  ("shape mismatch"); take_along_axis under x64 traces int64
  (unsupported) and under 32-bit tracing dies in lowering
  (AssertionError) even for ~6k-row extents.
* 1-D BlockSpecs crash this Mosaic version's compile helper
  (tpu_compile_helper exit 1) — all kernel operands must be >= 2-D.
  With that fixed, the gather-free variant in make_banded_spmv (RCM
  banding, one-hot iota==idx accumulation + MXU window matmul) compiles
  and runs, but measured 5.7x SLOWER than the XLA gather at 1M rows
  (544 ms vs 96 ms): the VPU one-hot construction costs
  n*K*window ~ n^1.5 compare-select ops and dominates.  It also loses
  ~1e-3 relative accuracy to bf16 MXU passes.  Conclusion: a
  competitive TPU SpMV needs hardware gather or per-block DMA
  scatter-orchestration, neither expressible in this Mosaic version.
* Production path remains ops.spmv.ell_matvec (XLA gather): ~3.5 ns per
  index at 1e5 rows, ~9 ns at 1e6 rows, flat in RHS width up to 128 —
  so multi-RHS batching is free and the per-index overhead dominates.
Follow-up options: per-index DMA orchestration via
PrefetchScalarGridSpec + scalar-driven make_async_copy, or a lane-major
layout with per-tile dynamic_gather.

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


def make_banded_spmv(n: int, K: int, R: int, dtype, cols: np.ndarray,
                     block_rows: int = 2048, interpret: bool = False):
    """Pallas ELL SpMV for RCM-banded structure (bandwidth <= block_rows).

    Row block i's columns all lie within blocks {i-1, i, i+1}; the kernel
    receives x three times through shifted BlockSpecs (clamped at the
    edges), concatenates a local 3*BN window in VMEM, and gathers with
    block-local indices.  Returns (f, n_pad, local_cols) or None when the
    bandwidth exceeds block_rows or lowering is unsupported.

    f(local_cols, vals, diag, x) operates on PADDED inputs.
    """
    try:
        import jax
        import jax.numpy as jnp
        import jax.experimental.pallas as pl
    except Exception:  # pragma: no cover
        return None

    BN = block_rows
    bw = ell_bandwidth(cols)
    if bw > BN:
        return None
    n_pad = ((n + BN - 1) // BN) * BN
    nblocks = n_pad // BN

    cols_p = np.tile(np.arange(n_pad, dtype=np.int64)[:, None], (1, K))
    cols_p[:n] = cols.astype(np.int64)
    block_of_row = np.arange(n_pad) // BN
    local = cols_p - (block_of_row[:, None] - 1) * BN
    if local.min() < 0 or local.max() >= 3 * BN:
        return None
    local = local.astype(np.int32)

    # Mosaic does not lower sublane gathers; instead each sub-block of
    # SB rows materializes its slice of the sparse matrix densely in VMEM
    # via iota==index one-hot accumulation (VPU) and multiplies the
    # 3*BN-row x-window on the MXU.  Gather-free.
    SB = 128  # sub-block rows; S tile is (SB, 3*BN) f32 in VMEM
    SUB = BN // SB

    # NOTE: 1-D BlockSpecs crash this Mosaic version's compiler, so diag
    # travels as an (n, 1) column.
    def kernel(lcols_ref, vals_ref, diag_ref, xm_ref, xs_ref, xp_ref, out_ref):
        window = jnp.concatenate(
            [xm_ref[...], xs_ref[...], xp_ref[...]], axis=0
        )  # (3*BN, R)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (SB, 3 * BN), 1)
        S = jnp.zeros((SB, 3 * BN), dtype=window.dtype)
        for k in range(K):
            idx = lcols_ref[:, k].astype(jnp.int32)[:, None]
            v = vals_ref[:, k][:, None]
            S = S + jnp.where(col_iota == idx, v, 0)
        # Rows of this sub-block within the BN-superblock:
        j = pl.program_id(1)
        xself = xs_ref[pl.ds(j * SB, SB), :]
        acc = diag_ref[...] * xself
        acc = acc + jnp.dot(S, window, preferred_element_type=window.dtype)
        out_ref[...] = acc

    # x is padded with one zero halo block on each side so the three
    # window fetches use static affine index maps.
    f = pl.pallas_call(
        kernel,
        grid=(nblocks, SUB),
        in_specs=[
            pl.BlockSpec((SB, K), lambda i, j: (i * SUB + j, 0)),
            pl.BlockSpec((SB, K), lambda i, j: (i * SUB + j, 0)),
            pl.BlockSpec((SB, 1), lambda i, j: (i * SUB + j, 0)),
            pl.BlockSpec((BN, R), lambda i, j: (i, 0)),
            pl.BlockSpec((BN, R), lambda i, j: (i + 1, 0)),
            pl.BlockSpec((BN, R), lambda i, j: (i + 2, 0)),
        ],
        out_specs=pl.BlockSpec((SB, R), lambda i, j: (i * SUB + j, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, R), dtype),
        interpret=interpret,
    )

    def apply(local_cols, vals, diag, x):
        import jax.numpy as jnp2

        x_halo = jnp2.zeros((n_pad + 2 * BN, x.shape[1]), dtype=x.dtype)
        x_halo = x_halo.at[BN : BN + n_pad].set(x)
        return f(local_cols, vals, diag.reshape(-1, 1), x_halo, x_halo, x_halo)

    return apply, n_pad, local


def make_vmem_spmv(n: int, K: int, R: int, dtype, block_rows: int = 1024,
                   interpret: bool = False):
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
        interpret=interpret,
    )

    def apply(cols, vals, diag, x):
        return f(cols, vals, diag, x, x)

    return apply, n_pad
