"""Block-offset-diagonal (DIA) sparse operators — the TPU SpMV format.

The production replacement for the gather ELL SpMV (reference hot path:
the SuperLU factorization inside scipy.spsolve, reference
solver.py:767-780).  Measured context on TPU v5e (jax 0.9, 1M-row FEM
Laplacian, 8 RHS):

* XLA lowers ``x[cols]`` to ~7-9 ns per index row and caps any dynamic
  gather at ~4-7 GB/s regardless of fetch width -> 60-90 ms per SpMV.
* XLA batched matmuls of small (8x128 @ 128x128) blocks run at an
  effective ~4-30 GB/s (per-batch-item overhead dominates).
* This module's Pallas kernel streams the same operator at ~700 GB/s:
  3.8 ms per 1M-row multi-RHS SpMV — a ~20x speedup.

Format.  Rows/columns are blocked at B=128.  After a locality ordering
(Hilbert curve over vertex coordinates, ops.bell.hilbert_order), ~95% of
the nonzeros of a FEM mesh operator fall on a handful of *block
offsets* d = col_block - row_block (measured: the top 5 offsets cover
95% at B=128).  Those offsets are stored as dense (ng, G, D, B, B)
weight slabs W (G row-blocks per grid step); the SpMV becomes, per
row-block, D static-offset (R, B) @ (B, B) MXU products against a
contiguous window of x — **zero gathers**.  The few percent of
stragglers are a sorted-COO remainder handled by one small gather +
scatter-add.  The diagonal is kept as a separate vector (the FEM
assembly produces it separately, ops.assembly.EllMatrix).

The weight slabs are (1/fill) larger than the nonzeros, but streaming
them at HBM speed beats gathering the compact format through a 5 GB/s
straw by an order of magnitude.  Slabs are never materialized on the
host nor uploaded: the host ships nnz-sized scatter indices and the
device builds W with one scatter (same discipline as ops.bell).

Two backends, one packing:

* ``pallas`` — the TPU kernel.  Per grid step: one async DMA of the x
  window HBM->VMEM, then G*D static-slice MXU dots.  f32 with
  ``Precision.HIGHEST`` (bf16x3) so results are full f32 accuracy.
* ``xla`` — einsum per offset over the same slabs; correct on any
  backend (CPU tests, fallback).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np


DEFAULT_B = 128   # row/column block size (= TPU lane count)
DEFAULT_G = 8     # row-blocks per pallas grid step


def choose_offsets(
    rows: np.ndarray,
    cols: np.ndarray,
    b: int = DEFAULT_B,
    coverage: float = 0.95,
    max_offsets: int = 8,
) -> tuple[int, ...]:
    """Pick the block offsets to densify: greedily by nnz count until
    `coverage` of the nonzeros are covered (or max_offsets reached).
    Offset 0 (the block diagonal) is always included."""
    if len(rows) == 0:
        return (0,)
    bd = cols // b - rows // b
    u, c = np.unique(bd, return_counts=True)
    order = np.argsort(-c)
    total = len(rows)
    picked = []
    covered = 0
    for i in order:
        if len(picked) >= max_offsets:
            break
        picked.append(int(u[i]))
        covered += int(c[i])
        if covered >= coverage * total:
            break
    if 0 not in picked:
        picked.append(0)
    return tuple(sorted(picked))


@dataclass
class DiaPack:
    """Host-side packing of a square operator in block-offset form.

    All arrays are nnz-sized or O(n); the dense weight slabs are built
    on device by `to_device` (one scatter).
    """

    n: int                 # logical rows (before padding)
    np_: int               # padded rows = ng * G * B
    b: int
    g: int
    ng: int
    offs: tuple[int, ...]
    widx: np.ndarray       # (nnz_main,) flat int index into W
    wval: np.ndarray       # (nnz_main,) float
    rem_rows: np.ndarray   # (nnz_rem,) int32, sorted
    rem_cols: np.ndarray   # (nnz_rem,) int32
    rem_vals: np.ndarray   # (nnz_rem,) float
    diag: np.ndarray       # (np_,) float64, zero on padding rows

    @property
    def meta(self) -> tuple:
        """Static description consumed by the jitted matvec."""
        return (self.np_, self.b, self.g, self.ng, self.offs)

    def rem_ell(self, kr_cap: int = 8):
        """Unique-row padded layout of the remainder: (ru_rows (U,),
        ru_cols (U, Kr), ru_vals (U, Kr)) plus a spill COO for rows
        whose remainder degree exceeds kr_cap (rare: high-degree
        connection vertices).

        The per-unique-row form lets the device scatter-add run with
        unique sorted indices (the generic duplicate-handling scatter
        measured ~3x slower at 1M rows).  Padding slots carry column 0
        with value 0 — an inert contribution.
        """
        rr = self.rem_rows
        if len(rr) == 0:
            z = np.zeros(0, np.int32)
            return (z, z.reshape(0, 1), np.zeros((0, 1)), z, z,
                    np.zeros(0))
        u, start, counts = np.unique(rr, return_index=True,
                                     return_counts=True)
        kr = int(min(counts.max(), kr_cap))
        seq = np.arange(len(rr))
        slot = seq - start[np.searchsorted(u, rr)]
        keep = slot < kr
        ru_cols = np.zeros((len(u), kr), np.int32)
        ru_vals = np.zeros((len(u), kr))
        row_of = np.searchsorted(u, rr[keep])
        ru_cols[row_of, slot[keep]] = self.rem_cols[keep]
        ru_vals[row_of, slot[keep]] = self.rem_vals[keep]
        return (u.astype(np.int32), ru_cols, ru_vals,
                rr[~keep], self.rem_cols[~keep], self.rem_vals[~keep])

    def to_device(self, dtype=None, w=None) -> dict:
        """Device parameter dict: W slab (one on-device scatter), the
        unique-row remainder, and the diagonal.

        w: reuse an already-built device slab (any dtype) instead of
        scattering a fresh one — avoids re-uploading the nnz-sized
        index/value arrays when one pack feeds two operators (e.g. the
        exact f32 CG matvec and a bf16 V-cycle)."""
        import jax
        import jax.numpy as jnp

        dtype = dtype or jnp.float32
        d, b, g, ng = len(self.offs), self.b, self.g, self.ng
        size = ng * g * d * b * b

        if w is None:
            idx = jnp.asarray(self.widx.astype(np.int32)
                              if size < 2**31 else self.widx)
            vals = jnp.asarray(self.wval.astype(np.float32))

            @partial(jax.jit, static_argnames=("total",))
            def _build(idx, v, total: int):
                w = jnp.zeros(total, jnp.float32)
                w = w.at[idx].set(v, mode="promise_in_bounds",
                                  unique_indices=True)
                return w.reshape(ng, g, d, b, b).astype(dtype)

            w = _build(idx, vals, size)

        ru_rows, ru_cols, ru_vals, sp_r, sp_c, sp_v = self.rem_ell()
        return {
            "w": w,
            "ru_rows": jnp.asarray(ru_rows),
            "ru_cols": jnp.asarray(ru_cols),
            "ru_vals": jnp.asarray(ru_vals.astype(np.float32)
                                   ).astype(dtype),
            "sp_rows": jnp.asarray(sp_r.astype(np.int32)),
            "sp_cols": jnp.asarray(sp_c.astype(np.int32)),
            "sp_vals": jnp.asarray(sp_v.astype(np.float32)).astype(dtype),
            "diag": jnp.asarray(self.diag).astype(dtype),
        }


def pack_dia(
    n: int,
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    diag: Optional[np.ndarray] = None,
    offs: Optional[tuple] = None,
    b: int = DEFAULT_B,
    g: Optional[int] = None,
    coverage: float = 0.95,
    max_offsets: int = 8,
    np_override: Optional[int] = None,
) -> DiaPack:
    """Pack COO triplets (off-diagonal, duplicate-free) + diagonal.

    The caller is responsible for having permuted indices into a
    locality-preserving order (bell.hilbert_order) — the offset coverage
    and therefore the speed depend on it.

    np_override: force the padded length (must be a multiple of b and
    >= n); used by the aligned AMG hierarchy where each level's length
    is slot_count * child_length.  `g` is then chosen as the largest of
    (8, 4, 2, 1) dividing np_override / b.
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    if offs is None:
        offs = choose_offsets(rows, cols, b=b, coverage=coverage,
                              max_offsets=max_offsets)
    # The searchsorted slot assignment below requires sorted offsets; an
    # unsorted caller-supplied tuple would silently misassign slots.
    offs = tuple(sorted(offs))
    d = len(offs)
    if np_override is not None:
        if np_override % b or np_override < n:
            raise ValueError("np_override must be a multiple of b and >= n")
        nb = np_override // b
        if g is None:
            g = next(gg for gg in (8, 4, 2, 1) if nb % gg == 0)
        elif nb % g:
            raise ValueError("np_override not divisible by g*b")
        ng = nb // g
        np_ = np_override
    else:
        g = g or DEFAULT_G
        nb = max((n + b - 1) // b, 1)
        ng = (nb + g - 1) // g
        np_ = ng * g * b

    diag_pad = np.zeros(np_, dtype=np.float64)
    if diag is not None:
        diag_pad[:n] = diag

    if len(rows) == 0:
        return DiaPack(
            n=n, np_=np_, b=b, g=g, ng=ng, offs=offs,
            widx=np.zeros(0, np.int64), wval=np.zeros(0),
            rem_rows=np.zeros(0, np.int32), rem_cols=np.zeros(0, np.int32),
            rem_vals=np.zeros(0), diag=diag_pad,
        )

    rb, cb = rows // b, cols // b
    bd = cb - rb
    sel = np.isin(bd, offs)
    off_arr = np.asarray(offs)
    ds = np.searchsorted(off_arr, bd[sel])
    r_s, c_s = rows[sel], cols[sel]
    gi, gg = (r_s // b) // g, (r_s // b) % g
    # W[gi, gg, ds, col_local, row_local]: the kernel computes
    # y^T_blk (R, B) += x^T_blk (R, B) @ W  (contraction over col_local).
    widx = ((((gi * g + gg) * d + ds) * b + (c_s - cb[sel] * b)) * b
            + (r_s - rb[sel] * b))

    rr, rc, rv = rows[~sel], cols[~sel], vals[~sel]
    order = np.argsort(rr, kind="stable")
    return DiaPack(
        n=n, np_=np_, b=b, g=g, ng=ng, offs=offs,
        widx=widx, wval=vals[sel],
        rem_rows=rr[order].astype(np.int32),
        rem_cols=rc[order].astype(np.int32),
        rem_vals=rv[order], diag=diag_pad,
    )


def pack_ell_as_dia(ell, perm: Optional[np.ndarray] = None, **kw) -> DiaPack:
    """assembly.EllMatrix (optionally permuted by `perm`: new->old)
    -> DiaPack."""
    n, k = ell.cols.shape
    nz = ell.vals != 0
    rows = np.repeat(np.arange(n, dtype=np.int64), k)[nz.ravel()]
    cols = ell.cols.astype(np.int64).ravel()[nz.ravel()]
    vals = ell.vals.ravel()[nz.ravel()]
    diag = ell.diag
    if perm is not None:
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n)
        rows, cols = inv[rows], inv[cols]
        diag = diag[perm]
    return pack_dia(n, rows, cols, vals, diag=diag, **kw)


def pack_csr_as_dia(a, **kw) -> DiaPack:
    """Square scipy CSR/COO (diagonal included in the matrix) -> DiaPack."""
    coo = a.tocoo()
    diag = np.asarray(a.diagonal(), dtype=np.float64)
    mask = coo.row != coo.col
    return pack_dia(
        a.shape[0], coo.row[mask].astype(np.int64),
        coo.col[mask].astype(np.int64), coo.data[mask], diag=diag, **kw,
    )


# ---------------------------------------------------------------------------
# Device matvec


def default_backend() -> str:
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _dmax(offs) -> int:
    return max(max(abs(o) for o in offs), 1)


def _pallas_main(meta, w, xt_pad):
    """y^T (R, np_) = OffDiag @ x via the pallas kernel.

    xt_pad: (R, np_ + 2*dmax*B) — x transposed, zero halo of dmax blocks
    on each side.  Per grid step: one DMA of the (R, WIN) x window into
    VMEM, then G*D static-slice (R,B)@(B,B) MXU dots.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    np_, b, g, ng, offs = meta
    d = len(offs)
    dmax = _dmax(offs)
    win = (g + 2 * dmax) * b
    r = xt_pad.shape[0]
    # bf16 slabs (preconditioner-only precision) halve the dominant HBM
    # stream; the MXU takes bf16 natively, so a single DEFAULT-precision
    # pass replaces f32's bf16x3.
    w_bf16 = w.dtype == jnp.bfloat16

    def kernel(x_hbm, w_ref, o_ref, xwin, sem):
        i = jnp.int32(pl.program_id(0))
        cp = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(i * jnp.int32(g * b), win)], xwin, sem)
        cp.start()
        cp.wait()
        for gg in range(g):
            acc = jnp.zeros((r, b), jnp.float32)
            for di, o in enumerate(offs):
                xs = xwin[:, (gg + dmax + o) * b:(gg + dmax + o + 1) * b]
                if w_bf16:
                    xs = xs.astype(jnp.bfloat16)
                acc = acc + jax.lax.dot_general(
                    xs, w_ref[0, gg, di], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=(None if w_bf16
                               else jax.lax.Precision.HIGHEST))
            o_ref[:, gg * b:(gg + 1) * b] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, g, d, b, b),
                         lambda i: (i,) + (jnp.int32(0),) * 4),
        ],
        out_specs=pl.BlockSpec((r, g * b), lambda i: (jnp.int32(0), i)),
        scratch_shapes=[pltpu.VMEM((r, win), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    f = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, np_), jnp.float32),
    )
    return f(xt_pad, w)


def _xla_main(meta, w, xt_pad):
    """Same contraction as einsums over shifted slices (any backend)."""
    import jax
    import jax.numpy as jnp

    np_, b, g, ng, offs = meta
    dmax = _dmax(offs)
    r = xt_pad.shape[0]
    nb = ng * g
    acc = jnp.zeros((nb, r, b), xt_pad.dtype)
    wb = w.reshape(nb, len(offs), b, b)
    for di, o in enumerate(offs):
        xs = jax.lax.dynamic_slice_in_dim(
            xt_pad, (dmax + o) * b, np_, axis=1)
        xsb = xs.reshape(r, nb, b)
        acc = acc + jax.lax.dot_general(
            xsb, wb[:, di].astype(xt_pad.dtype),
            (((2,), (1,)), ((1,), (0,))),
            preferred_element_type=xt_pad.dtype,
            # HIGHEST forces bf16x3 passes on TPU MXUs (full f32
            # accuracy); for f64 it has no benefit and can be slow.
            precision=(jax.lax.Precision.HIGHEST
                       if xt_pad.dtype == jnp.float32 else None))
    return acc.transpose(1, 0, 2).reshape(r, np_)


def dia_matvec(meta, params, x, backend: Optional[str] = None):
    """y = (Diag + OffDiag) @ x for (np_, R) or (np_,) x.  Jit-traceable;
    `meta` and `backend` must be static under jit."""
    import jax.numpy as jnp

    np_, b, g, ng, offs = meta
    backend = backend or default_backend()
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    dmax = _dmax(offs)
    # The pallas kernel is f32; the XLA path follows the slab dtype
    # (enables f64 V-cycles on CPU for reference computations).
    compute_dtype = (jnp.float32 if backend == "pallas"
                     else params["w"].dtype)
    xt = x.astype(compute_dtype).T
    xt_pad = jnp.pad(xt, ((0, 0), (dmax * b, dmax * b)))
    main = (_pallas_main if backend == "pallas" else _xla_main)(
        meta, params["w"], xt_pad).T
    main = _apply_remainder(params, x, main)
    y = main + params["diag"][:, None] * x
    y = y.astype(x.dtype)
    return y[:, 0] if squeeze else y


def dia_matvec_t(meta, params, xt, backend: Optional[str] = None,
                 skip_remainder: bool = False):
    """Transposed-layout matvec: yt = ((Diag + OffDiag) @ xt.T).T for
    xt of shape (R, np_).

    The (R, n) layout puts R on the sublane axis, so every elementwise
    op runs at full lane utilization — in (n, R) layout each op pays a
    16x padding tax (R=8 of 128 lanes).  The pallas kernel is already
    transposed internally; only the remainder scatter needs the row
    layout and runs inside a transpose sandwich (axis-1 scatters are
    ~25x slower than axis-0 on TPU).

    skip_remainder: apply only slab + diagonal (used for the V-cycle
    smoothing applications against the remainder-lumped diagonal)."""
    import jax.numpy as jnp

    np_, b, g, ng, offs = meta
    backend = backend or default_backend()
    dmax = _dmax(offs)
    compute_dtype = (jnp.float32 if backend == "pallas"
                     else params["w"].dtype)
    xt32 = xt.astype(compute_dtype)
    xt_pad = jnp.pad(xt32, ((0, 0), (dmax * b, dmax * b)))
    yt = (_pallas_main if backend == "pallas" else _xla_main)(
        meta, params["w"], xt_pad)
    yt = yt + params["diag"][None, :] * xt32
    if not skip_remainder and (params["ru_rows"].shape[0]
                               or params["sp_rows"].shape[0]):
        x = xt32.T
        rem = _apply_remainder(params, x, jnp.zeros_like(x))
        yt = yt + rem.T
    return yt.astype(xt.dtype)


def _apply_remainder(params, x, y):
    """y += Remainder @ x in the (np_, R) layout.

    Unique-row padded entries scatter with sorted unique indices (the
    fast lowering); the spill COO (degree > Kr outlier rows) falls back
    to the duplicate-handling scatter."""
    import jax.numpy as jnp

    if params["ru_rows"].shape[0]:
        contrib = (params["ru_vals"][:, :, None]
                   * x[params["ru_cols"]]).sum(axis=1)
        y = y.at[params["ru_rows"]].add(
            contrib.astype(y.dtype), mode="drop", unique_indices=True)
    if params["sp_rows"].shape[0]:
        sp = params["sp_vals"][:, None] * x[params["sp_cols"]]
        y = y.at[params["sp_rows"]].add(sp.astype(y.dtype), mode="drop")
    return y


def pad_to(x, np_: int):
    """Zero-pad axis 0 of an (n, ...) array to the DIA padded length."""
    import jax.numpy as jnp

    pad = np_ - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
