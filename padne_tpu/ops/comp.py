"""Compensated exact operator: f64-accurate residuals on an f32 device.

The refinement ladder needs the TRUE (f64) full-system residual after
every pass.  The reference gets it for free (float64 CPU solve,
reference solver.py:767-780); on TPU f64 is emulated and the resident
operator is f32, so round 3 computed these residuals on the HOST —
costing a v download + CSR SpMV + rc re-upload (~0.5 s per pass at 1M
DoF through the tunnel) and forcing a host "mop-up" pass whenever the
plain-f32 device update floor (~2.4e-7 * ||diag dv||) sat above the
target.

This module removes that tax.  At setup it builds an ELL view of the
EXACT level-0 operator ON DEVICE — rows/cols reconstructed from the
already-resident widx split (dia.coo_from_widx), hi values gathered
from the resident slab, and the f32->f64 value residue shipped as
exact f32 lo-halves (~2^-48 relative operator error; see _f32_lo for
why the int16 ratio residue is not tight enough) — so the only new
uploads are the 4 B/nnz lo streams and the small raw remainder.  Per
call, `matvec` then evaluates y = A64 @ x for f32 x with ~1e-13
relative accuracy:

* k ELL products per row in f32 with Dekker two-product error capture
  (split-based, safe without FMA guarantees), summed with an exact
  Knuth two-sum chain — the value residue rides along at f32;
* the diagonal in f64 (elementwise; cheap even emulated);
* the high-degree tail (rows with more than k entries) as a tiny f64
  scatter-add.

mode="f64" runs the whole ELL part in emulated f64 instead (bitwise
simplest; ~10-20x the flops).  Both modes are exact enough that the
refinement ladder converges to 1e-8 relative entirely on device: one
rc upload, one v download, nothing n-sized in between.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np


def _split(a):
    """Dekker split: a == ah + al with ah carrying <= 12 mantissa bits,
    so products of two "h"/"l" halves are exact in f32."""
    c = a * 4097.0          # 2**12 + 1
    ah = c - (c - a)
    return ah, a - ah


def _two_prod(a, b):
    """p + e == a * b exactly (f32, FMA-free)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


@dataclass
class CompOperator:
    """Device-resident compensated exact operator (see module doc)."""

    np0: int
    k: int
    tail_n: int
    mode: str
    params: dict            # device arrays, see build()


def _require_x64(jax) -> None:
    """The compensated operator stores f64 tails and (in ELL mode)
    int64 slab gather indices; with jax_enable_x64 off JAX silently
    downcasts both, corrupting indices for slabs >= 2^31 elements and
    defeating the accuracy claim.  Fail fast for direct callers
    (schur gates want_comp on x64 already)."""
    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            "comp.build()/build_slab_mode() require jax_enable_x64 "
            "(f64 tails + int64 slab indices); enable x64 or use the "
            "plain f32 operator")


def _host_degrees(pack) -> np.ndarray:
    """Per-(padded-)row entry count of the exact operator, main slab +
    remainder, computed from the host pack arrays."""
    b, d = pack.b, len(pack.offs)
    rb = (pack.widx_hi // b) // d
    rows_main = rb * b + pack.widx_lo.astype(np.int64)
    deg = np.bincount(rows_main, minlength=pack.np_)
    if len(pack.rem_rows):
        deg = deg + np.bincount(pack.rem_rows, minlength=pack.np_)
    return deg


def choose_k(pack, k_cap: int = 10) -> tuple[int, int]:
    """(k, tail_n): smallest ELL width k <= k_cap whose over-degree
    tail stays tiny (<= max(4096, nnz/500) entries)."""
    deg = _host_degrees(pack)
    nnz = int(deg.sum())
    budget = max(4096, nnz // 500)
    for k in range(4, k_cap + 1):
        tail = int(np.maximum(deg - k, 0).sum())
        if tail <= budget:
            return k, tail
    return k_cap, int(np.maximum(deg - k_cap, 0).sum())


def build(meta, op_params, pack, mode: str = "dekker",
          k_cap: int = 10) -> CompOperator:
    """Build the compensated operator from an exact-operator params
    dict holding the widx split (to_device(keep_widx=True)) plus the
    host pack (for the ratio streams and raw remainder).

    Uploads: int16 ratio streams (slab + diag + remainder) and the raw
    remainder triplets — ~2-14 B/entry on only the small streams; the
    nnz-sized index/value data is reconstructed from resident arrays.
    """
    import jax
    import jax.numpy as jnp

    from . import dia

    _require_x64(jax)
    np_, b, g, ng, offs = meta
    d = len(offs)
    hi_dev, lo_dev = op_params["_hi"], op_params["_lo"]
    w_dev = op_params["w"]
    if w_dev.dtype != jnp.float32:
        raise ValueError("comp build needs the f32 exact slab")

    k, tail_n = choose_k(pack, k_cap)

    def _f32_lo(a64):
        """Exact f32 lo-half of an f64 stream: a64 ≈ f32(a64) + lo with
        |lo| <= ulp32/2 and the lo itself f32-rounded — a combined
        representation error ~2^-48 relative.  An int16 ratio residue
        (dia.ratio16_encode, 2^-39) is NOT enough here: at production
        conductance scales (|a| ~ 2e3 S) and volt-scale fields the
        2^-39 operator quantization alone floors the 1M-DoF full-system
        residual at ~1.9e-6 absolute ≈ 1.2e-7 relative — ABOVE the
        1e-8 refinement target (measured, TPU v5e)."""
        a64 = np.asarray(a64, np.float64)
        return (a64 - a64.astype(np.float32).astype(np.float64)
                ).astype(np.float32)

    # Uploads: f32 lo-half value streams + the raw remainder (the
    # nnz-sized hi values and all indices stay resident/derived).
    # One batched device_put: separate transfers cost ~40 ms of fixed
    # tunnel round-trip EACH regardless of size.
    up = jax.device_put({
        "lo_slab": _f32_lo(pack.wval),
        "lo_diag": _f32_lo(pack.diag),
        "rem_r": pack.rem_rows.astype(np.int32),
        "rem_c": pack.rem_cols.astype(np.int32),
        "rem_v32": pack.rem_vals.astype(np.float32),
        "rem_lo": _f32_lo(pack.rem_vals),
    })
    lo_slab, lo_diag = up["lo_slab"], up["lo_diag"]
    rem_r, rem_c = up["rem_r"], up["rem_c"]
    rem_v32, rem_lo = up["rem_v32"], up["rem_lo"]

    @partial(jax.jit, static_argnames=("k", "tail_n"))
    def _build(hi, lo, w, lo_slab, lo_diag, diag32, rem_r, rem_c,
               rem_v32, rem_lo, k: int, tail_n: int):
        rows_m, cols_m = dia.coo_from_widx(meta, hi, lo)
        idx = hi.astype(jnp.int64) * b + lo.astype(jnp.int64)
        v_m = w.reshape(-1)[idx]
        lo_m = lo_slab
        lo_r = rem_lo
        rows = jnp.concatenate([rows_m, rem_r])
        cols = jnp.concatenate([cols_m, rem_c])
        vals = jnp.concatenate([v_m, rem_v32])
        vlo = jnp.concatenate([lo_m, lo_r])

        order = jnp.argsort(rows)
        rows_s = rows[order]
        # rank of each entry within its row (stable sort keeps this
        # well-defined); entries with rank >= k spill to the f64 tail.
        starts = jnp.searchsorted(rows_s, jnp.arange(np_,
                                                     dtype=rows_s.dtype))
        rank = jnp.arange(rows.shape[0], dtype=jnp.int32) - starts[
            rows_s].astype(jnp.int32)
        in_ell = rank < k
        # ELL scatter; spill entries route to a dropped dummy row.
        tgt_row = jnp.where(in_ell, rows_s, np_)
        tgt_rank = jnp.minimum(rank, k - 1)
        ell_cols = jnp.zeros((np_ + 1, k), jnp.int32).at[
            tgt_row, tgt_rank].set(cols[order], mode="drop")[:np_]
        ell_vals = jnp.zeros((np_ + 1, k), jnp.float32).at[
            tgt_row, tgt_rank].set(vals[order], mode="drop")[:np_]
        ell_lo = jnp.zeros((np_ + 1, k), jnp.float32).at[
            tgt_row, tgt_rank].set(vlo[order], mode="drop")[:np_]
        # Static-size tail: spill entries sort first on the (stable)
        # in_ell key.
        spill = jnp.argsort(in_ell)[:tail_n]
        tail_rows = rows_s[spill]
        tail_cols = cols[order][spill]
        tail_vals = (vals[order][spill].astype(jnp.float64)
                     + vlo[order][spill].astype(jnp.float64))
        diag64 = diag32.astype(jnp.float64) + lo_diag.astype(
            jnp.float64)
        return (ell_cols, ell_vals, ell_lo, tail_rows, tail_cols,
                tail_vals, diag64)

    (ell_cols, ell_vals, ell_lo, tail_rows, tail_cols, tail_vals,
     diag64) = _build(hi_dev, lo_dev, w_dev, lo_slab, lo_diag,
                      op_params["diag"], rem_r, rem_c, rem_v32, rem_lo,
                      k=k, tail_n=tail_n)
    params = {
        "ell_cols": ell_cols, "ell_vals": ell_vals, "ell_lo": ell_lo,
        "tail_rows": tail_rows, "tail_cols": tail_cols,
        "tail_vals": tail_vals, "diag64": diag64,
    }
    return CompOperator(np0=np_, k=k, tail_n=tail_n, mode=mode,
                        params=params)


def matvec(op: CompOperator, params: dict, x32):
    """y = A64 @ x for f32 x, as float64, ~1e-13 relative accuracy.
    Jit-traceable; `params` is passed explicitly so the arrays enter
    jitted programs as arguments, not inlined constants."""
    import jax.numpy as jnp

    cols = params["ell_cols"]
    v = params["ell_vals"]
    xg = x32[cols]                                   # (np0, k)
    if op.mode == "f64":
        y = (v.astype(jnp.float64) * xg.astype(jnp.float64)).sum(1)
        y = y + (params["ell_lo"] * xg).astype(jnp.float64).sum(1)
    else:
        p, e = _two_prod(v, xg)
        hi = p[:, 0]
        lo = jnp.zeros_like(hi)
        for i in range(1, op.k):
            s = hi + p[:, i]
            t = s - hi
            err = (hi - (s - t)) + (p[:, i] - t)
            hi, lo = s, lo + err
        low = lo + e.sum(1) + (params["ell_lo"] * xg).sum(1)
        y = hi.astype(jnp.float64) + low.astype(jnp.float64)
    y = y + params["diag64"] * x32.astype(jnp.float64)
    if op.tail_n:
        y = y.at[params["tail_rows"]].add(
            params["tail_vals"] * x32[params["tail_cols"]].astype(
                jnp.float64),
            mode="drop")
    return y


# ---------------------------------------------------------------------------
# Slab-mode compensated operator: the gather-free fast path.
#
# The ELL-mode matvec above is gather-bound (~81 ms at 1M rows on v5e:
# XLA's dynamic gather runs at ~8 ns/element regardless of width).
# Slab mode instead re-reads the MAIN entries in their dense DIA slab
# layout — the same ~HBM-speed stream the ordinary SpMV kernel rides —
# with a VPU Dekker product + two-sum tree per (row-block, offset)
# tile, plus a dense f32 residue slab so A64 = w + w_lo entrywise.
# The remainder runs as a COMPACT (rows-with-remainder, k) ELL with an
# exact indexed two-sum merge into the slab result (gather-set/add
# with unique rows is exact; only the tiny lo streams take plain adds).
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    """s + err == a + b exactly (Knuth)."""
    s = a + b
    t = s - a
    err = (a - (s - t)) + (b - t)
    return s, err


def _pallas_comp_slab(meta, w, w_lo, xt_pad, interpret: bool = False):
    """(hi8, lo8) each (8, np_): the main-slab contribution of
    A64 @ x, compensated, partially reduced to 8 sublane partials
    (the final 8->1 two-sum chain runs outside the kernel — Mosaic
    sublane slices below 8 rows are not tileable)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from . import dia

    np_, b, g, ng, offs = meta
    d = len(offs)
    dmax = dia._dmax(offs)
    win = (g + 2 * dmax) * b
    # The sublane two-sum tree below halves b rows down to 8; a
    # non-power-of-two or sub-8 block would silently drop sublanes
    # (b>last*2) or fail at trace time (b<8) — fail fast instead.
    if b < 8 or (b & (b - 1)) != 0:
        raise ValueError(
            f"slab comp kernel needs a power-of-two block size >= 8, "
            f"got b={b}")
    halving = []
    h = b // 2
    while h >= 8:
        halving.append(h)
        h //= 2

    def kernel(x_hbm, w_ref, wlo_ref, hi_ref, lo_ref, xwin, sem):
        i = jnp.int32(pl.program_id(0))
        cp = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(i * jnp.int32(g * b), win)], xwin, sem)
        cp.start()
        cp.wait()
        # jnp.eye's Mosaic lowering trips a layout bitwidth check on
        # v5e (measured crash); build the identity from 32-bit iotas.
        r_io = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
        c_io = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
        eye = jnp.where(r_io == c_io, jnp.float32(1.0),
                        jnp.float32(0.0))
        ones = jnp.ones((b, b), jnp.float32)
        for gg in range(g):
            acc_hi = jnp.zeros((8, b), jnp.float32)
            acc_lo = jnp.zeros((8, b), jnp.float32)
            for di, o in enumerate(offs):
                xs = xwin[:, (gg + dmax + o) * b:(gg + dmax + o + 1) * b]
                # Sublane-transposed broadcast xt[l, i] = x[l], built
                # from (b, b) tiles only (a direct (b, 1) MXU transpose
                # trips a Mosaic layout check on v5e): diag(x) @ ones.
                diag_x = eye * jnp.broadcast_to(xs, (b, b))
                # HIGHEST (bf16x3) is EXACT here: each output sums one
                # nonzero (exactly bf16x3-decomposed) times 1.0 plus
                # zeros, all in the f32 accumulator.
                xt = jax.lax.dot_general(
                    diag_x, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                wt = w_ref[0, gg, di]
                p, e = _two_prod(wt, xt)
                e = e + wlo_ref[0, gg, di] * xt
                # Two-sum tree over the sublane (l) axis down to 8 rows.
                hi_t, lo_t = p, e
                for half in halving:
                    a = hi_t[:half]
                    c = hi_t[half:2 * half]
                    s, err = _two_sum(a, c)
                    hi_t = s
                    lo_t = lo_t[:half] + lo_t[half:2 * half] + err
                s, err = _two_sum(acc_hi, hi_t)
                acc_hi = s
                acc_lo = acc_lo + lo_t + err
            hi_ref[:, gg * b:(gg + 1) * b] = acc_hi
            lo_ref[:, gg * b:(gg + 1) * b] = acc_lo

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, g, d, b, b),
                         lambda i: (i,) + (jnp.int32(0),) * 4),
            pl.BlockSpec((1, g, d, b, b),
                         lambda i: (i,) + (jnp.int32(0),) * 4),
        ],
        out_specs=[
            pl.BlockSpec((8, g * b), lambda i: (jnp.int32(0), i)),
            pl.BlockSpec((8, g * b), lambda i: (jnp.int32(0), i)),
        ],
        scratch_shapes=[pltpu.VMEM((1, win), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    f = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, np_), jnp.float32),
                   jax.ShapeDtypeStruct((8, np_), jnp.float32)],
        interpret=interpret,
    )
    return f(xt_pad, w, w_lo)


def build_slab_mode(meta, op_params, pack, k_cap: int = 6,
                    interpret: bool = False) -> CompOperator:
    """Slab-mode compensated operator (see section comment).  Shares
    the resident f32 hi slab with the CG operator; builds the residue
    slab on device from the widx split (dia.build_slabs program) and
    ships the remainder as compact host arrays in one device_put."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from . import dia

    _require_x64(jax)
    np_, b, g, ng, offs = meta
    w_dev = op_params["w"]
    if w_dev.dtype != jnp.float32:
        raise ValueError("slab comp needs the f32 exact slab")

    def _f32_lo(a64):
        a64 = np.asarray(a64, np.float64)
        return (a64 - a64.astype(np.float32).astype(np.float64)
                ).astype(np.float32)

    # Residue slab: same scatter program as the weight slabs, with the
    # f32 lo-half values.
    pack_lo = dataclasses.replace(pack, wval=_f32_lo(pack.wval))
    (w_lo,) = dia.build_slabs([(pack_lo, jnp.float32)])

    # Compact remainder ELL (rows-with-remainder only; the ELL-mode
    # build above pads to np_ rows, whose (np_, k) gather is exactly
    # the 8 ns/element cost this mode removes).
    rr = pack.rem_rows
    u_rows, starts, counts = np.unique(rr, return_index=True,
                                       return_counts=True)
    kmax = int(counts.max()) if len(counts) else 0
    k = min(k_cap, max(kmax, 1))
    u = len(u_rows)
    rem_cols = np.zeros((u, k), np.int32)
    rem_vals = np.zeros((u, k), np.float32)
    rem_vlo = np.zeros((u, k), np.float32)
    tail_rows, tail_cols, tail_vals = [], [], []
    which = np.searchsorted(u_rows, rr)
    slot = np.arange(len(rr)) - starts[which]
    in_ell = slot < k
    rem_cols[which[in_ell], slot[in_ell]] = pack.rem_cols[in_ell]
    rem_vals[which[in_ell], slot[in_ell]] = pack.rem_vals[
        in_ell].astype(np.float32)
    rem_vlo[which[in_ell], slot[in_ell]] = _f32_lo(
        pack.rem_vals)[in_ell]
    spill = ~in_ell
    tail_rows = rr[spill].astype(np.int32)
    tail_cols = pack.rem_cols[spill].astype(np.int32)
    tail_vals = pack.rem_vals[spill].astype(np.float64)

    up = jax.device_put({
        "rem_rows": u_rows.astype(np.int32),
        "rem_cols": rem_cols, "rem_vals": rem_vals,
        "rem_vlo": rem_vlo,
        "tail_rows": tail_rows, "tail_cols": tail_cols,
        "tail_vals": tail_vals,
        "lo_diag": _f32_lo(pack.diag),
    })
    params = {
        "w": w_dev, "w_lo": w_lo,
        "diag64": None,  # set below from resident diag + lo_diag
        **{kk: vv for kk, vv in up.items() if kk != "lo_diag"},
    }
    params["diag64"] = (op_params["diag"].astype(jnp.float64)
                        + up["lo_diag"].astype(jnp.float64))
    return CompOperator(np0=np_, k=k, tail_n=int(spill.sum()),
                        mode="slab-interpret" if interpret else "slab",
                        params=params)


def matvec_slab(op: CompOperator, params: dict, x32, meta):
    """Slab-mode y = A64 @ x (float64), ~1e-13 relative — no np-sized
    gathers; see section comment."""
    import jax.numpy as jnp

    from . import dia

    np_, b, g, ng, offs = meta
    dmax = dia._dmax(offs)
    xt_pad = jnp.pad(x32[None, :], ((0, 0), (dmax * b, dmax * b)))
    hi8, lo8 = _pallas_comp_slab(
        meta, params["w"], params["w_lo"], xt_pad,
        interpret=op.mode == "slab-interpret")
    hi = hi8[0]
    lo = lo8.sum(axis=0)
    for i in range(1, 8):
        hi, err = _two_sum(hi, hi8[i])
        lo = lo + err
    # Compact remainder with an exact indexed two-sum merge.
    if params["rem_rows"].shape[0]:
        xg = x32[params["rem_cols"]]                 # (u, k)
        p, e = _two_prod(params["rem_vals"], xg)
        hr = p[:, 0]
        lr = e.sum(axis=1) + (params["rem_vlo"] * xg).sum(axis=1)
        for i in range(1, op.k):
            hr, err = _two_sum(hr, p[:, i])
            lr = lr + err
        rows = params["rem_rows"]
        a = hi[rows]
        s, err = _two_sum(a, hr)
        hi = hi.at[rows].set(s, mode="drop", unique_indices=True)
        lo = lo.at[rows].add(err + lr, mode="drop",
                             unique_indices=True)
    y = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    y = y + params["diag64"] * x32.astype(jnp.float64)
    if op.tail_n:
        y = y.at[params["tail_rows"]].add(
            params["tail_vals"] * x32[params["tail_cols"]].astype(
                jnp.float64),
            mode="drop")
    return y


def apply(op: CompOperator, params: dict, x32, meta=None):
    """Mode dispatch: slab (pallas fast path) or ELL (portable)."""
    if op.mode.startswith("slab"):
        return matvec_slab(op, params, x32, meta)
    return matvec(op, params, x32)
