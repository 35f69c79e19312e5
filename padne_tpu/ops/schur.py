"""Bordered saddle-point solve: FEM core + MNA border via Schur complement.

The reference assembles one indefinite sparse system mixing the cotan
Laplacian with modified-nodal-analysis rows for voltage sources,
regulators and the ground pin, then calls a direct solver
(solver.py:469-560, 767-780).  Voltage-source rows have zero diagonal,
which rules out plain CG.

TPU-native formulation: with L = -A (A SPSD, the assembled Laplacian +
resistor conductances), C the (sparse) border injection columns, B the
border constraint rows, the full system

    -A v + C j = r_core
     B v       = r_border

is reduced by the pseudo-inverse:  v = A^+ (C j - r_core) + Z c, where Z
spans A's nullspace (per-component constants, p columns).  The unknowns
(j, c) then satisfy the small dense (m+p) system

    [ B A^+ C    B Z ] [j]   [ r_border + B A^+ r_core ]
    [ Z^T C      0   ] [c] = [ Z^T r_core              ]

The expensive part is A^+ applied to m+1 vectors — ONE multi-RHS
deflated PCG (ops.cg).  The dense block is solved with lstsq so that
ill-posed inputs (floating regions, unterminated current loops — see
reference SolverWarning, solver.py:880-888) degrade gracefully instead
of crashing.  A few rounds of full-system iterative refinement polish
the result to the 1e-9 residual gate.

The regulator's asymmetric gain stamp makes C != B^T in general, which
this formulation handles without symmetrization.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import assembly, cg
from ..utils.validation import checked
from .spmv import ell_matvec


@dataclass
class BorderSpec:
    """Sparse description of the MNA border.

    Border variables k = 0..m-1 (voltage sources, regulators, ground pin).
    Rows:    sum_i B[k, i] v_i = rhs[k]
    Columns: current injections C[i, k] added to core equations.
    """

    m: int
    row_idx: np.ndarray   # (nnzB,) border variable index k
    row_node: np.ndarray  # (nnzB,) core node i
    row_val: np.ndarray   # (nnzB,)
    col_idx: np.ndarray   # (nnzC,) border variable index k
    col_node: np.ndarray  # (nnzC,) core node i
    col_val: np.ndarray   # (nnzC,)
    rhs: np.ndarray       # (m,)


@dataclass
class CoreSystem:
    """The assembled device-ready system."""

    n: int
    ell: assembly.EllMatrix
    comp_id: np.ndarray
    num_components: int
    border: BorderSpec
    r_core: np.ndarray    # (n,)
    ground_var: int       # border variable index of the ground pin
    coords: Optional[np.ndarray] = None  # (n, 2) node coordinates (mm);
    # enables the Hilbert-ordered DIA fast path (ops.dia)
    group: Optional[np.ndarray] = None   # (n,) int mesh/layer label —
    # primary ordering key so stacked layers don't interleave


@dataclass
class BorderedSolution:
    v: np.ndarray            # (n,) node potentials
    j: np.ndarray            # (m,) border currents
    residual_norm: float     # || full system residual ||
    ground_current: float
    cg_iterations: int
    refinement_steps: int


def _border_covers_components(system: CoreSystem) -> bool:
    """True when every copper component is touched by at least one
    border row or column — a necessary condition for the direct
    bordered matrix to be nonsingular (an untouched floating component
    makes it singular outright; those need the iterative path's
    deflation).  Not sufficient in pathological topologies (e.g. a
    V-source chain never anchored to ground), which the caller's
    non-finite fallback catches after the factorization."""
    touched = np.zeros(system.num_components, dtype=bool)
    b = system.border
    touched[system.comp_id[b.row_node]] = True
    touched[system.comp_id[b.col_node]] = True
    return bool(touched.all())


def bordered_scipy_system(system: CoreSystem):
    """(L, r, A, B, C): the full sparse system in the reference layout
    [[-A, C], [B, 0]] z = [r_core, rhs] — the ONE place the bordered
    sign/orientation conventions live (solver.system_to_scipy and the
    direct route both delegate here)."""
    import scipy.sparse

    n, m = system.n, system.border.m
    b = system.border
    A = system.ell.to_scipy()
    C = scipy.sparse.coo_matrix(
        (b.col_val, (b.col_node, b.col_idx)), shape=(n, m))
    B = scipy.sparse.coo_matrix(
        (b.row_val, (b.row_idx, b.row_node)), shape=(m, n))
    L = scipy.sparse.bmat([[-A, C], [B, None]], format="csc")
    r = np.concatenate([system.r_core, b.rhs])
    return L, r, A, B, C


def _solve_bordered_direct(system: CoreSystem):
    """Host sparse direct solve (SuperLU) of the full bordered system
    in the reference layout [[-A, C], [B, 0]] — used only for small
    border-covered cores with wide borders (see the dispatch comment
    in solve_bordered).  Mirrors ref solver.py:767-780.  Returns None
    when the factorization is singular (caller falls back to the
    deflated iterative path)."""
    import scipy.sparse
    import scipy.sparse.linalg

    n, m = system.n, system.border.m
    b = system.border
    L, r, A, B, C = bordered_scipy_system(system)
    import warnings as _warnings

    with _warnings.catch_warnings():
        # A singular factorization surfaces as MatrixRankWarning +
        # inf/NaN; the finite check below turns that into a fallback
        # to the iterative path instead of a NaN solution.
        _warnings.simplefilter("ignore",
                               scipy.sparse.linalg.MatrixRankWarning)
        z = scipy.sparse.linalg.spsolve(L, r)
    if not np.isfinite(z).all():
        return None
    v, j = z[:n], z[n:]
    res_core = system.r_core + A @ v - C @ j
    res_border = b.rhs - B @ v
    res_norm = float(np.sqrt((res_core**2).sum()
                             + (res_border**2).sum()))
    gc = float(j[system.ground_var]) if m > 0 else 0.0
    return BorderedSolution(
        v=v, j=np.asarray(j), residual_norm=res_norm,
        ground_current=gc, cg_iterations=0, refinement_steps=0)


def _dense_border(system: CoreSystem):
    """Materialize B (m, n) rows / C (n, m) columns as dense jnp arrays.
    m is small (sources + ground), so dense is cheap and jit-friendly."""
    b = system.border
    n, m = system.n, b.m
    B = jnp.zeros((m, n), dtype=jnp.float64)
    B = B.at[b.row_idx, b.row_node].add(b.row_val)
    C = jnp.zeros((n, m), dtype=jnp.float64)
    C = C.at[b.col_node, b.col_idx].add(b.col_val)
    return B, C


@checked
def solve_bordered(
    system: CoreSystem,
    tol: float = 1e-14,
    maxiter: int = 40000,
    max_refinements: int = 8,
    target_residual: float = 1e-10,
    precond: str = "auto",
    amg_threshold: int = 5000,
    device_dtype=None,
    mesh=None,
    dispatch_cap="auto",
    operator: str = "auto",
    dia_threshold: int = 200_000,
    dia_shard_min: int = 32768,
) -> BorderedSolution:
    """Solve the full bordered system.  Host-side driver around jitted
    device stages; the refinement loop reuses the same CG machinery.

    precond: "auto" (AMG above amg_threshold core unknowns), "amg",
    or "jacobi".  The threshold is low because spectral-weighted AMG
    dominates Jacobi well before setup cost matters (measured: the 4.5k
    ldo board needs 162 AMG vs 7715 Jacobi iterations; setup < 0.1 s).

    device_dtype: when set (e.g. jnp.float32 on TPUs, where f64 is
    emulated), the CG/AMG inner solves run in that dtype while residuals
    and the accumulated solution stay f64 — classic mixed-precision
    iterative refinement; each pass gains the inner solve's relative
    accuracy, so a handful of f32 passes reach f64-grade residuals.

    dispatch_cap: maximum CG iterations per device dispatch.  TPU
    runtimes behind a tunnel (axon) kill device executions that run for
    more than roughly a minute, so one while_loop with maxiter=40000
    crashes the worker.  "auto" picks a size-scaled cap on non-CPU
    backends (none on CPU); an int forces a cap; None disables.  Capped
    runs chunk the CG with host-side warm restarts (each chunk solves
    the residual equation from zero — a plain CG restart).

    mesh: optional jax.sharding.Mesh with a "tp" axis: the inner
    multi-RHS CG (and its AMG V-cycle) run tensor-parallel — operator
    rows and all CG state sharded over the axis, SpMV via all_gather,
    reductions via psum (parallel/sharding.py holds the standalone
    variants; this is the production integration).  Rows are padded to
    a tp multiple; padding rows form their own deflation component so
    they carry exactly zero through the solve.  The small dense Schur
    block and the f64 refinement residuals stay replicated.

    operator: "auto" routes large single-device mixed-precision solves
    with coordinates through the block-offset-DIA fast path (ops.dia +
    aligned AMG, ~20x faster SpMV on TPU); "dia" forces it (any
    backend); "ell" forces the gather path.
    """
    n, m = system.n, system.border.m
    if operator == "dia" and system.coords is None:
        raise ValueError(
            "operator='dia' needs node coordinates (CoreSystem.coords) "
            "for the Hilbert ordering"
        )
    # Small core + WIDE MNA border: the iterative path solves m+1 Schur
    # columns whose CG work is out of all proportion to the system size
    # (the reference-excluded tht_component at a coarse mesh: n ~ 2.5k,
    # m = 64 — minutes of CPU multi-RHS for a system SuperLU factors in
    # milliseconds).  Route those to a host sparse direct solve; large
    # systems never take this path (its superlinear cost is exactly
    # what the device pipeline replaces).  PADNE_TPU_DIRECT_SMALL=0
    # disables (A/B / coverage runs).
    import os as _os

    if (operator == "auto"
            and system.border.m > 16
            and n <= 50_000
            and _os.environ.get("PADNE_TPU_DIRECT_SMALL", "1") != "0"
            and _border_covers_components(system)):
        # Coverage guard: a copper component no border row touches
        # leaves [[-A, C], [B, 0]] singular (the iterative path handles
        # that via component deflation + minimum-norm lstsq), so such
        # boards keep the iterative route.  A non-finite direct result
        # (singular despite the guard) also falls back.
        direct = _solve_bordered_direct(system)
        if direct is not None:
            return direct

    use_dia = operator == "dia" or (
        operator == "auto"
        and device_dtype is not None
        and system.coords is not None
        and n >= dia_threshold
    )
    if use_dia:
        result = _solve_bordered_dia(
            system, tol=tol, maxiter=maxiter,
            max_refinements=max_refinements,
            target_residual=target_residual,
            dispatch_cap=dispatch_cap,
            mesh=mesh,
            shard_min=dia_shard_min,
        )
        if result is not None:
            return result
        # fall through (hierarchy unavailable, e.g. tiny system)
    cols, vals, diag = system.ell.to_device()
    comp_id = jnp.asarray(system.comp_id)
    p = system.num_components
    B, C = _dense_border(system)
    mixed = device_dtype is not None and jnp.dtype(device_dtype) != jnp.float64
    inner_dtype = jnp.dtype(device_dtype) if mixed else jnp.float64

    tp = int(mesh.shape["tp"]) if mesh is not None else 1
    if tp <= 1:
        mesh = None
        tp = 1
    pad = (-n) % tp
    if mesh is not None:
        ell_inner = assembly.EllMatrix(
            cols=np.pad(system.ell.cols, ((0, pad), (0, 0))),
            vals=np.pad(system.ell.vals, ((0, pad), (0, 0))),
            diag=np.pad(system.ell.diag, (0, pad)),
        )
        # Padding rows form their own (trivially satisfied) deflation
        # component, so real components' means are unaffected.
        comp_cg = jnp.asarray(
            np.concatenate([system.comp_id,
                            np.full(pad, p, dtype=system.comp_id.dtype)])
            if pad else system.comp_id
        )
        p_cg = p + (1 if pad else 0)
    else:
        ell_inner = system.ell
        comp_cg, p_cg = comp_id, p

    if mixed:
        cols_i, vals_i, diag_i = ell_inner.to_device(dtype=inner_dtype)
        inner_tol = max(tol, 1e-5)
    else:
        cols_i, vals_i, diag_i = ell_inner.to_device()
        inner_tol = tol

    use_amg = precond == "amg" or (precond == "auto" and n >= amg_threshold)
    if use_amg and not mixed:
        # The V-cycle's attainable f64 residual floor sits around 1e-11
        # relative; asking CG for less makes it spin at maxiter.  The
        # outer full-system refinement multiplies the gain per pass, so a
        # 1e-9 inner target converges in a couple of cheap passes instead.
        inner_tol = max(inner_tol, 1e-9)

    # Z^T y  == per-component sums; (p, R) for multi-RHS y.
    def zt(y):
        return jax.ops.segment_sum(y, comp_id, num_segments=p)

    r_core = jnp.asarray(system.r_core)
    r_border = jnp.asarray(system.border.rhs)

    vcycle = None
    if use_amg:
        import logging

        from . import amg

        hierarchy = amg.build_hierarchy(system.ell)
        vcycle = amg.make_vcycle(
            hierarchy, dtype=inner_dtype if mixed else None,
            tp=tp if mesh is not None else 1,
            axis_name="tp" if mesh is not None else None,
        )
        logging.getLogger(__name__).info(
            "Preconditioner: AMG, levels %s (inner dtype %s, tp %d)",
            [len(l.a_diag) for l in hierarchy.levels], inner_dtype, tp,
        )
    # Stall exit only with a mixed-precision inner solve: there the f32
    # recurrence floor pins border columns above inner_tol and refinement
    # multiplies partial gains; in f64 a mid-stream plateau is normal and
    # must be allowed to run (see make_pcg's stall_window docstring).
    cg_solver = cg.make_pcg(
        cols_i, vals_i, diag_i, comp_cg, p_cg, precond=vcycle, mesh=mesh,
        stall_window=30 if mixed else None,
    )

    if dispatch_cap == "auto":
        platform = (mesh.devices.flat[0].platform if mesh is not None
                    else jax.default_backend())
        # Budget ~60M row-updates per dispatch (Jacobi); an AMG-
        # preconditioned iteration does ~5x the work of a Jacobi one
        # (V-cycle = several level SpMVs), so scale the cap down — the
        # tunnel watchdog kills dispatches by wall time, not iteration
        # count.
        per_iter_rows = max(n, 1) * (5 if use_amg else 1)
        dispatch_cap = (
            None if platform == "cpu"
            else int(np.clip(60_000_000 // per_iter_rows, 30, 4000))
        )

    def run_cg(rhs_dev, tol_run):
        """cg_solver honoring the dispatch cap: the Krylov state is
        threaded through bounded-length dispatches, so the chunked run
        IS one uninterrupted CG iteration sequence."""
        if dispatch_cap is None or maxiter <= dispatch_cap:
            res = cg_solver(rhs_dev, tol_run, maxiter)
            return res.x, int(res.iterations)
        total = 0
        state = None
        while True:
            it = int(min(dispatch_cap, maxiter - total))
            res, state = cg_solver.stateful(rhs_dev, tol_run, it, state)
            chunk_iters = int(res.iterations)
            total += chunk_iters
            if chunk_iters < it or total >= maxiter:
                break  # converged (while_loop exited early) or budget out
        return res.x, total

    total_cg_iters = 0

    def solve_once(rc, rb, tol_pass=None):
        """One pass of the Schur pipeline for core rhs rc, border rhs rb.

        tol_pass: inner CG tolerance for this pass (defaults to
        inner_tol; refinement passes request only the remaining
        contraction to the outer target)."""
        nonlocal total_cg_iters
        # RHS block: [C | rc] -> A^+ of each column.
        rhs = jnp.concatenate([C, rc[:, None]], axis=1)  # (n, m+1)
        if pad:
            rhs = jnp.concatenate(
                [rhs, jnp.zeros((pad, m + 1), rhs.dtype)], axis=0
            )
        x_cg, iters = run_cg(rhs.astype(inner_dtype),
                             inner_tol if tol_pass is None else tol_pass)
        total_cg_iters += iters
        X = x_cg.astype(jnp.float64)[:n]  # (n, m+1): [A^+ C | A^+ rc]
        Xc, xr = X[:, :m], X[:, m]

        BXc = B @ Xc                   # (m, m)
        Bxr = B @ xr                   # (m,)
        BZ = jax.ops.segment_sum((B.T), comp_id, num_segments=p).T  # (m, p)
        ZtC = zt(C)                    # (p, m)
        Ztr = zt(rc[:, None])[:, 0]    # (p,)

        if p > 256:
            # Heavily fragmented copper (thousands of floating islands):
            # the assembled block matrix [[BXc, BZ], [ZtC, 0]] is almost
            # entirely the (p, p) zero block — solve the thin blocks
            # directly instead of a dense (m+p)^2 lstsq.  Row block 1 is
            # exactly satisfiable through c for any j, so the joint
            # least-squares reduces to lstsq(ZtC) for j, then the
            # minimum-norm c from the first block (islands untouched by
            # any border row keep zero mean shift); the outer full-system
            # refinement guards the rank-deficient corner cases.
            j, *_ = jnp.linalg.lstsq(ZtC, Ztr, rcond=None)      # (m,)
            c, *_ = jnp.linalg.lstsq(
                BZ, (rb + Bxr) - BXc @ j, rcond=None
            )                                                    # (p,)
        else:
            top = jnp.concatenate([BXc, BZ], axis=1)               # (m, m+p)
            bot = jnp.concatenate([ZtC, jnp.zeros((p, p))], axis=1)
            M = jnp.concatenate([top, bot], axis=0)
            rhs_small = jnp.concatenate([rb + Bxr, Ztr])
            sol, *_ = jnp.linalg.lstsq(M, rhs_small, rcond=None)
            j, c = sol[:m], sol[m:]
        v = Xc @ j - xr + c[comp_id]
        return v, j

    v, j = solve_once(r_core, r_border)

    def full_residual(v, j):
        # core: r_core - (-A v + C j);  border: r_border - B v
        av = ell_matvec(cols, vals, diag, v[:, None])[:, 0]
        res_core = r_core + av - C @ j
        res_border = r_border - B @ v
        return res_core, res_border

    def escalate_inner_to_f64():
        """Swap the inner solve to f64 after a mixed-precision stall.

        Iterative refinement with an f32 inner operator contracts per
        pass by ~kappa(A)*eps32; boards mixing milliohm lumped couplings
        with thin-sliver cotan weights push kappa past 1e7, where the
        f32 floor sits ABOVE the target and refinement flatlines around
        1e-2 V (observed: gen_resistor_divider on TPU, max|dV| 0.02 V).
        Emulated f64 on TPU is slow per iteration, but this path only
        runs for the remaining passes of small/mid systems (the DIA
        path owns large ones), so correctness wins."""
        nonlocal cg_solver, inner_tol, inner_dtype, dispatch_cap
        import logging

        vc64 = None
        if use_amg:
            vc64 = amg.make_vcycle(
                hierarchy, dtype=None,
                tp=tp if mesh is not None else 1,
                axis_name="tp" if mesh is not None else None,
            )
        cols64, vals64, diag64 = ell_inner.to_device()
        cg_solver = cg.make_pcg(
            cols64, vals64, diag64, comp_cg, p_cg, precond=vc64,
            mesh=mesh, stall_window=None,
        )
        inner_dtype = jnp.float64
        inner_tol = max(tol, 1e-9) if use_amg else max(tol, 1e-12)
        if dispatch_cap is not None:
            # Emulated f64 costs ~8x per iteration; keep dispatches
            # under the tunnel watchdog's wall-time budget.
            dispatch_cap = max(30, dispatch_cap // 8)
        logging.getLogger(__name__).info(
            "mixed-precision refinement stalled above target; "
            "escalating inner solve to f64"
        )

    refinements = 0
    escalated = False
    budget = max_refinements
    res_core, res_border = full_residual(v, j)
    res_norm = float(
        jnp.sqrt((res_core**2).sum() + (res_border**2).sum())
    )
    while res_norm > target_residual:
        if refinements >= budget:
            if mixed and not escalated:
                escalate_inner_to_f64()
                escalated = True
                budget = refinements + 4
                continue
            break
        # Pass-adaptive inner tolerance (see DiaBorderedSolver.solve):
        # request only the remaining contraction, with a 5x margin.
        tol_pass = min(0.05, max(inner_tol,
                                 0.2 * target_residual / res_norm))
        dv, dj = solve_once(res_core, res_border, tol_pass=tol_pass)
        v_new = v + dv
        j_new = j + dj
        rc_new, rb_new = full_residual(v_new, j_new)
        new_norm = float(jnp.sqrt((rc_new**2).sum() + (rb_new**2).sum()))
        refinements += 1
        if new_norm >= res_norm:
            if mixed and not escalated:
                # Discard the failed iterate; retry the pass in f64.
                escalate_inner_to_f64()
                escalated = True
                budget = refinements + 4
                continue
            break  # no progress; keep the better iterate
        v, j = v_new, j_new
        res_core, res_border = rc_new, rb_new
        res_norm = new_norm

    gc = float(j[system.ground_var]) if m > 0 else 0.0
    return BorderedSolution(
        v=np.asarray(v),
        j=np.asarray(j),
        residual_norm=res_norm,
        ground_current=gc,
        cg_iterations=total_cg_iters,
        refinement_steps=refinements,
    )


class DiaBorderedSolver:
    """The block-offset-DIA fast path (large meshes), set up once and
    solvable repeatedly.

    mesh: optional jax.sharding.Mesh — ALL its devices become one `tp`
    row-sharding axis for the slab operator and the AMG V-cycle
    (ops.dia_sharded: ppermute halo exchange, compressed far exchange;
    ops.amg.make_vcycle_dia_sharded).  Falls back to the single-device
    layout when the hierarchy's top level is too small to shard.

    Same Schur-complement algorithm as the generic path, engineered for
    the TPU + slow-host-tunnel reality:

    * the inner CG matvec and the whole AMG V-cycle are ops.dia
      operators (pallas kernel on TPU) on Hilbert/aggregate-aligned row
      positions — no XLA gathers in the hot loop;
    * nothing (n x m)-dense ever crosses the host<->device link: the
      border products B X are computed on device from the nnz border
      triplets, the Schur RHS block is scattered on device, and only
      (np0,)-vectors are downloaded;
    * the f64 full-system refinement residual is computed on the host
      CSR (one SpMV per refinement pass) — the device stays f32.

    Construction raises _NoDiaHierarchy when no DIA hierarchy can be
    built (tiny system); `solve()` runs one bordered solve + iterative
    refinement and may be called repeatedly (bench.py times the second,
    compile-warm call).
    """

    def __init__(self, system: CoreSystem, tol: float = 1e-14,
                 maxiter: int = 40000, dispatch_cap="auto", mesh=None,
                 shard_min: int = 32768):
        import logging

        import scipy.sparse

        from . import amg, cg, dia

        self.system = system
        n, m = system.n, system.border.m
        p = system.num_components
        b = system.border
        log = logging.getLogger(__name__)

        # Multi-chip: flatten ALL the mesh's devices into one tp
        # row-sharding axis (the DIA format row-shards; dp batching
        # happens above this layer in sweep.py).
        dia_mesh = None
        tp = 1
        if mesh is not None:
            devs = np.asarray(mesh.devices).reshape(-1)
            if devs.size > 1:
                from jax.sharding import Mesh

                dia_mesh = Mesh(devs, axis_names=("tp",))
                tp = int(devs.size)

        # coarse_size 3000: a strong dense bottom measured 43 vs 56-67
        # CG iterations at 1M DoF; its pinvh costs a few setup seconds.
        import os

        # Debug knob: PADNE_TPU_NO_GROUP=1 drops the mesh-id ordering
        # key (A/B the layer-blind Hilbert sweep).
        grp = (None if os.environ.get("PADNE_TPU_NO_GROUP")
               else system.group)
        # One ELL->CSR conversion serves both the hierarchy build and
        # the f64 refinement residuals (A_host) — it costs seconds at
        # 1M rows.
        import time as _time

        _t0 = _time.time()
        self.A_host = system.ell.to_scipy()
        self._trace("setup: ell->csr", _t0)
        _t0 = _time.time()
        # A/B knobs for the deep-level offset budget (ROADMAP: widening
        # levels >= 1 absorbs 35-60% of their remainder; needs TPU
        # measurement to pick defaults).
        deep_mo = os.environ.get("PADNE_TPU_DEEP_OFFSETS")
        deep_cov = os.environ.get("PADNE_TPU_DEEP_COVERAGE")
        drop = os.environ.get("PADNE_TPU_DROP_TOL")
        # Env knobs OVERRIDE the deep-widening defaults; when unset the
        # kwargs must be omitted — passing None here would fall back to
        # the narrow budget inside build_hierarchy_dia, silently
        # disabling the measured wide-deep default (-0.4 s at 1M).
        knobs = {}
        if deep_mo:
            knobs["deep_max_offsets"] = int(deep_mo)
        if deep_cov:
            knobs["deep_coverage"] = float(deep_cov)
        if drop:
            knobs["drop_tol"] = float(drop)
        # Level-0 slab budget: fewer offsets shrink the dominant HBM
        # stream of the V-cycle while the slot tables absorb the grown
        # remainder.  Default 4 from the v5e sweep at the 1M bench
        # (2026-08-20, warm solve / 30 iters in every case):
        # mo=8: 3.25 s, 6: 2.78, 5: 2.71, 4: 2.46, 3: 2.66, 2: 2.41 —
        # 4 is the consistent knee (2 wins within noise but leaves an
        # asymmetric band and a 2.7x remainder).  Host hierarchy build
        # shrinks too (14.4 -> 8.5 s: fewer slab entries to pack).
        l0_mo = os.environ.get("PADNE_TPU_L0_OFFSETS")
        l0_cov = os.environ.get("PADNE_TPU_L0_COVERAGE")
        knobs["max_offsets"] = int(l0_mo) if l0_mo else 4
        if l0_cov:
            knobs["coverage"] = float(l0_cov)
        # Coarsening-shape A/B knobs (aggregation cap, strength
        # threshold, prolongation-smoothing depth, dense-bottom size).
        for env, kw, cast in (("PADNE_TPU_CAP", "cap", int),
                              ("PADNE_TPU_THETA", "theta", float),
                              ("PADNE_TPU_SMOOTH_LEVELS",
                               "smooth_levels", int)):
            val = os.environ.get(env)
            if val:
                knobs[kw] = cast(val)
        coarse_size = int(os.environ.get("PADNE_TPU_COARSE_SIZE",
                                         "3000"))
        hierarchy = amg.build_hierarchy_dia(
            system.ell, system.coords, coarse_size=coarse_size, tp=tp,
            shard_min=shard_min, group=grp, a_csr=self.A_host, **knobs)
        if not hierarchy.levels:
            raise _NoDiaHierarchy()
        self._trace("setup: hierarchy build", _t0)
        self.hierarchy = hierarchy
        backend = dia.default_backend()
        use_t = system.num_components + 1 <= 64
        # The sharded CG's deflation projector is the dense one-hot
        # (n, p) form — the same >64-component hazard the use_t gate
        # protects against (a fragmented board with thousands of
        # islands would allocate an n*p array and pay an O(n*p) matmul
        # per iteration).  Heavily fragmented multi-chip solves fall
        # back to the single-device DIA path, whose make_pcg projector
        # switches to segment_sum beyond 64 components.
        sharded = tp > 1 and hierarchy.levels[0].shard and use_t
        want_comp = False   # set in the single-device branch below
        if tp > 1 and hierarchy.levels[0].shard and not use_t:
            log.info(
                "DIA sharding declined: %d deflation components exceed "
                "the dense-projector budget (64); running single-device",
                system.num_components)
        if sharded:
            from . import dia_sharded

            (vcycle_apply, vparams, vspecs, n_sh,
             shard_plans) = amg.make_vcycle_dia_sharded(
                hierarchy, dia_mesh, backend=backend)
        elif use_t:
            # bf16 slabs for the V-cycle (preconditioner-only
            # precision): halves the dominant HBM stream.  The exact CG
            # operator keeps its own f32 slab, built FIRST so the
            # nnz-sized host arrays upload only once (the cycle's bf16
            # copy is a device-side cast).
            cycle_bf16 = backend == "pallas"
            # Retain the widx split only when the f64 anchor can use it
            # (x64 on, anchor knobs not disabled) — otherwise the
            # nnz-sized _hi/_lo arrays would sit in HBM unused.
            # The f64 device anchor is OPT-IN: it only pays for itself
            # on a severely bandwidth-limited host link (it replaces
            # ~0.65 s of per-solve transfers with ~0.45 s of emulated
            # f64 device work at 1M DoF, measured v5e through a
            # ~30 MB/s tunnel), while costing tens of seconds of
            # shape-dependent setup compiles.  On a PCIe-attached host
            # the transfers it replaces cost single-digit ms.
            want_anchor = (
                bool(jax.config.jax_enable_x64)
                and os.environ.get("PADNE_TPU_DEVICE_ANCHOR") == "1"
                and not os.environ.get("PADNE_TPU_HOST_ANCHOR")
                and not os.environ.get("PADNE_TPU_HOST_REFINE"))
            # Compensated device-resident ladder (ops.comp): the
            # default high-accuracy residual path — exact f64-class
            # residuals evaluated ON DEVICE, so no per-pass v
            # downloads / host SpMVs / rc re-uploads and no host
            # mop-up pass.  Needs x64 and the widx split; composes
            # with slot packing (unlike the f64 anchor).
            want_comp = (
                bool(jax.config.jax_enable_x64)
                and os.environ.get("PADNE_TPU_COMP", "1") != "0"
                and not os.environ.get("PADNE_TPU_HOST_REFINE"))
            _t0 = _time.time()
            op_params = amg.make_dia_cg_operator(
                hierarchy, keep_widx=want_anchor or want_comp,
                slots=(None if want_anchor
                       else dia.slots_env() if want_comp else None))
            self._trace("setup: cg operator upload", _t0)
            _t0 = _time.time()
            w0 = (op_params["w"].astype(jnp.bfloat16)
                  if cycle_bf16 else op_params["w"])
            vcycle_apply, vparams = amg.make_vcycle_dia_t(
                hierarchy, backend=backend, lump_smoothing=True,
                slab_dtype=jnp.bfloat16 if cycle_bf16 else None, w0=w0)
            self._trace("setup: vcycle params upload", _t0)
        else:
            vcycle_apply, vparams = amg.make_vcycle_dia(hierarchy,
                                                        backend=backend)
        posmap = hierarchy.posmap0
        np0 = hierarchy.np0
        level0 = hierarchy.levels[0]
        meta0 = level0.pack.meta
        log.info(
            "DIA solve: np0=%d offsets=%s remainder=%d levels=%s "
            "backend=%s tp=%d%s",
            np0, level0.pack.offs, len(level0.pack.rem_rows),
            [lv.pack.np_ for lv in hierarchy.levels], backend, tp,
            f" (sharded levels: {n_sh})" if sharded else "",
        )

        # Deflation over padded rows: dummies form one extra component.
        comp_pad = np.full(np0, p, dtype=np.int32)
        comp_pad[posmap] = system.comp_id
        p_cg = p + 1

        def a_apply(prm, x):
            return dia.dia_matvec(meta0, prm, x, backend=backend)

        if sharded:
            plan0_meta = shard_plans[0].meta_local

            def a_apply_local(prm, xt):
                return dia_sharded.dia_matvec_t_local(
                    meta0, plan0_meta, prm, xt, "tp", backend)

            # vparams[0] IS the exact level-0 operator (no lumping in
            # the sharded cycle), so the CG matvec shares it outright.
            cg_solver = cg.make_pcg_t_sharded(
                operator=(a_apply_local, vparams[0]),
                precond=(vcycle_apply, vparams),
                comp_id=comp_pad, num_components=p_cg,
                mesh=dia_mesh, op_specs=vspecs[0], pp_specs=vspecs,
            )
            self._shard_refine = (vparams[0], vspecs[0], plan0_meta,
                                  dia_mesh)
        elif use_t:
            def a_apply_t(prm, xt):
                return dia.dia_matvec_t(meta0, prm, xt, backend=backend)

            cg_solver = cg.make_pcg_t(
                operator=(a_apply_t, op_params),
                precond=(vcycle_apply, vparams),
                comp_id=jnp.asarray(comp_pad), num_components=p_cg,
            )
        else:
            op_params = amg.make_dia_cg_operator(hierarchy, vparams)
            cg_solver = cg.make_pcg(
                None, None, None, jnp.asarray(comp_pad), p_cg,
                precond=(vcycle_apply, vparams),
                operator=(a_apply, op_params),
            )
        self.cg_solver = cg_solver
        # Kernel-accounting handles (bench.py times the hot kernels in
        # isolation and reports bytes-moved/GB-s in BENCH detail).
        self._vcycle_pair = (vcycle_apply, vparams)
        # _op_exact: the plain-layout exact operator (single-device
        # only) — feeds the single-device refine step and the f64
        # anchor.  The sharded path refines on device too (its refine
        # step wraps the matvec in shard_map, below) but keeps the host
        # anchor for pass 1: the sharded params don't retain the widx
        # split, so the f64 residue overlay has nothing to index.
        self._sharded = bool(sharded)
        self._op_exact = None if sharded else op_params
        self._meta0 = meta0
        self._backend = backend
        self._BXc_host = None
        # Per-pass inner CG tolerance floors.  The refinement ladder
        # multiplies per-pass contractions, so chasing 1e-5 in EVERY
        # pass buys accuracy the outer target does not need.  The
        # loose 3e-4 knee was A/B'd ONLY on the comp ladder (v5e, 1M
        # bench, 2026-08-20: 3e-4 -> 2.89 s / 30 iters / 2 passes vs
        # 3.26 s at 1e-5 and 3.77 s / 3 passes at 1e-3), so it is
        # scoped to comp_inner_tol; the host-anchored / f64-anchor /
        # mop-up paths keep the conservative 1e-5 (their per-pass
        # overhead is lower, so extra passes cost more there).
        # PADNE_TPU_INNER_TOL overrides BOTH (trace-time capture).
        _it = os.environ.get("PADNE_TPU_INNER_TOL")
        self.inner_tol = max(tol, float(_it) if _it else 1e-5)
        self.comp_inner_tol = max(tol, float(_it) if _it else 3e-4)
        # f32 CG gains stall after a few dozen V-cycles (noise floor);
        # the outer refinement multiplies per-pass gains, so cap the
        # inner solve instead of letting a floor-limited CG spin to
        # `maxiter`.
        self.maxiter = min(maxiter, 300)

        if dispatch_cap == "auto":
            platform = jax.default_backend()
            per_iter_rows = max(np0, 1) * 5
            dispatch_cap = (
                None if platform == "cpu"
                else int(np.clip(60_000_000 // per_iter_rows, 30, 4000))
            )
        self.dispatch_cap = dispatch_cap

        # Device-side border products from nnz triplets (tiny uploads).
        self.posmap = posmap
        self.np0 = np0
        self.m, self.p = m, p
        # One batched device_put (separate transfers pay ~40 ms of
        # fixed tunnel round-trip each).
        _up = jax.device_put({
            "posmap": posmap.astype(np.int32),
            "rnp": posmap[b.row_node].astype(np.int32),
            "ri": b.row_idx.astype(np.int32),
            "rv": b.row_val.astype(np.float32),
            "cnp": posmap[b.col_node].astype(np.int32),
            "ci": b.col_idx.astype(np.int32),
            "cv": b.col_val.astype(np.float32),
            "comp_pad": comp_pad,
        })
        self.posmap_dev = _up["posmap"]
        row_node_pos = _up["rnp"]
        row_idx_dev = _up["ri"]
        row_val_dev = _up["rv"]
        col_node_pos = _up["cnp"]
        col_idx_dev = _up["ci"]
        col_val_dev = _up["cv"]

        @jax.jit
        def build_rhs(rc_pad):
            """[C | rc] as a padded (np0, m+1) f32 block, on device."""
            rhs = jnp.zeros((np0, m + 1), jnp.float32)
            rhs = rhs.at[col_node_pos, col_idx_dev].add(col_val_dev)
            return rhs.at[:, m].set(rc_pad)

        @jax.jit
        def border_products(X):
            """(B Xc, B xr) from the sparse border rows: (m, m), (m,)."""
            g = X[row_node_pos] * row_val_dev[:, None]   # (nnzB, m+1)
            bx = jax.ops.segment_sum(g, row_idx_dev, num_segments=m)
            return bx[:, :m], bx[:, m]

        @jax.jit
        def combine(X, j_dev, c_full, comp_dev):
            """v_pad = Xc @ j - xr + c[comp]."""
            return X[:, :m] @ j_dev - X[:, m] + c_full[comp_dev]

        self._build_rhs = build_rhs
        self._border_products = border_products
        self._combine = combine
        self.comp_pad_dev = _up["comp_pad"]

        @jax.jit
        def border_single(xr):
            """B @ xr for one padded core vector: (m,)."""
            g = xr[row_node_pos] * row_val_dev
            return jax.ops.segment_sum(g, row_idx_dev, num_segments=m)

        comp_pad_dev = self.comp_pad_dev

        @jax.jit
        def ztr_device(rc_hi, rc_lo):
            """Z^T rc per component (incl. the dummy padding slot)."""
            return jax.ops.segment_sum(rc_hi + rc_lo, comp_pad_dev,
                                       num_segments=p + 1)

        def _two_sum_update(adv, dv, dcorr, rc_hi, rc_lo, dj):
            """Shared tail of a refinement update: absorb
            delta = A dv - C dj into the double-f32 residual pair via an
            error-free Knuth two-sum and accumulate the correction."""
            cdj = jnp.zeros_like(dv).at[col_node_pos].add(
                col_val_dev * dj[col_idx_dev])
            delta = adv - cdj
            s = rc_hi + delta
            t = s - rc_hi
            err = (rc_hi - (s - t)) + (delta - t)
            lo = rc_lo + err
            hi2 = s + lo
            lo2 = lo - (hi2 - s)
            dcorr = dcorr + dv
            n2 = jnp.sum(jnp.square(hi2))
            return dcorr, hi2, lo2, n2

        if self._op_exact is not None:
            from . import dia as _dia

            op_meta, op_backend = meta0, backend

            @jax.jit
            def refine_step(params, xc, dcorr, rc_hi, rc_lo, xr, dj,
                            c_full):
                """One device-resident refinement update.

                dv = Xc dj - xr + Z c; the stored full-system residual
                (a double-f32 hi/lo pair, so its quantization floor sits
                at ~1e-14 relative) absorbs delta = A dv - C dj via an
                error-free two-sum.  Only the correction dv reaches the
                accumulator; nothing n-sized crosses the tunnel."""
                dv = xc @ dj - xr + c_full[comp_pad_dev]
                adv = _dia.dia_matvec(op_meta, params, dv,
                                      backend=op_backend)
                return _two_sum_update(adv, dv, dcorr, rc_hi, rc_lo, dj)

            self._refine_step = refine_step
            self._refine_params = self._op_exact
        elif sharded:
            # Multi-chip device-resident refinement: same update, with
            # the exact matvec under shard_map (the vparams[0] operator
            # the sharded CG already uses).  Elementwise pieces stay
            # global ops; XLA inserts the (cheap, n-sized on-fabric)
            # reshards around the matvec.
            from jax.sharding import PartitionSpec as P

            from . import dia_sharded as _dsh
            from .spmv import shard_map_unchecked

            sh_params, sh_specs, sh_plan_meta, sh_mesh = \
                self._shard_refine

            def _adv_local(prm, xt):
                return _dsh.dia_matvec_t_local(
                    meta0, sh_plan_meta, prm, xt, "tp", backend)

            adv_sharded = shard_map_unchecked(
                _adv_local, mesh=sh_mesh,
                in_specs=(sh_specs, P(None, "tp")),
                out_specs=P(None, "tp"))

            @jax.jit
            def refine_step_sharded(params, xc, dcorr, rc_hi, rc_lo,
                                    xr, dj, c_full):
                dv = xc @ dj - xr + c_full[comp_pad_dev]
                adv = adv_sharded(params, dv[None, :])[0]
                return _two_sum_update(adv, dv, dcorr, rc_hi, rc_lo, dj)

            self._refine_step = refine_step_sharded
            self._refine_params = sh_params
        else:
            self._refine_step = None
            self._refine_params = None
        self._border_single = border_single
        self._ztr_device = ztr_device

        # f64 device anchor: pass 1's exact full-system residual
        # computed on device (no v download / host SpMV / rc re-upload).
        # Needs x64 mode and the retained widx split; falls back to the
        # host anchor on setup OR first-call failure (e.g. a backend
        # without f64 einsum support).
        self._anchor = None
        self._v1_pad = None
        self._want_v_dev = False
        if (self._refine_step is not None
                and jax.config.jax_enable_x64
                and "_hi" in (self._op_exact or {})
                and os.environ.get("PADNE_TPU_DEVICE_ANCHOR") == "1"
                and not os.environ.get("PADNE_TPU_HOST_ANCHOR")
                and not os.environ.get("PADNE_TPU_HOST_REFINE")):
            try:
                import time as _time2

                _ta = _time2.time()
                self._setup_anchor(level0.pack, row_node_pos,
                                   row_idx_dev, col_node_pos,
                                   col_idx_dev)
                self._trace("setup: anchor total", _ta)
            except Exception:
                log.info("f64 device anchor setup failed; keeping the "
                         "host anchor", exc_info=True)
                self._anchor = None
        # Compensated device-resident ladder setup (ops.comp) —
        # consumes the widx split like the anchor, then it is released.
        self._comp = None
        self._comp_thread = None
        self._comp_verified = False
        self._b64_cache = None
        self._rc0_pad = None
        if (want_comp and self._op_exact is not None
                and "_hi" in self._op_exact
                and self._refine_step is not None):
            # Deferred build (default): the comp operator is only
            # consumed at refinement time, AFTER the first main CG
            # pass, so its ~3-4 s of residue-slab builds and stream
            # transfers run on a worker thread and overlap the first
            # solve (the backend is initialized by now, and JAX
            # dispatch is thread-safe; the axon tunnel serializes the
            # transfers either way).  PADNE_TPU_SYNC_COMP=1 restores
            # the synchronous build (A/B + hang fallback).
            import threading as _threading
            import time as _time3

            _args = (level0.pack, row_node_pos, row_idx_dev,
                     col_node_pos, col_idx_dev)

            def _comp_worker():
                try:
                    _tc = _time3.time()
                    self._setup_comp(*_args)
                    self._trace("comp operator total (worker)", _tc)
                except Exception:
                    log.info("compensated operator setup failed; "
                             "keeping the host-anchored ladder",
                             exc_info=True)
                    self._comp = None

            if os.environ.get("PADNE_TPU_SYNC_COMP"):
                _comp_worker()
                self._release_widx()
            else:
                self._comp_thread = _threading.Thread(
                    target=_comp_worker, daemon=True)
                self._comp_thread.start()
        else:
            self._release_widx()

        # Host-side small dense pieces.
        self.BZ = np.zeros((m, p))
        np.add.at(self.BZ, (b.row_idx, system.comp_id[b.row_node]),
                  b.row_val)
        self.ZtC = np.zeros((p, m))
        np.add.at(self.ZtC, (system.comp_id[b.col_node], b.col_idx),
                  b.col_val)

        self.C_host = scipy.sparse.coo_matrix(
            (b.col_val, (b.col_node, b.col_idx)), shape=(n, m)).tocsr()
        self.B_host = scipy.sparse.coo_matrix(
            (b.row_val, (b.row_idx, b.row_node)), shape=(m, n)).tocsr()
        self._cg_iters = 0
        # A^-1 C cache: the m border columns of the Schur RHS never
        # change across refinement passes (only the residual column
        # does), so they are solved once — passes 2+ run a single-RHS
        # CG.  Measured: the border point-source columns are the SLOW
        # columns (their recurrence target sits at the f32 floor), so
        # this removes most of the per-pass iteration cost.
        self._Xc = None

    def _release_widx(self):
        """Release the ~5 B/nnz device widx split once its consumers
        (anchor / comp setup) are done with it, so it doesn't ride
        along as unused CG-operator params."""
        if self._op_exact is not None:
            self._op_exact.pop("_hi", None)
            self._op_exact.pop("_lo", None)

    def _comp_active(self) -> bool:
        """True when the comp ladder is built OR still building on the
        worker thread (solve-path branches must commit to the ladder
        before joining, so the build overlaps the main CG pass)."""
        return self._comp is not None or self._comp_thread is not None

    def _join_comp(self):
        """Join the deferred comp build (no-op when sync/absent).
        After this, self._comp is authoritative."""
        th = self._comp_thread
        if th is not None:
            th.join()
            self._comp_thread = None
            self._release_widx()

    def _rhs_block(self) -> int:
        """Column-block width for the border multi-RHS pass; 0 = solve
        all m+1 columns in one CG.

        CG columns are fully independent (per-column alpha/beta/active
        masks in ops.cg), so blocking changes grouping, not math.  On
        TPU, lane padding makes any R <= 128 cost the same per
        iteration — one block is optimal there.  On CPU the cost is
        linear in R, so a wide border (e.g. tht_component's m=64) pays
        (m+1) x slowest-column iterations monolithically; 16-wide
        blocks let fast blocks stop early (minutes -> default CI time).
        PADNE_TPU_RHS_BLOCK overrides (0 disables)."""
        import os

        env = os.environ.get("PADNE_TPU_RHS_BLOCK")
        if env is not None:
            return max(0, int(env))
        from . import dia

        if dia.default_backend() == "pallas":
            return 128 if self.m + 1 > 128 else 0
        return 16

    def _solve_border_block(self, rc_pad):
        """The pass-1 multi-RHS solve [A^-1 C | A^-1 rc], optionally in
        column blocks (see _rhs_block).  The residual column always
        solves separately in blocked mode so its convergence is not
        tied to the border columns' f32 stall floor."""
        m = self.m
        rhs = self._build_rhs(rc_pad)
        blk = self._rhs_block()
        if not blk or m + 1 <= blk + 1:
            return self._run_cg(rhs)
        parts = []
        for s in range(0, m, blk):
            e = min(s + blk, m)
            sub = rhs[:, s:e]
            pad = blk - (e - s)
            if pad:
                # Zero-pad to the block width: one compiled shape, and
                # a zero RHS column converges at iteration 0.
                sub = jnp.pad(sub, ((0, 0), (0, pad)))
            xs = self._run_cg(sub)
            parts.append(xs[:, :e - s])
        parts.append(self._run_cg(rhs[:, m:]))
        return jnp.concatenate(parts, axis=1)

    def _run_cg(self, rhs_dev, tol=None):
        tol = self.inner_tol if tol is None else tol
        dispatch_cap, maxiter = self.dispatch_cap, self.maxiter
        if dispatch_cap is None or maxiter <= dispatch_cap:
            res = self.cg_solver(rhs_dev, tol, maxiter)
            self._cg_iters += int(res.iterations)
            return res.x
        total = 0
        state = None
        while True:
            it = int(min(dispatch_cap, maxiter - total))
            res, state = self.cg_solver.stateful(
                rhs_dev, tol, it, state)
            chunk = int(res.iterations)
            total += chunk
            if chunk < it or total >= maxiter:
                break
        self._cg_iters += total
        return res.x

    def _solve_once(self, rc, rb, tol=None):
        """One Schur pass; rc (n,) rb (m,) host f64 -> (dv, dj) f64.

        tol: inner CG relative tolerance for this pass (defaults to
        self.inner_tol; the refinement loop passes a looser value on
        the FINAL pass, where only the remaining contraction to the
        outer target is needed — saves V-cycles vs running every pass
        to the f32 stall floor)."""
        import time

        m, p = self.m, self.p
        system = self.system
        t0 = time.time()
        if self._Xc is None or self._comp_active():
            # Comp ladder: the pass-0 rc must stay exact f32 — it is
            # the hi half of the device-resident exact b64 (see
            # _comp_b64), so the f16 wire trick below would poison the
            # exact residual, not just the correction RHS.
            rc_dev = jnp.asarray(rc.astype(np.float32))
        else:
            # Refinement-pass RHS rides the (slow) tunnel as scaled f16
            # — half the bytes.  Safe: a perturbed RHS only changes
            # which correction is computed, so per-entry 5e-4 relative
            # error merely caps the per-pass contraction at ~5e-4,
            # below the f32 stall floor's ~1e-4-2e-4 anyway in the
            # passes that matter.  Pass 1 (the original point-source
            # RHS) stays f32.
            scale = max(float(np.abs(rc).max()), 1e-300)
            rc16 = (rc / scale).astype(np.float16)
            rc_dev = jnp.asarray(rc16).astype(jnp.float32) * jnp.float32(
                scale)
        rc_pad = jnp.zeros(self.np0, jnp.float32).at[self.posmap_dev].set(
            rc_dev)
        rc_pad.block_until_ready()
        if self._comp_active():
            self._rc0_pad = rc_pad
        self._trace("upload rc", t0)
        t0 = time.time()
        if self._Xc is None:
            X = self._solve_border_block(rc_pad)         # (np0, m+1) f32
            self._Xc = X[:, :m]
        else:
            x_rc = self._run_cg(rc_pad[:, None], tol=tol)  # (np0, 1) f32
            X = jnp.concatenate([self._Xc, x_rc], axis=1)
        X.block_until_ready()
        self._trace("inner cg", t0)
        t0 = time.time()
        BXc, Bxr = self._border_products(X)
        BXc = np.asarray(BXc, dtype=np.float64)
        Bxr = np.asarray(Bxr, dtype=np.float64)
        self._BXc_host = BXc
        self._trace("border products", t0)
        t0 = time.time()
        Ztr = np.zeros(p)
        np.add.at(Ztr, system.comp_id, rc)
        j, c = self._small_correction(BXc, Bxr, rb, Ztr)
        self._trace("small lstsq", t0)
        t0 = time.time()
        c_full = jnp.asarray(
            np.concatenate([c, [0.0]]).astype(np.float32))  # dummy comp
        v_pad = self._combine(X, jnp.asarray(j.astype(np.float32)),
                              c_full, self.comp_pad_dev)
        if self._want_v_dev:
            # Anchor mode: v stays resident; the f64 anchor evaluates
            # the pass-1 residual on device, so nothing n-sized needs
            # to cross the tunnel here.
            v_pad.block_until_ready()
            self._v1_pad = v_pad
            self._trace("combine (v kept on device)", t0)
            return None, j
        # Fetch f32 over the wire, widen on host (np.asarray with a
        # dtype could widen on device first — 2x the tunnel bytes).
        v = np.asarray(v_pad).astype(np.float64)[self.posmap]
        self._trace("combine+download v", t0)
        return v, j

    def _setup_anchor(self, pack, row_node_pos, row_idx_dev,
                      col_node_pos, col_idx_dev):
        """Build the f64 device anchor jit.

        rc = r_core + A v - C j evaluated entirely on device in float64
        through a COO view of the operator: (row, col) pairs are
        reconstructed from the already-resident widx split, the f32
        values are gathered back from the resident slab, and the
        f32→f64 value residue (A_lo = A - f32(A), |A_lo| <= 6e-8|A|)
        decodes from an int16 fixed-point ratio stream
        (dia.ratio16_encode: 2 B/entry, ~2^-39 relative reconstruction
        error — two decades below the f64 refinement floor).  The COO
        triples are row-sorted once at setup so the runtime matvec is a
        sorted f64 segment_sum — the slab itself is NEVER cast to f64
        (per-offset f64 slab slices are ~625 MB each; XLA materializes
        them and OOMs HBM at 1M DoF).  Remainder/diag/r_core widen the
        same ratio16 way.  Also returns B v for the exact border
        residual and the squared core norm.  Replaces the host anchor's
        v download + f64 CSR SpMV + rc re-upload (the residual pair
        seeds the device-resident refinement loop directly)."""
        import time as _time

        from . import dia

        system = self.system
        b = system.border
        m, np0 = self.m, self.np0
        meta0 = self._meta0
        blk = meta0[1]
        op = self._op_exact
        hi_dev, lo_dev = op["_hi"], op["_lo"]

        # f64 view of the small operator pieces: resident f32 arrays
        # widened in place by int16 ratio streams (indices reused
        # verbatim).  One jit per stream keeps these off the eager
        # dispatch path.
        t0 = _time.time()
        buckets, _sp_r, _sp_c, sp_v = pack.rem_ell()
        widen = jax.jit(dia.ratio16_widen)
        op64 = {
            "diag": widen(
                op["diag"], jnp.asarray(dia.ratio16_encode(pack.diag))),
            "sp_rows": op["sp_rows"],
            "sp_cols": op["sp_cols"],
            "sp_vals": widen(
                op["sp_vals"], jnp.asarray(dia.ratio16_encode(sp_v))),
        }
        for d in dia.DiaPack.REM_BUCKETS:
            op64[f"r{d}_rows"] = op[f"r{d}_rows"]
            op64[f"r{d}_cols"] = op[f"r{d}_cols"]
            op64[f"r{d}_vals"] = widen(
                op[f"r{d}_vals"],
                jnp.asarray(dia.ratio16_encode(buckets[d][2])))
        self._trace("anchor: widen streams", t0)

        t0 = _time.time()
        q_slab = jnp.asarray(dia.ratio16_encode(pack.wval))
        self._trace("anchor: encode+upload slab ratios", t0)

        @jax.jit
        def _coo(w, h, lo, q):
            rows, cols = dia.coo_from_widx(meta0, h, lo)
            idx = h.astype(jnp.int64) * blk + lo.astype(jnp.int64)
            vhi = w.reshape(-1)[idx]
            vlo = vhi * (q.astype(jnp.float32)
                         * jnp.float32(dia.RATIO16_SCALE))
            order = jnp.argsort(rows)
            return rows[order], cols[order], vhi[order], vlo[order]

        t0 = _time.time()
        rows, cols, vals_hi, vals_lo = _coo(op["w"], hi_dev, lo_dev,
                                            q_slab)
        jax.block_until_ready(rows)
        self._trace("anchor: sorted COO build", t0)
        t0 = _time.time()
        rc32 = np.asarray(system.r_core, np.float64).astype(np.float32)
        b64 = jnp.zeros(np0, jnp.float64).at[self.posmap_dev].set(
            dia.ratio16_widen(
                jnp.asarray(rc32),
                jnp.asarray(dia.ratio16_encode(system.r_core))))
        cv64 = jnp.asarray(np.asarray(b.col_val, np.float64))
        rv64 = jnp.asarray(np.asarray(b.row_val, np.float64))
        self._trace("anchor: rhs/border widen", t0)

        # All large device arrays travel as jit ARGUMENTS (closure-
        # captured arrays would be inlined into the HLO as constants —
        # the nnz streams in particular; same rule as make_vcycle).
        @jax.jit
        def anchor(v_pad, j64, op64, rows, cols, vals_hi, vals_lo, b64,
                   cv64, rv64, col_node_pos, col_idx_dev, row_node_pos,
                   row_idx_dev):
            v64 = v_pad.astype(jnp.float64)
            vals64 = vals_hi.astype(jnp.float64) + vals_lo.astype(
                jnp.float64)
            av = jax.ops.segment_sum(
                vals64 * v64[cols], rows, num_segments=np0,
                indices_are_sorted=True)
            av = av + op64["diag"] * v64
            # Remainder + spill in f64 (awkward-degree rows outside the
            # slab; the widx split does not cover them).
            av = dia._apply_remainder(op64, v64[:, None],
                                      av[:, None])[:, 0]
            cj = jnp.zeros(np0, jnp.float64).at[col_node_pos].add(
                cv64 * j64[col_idx_dev])
            rc = b64 + av - cj
            hi = rc.astype(jnp.float32)
            lo = (rc - hi.astype(jnp.float64)).astype(jnp.float32)
            bv = jax.ops.segment_sum(v64[row_node_pos] * rv64,
                                     row_idx_dev, num_segments=m)
            return hi, lo, bv, jnp.sum(rc * rc)

        anchor_args = (op64, rows, cols, vals_hi, vals_lo, b64, cv64,
                       rv64, col_node_pos, col_idx_dev, row_node_pos,
                       row_idx_dev)
        self._anchor_args = anchor_args  # exposed for micro-profiling
        self._anchor = lambda v_pad, j64: anchor(v_pad, j64,
                                                 *anchor_args)
        self._want_v_dev = True

    def _setup_comp(self, pack, row_node_pos, row_idx_dev,
                    col_node_pos, col_idx_dev):
        """Build the compensated exact operator (ops.comp) and the
        device-resident refinement jits around it.

        The ladder this enables (see _comp_refine): one rc upload and
        one final v download per solve; every residual in between is
        evaluated ON DEVICE to ~1e-13 relative, so there is no device
        noise floor to hand over to a host mop-up pass.  Replaces the
        round-3 per-pass host f64 residual (v download + CSR SpMV + rc
        re-upload, ~0.5 s/pass at 1M DoF through the axon tunnel)."""
        import os
        import time as _time

        from . import comp as comp_mod
        from . import dia

        b = self.system.border
        np0, m, p = self.np0, self.m, self.p
        _t0 = _time.time()
        # Mode: the slab kernel (gather-free VPU Dekker pass, 27 ms vs
        # 81 ms for the ELL gather at 1M on v5e) on the pallas backend;
        # the portable ELL path elsewhere.  PADNE_TPU_COMP_MODE
        # overrides ("slab" | "f64" | "dekker").
        from . import dia as _dia_mode

        mode = os.environ.get("PADNE_TPU_COMP_MODE", "")
        if not mode:
            mode = ("slab" if _dia_mode.default_backend() == "pallas"
                    else "f64")
        if mode == "slab":
            cop = comp_mod.build_slab_mode(self._meta0, self._op_exact,
                                           pack)
        else:
            cop = comp_mod.build(self._meta0, self._op_exact, pack,
                                 mode=mode)
        meta0 = self._meta0
        if os.environ.get("PADNE_TPU_SOLVE_TRACE"):
            # Only block for honest per-phase attribution under the
            # trace; otherwise the build + lo-stream transfers stay
            # in flight and finish under the first solve's compile.
            jax.block_until_ready(
                cop.params["w_lo" if mode == "slab" else "ell_vals"])
        self._trace(f"setup: comp build ({mode})", _t0)
        cv64 = jnp.asarray(np.asarray(b.col_val, np.float64))
        rv64 = jnp.asarray(np.asarray(b.row_val, np.float64))
        comp_pad_dev = self.comp_pad_dev

        @jax.jit
        def residual0(cp, v_pad, j64, b64):
            """r64 = b64 + A64 v - C64 j, its squared norm, and B64 v."""
            av = comp_mod.apply(cop, cp, v_pad, meta0)
            cj = jnp.zeros(np0, jnp.float64).at[col_node_pos].add(
                cv64 * j64[col_idx_dev])
            r = b64 + av - cj
            v64 = v_pad.astype(jnp.float64)
            bv = jax.ops.segment_sum(v64[row_node_pos] * rv64,
                                     row_idx_dev, num_segments=m)
            return r, jnp.sum(r * r), bv

        @jax.jit
        def update(cp, xc, r64, dcorr64, xr, dj32, c_full):
            """One pass: dv = Xc dj - xr + Z c;  r64 += A64 dv - C64 dj;
            dcorr64 += dv.  Returns (r64, dcorr64, ||r||^2)."""
            dv = xc @ dj32 - xr + c_full[comp_pad_dev]
            av = comp_mod.apply(cop, cp, dv, meta0)
            cj = jnp.zeros(np0, jnp.float64).at[col_node_pos].add(
                cv64 * dj32.astype(jnp.float64)[col_idx_dev])
            r = r64 + av - cj
            return r, dcorr64 + dv.astype(jnp.float64), jnp.sum(r * r)

        @jax.jit
        def fused_pass(cp, xc, pinv_M, BXc64, BZ64, r64, rb64,
                       dcorr64, j64, xr):
            """One whole refinement pass on device: border products,
            the small correction (via the host-prefactored pinv of the
            constant Schur block — minimum-norm like the host lstsq),
            and the compensated update.  The host pulls ONE scalar
            (the new squared norm) for loop control."""
            xr64 = xr.astype(jnp.float64)
            Bxr = jax.ops.segment_sum(xr64[row_node_pos] * rv64,
                                      row_idx_dev, num_segments=m)
            Ztr = jax.ops.segment_sum(r64, comp_pad_dev,
                                      num_segments=p + 1)[:p]
            rhs_small = jnp.concatenate([rb64 + Bxr, Ztr])
            sol = pinv_M @ rhs_small
            dj, c = sol[:m], sol[m:]
            c_full = jnp.concatenate(
                [c, jnp.zeros(1, jnp.float64)]).astype(jnp.float32)
            dj32 = dj.astype(jnp.float32)
            dv = xc @ dj32 - xr + c_full[comp_pad_dev]
            av = comp_mod.apply(cop, cp, dv, meta0)
            cj = jnp.zeros(np0, jnp.float64).at[col_node_pos].add(
                cv64 * dj32.astype(jnp.float64)[col_idx_dev])
            r_new = r64 + av - cj
            rb_new = rb64 - (BXc64 @ dj - Bxr + BZ64 @ c)
            n2 = jnp.sum(r_new * r_new) + jnp.sum(rb_new * rb_new)
            return (r_new, rb_new, dcorr64 + dv.astype(jnp.float64),
                    j64 + dj, n2)

        @jax.jit
        def rhs32(r64):
            return r64.astype(jnp.float32)

        @jax.jit
        def ztr64(r64):
            return jax.ops.segment_sum(r64, comp_pad_dev,
                                       num_segments=p + 1)

        @jax.jit
        def pass_products(xr, r64):
            """(B xr, Z^T r) fused — one dispatch + one pull per pass
            instead of two round trips through the (slow) tunnel."""
            bx = jax.ops.segment_sum(
                xr.astype(jnp.float64)[row_node_pos] * rv64,
                row_idx_dev, num_segments=m)
            zt = jax.ops.segment_sum(r64, comp_pad_dev,
                                     num_segments=p + 1)
            return bx, zt

        @jax.jit
        def final_v(v_pad, dcorr64):
            return v_pad.astype(jnp.float64) + dcorr64

        @jax.jit
        def final_v_split(v_pad, dcorr64):
            """v as (f32 hi, scaled-f16 lo, scale): 6 B/row on the wire
            instead of 8, reconstructing to ~1e-10-relative — used once
            the device residual is host-verified (the verification
            solve itself downloads exact f64)."""
            v = v_pad.astype(jnp.float64) + dcorr64
            hi = v.astype(jnp.float32)
            lo = (v - hi.astype(jnp.float64)).astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(lo)), jnp.float32(1e-30))
            lo16 = (lo / s).astype(jnp.float16)
            return hi, lo16, s

        @jax.jit
        def widen_rc(rc32_pad, q_pad):
            return rc32_pad.astype(jnp.float64) * (
                1.0 + q_pad.astype(jnp.float64) * dia.RATIO16_SCALE)

        self._comp = {
            "op": cop, "residual0": residual0, "update": update,
            "rhs32": rhs32, "ztr64": ztr64, "final_v": final_v,
            "widen_rc": widen_rc, "pass_products": pass_products,
            "final_v_split": final_v_split, "fused_pass": fused_pass,
        }

    def _comp_b64(self, rc, rc_pad):
        """Exact f64 r_core on device: the resident f32 pad widened by
        an int16 ratio-residue upload (2 B/row).  Cached per r_core
        array (repeat solves of one system upload nothing)."""
        from . import dia

        if self._b64_cache is not None and self._b64_cache[0] is rc:
            return self._b64_cache[1]
        q = dia.ratio16_encode(rc)
        q_pad = jnp.zeros(self.np0, jnp.int16).at[self.posmap_dev].set(
            jnp.asarray(q))
        b64 = self._comp["widen_rc"](rc_pad, q_pad)
        self._b64_cache = (rc, b64)
        return b64

    def _comp_refine(self, j, target_residual, max_refinements):
        """Fully device-resident refinement ladder on the compensated
        operator: CG pass -> tiny (m,) border downloads -> host lstsq
        -> device update with an exact residual.  Nothing n-sized
        crosses the tunnel between the pass-0 rc upload and the single
        final v download.

        Returns (v, j, res_core, res_border, res_norm, refinements);
        res_core/res_border are None when the device residual was
        host-verified earlier and the target was met (the caller's
        mop-up loop is not entered)."""
        import os
        import time

        c = self._comp
        b = self.system.border
        p = self.p
        system = self.system
        t0 = time.time()
        b64 = self._comp_b64(system.r_core, self._rc0_pad)
        j64 = jnp.asarray(j.astype(np.float64))
        r64, n2, bv = c["residual0"](c["op"].params, self._v1_pad,
                                     j64, b64)
        n2_h, bv_h = jax.device_get((n2, bv))
        rb = b.rhs - np.asarray(bv_h, np.float64)
        res_norm = float(np.sqrt(float(n2_h) + (rb ** 2).sum()))
        self._trace("comp residual (device)", t0)
        dcorr64 = jnp.zeros(self.np0, jnp.float64)
        refinements = 0
        use_fused = p <= 256
        if use_fused:
            # Whole passes run on device: the constant Schur block is
            # prefactored ONCE on host (pinv — minimum-norm semantics,
            # like the host lstsq) and uploaded with the border pieces;
            # each pass then costs one CG dispatch, one fused-pass
            # dispatch, and a single scalar pull.
            M = np.concatenate([
                np.concatenate([self._BXc_host, self.BZ], axis=1),
                np.concatenate([self.ZtC, np.zeros((p, p))], axis=1),
            ], axis=0)
            dev = jax.device_put({
                "pinv": np.linalg.pinv(M),
                "BXc": self._BXc_host, "BZ": self.BZ,
                "rb": rb,
            })
            rb64 = dev["rb"]
        pending_v = None
        while (res_norm > target_residual
               and refinements < max_refinements):
            tol_pass = min(0.05, max(self.comp_inner_tol,
                                     0.2 * target_residual / res_norm))
            # The inner-tol clamp not binding means this pass should
            # contract all the way to the target — i.e. it is expected
            # to be the LAST one.
            expect_final = (0.2 * target_residual / res_norm
                            >= self.comp_inner_tol)
            t0 = time.time()
            x = self._run_cg(c["rhs32"](r64)[:, None], tol=tol_pass)
            x.block_until_ready()
            self._trace("inner cg (comp pass)", t0)
            t0 = time.time()
            xr = x[:, 0]
            if use_fused:
                prev = (r64, rb64, dcorr64, j64, res_norm)
                (r64n, rb64n, dcorr64n, j64n,
                 n2_new) = c["fused_pass"](
                    c["op"].params, self._Xc, dev["pinv"], dev["BXc"],
                    dev["BZ"], r64, rb64, dcorr64, j64, xr)
                if (expect_final and self._comp_verified
                        and not os.environ.get("PADNE_TPU_HOST_CHECK")):
                    # Optimistically dispatch the final split-precision
                    # v AND start its device->host copy NOW, so the
                    # 0.3-0.6 s download (tunnel-bound) overlaps the
                    # fused pass + the norm scalar round trip below.
                    # Wasted only when the expected-final pass stalls.
                    pend = c["final_v_split"](self._v1_pad, dcorr64n)
                    try:
                        for a in pend:
                            a.copy_to_host_async()
                    except Exception:  # noqa: BLE001 platform-optional
                        pass
                    pending_v = (dcorr64n,) + tuple(pend)
                new_norm = float(np.sqrt(float(n2_new)))
                refinements += 1
                self._trace("comp fused pass", t0)
                if new_norm >= res_norm:
                    r64, rb64, dcorr64, j64, res_norm = prev
                    break
                r64, rb64, dcorr64, j64 = r64n, rb64n, dcorr64n, j64n
                res_norm = new_norm
                continue
            bx_d, zt_d = c["pass_products"](xr, r64)
            Bxr = np.asarray(bx_d, dtype=np.float64)
            Ztr = np.asarray(zt_d, dtype=np.float64)[:p]
            dj, cc = self._small_correction(self._BXc_host, Bxr, rb,
                                            Ztr)
            c_full = jnp.asarray(
                np.concatenate([cc, [0.0]]).astype(np.float32))
            prev = (r64, dcorr64, rb, j, res_norm)
            r64, dcorr64, n2 = c["update"](
                c["op"].params, self._Xc, r64, dcorr64, xr,
                jnp.asarray(dj.astype(np.float32)), c_full)
            rb = rb - (self._BXc_host @ dj - Bxr + self.BZ @ cc)
            j = j + dj
            refinements += 1
            new_norm = float(np.sqrt(float(n2) + (rb ** 2).sum()))
            self._trace("comp update", t0)
            if new_norm >= res_norm:
                # CG stall (not a precision floor — the compensated
                # residual sits at ~1e-13 relative): revert, hand back.
                r64, dcorr64, rb, j, res_norm = prev
                break
            res_norm = new_norm
        if use_fused:
            j = np.asarray(j64, dtype=np.float64)
        t0 = time.time()
        if self._comp_verified and not os.environ.get(
                "PADNE_TPU_HOST_CHECK"):
            if pending_v is not None and pending_v[0] is dcorr64:
                hi, lo16, sc = pending_v[1:]   # copy already in flight
            else:
                hi, lo16, sc = c["final_v_split"](self._v1_pad, dcorr64)
            v = (np.asarray(hi).astype(np.float64)
                 + np.asarray(lo16).astype(np.float64)
                 * float(sc))[self.posmap]
            self._trace("download v (f32+f16)", t0)
        else:
            v = np.asarray(c["final_v"](self._v1_pad,
                                        dcorr64))[self.posmap]
            self._trace("download v (f64)", t0)
        # Honesty: verify the device residual against the host f64
        # residual on the first solve of this instance (and whenever
        # the ladder failed to reach the target, so the caller's mop-up
        # loop starts from true host state).  Once verified, repeat
        # solves trust the device number; PADNE_TPU_HOST_CHECK=1 forces
        # the check every solve.
        res_core = res_border = None
        if (not self._comp_verified or res_norm > target_residual
                or os.environ.get("PADNE_TPU_HOST_CHECK")):
            res_core, res_border = self._full_residual(v, j)
            host_norm = float(np.sqrt((res_core ** 2).sum()
                                      + (res_border ** 2).sum()))
            self._comp_verified = (
                abs(host_norm - res_norm)
                <= 0.25 * max(host_norm, res_norm))
            if not self._comp_verified:
                import logging

                logging.getLogger(__name__).info(
                    "comp residual disagrees with host (%.3e vs %.3e);"
                    " host value kept", res_norm, host_norm)
            res_norm = host_norm
        return v, j, res_core, res_border, res_norm, refinements

    def _small_correction(self, BXc, Bxr, rb, Ztr):
        """Solve the small dense (m+p) Schur block with lstsq (graceful
        on ill-posed borders): returns the border correction (j, c)."""
        m, p = self.m, self.p
        if p > 256:
            j, *_ = np.linalg.lstsq(self.ZtC, Ztr, rcond=None)
            c, *_ = np.linalg.lstsq(self.BZ, (rb + Bxr) - BXc @ j,
                                    rcond=None)
        else:
            top = np.concatenate([BXc, self.BZ], axis=1)
            bot = np.concatenate([self.ZtC, np.zeros((p, p))], axis=1)
            M = np.concatenate([top, bot], axis=0)
            rhs_small = np.concatenate([rb + Bxr, Ztr])
            sol, *_ = np.linalg.lstsq(M, rhs_small, rcond=None)
            j, c = sol[:m], sol[m:]
        return j, c

    def _device_refine(self, v, j, res_core, res_border,
                       target_residual, max_refinements,
                       rc_pair=None, res_norm0=None, v_pad_dev=None):
        """Device-resident refinement passes (passes 2+ of solve()).

        The host anchor (pass 1's exact f64 residual) uploads once as
        f32 — its quantization (6e-8 * ||rc1|| ~ 1e-11 * ||b|| at the
        measured f32 stall floor) sits below the refinement targets.
        Each pass then runs entirely on device: single-RHS CG, a tiny
        (m,) border-product download, the small host lstsq, and one
        fused update that accumulates the correction and maintains the
        residual as a double-f32 pair via exact two-sums.  Nothing
        n-sized crosses the host<->device tunnel until the final
        correction download; a closing host f64 residual keeps the
        reported norm honest (and hands over to the host-anchored loop
        if the device floor lands above the target).

        Returns (v, j, res_core, res_border, res_norm, refinements).
        """
        import os
        import time

        p = self.p
        if rc_pair is not None:
            # Device-anchored entry: the residual pair is already
            # resident (f64 anchor); res_core is not materialized.
            rc_hi, rc_lo = rc_pair
            res_norm = res_norm0
        else:
            res_norm = float(np.sqrt((res_core**2).sum()
                                     + (res_border**2).sum()))
            t0 = time.time()
            rc_hi = jnp.zeros(self.np0,
                              jnp.float32).at[self.posmap_dev].set(
                jnp.asarray(res_core.astype(np.float32)))
            rc_lo = jnp.zeros(self.np0, jnp.float32)
            rc_hi.block_until_ready()
            self._trace("upload anchor rc", t0)
        dcorr = jnp.zeros(self.np0, jnp.float32)
        rb = res_border.astype(np.float64).copy()
        refinements = 0
        # f32-matvec noise floor of the maintained residual pair: each
        # pass's two-sum absorbs delta = A dv - C dj whose f32 slab
        # matvec carries ~eps32 * (|A||dv|)_i per row; the pair is
        # error-free GIVEN delta, so this noise accumulates and the
        # VISIBLE norm diverges from the true residual near it.  Track
        # it via ||diag*dv|| (Sigma_j |a_ij| ~ 2 diag_i for the SPD
        # cotan core) and hand the mop-up to the exact host loop once
        # the target sits within a safety factor of the floor — a
        # device pass below the floor is wasted work the host pass
        # redoes anyway.
        floor_acc = 0.0
        diag_dev = None
        if isinstance(self._refine_params, dict):
            diag_dev = self._refine_params.get("diag")
        while (res_norm > target_residual
               and res_norm > 4.0 * floor_acc
               and refinements < max_refinements):
            tol_pass = min(0.05, max(self.inner_tol,
                                     0.2 * target_residual / res_norm))
            t0 = time.time()
            x = self._run_cg(rc_hi[:, None], tol=tol_pass)
            x.block_until_ready()
            self._trace("inner cg (device pass)", t0)
            t0 = time.time()
            xr = x[:, 0]
            Bxr = np.asarray(self._border_single(xr), dtype=np.float64)
            Ztr = np.asarray(self._ztr_device(rc_hi, rc_lo),
                             dtype=np.float64)[:p]
            dj, c = self._small_correction(self._BXc_host, Bxr, rb, Ztr)
            c_full = jnp.asarray(
                np.concatenate([c, [0.0]]).astype(np.float32))
            prev = (dcorr, rc_hi, rc_lo, rb, j, res_norm)
            dcorr, rc_hi, rc_lo, n2 = self._refine_step(
                self._refine_params, self._Xc, dcorr, rc_hi, rc_lo, xr,
                jnp.asarray(dj.astype(np.float32)), c_full)
            rb = rb - (self._BXc_host @ dj - Bxr + self.BZ @ c)
            j = j + dj
            refinements += 1
            new_norm = float(np.sqrt(float(n2) + (rb**2).sum()))
            if diag_dev is not None:
                floor_acc += 2.4e-7 * float(
                    jnp.linalg.norm(diag_dev * xr))
                if os.environ.get("PADNE_TPU_SOLVE_TRACE"):
                    import sys as _sys

                    print(f"[solve-trace] pass {refinements}: visible "
                          f"{new_norm:.3e} floor_est {floor_acc:.3e}",
                          file=_sys.stderr, flush=True)
            self._trace("device update", t0)
            if new_norm >= res_norm:
                # Device floor/stall: revert the pass, hand back.
                dcorr, rc_hi, rc_lo, rb, j, res_norm = prev
                break
            res_norm = new_norm
        t0 = time.time()
        if v_pad_dev is not None:
            # Anchored entry (v is None by contract): combine on device
            # in f64 (x64 is on in anchor mode), one download for the
            # final result.
            v_full = jax.jit(
                lambda a, c: a.astype(jnp.float64)
                + c.astype(jnp.float64))(v_pad_dev, dcorr)
            v = np.asarray(v_full)[self.posmap]
        else:
            v = v + np.asarray(dcorr).astype(np.float64)[self.posmap]
        self._trace("download correction", t0)
        res_core, res_border = self._full_residual(v, j)
        res_norm = float(np.sqrt((res_core**2).sum()
                                 + (res_border**2).sum()))
        return v, j, res_core, res_border, res_norm, refinements

    @staticmethod
    def _trace(label, t0):
        """PADNE_TPU_SOLVE_TRACE=1: per-phase stderr timing lines."""
        import os

        if os.environ.get("PADNE_TPU_SOLVE_TRACE"):
            import sys
            import time

            print(f"[solve-trace] {label}: {time.time() - t0:.3f}s",
                  file=sys.stderr, flush=True)

    def _full_residual(self, v, j):
        import time

        t0 = time.time()
        b = self.system.border
        res_core = self.system.r_core + self.A_host @ v - self.C_host @ j
        res_border = b.rhs - self.B_host @ v
        self._trace("host f64 residual", t0)
        return res_core, res_border

    def solve(self, target_residual: float = 1e-10,
              max_refinements: int = 8) -> BorderedSolution:
        import logging
        import os

        system, b = self.system, self.system.border
        self._cg_iters = 0
        # Keep-v-on-device applies to THIS pass only: later host-
        # fallback passes through _solve_once must return host arrays.
        self._want_v_dev = (self._anchor is not None
                            or self._comp_active())
        v, j = self._solve_once(system.r_core, b.rhs)
        self._want_v_dev = False
        refinements = 0
        anchored = False
        # The deferred comp build has had the whole main CG pass to
        # finish; join it now (fallbacks below handle a failed build).
        self._join_comp()
        if v is None and self._comp is not None:
            # Compensated device-resident ladder (the default when x64
            # is on): exact residuals on device, no host anchor pass.
            try:
                (v, j, res_core, res_border, res_norm,
                 refinements) = self._comp_refine(
                    j, target_residual, max_refinements)
                anchored = True
            except Exception:
                # e.g. a Mosaic lowering fault in the slab kernel on
                # an unusual shape: permanently fall back to the
                # host-anchored ladder for this instance.
                logging.getLogger(__name__).info(
                    "compensated ladder failed at runtime; "
                    "host-anchored ladder takes over", exc_info=True)
                self._comp = None
                v = np.asarray(self._v1_pad).astype(
                    np.float64)[self.posmap]
        elif v is None:
            # Anchor mode: v stayed on device; evaluate the exact pass-1
            # residual there.  A runtime failure (platform without f64
            # einsum) permanently falls back to the host anchor.
            import time

            try:
                t0 = time.time()
                rc_hi, rc_lo, bv, n2 = self._anchor(
                    self._v1_pad, jnp.asarray(j.astype(np.float64)))
                n2 = float(n2)
                self._trace("f64 device anchor", t0)
            except Exception:
                logging.getLogger(__name__).info(
                    "f64 device anchor failed at runtime; host anchor "
                    "takes over", exc_info=True)
                self._anchor = None
            if self._anchor is None:
                v = np.asarray(self._v1_pad).astype(
                    np.float64)[self.posmap]
            else:
                rb = b.rhs - np.asarray(bv, dtype=np.float64)
                res_norm = float(np.sqrt(n2 + (rb**2).sum()))
                (v, j, res_core, res_border, res_norm,
                 refinements) = self._device_refine(
                    None, j, None, rb, target_residual,
                    max_refinements, rc_pair=(rc_hi, rc_lo),
                    res_norm0=res_norm, v_pad_dev=self._v1_pad)
                anchored = True
        if not anchored:
            # Host-anchored entry (anchor off, or it fell back).
            res_core, res_border = self._full_residual(v, j)
            res_norm = float(np.sqrt((res_core**2).sum()
                                     + (res_border**2).sum()))
            # Device-resident passes (no per-pass n-sized transfers);
            # the host-anchored loop below mops up if the device floor
            # sits above the target.  PADNE_TPU_HOST_REFINE=1 forces
            # the legacy host loop (A/B + fallback).
            if (self._refine_step is not None
                    and res_norm > target_residual
                    and refinements < max_refinements
                    and not os.environ.get("PADNE_TPU_HOST_REFINE")):
                (v, j, res_core, res_border, res_norm,
                 refinements) = self._device_refine(
                    v, j, res_core, res_border, target_residual,
                    max_refinements)
        while res_norm > target_residual and refinements < max_refinements:
            # Pass-adaptive inner tolerance: only the remaining
            # contraction to the outer target is needed, with a 5x
            # margin.  Early passes hit the f32 stall floor regardless;
            # the FINAL pass typically needs a factor of only 10-100 —
            # a few V-cycles instead of running to the stall window.
            tol_pass = min(0.05, max(self.inner_tol,
                                     0.2 * target_residual / res_norm))
            dv, dj = self._solve_once(res_core, res_border, tol=tol_pass)
            v_new, j_new = v + dv, j + dj
            rc_new, rb_new = self._full_residual(v_new, j_new)
            new_norm = float(np.sqrt((rc_new**2).sum()
                                     + (rb_new**2).sum()))
            refinements += 1
            if new_norm >= res_norm:
                break
            v, j = v_new, j_new
            res_core, res_border = rc_new, rb_new
            res_norm = new_norm

        gc = float(j[system.ground_var]) if self.m > 0 else 0.0
        return BorderedSolution(
            v=v, j=np.asarray(j), residual_norm=res_norm,
            ground_current=gc, cg_iterations=self._cg_iters,
            refinement_steps=refinements,
        )


class _NoDiaHierarchy(Exception):
    """No DIA hierarchy could be built (system too small)."""


def _solve_bordered_dia(
    system: CoreSystem,
    tol: float,
    maxiter: int,
    max_refinements: int,
    target_residual: float,
    dispatch_cap="auto",
    mesh=None,
    shard_min: int = 32768,
) -> Optional[BorderedSolution]:
    """One-shot wrapper around DiaBorderedSolver (the solve_bordered
    dispatch target).  Returns None when no hierarchy can be built."""
    try:
        solver = DiaBorderedSolver(
            system, tol=tol, maxiter=maxiter, dispatch_cap=dispatch_cap,
            mesh=mesh, shard_min=shard_min)
    except _NoDiaHierarchy:
        return None
    return solver.solve(target_residual=target_residual,
                        max_refinements=max_refinements)
