"""Batched multi-RHS preconditioned conjugate gradients with deflation.

Solves A X = B for an SPSD graph Laplacian A in ELL form, for R
right-hand sides simultaneously (vectorized CG: each column keeps its own
alpha/beta but every iteration shares the one multi-RHS SpMV — the TPU
replacement for the reference's direct SuperLU factorization,
solver.py:767-780).  TPU measurement note: the ELL gather cost is per
index and nearly flat in the number of RHS columns, so multi-RHS
batching is effectively free.

A is singular with nullspace = per-component constants; the solver works
in the orthogonal complement by projecting the RHS, the preconditioned
residual, and (periodically) the iterates — yielding the pseudo-inverse
action A^+ B.  The preconditioner is pluggable: Jacobi by default, or an
AMG V-cycle (ops.amg) for mesh-size-independent convergence.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .spmv import ell_matvec


class CGResult(NamedTuple):
    x: jnp.ndarray           # (N, R)
    iterations: jnp.ndarray  # scalar int
    residual_norms: jnp.ndarray  # (R,) final ||b - A x|| per column


def make_projector(comp_id: jnp.ndarray, num_components: int):
    """Orthogonal projector onto the complement of per-component constant
    vectors: x <- x - mean_of_component(x).

    Implemented as dense one-hot matmuls (p is small), which run on the
    MXU instead of the scatter unit — measured ~10x faster than
    segment_sum on TPU for the per-iteration projection.
    """
    if num_components == 1:
        def project(x):
            return x - jnp.mean(x, axis=0, keepdims=True)

        return project

    onehot = jax.nn.one_hot(comp_id, num_components, dtype=jnp.float64)  # (n, p)
    counts = onehot.sum(axis=0)  # (p,)

    def project(x):
        sums = onehot.T @ x               # (p, R)
        means = sums / counts[:, None]
        return x - onehot @ means

    return project


def make_pcg(
    cols: jnp.ndarray,
    vals: jnp.ndarray,
    diag: jnp.ndarray,
    comp_id: jnp.ndarray,
    num_components: int,
    precond: Optional[tuple] = None,
):
    """Build a jitted deflated-PCG solver bound to one operator.

    precond: (apply, params) pair where z = apply(params, r) on (N, R)
    arrays — e.g. ops.amg.make_vcycle's return value; None selects
    Jacobi.  All large arrays (operator, preconditioner levels) are
    threaded through the jitted program as explicit XLA parameters, not
    closure constants, so compilation stays cheap at millions of rows.
    Returns solve(b, tol, maxiter) -> CGResult.
    """
    if precond is None:
        def apply_m(op, r):
            _, _, dg, _ = op
            minv = jnp.where(dg > 0, 1.0 / jnp.where(dg > 0, dg, 1.0), 1.0)
            return minv[:, None] * r
        precond_params = None
    else:
        precond_fn, precond_params = precond

        def apply_m(op, r):
            return precond_fn(op[3], r)

    @partial(jax.jit, static_argnames=("num_components", "maxiter"))
    def _solve(op, comp_id, b, tol, num_components: int, maxiter: int):
        cols, vals, diag, _ = op
        project = make_projector(comp_id, num_components)
        b = project(b)
        bnorm = jnp.linalg.norm(b, axis=0)
        target = tol * jnp.maximum(bnorm, 1e-300)

        x0 = jnp.zeros_like(b)
        r0 = b
        z0 = project(apply_m(op, r0))
        p0 = z0
        rz0 = (r0 * z0).sum(axis=0)

        def cond(state):
            _, r, _, _, k, _ = state
            rn = jnp.linalg.norm(r, axis=0)
            return jnp.logical_and(k < maxiter, jnp.any(rn > target))

        def body(state):
            x, r, z, p, k, rz = state
            active = jnp.linalg.norm(r, axis=0) > target  # (R,)
            ap = ell_matvec(cols, vals, diag, p)
            pap = (p * ap).sum(axis=0)
            alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
            alpha = jnp.where(active, alpha, 0.0)
            x = x + alpha[None, :] * p
            r = r - alpha[None, :] * ap
            # Periodic re-projection kills numerical drift into the
            # nullspace.
            r = jax.lax.cond(k % 50 == 49, project, lambda v: v, r)
            z = project(apply_m(op, r))
            rz_new = (r * z).sum(axis=0)
            beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
            beta = jnp.where(active, beta, 0.0)
            p = z + beta[None, :] * p
            return (x, r, z, p, k + 1, rz_new)

        x, r, _, _, iters, _ = jax.lax.while_loop(
            cond, body, (x0, r0, z0, p0, jnp.int64(0), rz0)
        )
        rtrue = b - ell_matvec(cols, vals, diag, x)
        return CGResult(
            x=project(x),
            iterations=iters,
            residual_norms=jnp.linalg.norm(rtrue, axis=0),
        )

    op = (cols, vals, diag, precond_params)

    def solve(b, tol, maxiter: int = 10000) -> CGResult:
        return _solve(op, comp_id, b, tol, num_components, maxiter)

    return solve


def pcg(
    cols: jnp.ndarray,
    vals: jnp.ndarray,
    diag: jnp.ndarray,
    b: jnp.ndarray,             # (N, R)
    comp_id: jnp.ndarray,       # (N,)
    num_components: int,
    tol: float = 1e-12,
    maxiter: int = 10000,
) -> CGResult:
    """One-shot Jacobi-preconditioned deflated CG.

    Convenience wrapper; compiles per call — hold on to make_pcg's solver
    for repeated solves against one operator."""
    solver = make_pcg(cols, vals, diag, comp_id, num_components)
    return solver(b, tol, maxiter)
