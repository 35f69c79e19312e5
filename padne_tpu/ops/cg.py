"""Batched multi-RHS preconditioned conjugate gradients with deflation.

Solves A X = B for an SPSD graph Laplacian A in ELL form, for R
right-hand sides simultaneously (vectorized CG: each column keeps its own
alpha/beta but every iteration shares the one multi-RHS SpMV — the TPU
replacement for the reference's direct SuperLU factorization,
solver.py:767-780).

A is singular with nullspace = per-component constants; the solver works
in the orthogonal complement by projecting the RHS and periodically
re-projecting iterates ("deflation"), yielding the pseudo-inverse action
A^+ B.  Converged columns are frozen via masking so a hard column cannot
stall the others' updates.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .spmv import ell_matvec


class CGResult(NamedTuple):
    x: jnp.ndarray          # (N, R)
    iterations: jnp.ndarray  # scalar int
    residual_norms: jnp.ndarray  # (R,) final ||b - A x|| per column


def make_projector(comp_id: jnp.ndarray, num_components: int):
    """Orthogonal projector onto the complement of per-component constant
    vectors: x <- x - mean_of_component(x)."""
    counts = jax.ops.segment_sum(
        jnp.ones_like(comp_id, dtype=jnp.float64), comp_id,
        num_segments=num_components,
    )

    def project(x):
        sums = jax.ops.segment_sum(x, comp_id, num_segments=num_components)
        means = sums / counts[:, None]
        return x - means[comp_id]

    return project


@partial(jax.jit, static_argnames=("num_components", "maxiter"))
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
    """Jacobi-preconditioned deflated CG.  Returns A^+ P b (P = nullspace
    projector) per column."""
    project = make_projector(comp_id, num_components)
    minv = jnp.where(diag > 0, 1.0 / jnp.where(diag > 0, diag, 1.0), 1.0)

    b = project(b)
    bnorm = jnp.linalg.norm(b, axis=0)
    target = tol * jnp.maximum(bnorm, 1e-300)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = minv[:, None] * r0
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
        # Periodic re-projection kills numerical drift into the nullspace.
        r = jax.lax.cond(k % 50 == 49, project, lambda v: v, r)
        z = minv[:, None] * r
        rz_new = (r * z).sum(axis=0)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        beta = jnp.where(active, beta, 0.0)
        p = z + beta[None, :] * p
        return (x, r, z, p, k + 1, rz_new)

    x, r, _, _, iters, _ = jax.lax.while_loop(
        cond, body, (x0, r0, z0, p0, jnp.int64(0), rz0)
    )
    # True residual (not the recurrence residual).
    rtrue = b - ell_matvec(cols, vals, diag, x)
    return CGResult(
        x=project(x),
        iterations=iters,
        residual_norms=jnp.linalg.norm(rtrue, axis=0),
    )
