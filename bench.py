"""North-star benchmark: FEM PDN solve throughput on the current device.

Meshes a large copper plane (the "high-current heating-element plane"
config, BASELINE.json configs[3]), assembles the ELL Laplacian, and
times the Jacobi-PCG solve to 1e-6 relative residual on the default JAX
device (the real TPU under the driver; CPU elsewhere).

Prints ONE JSON line:
  {"metric": "solve_dof_per_sec", "value": N, "unit": "DoF/s",
   "vs_baseline": N / 1e6}
vs_baseline normalizes against the BASELINE.md target of 1M DoF solved
per second (1M-DoF board in <1 s).
"""

import json
import sys
import time

import numpy as np


def build_system(target_dof: int):
    from padne_tpu import geom, mesh
    from padne_tpu.ops import assembly

    # Plane size fixed; mesh density chosen to hit the DoF target
    # (vertices ~ area / (0.43 * size^2) empirically).
    side = 100.0
    size = max(0.08, (side * side / (0.43 * target_dof)) ** 0.5)
    poly = geom.box(0.0, 0.0, side, side)
    cfg = mesh.Mesher.Config(
        maximum_size=size, variable_size_maximum_factor=1.0
    )
    m = mesh.Mesher(cfg).poly_to_mesh(poly)
    ell = assembly.build_ell(
        m.num_vertices, m.edges.astype(np.int64), m.cotan_edge_weights
    )
    return m, ell


def main():
    target_dof = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    t_mesh0 = time.time()
    m, ell = build_system(target_dof)
    t_mesh = time.time() - t_mesh0
    n = m.num_vertices

    import jax
    import jax.numpy as jnp

    from padne_tpu.ops import amg, assembly, cg

    dtype = jnp.float32
    cols = jnp.asarray(ell.cols)
    vals = jnp.asarray(ell.vals, dtype=dtype)
    diag = jnp.asarray(ell.diag, dtype=dtype)

    # Balanced multi-RHS (8 source/sink pairs), consistent for the
    # singular Neumann operator.
    R = 8
    rng = np.random.default_rng(42)
    b_np = np.zeros((n, R), dtype=np.float32)
    for k in range(R):
        i, j = rng.integers(0, n, 2)
        b_np[i, k] += 1.0
        b_np[j, k] -= 1.0
    b = jnp.asarray(b_np)

    tol = 1e-8  # BASELINE.md row 1: 1e-8 relative residual
    comp_id = np.zeros(n, dtype=np.int32)  # single connected plane
    cid = jnp.asarray(comp_id)

    t_setup0 = time.time()
    hierarchy = amg.build_hierarchy(ell)
    vcycle = amg.make_vcycle(hierarchy, dtype=dtype)
    solver = cg.make_pcg(cols, vals, diag, cid, 1, precond=vcycle)
    t_setup = time.time() - t_setup0

    # Mixed-precision refinement, fully on device: f32 AMG-PCG corrections
    # accumulate into an f64 solution; the per-pass true residual is one
    # f64 SpMV (emulated on TPU but amortized — one per pass, not per
    # iteration).  No host transfers inside the loop.
    from padne_tpu.ops.spmv import ell_matvec

    vals64 = jnp.asarray(ell.vals)
    diag64 = jnp.asarray(ell.diag)

    @jax.jit
    def residual64(op64, b64, x64):
        v64, d64 = op64
        r = b64 - ell_matvec(cols, v64, d64, x64)
        r = r - r.mean(axis=0, keepdims=True)  # deflate
        return r, jnp.linalg.norm(r)

    def mp_solve(b64_np: np.ndarray, max_passes: int = 8):
        """Mixed-precision solve; returns (x64, passes, iters, rel)."""
        b64 = jnp.asarray(b64_np)
        x64 = jnp.zeros_like(b64)
        bn = float(jnp.linalg.norm(b64))
        total_iters = 0
        rel = np.inf
        for p in range(max_passes):
            r64, rn = residual64((vals64, diag64), b64, x64)
            rel = float(rn) / bn
            if rel < tol:
                return x64, p, total_iters, rel
            # Short inner passes: the axon tunnel kills single device
            # dispatches that run too long, so cap the while_loop length
            # and let the outer f64 refinement finish the job.
            res = solver(r64.astype(dtype), 1e-4, 60)
            total_iters += int(res.iterations)
            x64 = x64 + res.x.astype(jnp.float64)
        _, rn = residual64((vals64, diag64), b64, x64)
        jax.block_until_ready(x64)
        return x64, max_passes, total_iters, float(rn) / bn

    # Warmup / compile.
    mp_solve(b_np.astype(np.float64))

    # Timed solves with fresh RHS each run (defeats any execution-level
    # caching in the runtime).
    times = []
    for run in range(3):
        b_run = np.zeros((n, R))
        rng2 = np.random.default_rng(100 + run)
        for k in range(R):
            i, j = rng2.integers(0, n, 2)
            b_run[i, k] += 1.0
            b_run[j, k] -= 1.0
        t0 = time.time()
        x64, passes, iters, final_rel = mp_solve(b_run)
        times.append(time.time() - t0)
    t_solve = float(np.median(times))
    dof_per_sec = n / t_solve
    result = {
        "metric": "solve_dof_per_sec",
        "value": round(dof_per_sec, 1),
        "unit": "DoF/s",
        "vs_baseline": round(dof_per_sec / 1e6, 4),
        "detail": {
            "dof": n,
            "solve_seconds": round(t_solve, 3),
            "mesh_seconds": round(t_mesh, 3),
            "amg_setup_seconds": round(t_setup, 3),
            "cg_iterations": iters,
            "final_rel_residual": final_rel,
            "rhs_columns": R,
            "amg_levels": [len(l.a_diag) for l in hierarchy.levels],
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
