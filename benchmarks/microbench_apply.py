"""Microbenchmark: decompose the DIA operator-apply / V-cycle cost on
the current device (run on the real TPU).

Builds (or loads from /tmp/padne_bench_1m.npz) the 1M-DoF plane system,
then times each piece of the hot loop separately:

  slab        pallas kernel only (no remainder, no diag)
  diag        + diagonal multiply
  remainder   the off-offset gather + scatter-add (and the transpose
              sandwich it needs in the transposed layout)
  exact mv    the full dia_matvec_t
  vcycle      one preconditioner application
  cg iter     one full PCG iteration (5 applies + dots + axpys)

Usage: python benchmarks/microbench_apply.py [target_dof]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")


def get_system(target_dof=1_000_000, cache="/tmp/padne_bench_1m.npz"):
    """The bench board's assembled core system (cached as flat arrays).

    Returns (ell, coords, group) — the EllMatrix core operator plus the
    per-row coordinates and mesh-id group key that build_hierarchy_dia
    consumes (same inputs ops.schur.DiaBorderedSolver passes it)."""
    import os

    if os.path.exists(cache):
        z = np.load(cache)
        if abs(int(z["n"]) - target_dof) / target_dof < 0.3:
            from padne_tpu.ops import assembly

            ell = assembly.EllMatrix(
                cols=z["cols"], vals=z["vals"], diag=z["diag"])
            return ell, z["verts"], z["group"]
    sys.path.insert(0, "/root/repo")
    from tests.boardgen import gen_bench_4layer
    from padne_tpu import kicad, mesh, solver

    pro = gen_bench_4layer("/tmp/padne_bench_board")
    prob = kicad.load_kicad_project(pro)
    area = sum(layer.shape.area for layer in prob.layers)
    size = max(0.05, (area / (0.43 * target_dof)) ** 0.5)
    cfg = mesh.Mesher.Config(
        maximum_size=size, variable_size_maximum_factor=1.0)
    system, *_ = solver.build_system(prob, mesher_config=cfg)
    np.savez(cache, n=system.n, cols=system.ell.cols,
             vals=system.ell.vals, diag=system.ell.diag,
             verts=system.coords, group=system.group)
    return system.ell, system.coords, system.group


def _sync(r):
    """Force completion: a 1-element download waits for r's whole
    dependency chain (block_until_ready alone is unreliable through the
    axon tunnel)."""
    import jax

    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ell, verts, group = get_system(target)
    n = len(ell.diag)
    print(f"n={n}", flush=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from padne_tpu.ops import amg, cg, dia

    import os as _os
    R = int(_os.environ.get("PADNE_TPU_MB_R", "8"))
    t0 = time.time()
    h = amg.build_hierarchy_dia(ell, verts, coarse_size=3000, group=group)
    print(f"setup {time.time()-t0:.1f}s levels="
          f"{[lv.pack.np_ for lv in h.levels]}", flush=True)
    backend = dia.default_backend()
    lv0 = h.levels[0]
    meta0 = lv0.pack.meta
    np0 = lv0.pack.np_
    # Production order (ops.schur.DiaBorderedSolver): the exact f32
    # CG operator slab first, the V-cycle's bf16 slab as a device cast.
    op_params = amg.make_dia_cg_operator(h)
    print(f"offsets={lv0.pack.offs} rem={len(lv0.pack.rem_rows)} "
          f"nnz_main={len(lv0.pack.widx_hi)}", flush=True)

    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((R, np0)).astype(np.float32))
    p0 = op_params

    # slab only
    dmax = dia._dmax(lv0.pack.offs)
    b = lv0.pack.b

    @jax.jit
    def slab_only(prm, xt):
        xt_pad = jnp.pad(xt, ((0, 0), (dmax * b, dmax * b)))
        # Follow the platform (pallas on TPU, einsum elsewhere) so a
        # CPU dry-run of this script exercises the same structure.
        return dia._run_main(backend, meta0, prm["w"], xt_pad)

    @jax.jit
    def slab_diag(prm, xt):
        y = slab_only.__wrapped__(prm, xt)
        return y + prm["diag"][None, :] * xt

    @jax.jit
    def rem_only(prm, xt):
        x = xt.T
        rem = dia._apply_remainder(prm, x, jnp.zeros_like(x))
        return rem.T

    @jax.jit
    def rem_gather_only(prm, xt):
        x = xt.T
        parts = []
        for dd in dia.DiaPack.REM_BUCKETS:
            vals_d, cols_d = prm[f"r{dd}_vals"], prm[f"r{dd}_cols"]
            if not vals_d.shape[0]:
                continue
            c = vals_d[:, 0, None] * x[cols_d[:, 0]]
            for k in range(1, dd):
                c = c + vals_d[:, k, None] * x[cols_d[:, k]]
            parts.append(c)
        return jnp.concatenate(parts)

    @jax.jit
    def transpose_only(xt):
        return xt.T.sum(axis=1)

    @jax.jit
    def exact_mv(prm, xt):
        return dia.dia_matvec_t(meta0, prm, xt, backend=backend)

    # bf16 cycle (production configuration): exact f32 CG operator,
    # bf16 slabs in the V-cycle.  (A full-f32 second V-cycle slab OOMs
    # 16 GB HBM at 1M DoF alongside the exact operator's slab — and
    # production never builds one, so it isn't timed here either.)
    w0_bf16 = p0["w"].astype(jnp.bfloat16)
    vcycle_bf, vparams_bf = amg.make_vcycle_dia_t(
        h, backend=backend, slab_dtype=jnp.bfloat16, w0=w0_bf16)
    vcb = jax.jit(lambda p, rt: vcycle_bf(p, rt))

    @jax.jit
    def slab_bf16(w, xt):
        xt_pad = jnp.pad(xt, ((0, 0), (dmax * b, dmax * b)))
        return dia._run_main(backend, meta0, w, xt_pad)

    # Dispatch/tunnel round-trip latency baseline.
    tiny = jnp.zeros((8, 128), jnp.float32)
    tiny_fn = jax.jit(lambda a: a + 1.0)
    t = timeit(tiny_fn, tiny, n=50)
    print(f"{'dispatch_rt':12s} {t*1e3:8.2f} ms", flush=True)

    for name, fn, args in [
        ("slab", slab_only, (p0, xt)),
        ("slab+diag", slab_diag, (p0, xt)),
        ("rem_gather", rem_gather_only, (p0, xt)),
        ("rem_full", rem_only, (p0, xt)),
        ("transpose", transpose_only, (xt,)),
        ("exact_mv", exact_mv, (p0, xt)),
        ("slab_bf16", slab_bf16, (vparams_bf[0]["w"], xt)),
        ("vcycle_bf16", vcb, (vparams_bf, xt)),
    ]:
        t = timeit(fn, *args)
        print(f"{name:12s} {t*1e3:8.2f} ms", flush=True)

    # Per-level decomposition of the production V-cycle: one exact
    # matvec of each level operator (4 run per level per cycle), plus
    # the level-0 lumped smoothing operator when present.
    if "sm" in vparams_bf[0]:
        e_sm = vparams_bf[0]["sm"]
        n_strong = int(sum(e_sm[f"r{dd}_rows"].shape[0]
                           for dd in dia.DiaPack.REM_BUCKETS)
                       + e_sm["sp_rows"].shape[0])

        @jax.jit
        def mv_sm0(prm, xt):
            return dia.dia_matvec_t(meta0, prm, xt, backend=backend)

        t = timeit(mv_sm0, e_sm, xt)
        print(f"L0 mv lumped (strong rem {n_strong:7d}) {t*1e3:8.2f} ms",
              flush=True)
    for li in range(1, len(h.levels)):
        lv = h.levels[li]
        meta_l = lv.pack.meta
        e_l = vparams_bf[li]
        xt_l = jnp.asarray(rng.standard_normal(
            (R, lv.pack.np_)).astype(np.float32))
        mv_l = jax.jit(partial(
            lambda meta, prm, xt: dia.dia_matvec_t(
                meta, prm, xt, backend=backend), meta_l))
        t = timeit(mv_l, e_l, xt_l)
        print(f"L{li} mv (np={lv.pack.np_:8d} d={len(lv.pack.offs):2d} "
              f"rem={len(lv.pack.rem_rows):7d}) {t*1e3:8.2f} ms",
              flush=True)

    # one CG iteration cost: via solver with maxiter=1 vs maxiter=2 delta
    posmap = h.posmap0
    comp_pad = np.full(np0, 1, dtype=np.int32)
    comp_pad[posmap] = 0

    def a_apply(prm, xt):
        return dia.dia_matvec_t(meta0, prm, xt, backend=backend)

    solver = cg.make_pcg_t(
        operator=(a_apply, op_params), precond=(vcycle_bf, vparams_bf),
        comp_id=jnp.asarray(comp_pad), num_components=2)
    bvec = rng.standard_normal((np0, R)).astype(np.float32)
    bj = jnp.asarray(bvec)
    t1 = timeit(lambda: solver(bj, 1e-30, 5), n=3, warmup=1)
    t2 = timeit(lambda: solver(bj, 1e-30, 15), n=3, warmup=1)
    print(f"cg_iter      {(t2-t1)/10*1e3:8.2f} ms  (5it {t1:.3f}s "
          f"15it {t2:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
