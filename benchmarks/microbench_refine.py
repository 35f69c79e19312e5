"""Microbenchmark: refinement-pass overheads of the bench solve at 1M.

Times the f64 device residual, the RHS upload, and a full
25-iteration CG pass — the pieces of bench.py's mp_solve outside the
CG iterations themselves.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from microbench_apply import get_system, timeit, _sync  # noqa: E402


def main():
    ell, verts, group = get_system()
    n = len(ell.diag)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from padne_tpu.ops import amg, cg, dia

    R = 8
    h = amg.build_hierarchy_dia(ell, verts, coarse_size=3000,
                                group=group)
    backend = dia.default_backend()
    vcycle_apply, vparams = amg.make_vcycle_dia_t(h, backend=backend)
    meta0 = h.levels[0].pack.meta
    posmap = h.posmap0
    np0 = h.np0

    def a_apply(prm, xt):
        return dia.dia_matvec_t(meta0, prm, xt, backend=backend)

    comp_pad = np.full(np0, 1, dtype=np.int32)
    comp_pad[posmap] = 0
    op_params = amg.make_dia_cg_operator(h, vparams)
    solver = cg.make_pcg_t(
        operator=(a_apply, op_params), precond=(vcycle_apply, vparams),
        comp_id=jnp.asarray(comp_pad), num_components=2)

    K = ell.cols.shape[1]
    cols_pad = np.zeros((np0, K), np.int32)
    vals_pad = np.zeros((np0, K))
    diag_pad = np.zeros(np0)
    cols_pad[posmap] = posmap[ell.cols.astype(np.int64)]
    vals_pad[posmap] = ell.vals
    diag_pad[posmap] = ell.diag
    ell64 = (jnp.asarray(cols_pad), jnp.asarray(vals_pad),
             jnp.asarray(diag_pad))
    mask = np.zeros(np0)
    mask[posmap] = 1.0
    nreal = float(len(posmap))
    mask_dev = jnp.asarray(mask)

    @jax.jit
    def residual64(e64, b64, x64):
        c, v, dg = e64
        ax = dg[:, None] * x64
        for k in range(K):
            ax = ax + v[:, k, None] * x64[c[:, k]]
        r = b64 - ax
        r = r - (r * mask_dev[:, None]).sum(0) / nreal * mask_dev[:, None]
        return r, jnp.linalg.norm(r)

    @jax.jit
    def residual32(e64, b64, x64):
        """Same SpMV but f32 gather/multiplies with f64 accumulation
        via two-sum style split: here plain f32 compute for speed
        comparison."""
        c, v, dg = e64
        x32 = x64.astype(jnp.float32)
        ax = dg.astype(jnp.float32)[:, None] * x32
        for k in range(K):
            ax = ax + v[:, k].astype(jnp.float32)[:, None] * x32[c[:, k]]
        r = b64 - ax.astype(jnp.float64)
        r = r - (r * mask_dev[:, None]).sum(0) / nreal * mask_dev[:, None]
        return r, jnp.linalg.norm(r)

    rng = np.random.default_rng(0)
    b64 = jnp.asarray(rng.standard_normal((np0, R)))
    x64 = jnp.asarray(rng.standard_normal((np0, R)) * 0.1)
    b_np = np.asarray(rng.standard_normal((np0, R)))

    t = timeit(residual64, ell64, b64, x64, n=5)
    print(f"residual64     {t*1e3:8.1f} ms", flush=True)
    t = timeit(residual32, ell64, b64, x64, n=5)
    print(f"residual32     {t*1e3:8.1f} ms", flush=True)

    def upload():
        return jnp.asarray(b_np).block_until_ready()

    t = timeit(upload, n=5)
    print(f"upload (66MB)  {t*1e3:8.1f} ms", flush=True)

    def download():
        return np.asarray(b64)

    t = timeit(download, n=5)
    print(f"download       {t*1e3:8.1f} ms", flush=True)

    r32 = jnp.asarray(np.asarray(b64).astype(np.float32))
    t0 = time.perf_counter()
    res = solver(r32, 3e-4, 25)
    _sync(res.x)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = solver(r32, 3e-4, 25)
    _sync(res.x)
    t_second = time.perf_counter() - t0
    print(f"solver(25it) first {t_first:.3f}s second {t_second:.3f}s "
          f"iters={int(res.iterations)}", flush=True)

    # x64 accumulation + norm
    @jax.jit
    def accum(x64, dx32):
        return x64 + dx32.astype(jnp.float64)

    t = timeit(accum, x64, res.x, n=5)
    print(f"accum          {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
