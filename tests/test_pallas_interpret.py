"""Pallas-kernel parity in interpret mode (no TPU needed).

The production TPU kernels (ops.dia._pallas_main slab contraction and
ops.spmv_pallas's ELL kernels) are exercised here through the pallas
interpreter and compared against the XLA fallback and a scipy
reference — so a divergence between the TPU kernel and the CPU path
fails CI instead of surfacing only on hardware (round-2 VERDICT weak
item 4).
"""

import numpy as np
import pytest
import scipy.sparse

import jax.numpy as jnp

from padne_tpu.ops import assembly, bell, dia, spmv_pallas


def coo_to_ell(n, rows, cols, vals, diag) -> assembly.EllMatrix:
    """Generic COO (duplicate-free, off-diagonal) -> padded ELL."""
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    counts = np.bincount(rows, minlength=n)
    K = max(int(counts.max(initial=0)), 1)
    slot = np.arange(len(rows)) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    ell_cols = np.tile(np.arange(n, dtype=np.int64)[:, None], (1, K))
    ell_vals = np.zeros((n, K))
    ell_cols[rows, slot] = cols
    ell_vals[rows, slot] = vals
    return assembly.EllMatrix(cols=ell_cols.astype(np.int32),
                              vals=ell_vals, diag=diag)


def banded_system(n=1600, seed=0, spread=96):
    rng = np.random.default_rng(seed)
    m = 6 * n
    rows = rng.integers(0, n, m)
    cols = np.clip(rows + rng.integers(-spread, spread + 1, m), 0, n - 1)
    keep = rows != cols
    rows, cols = rows[keep], cols[keep]
    key = rows * n + cols
    _, ui = np.unique(key, return_index=True)
    rows, cols = rows[ui], cols[ui]
    vals = rng.standard_normal(len(rows))
    diag = rng.random(n) + 1.0
    a = scipy.sparse.coo_matrix(
        (np.concatenate([vals, diag]),
         (np.concatenate([rows, np.arange(n)]),
          np.concatenate([cols, np.arange(n)]))),
        shape=(n, n),
    ).tocsr()
    return a, rows, cols, vals, diag


class TestDiaInterpret:
    def pack(self, n, rows, cols, vals, diag, **kw):
        return dia.pack_dia(n, rows.astype(np.int64),
                            cols.astype(np.int64), vals, diag, **kw)

    def test_slab_kernel_matches_xla(self):
        n = 1600
        a, rows, cols, vals, diag = banded_system(n)
        pack = self.pack(n, rows, cols, vals, diag)
        params = pack.to_device(dtype=jnp.float32)
        rng = np.random.default_rng(1)
        xt = jnp.asarray(rng.standard_normal((8, pack.np_)),
                         dtype=jnp.float32)
        y_int = dia.dia_matvec_t(pack.meta, params, xt, backend="interpret")
        y_xla = dia.dia_matvec_t(pack.meta, params, xt, backend="xla")
        np.testing.assert_allclose(
            np.asarray(y_int), np.asarray(y_xla), rtol=2e-5, atol=2e-5)

    def test_slab_kernel_matches_scipy(self):
        n = 1600
        a, rows, cols, vals, diag = banded_system(n, seed=3)
        pack = self.pack(n, rows, cols, vals, diag)
        params = pack.to_device(dtype=jnp.float32)
        rng = np.random.default_rng(2)
        x = rng.standard_normal((n, 4))
        xp = np.zeros((pack.np_, 4))
        xp[:n] = x  # identity layout + padding
        y = dia.dia_matvec(pack.meta, params,
                           jnp.asarray(xp, dtype=jnp.float32),
                           backend="interpret")
        y_np = np.asarray(y)[:n]
        ref = a @ x
        np.testing.assert_allclose(y_np, ref, rtol=5e-4, atol=5e-4)

    def test_bf16_slabs_interpret(self):
        """The bf16 V-cycle slab variant must run under the interpreter
        and stay within bf16 accuracy of the f32 result."""
        n = 1024
        a, rows, cols, vals, diag = banded_system(n, seed=5, spread=64)
        pack = self.pack(n, rows, cols, vals, diag)
        p32 = pack.to_device(dtype=jnp.float32)
        pbf = dict(p32)
        pbf["w"] = p32["w"].astype(jnp.bfloat16)
        rng = np.random.default_rng(4)
        xt = jnp.asarray(rng.standard_normal((8, pack.np_)),
                         dtype=jnp.float32)
        y32 = dia.dia_matvec_t(pack.meta, p32, xt, backend="interpret")
        ybf = dia.dia_matvec_t(pack.meta, pbf, xt, backend="interpret")
        scale = np.abs(np.asarray(y32)).max()
        err = np.abs(np.asarray(ybf) - np.asarray(y32)).max()
        assert err < 0.05 * scale, (err, scale)

    def test_fem_operator_interpret(self):
        """End-to-end: a real FEM ELL packed as DIA, interpret kernel vs
        the scipy matrix."""
        from padne_tpu import geom, mesh

        m = mesh.Mesher(mesh.Mesher.Config(maximum_size=0.5)).poly_to_mesh(
            geom.box(0, 0, 8, 8))
        ell = assembly.build_ell(
            m.num_vertices, m.edges.astype(np.int64), m.cotan_edge_weights)
        perm = bell.hilbert_order(m.vertices)  # perm[new] = old
        pack = dia.pack_ell_as_dia(ell, perm=perm)
        params = pack.to_device(dtype=jnp.float32)
        n = m.num_vertices
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n)
        rng = np.random.default_rng(7)
        x = rng.standard_normal((n, 2))
        xp = np.zeros((pack.np_, 2))
        xp[inv] = x
        y = dia.dia_matvec(pack.meta, params,
                           jnp.asarray(xp, dtype=jnp.float32),
                           backend="interpret")
        y_np = np.asarray(y)[inv]
        ref = ell.to_scipy() @ x
        scale = np.abs(ref).max()
        np.testing.assert_allclose(y_np, ref, atol=3e-4 * scale)


class TestSpmvPallasInterpret:
    def test_banded_kernel_matches_scipy(self):
        n = 1500
        a, rows, cols, vals, diag = banded_system(n, seed=11, spread=40)
        ell = coo_to_ell(n, rows, cols, vals, diag)
        K, R = ell.cols.shape[1], 4
        made = spmv_pallas.make_banded_spmv(
            n, K, R, jnp.float32, ell.cols, block_rows=512, interpret=True)
        assert made is not None
        apply_fn, n_pad, local = made
        rng = np.random.default_rng(12)
        x = rng.standard_normal((n, R)).astype(np.float32)
        xpad = np.zeros((n_pad, R), np.float32)
        xpad[:n] = x
        vals_p = np.zeros((n_pad, K), np.float32)
        vals_p[:n] = ell.vals
        diag_p = np.zeros(n_pad, np.float32)
        diag_p[:n] = ell.diag
        y = np.asarray(apply_fn(
            jnp.asarray(local), jnp.asarray(vals_p), jnp.asarray(diag_p),
            jnp.asarray(xpad)))[:n]
        ref = a @ x
        np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)

    def test_vmem_kernel_matches_scipy(self):
        n = 900
        a, rows, cols, vals, diag = banded_system(n, seed=13, spread=200)
        ell = coo_to_ell(n, rows, cols, vals, diag)
        K, R = ell.cols.shape[1], 2
        made = spmv_pallas.make_vmem_spmv(
            n, K, R, jnp.float32, block_rows=256, interpret=True)
        assert made is not None
        apply_fn, n_pad = made
        rng = np.random.default_rng(14)
        x = rng.standard_normal((n, R)).astype(np.float32)
        xpad = np.zeros((n_pad, R), np.float32)
        xpad[:n] = x
        cols_p = np.tile(np.arange(n_pad, dtype=np.int32)[:, None], (1, K))
        cols_p[:n] = ell.cols
        vals_p = np.zeros((n_pad, K), np.float32)
        vals_p[:n] = ell.vals
        diag_p = np.zeros(n_pad, np.float32)
        diag_p[:n] = ell.diag
        y = np.asarray(apply_fn(
            jnp.asarray(cols_p), jnp.asarray(vals_p), jnp.asarray(diag_p),
            jnp.asarray(xpad)))[:n]
        ref = a @ x
        np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)


class TestWideOffsetsInterpret:
    def test_wide_slab_kernel_matches_scipy(self):
        """The deep-level widening knob produces d=24 slabs; the pallas
        kernel's grid math must stay exact at wide offset counts."""
        n = 1600
        a, rows, cols, vals, diag = banded_system(n, spread=90)
        pack = dia.pack_dia(n, rows.astype(np.int64),
                            cols.astype(np.int64), vals, diag,
                            b=8, max_offsets=24, coverage=0.995)
        assert len(pack.offs) > 8  # actually exercises the wide shape
        params = pack.to_device(dtype=jnp.float32)
        rng = np.random.default_rng(3)
        xt = jnp.asarray(rng.standard_normal((8, pack.np_)),
                         dtype=jnp.float32)
        y_int = dia.dia_matvec_t(pack.meta, params, xt,
                                 backend="interpret")
        ref = np.zeros((8, pack.np_))
        ref[:, :n] = (a @ np.asarray(xt)[:, :n].T).T
        np.testing.assert_allclose(np.asarray(y_int), ref,
                                   rtol=3e-5, atol=3e-5)
