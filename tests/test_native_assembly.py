"""Native assembly kernels vs their numpy reference twins.

pg_build_ell / pg_unique_edges replace the numpy argsort/np.unique
pipelines above a size threshold (ops/assembly.py::build_ell,
mesh.py::TriMesh._edge_data); these tests pin the two implementations
to each other on adversarial inputs (duplicates, zero weights,
isolated vertices), so a native divergence fails CI regardless of
which path production sizes take.
"""

import numpy as np
import pytest

from padne_tpu import native
from padne_tpu.ops import assembly


def _numpy_build_ell(n, edges, weights):
    """The numpy path, forced (build_ell dispatches to native above a
    size threshold)."""
    assert len(edges) < 100_000
    return assembly.build_ell(n, edges, weights)


class TestNativeBuildEll:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_parity_random_graph(self, seed):
        rng = np.random.default_rng(seed)
        n = rng.integers(50, 4000)
        ne = int(rng.integers(1, 20 * n))
        eu = rng.integers(0, n, ne)
        ev = rng.integers(0, n, ne)
        w = rng.random(ne)
        w[rng.random(ne) < 0.07] = 0.0                     # dropped edges
        dup = ne // 4                                       # duplicates
        eu = np.concatenate([eu, eu[:dup]])
        ev = np.concatenate([ev, ev[:dup]])
        w = np.concatenate([w, w[:dup] * 0.3])
        ref = _numpy_build_ell(n, np.stack([eu, ev], axis=1), w)
        cols, vals, diag = native.build_ell(n, eu, ev, w)
        nat = assembly.EllMatrix(cols=cols, vals=vals, diag=diag)
        d = abs(ref.to_scipy() - nat.to_scipy())
        assert (d.max() if d.nnz else 0.0) < 1e-12
        assert cols.shape == ref.cols.shape
        np.testing.assert_allclose(diag, ref.diag, rtol=0, atol=1e-12)

    def test_columns_ascending_and_padding(self):
        eu = np.array([3, 0, 3, 3])
        ev = np.array([1, 2, 2, 1])       # duplicate (3,1)
        w = np.array([1.0, 2.0, 3.0, 4.0])
        cols, vals, diag = native.build_ell(5, eu, ev, w)
        n, k = cols.shape
        for i in range(n):
            real = vals[i] != 0
            rc = cols[i][real]
            assert np.all(np.diff(rc) > 0)                  # ascending, deduped
            assert np.all(cols[i][~real] == i)              # padding = row
        # duplicate (3,1) accumulated: A[3,1] = -(1+4)
        r3 = dict(zip(cols[3], vals[3]))
        assert r3[1] == -5.0
        # vertex 4 isolated: only padding
        assert np.all(vals[4] == 0.0) and np.all(cols[4] == 4)

    def test_all_zero_weights(self):
        cols, vals, diag = native.build_ell(
            3, np.array([0, 1]), np.array([1, 2]), np.zeros(2))
        assert np.all(vals == 0.0) and np.all(diag == 0.0)

    def test_out_of_range_raises(self):
        with pytest.raises(RuntimeError, match="out of range"):
            native.build_ell(3, np.array([0]), np.array([5]), np.ones(1))


class TestNativeUniqueEdges:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_parity_random_soup(self, seed):
        rng = np.random.default_rng(seed)
        nf = int(rng.integers(10, 5000))
        tris = rng.integers(0, max(4, nf // 2), (nf, 3)).astype(np.int32)
        t = tris.astype(np.int64)
        a = np.concatenate([t[:, 0], t[:, 1], t[:, 2]])
        b = np.concatenate([t[:, 1], t[:, 2], t[:, 0]])
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        uniq, inv_ref = np.unique(lo << 32 | hi, return_inverse=True)
        edges_ref = np.stack(
            [uniq >> 32, uniq & 0xFFFFFFFF], axis=1).astype(np.int32)
        e_nat, inv_nat = native.unique_edges(tris)
        np.testing.assert_array_equal(edges_ref, e_nat)
        np.testing.assert_array_equal(inv_ref.reshape(-1), inv_nat)

    def test_mesh_path_equivalence(self):
        """TriMesh derived topology is identical through both paths."""
        from padne_tpu import mesh as mesh_mod

        rng = np.random.default_rng(11)
        # A valid little triangulated strip
        nvx = 40
        pts = np.stack([np.arange(nvx, dtype=float),
                        rng.random(nvx)], axis=1)
        tris = np.array([[i, i + 1, i + 2] for i in range(nvx - 2)],
                        dtype=np.int32)
        m = mesh_mod.TriMesh(vertices=pts, triangles=tris)
        edges_np, inv_np = type(m)._edge_data.func(m)   # numpy path (small)
        edges_nat, inv_nat = native.unique_edges(tris)
        np.testing.assert_array_equal(edges_np, edges_nat)
        np.testing.assert_array_equal(inv_np, inv_nat)


def _random_laplacian(rng, n, ne):
    """Random symmetric positive-semidefinite graph Laplacian CSR."""
    import scipy.sparse

    r = rng.integers(0, n, ne)
    c = rng.integers(0, n, ne)
    m = r != c
    w = rng.random(m.sum()) + 0.05
    A = scipy.sparse.coo_matrix((-w, (r[m], c[m])), shape=(n, n))
    A = (A + A.T).tocsr()
    d = -np.asarray(A.sum(axis=1)).ravel()
    return (A + scipy.sparse.diags(d)).tocsr()


class TestNativeEllToCsr:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_parity_vs_numpy_path(self, seed):
        import scipy.sparse

        rng = np.random.default_rng(seed)
        n = int(rng.integers(100, 3000))
        eu = rng.integers(0, n, 6 * n)
        ev = rng.integers(0, n, 6 * n)
        m = eu != ev
        ell = assembly.build_ell(
            n, np.stack([eu[m], ev[m]], axis=1), rng.random(m.sum()))
        ref = ell.to_scipy()  # below threshold -> numpy path
        ip, ix, dt = native.ell_to_csr(ell.cols, ell.vals, ell.diag)
        nat = scipy.sparse.csr_matrix((dt, ix, ip), shape=ref.shape)
        diff = ref - nat
        assert diff.nnz == 0 or np.abs(diff.data).max() == 0.0
        assert nat.nnz == ref.nnz

    def test_diag_only(self):
        import scipy.sparse

        ell = assembly.EllMatrix(
            cols=np.zeros((3, 1), np.int32),
            vals=np.zeros((3, 1)),
            diag=np.array([1.0, 2.0, 3.0]),
        )
        ip, ix, dt = native.ell_to_csr(ell.cols, ell.vals, ell.diag)
        nat = scipy.sparse.csr_matrix((dt, ix, ip), shape=(3, 3))
        assert np.allclose(nat.toarray(), np.diag([1.0, 2.0, 3.0]))


class TestNativeGalerkin:
    """pg_galerkin vs the scipy P^T A P chain it replaces
    (amg.build_hierarchy_dia's small-size fallback)."""

    def _scipy_galerkin(self, A, agg, nc, dinv, omega_p, drop_tol):
        import scipy.sparse

        n = A.shape[0]
        P0 = scipy.sparse.csr_matrix(
            (np.ones(n), (np.arange(n), agg)), shape=(n, nc))
        if omega_p:
            P = (P0 - omega_p * (scipy.sparse.diags(dinv) @ (A @ P0))
                 ).tocsr()
        else:
            P = P0
        Ac = (P.T @ A @ P).tocsr()
        Ac.eliminate_zeros()
        if drop_tol:
            dc = np.asarray(Ac.diagonal())
            dc = np.where(dc > 0, dc, 1.0)
            coo = Ac.tocoo()
            keep = (coo.row == coo.col) | (
                np.abs(coo.data)
                >= drop_tol * np.sqrt(dc[coo.row] * dc[coo.col]))
            lump = np.zeros(nc)
            np.add.at(lump, coo.row[~keep], coo.data[~keep])
            Ac = scipy.sparse.csr_matrix(
                (coo.data[keep], (coo.row[keep], coo.col[keep])),
                shape=Ac.shape)
            Ac = (Ac + scipy.sparse.diags(lump)).tocsr()
        return Ac

    @pytest.mark.parametrize("omega_p", [0.0, 0.41])
    @pytest.mark.parametrize("drop_tol", [0.0, 1e-3])
    def test_parity(self, omega_p, drop_tol):
        rng = np.random.default_rng(7)
        n, nc = 2500, 600
        A = _random_laplacian(rng, n, 18 * n)
        agg = rng.integers(0, nc, n).astype(np.int32)
        agg[:nc] = np.arange(nc)  # every aggregate nonempty
        d = np.asarray(A.diagonal())
        dinv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
        ref = self._scipy_galerkin(A, agg, nc, dinv, omega_p, drop_tol)
        nat = native.galerkin(A, agg, nc, dinv, omega_p, drop_tol)
        diff = ref - nat
        err = np.abs(diff.data).max() if diff.nnz else 0.0
        assert err <= 1e-12 * np.abs(ref.data).max()

    def test_row_sums_preserved_under_drop(self):
        # The lump keeps the Neumann constant-vector kernel exact.
        rng = np.random.default_rng(3)
        n, nc = 1500, 300
        A = _random_laplacian(rng, n, 12 * n)
        agg = (np.arange(n) % nc).astype(np.int32)
        d = np.asarray(A.diagonal())
        dinv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
        loose = native.galerkin(A, agg, nc, dinv, 0.0, 0.0)
        tight = native.galerkin(A, agg, nc, dinv, 0.0, 1e-2)
        ones = np.ones(nc)
        assert np.allclose(loose @ ones, tight @ ones, atol=1e-11)


class TestNativeCsrPermute:
    @pytest.mark.parametrize("seed", [0, 4])
    def test_parity(self, seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(50, 2500))
        A = _random_laplacian(rng, n, 10 * n)
        perm = rng.permutation(n)
        ref = A[perm][:, perm].tocsr()
        ref.sort_indices()
        nat = native.csr_permute(A, perm)
        diff = ref - nat
        assert diff.nnz == 0 or np.abs(diff.data).max() == 0.0
        # columns ascend within each row
        for i in range(0, n, max(1, n // 37)):
            row = nat.indices[nat.indptr[i]:nat.indptr[i + 1]]
            assert np.all(np.diff(row) > 0)
