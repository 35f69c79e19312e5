"""Aligned (reshape-transfer) DIA AMG hierarchy: build invariants and
end-to-end PCG convergence on the XLA backend.

Reference counterpart: the direct SuperLU solve (reference
solver.py:767-780) — here replaced by deflated PCG preconditioned with
the gather-free V-cycle.
"""

import numpy as np
import pytest
import scipy.sparse

import jax.numpy as jnp

from padne_tpu.ops import amg, assembly, cg, dia


def grid_laplacian(g=48, seed=0):
    """Triangulated g x g grid graph Laplacian (singular, Neumann) with
    vertex coordinates."""
    idx = np.arange(g * g).reshape(g, g)
    e = []
    e.append(np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], 1))
    e.append(np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], 1))
    e.append(np.stack([idx[:-1, :-1].ravel(), idx[1:, 1:].ravel()], 1))
    e = np.concatenate(e, 0)
    rng = np.random.default_rng(seed)
    w = 0.5 + rng.random(len(e))
    ell = assembly.build_ell(g * g, e.astype(np.int64), w)
    xs, ys = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    coords = np.stack([xs.ravel(), ys.ravel()], 1).astype(float)
    return ell, coords


class TestBuildHierarchyDia:
    def test_invariants(self):
        ell, coords = grid_laplacian()
        h = amg.build_hierarchy_dia(ell, coords, coarse_size=100)
        n = len(ell.diag)
        assert len(h.levels) >= 1
        # posmap0 is injective into [0, np0)
        assert len(np.unique(h.posmap0)) == n
        assert h.posmap0.min() >= 0 and h.posmap0.max() < h.np0
        # level invariants: cap-divisible padding, valid child mapping
        for lv in h.levels:
            assert lv.pack.np_ % lv.cap == 0
            assert np.all(lv.dinv[lv.pack.diag == 0] == 0)
            assert len(np.unique(lv.child_perm)) == len(lv.child_perm)
            assert lv.child_perm.max(initial=0) < lv.child_len
            # padding bounded: no 8^level pyramid
            assert lv.pack.np_ <= 4 * max(np.count_nonzero(lv.dinv), 256)
        # coarse_inv padded square
        assert h.coarse_inv.shape[0] == h.coarse_inv.shape[1]

    def test_tiny_system_no_levels(self):
        ell, coords = grid_laplacian(g=8)
        h = amg.build_hierarchy_dia(ell, coords, coarse_size=100)
        assert len(h.levels) == 0
        assert h.np0 == h.coarse_inv.shape[0]


class TestVcycleDiaPCG:
    def solve(self, g=48, tol=3e-6):
        ell, coords = grid_laplacian(g)
        n = g * g
        h = amg.build_hierarchy_dia(ell, coords, coarse_size=100)
        apply_v, vparams = amg.make_vcycle_dia(h, backend="xla")

        rng = np.random.default_rng(3)
        b = rng.standard_normal((n, 2))
        b -= b.mean(axis=0, keepdims=True)   # range of the Neumann operator

        # scatter RHS into level-0 positions
        b_pad = np.zeros((h.np0, 2))
        b_pad[h.posmap0] = b
        comp_pad = np.ones(h.np0, dtype=np.int32)
        comp_pad[h.posmap0] = 0

        meta0 = h.levels[0].pack.meta
        params0 = amg.make_dia_cg_operator(h, vparams)

        def a_apply(p, x):
            return dia.dia_matvec(meta0, p, x, backend="xla")

        solver = cg.make_pcg(
            None, None, jnp.asarray(h.levels[0].pack.diag),
            jnp.asarray(comp_pad), 2,
            precond=(apply_v, vparams),
            operator=(a_apply, params0),
        )
        res = solver(jnp.asarray(b_pad.astype(np.float32)), tol, 200)
        x = np.asarray(res.x, dtype=np.float64)[h.posmap0]
        return ell, b, x, int(res.iterations)

    def test_converges_and_matches_scipy(self):
        ell, b, x, iters = self.solve()
        A = ell.to_scipy()
        # residual gate
        r = b - A @ x
        assert np.linalg.norm(r) / np.linalg.norm(b) < 5e-5  # f32 CG floor
        # parity with scipy pseudo-solve (up to constant shift)
        x_ref = scipy.sparse.linalg.lsqr(A, b[:, 0], atol=1e-12,
                                         btol=1e-12, iter_lim=20000)[0]
        d = x[:, 0] - x_ref
        d -= d.mean()
        assert np.abs(d).max() < 1e-3 * max(np.abs(x_ref).max(), 1.0)

    def test_mesh_independent_iterations(self):
        # 3e-6: comfortably above the f32 CG residual floor (~1e-7)
        _, _, _, it_small = self.solve(g=32, tol=3e-6)
        _, _, _, it_large = self.solve(g=64, tol=3e-6)
        # AMG: iteration count roughly flat with mesh size
        assert it_large <= it_small * 2
        assert it_large < 80
