"""Deeper board-physics gates mirroring the remaining reference tier-3
tests: power density on a current-driven trace, tapered-width analytic
resistance, serialization round trips."""

import math
import pathlib
import pickle
import warnings

import numpy as np
import pytest

from padne_tpu import kicad, mesh, problem, solver
from padne_tpu.io import solution as solution_io

REF_BOARDS = pathlib.Path("/root/reference/tests/kicad")
needs_boards = pytest.mark.skipif(
    not REF_BOARDS.exists(), reason="reference fixture boards not mounted"
)


def load_and_solve(name, **kw):
    prob = kicad.load_kicad_project(REF_BOARDS / name / f"{name}.kicad_pro")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return prob, solver.solve(prob, **kw)


def find_vertex_value(sol, conn):
    layer_idx = next(
        i for i, l in enumerate(sol.problem.layers) if l is conn.layer
    )
    ls = sol.layer_solutions[layer_idx]
    best = (np.inf, None)
    for m, pot in zip(ls.meshes, ls.potentials):
        d = np.hypot(
            m.vertices[:, 0] - conn.point.x, m.vertices[:, 1] - conn.point.y
        )
        k = int(np.argmin(d))
        if d[k] < best[0]:
            best = (float(d[k]), float(pot.values[k]))
    assert best[0] < 1e-4
    return best[1]


@needs_boards
class TestPowerDensity:
    def test_long_trace_power_density(self):
        """p = I^2 R / A uniformly on a constant-width trace; per-face
        within 5%, area-weighted mean within 0.1% (reference
        test_solver.py:1249-1321)."""
        prob, sol = load_and_solve("long_trace_current")
        trace_width = 0.2
        current = 1.0
        total_r = 0.24
        expected = current**2 * total_r / (100.0 * trace_width)

        ls = sol.layer_solutions[0]
        x_min, x_max = 127.0, 223.0
        trace_y = 94.45
        densities, areas = [], []
        for m, pd in zip(ls.meshes, ls.power_densities):
            c = m.face_centroids
            in_region = (
                (c[:, 0] > x_min)
                & (c[:, 0] < x_max)
                & (np.abs(c[:, 1] - trace_y) < 2 * trace_width)
            )
            vals = pd.values[in_region]
            ars = m.face_areas[in_region]
            assert np.all(
                np.abs(vals - expected) <= 0.05 * expected
            ), f"worst face rel err {np.abs(vals / expected - 1).max():.4f}"
            densities.append(vals)
            areas.append(ars)
        vals = np.concatenate(densities)
        ars = np.concatenate(areas)
        assert len(vals) >= 30
        mean = float((vals * ars).sum() / ars.sum())
        assert mean == pytest.approx(expected, rel=0.001)


@needs_boards
class TestTaperedTrace:
    def test_complicated_trace_analytic_resistance(self):
        """Variable-width trace vs segment-integrated analytic resistance
        (reference test_solver.py:1344-1444, rel 0.1)."""
        prob, sol = load_and_solve("complicated_trace_current")
        widths = [
            0.2, 0.2, 6.0, 6.0, 6.0, 0.2, 0.2, 0.2, 0.2, 2.0, 2.0, 2.0,
            4.0, 4.0, 0.2, 0.2, 1.0, 2.0, 1.0, 0.2, 0.2,
        ]
        net = next(
            n for n in prob.networks
            if len(n.elements) == 1
            and isinstance(n.elements[0], problem.CurrentSource)
        )
        cs = net.elements[0]
        f_conn = next(c for c in net.connections if c.node_id == cs.f)
        t_conn = next(c for c in net.connections if c.node_id == cs.t)
        v_diff = find_vertex_value(sol, t_conn) - find_vertex_value(sol, f_conn)

        sheet_r = 1.0 / prob.layers[0].conductance
        total_r = 0.0
        for i in range(len(widths) - 1):
            w0, w1 = widths[i], widths[i + 1]
            if abs(w0 - w1) < 1e-9:
                total_r += sheet_r * 10.0 / w0
            else:
                w_avg = (w1 - w0) / math.log(w1 / w0)
                total_r += sheet_r * 10.0 / w_avg
        expected = cs.current * total_r
        assert v_diff == pytest.approx(expected, rel=0.1)


@needs_boards
class TestSerialization:
    def test_solution_pickle_roundtrip(self):
        """Solutions pickle cleanly (flat arrays; no custom protocol
        needed, unlike the reference's half-edge id flattening)."""
        prob, sol = load_and_solve("simple_geometry")
        blob = pickle.dumps(sol)
        back = pickle.loads(blob)
        assert back.solver_info.residual_norm == sol.solver_info.residual_norm
        for ls_a, ls_b in zip(sol.layer_solutions, back.layer_solutions):
            for ma, mb in zip(ls_a.meshes, ls_b.meshes):
                assert np.array_equal(ma.vertices, mb.vertices)
                assert np.array_equal(ma.triangles, mb.triangles)
            for pa, pb in zip(ls_a.potentials, ls_b.potentials):
                assert np.array_equal(pa.values, pb.values)

    def test_mesh_pickle_preserves_derived(self):
        m = mesh.Mesher(mesh.Mesher.Config.RELAXED).poly_to_mesh(
            __import__("padne_tpu.geom", fromlist=["box"]).box(0, 0, 5, 5)
        )
        _ = m.cotan_edge_weights  # populate caches
        m2 = pickle.loads(pickle.dumps(m))
        assert np.array_equal(m.edges, m2.edges)
        assert np.allclose(m.cotan_edge_weights, m2.cotan_edge_weights)

    def test_npz_artifact_loadable_by_plain_numpy(self, tmp_path):
        """The artifact is consumable without padne_tpu (plain numpy)."""
        prob, sol = load_and_solve("long_trace")
        p = tmp_path / "s.npz"
        solution_io.save_solution(sol, p)
        data = np.load(p)
        keys = [k for k in data.files if k.endswith("potential")]
        assert keys
        assert np.isfinite(data[keys[0]]).all()
