"""Viewer at production scale (round-4 gate): a >= 500k-triangle
solution must export to the WebGL HTML viewer within explicit wall-time
and file-size budgets, its embedded payload must round-trip bit-exactly
and pass a rasterized-pixel probe, and the matplotlib viewer must
decimate its draw so a 1M-triangle-class solution stays interactive.

Reference bar: the Qt/OpenGL GUI handles big solutions with VBO upload
and a 2-worker prep pool (reference ui.py:649-1142); the round-3 suite
only ever exercised the viewers on toy boards.
"""

import base64
import time

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from padne_tpu import geom, problem, solver
from padne_tpu import mesh as mesh_mod
from padne_tpu.io import htmlview

NX = NY = 502                      # 501*501*2 = 502,002 triangles
V_SCALE = 3.3


def _grid_solution(nx=NX, ny=NY):
    """Structured-grid Solution with an analytic linear potential
    v(x, y) = V_SCALE * x / W — big, exact, and cheap to build."""
    w = h = 100.0
    xs = np.linspace(0.0, w, nx)
    ys = np.linspace(0.0, h, ny)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    vertices = np.stack([gx.ravel(), gy.ravel()], axis=1)
    ii, jj = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                         indexing="ij")
    v00 = (ii * ny + jj).ravel()
    v10 = v00 + ny
    v01 = v00 + 1
    v11 = v10 + 1
    tris = np.concatenate([
        np.stack([v00, v10, v11], axis=1),
        np.stack([v00, v11, v01], axis=1),
    ])
    m = mesh_mod.TriMesh(vertices, tris.astype(np.int32))
    pot = mesh_mod.ZeroForm(m, V_SCALE * vertices[:, 0] / w)
    power = mesh_mod.TwoForm(m, np.full(m.num_faces, 0.25))
    layer = problem.Layer(
        shape=geom.MultiPolygon([geom.box(0, 0, w, h)]),
        name="F.Cu", conductance=1.0,
    )
    prob = problem.Problem(layers=[layer], networks=[],
                           project_name="viewer-scale")
    ls = solver.LayerSolution(meshes=[m], potentials=[pot],
                              power_densities=[power],
                              disconnected_meshes=[])
    info = solver.SolverInfo(ground_node_current=0.0,
                             residual_norm=1e-10)
    return solver.Solution(problem=prob, layer_solutions=[ls],
                           solver_info=info)


@pytest.fixture(scope="module")
def big_solution():
    return _grid_solution()


@pytest.fixture(scope="module")
def exported(big_solution, tmp_path_factory):
    out = tmp_path_factory.mktemp("scale") / "view.html"
    t0 = time.time()
    htmlview.export_html(big_solution, out)
    return out, time.time() - t0


class TestExportAtScale:
    def test_export_budgets(self, big_solution, exported):
        out, seconds = exported
        n_tri = big_solution.layer_solutions[0].meshes[0].num_faces
        assert n_tri >= 500_000, n_tri
        # Budgets: a half-million-triangle export is a routine save,
        # not a batch job.
        assert seconds < 30.0, f"export took {seconds:.1f}s"
        size = out.stat().st_size
        assert size < 60e6, f"export is {size/1e6:.1f} MB"

    def test_payload_roundtrip_bit_exact(self, big_solution, exported):
        from tests.test_htmlview import _extract_data

        out, _ = exported
        data = _extract_data(out.read_text())
        m = big_solution.layer_solutions[0].meshes[0]
        pot = big_solution.layer_solutions[0].potentials[0].values
        got = data["layers"][0]["meshes"][0]
        np.testing.assert_array_equal(
            got["v"].reshape(-1, 2), m.vertices.astype(np.float32))
        np.testing.assert_array_equal(got["t"].reshape(-1, 3),
                                      m.triangles.astype(np.uint32))
        np.testing.assert_array_equal(got["pot"],
                                      pot.astype(np.float32))

    def test_rasterized_probe_matches_analytic_field(self, exported):
        """Rasterize the decoded payload (barycentric interpolation of
        the f32 potentials over a pixel grid) and probe it against the
        analytic field — the scale version of the jsmini pixel gate."""
        from tests.test_htmlview import _extract_data

        out, _ = exported
        data = _extract_data(out.read_text())
        got = data["layers"][0]["meshes"][0]
        v = got["v"].reshape(-1, 2).astype(np.float64)
        pot = got["pot"].astype(np.float64)
        w = v[:, 0].max()
        h = v[:, 1].max()
        W = H = 256
        px = (np.arange(W) + 0.5) * (w / W)
        py = (np.arange(H) + 0.5) * (h / H)
        gx, gy = np.meshgrid(px, py, indexing="ij")
        # Structured grid: locate the containing cell arithmetically,
        # split on the v00->v11 diagonal, interpolate barycentrically.
        dx, dy = w / (NX - 1), h / (NY - 1)
        ci = np.clip((gx / dx).astype(int), 0, NX - 2)
        cj = np.clip((gy / dy).astype(int), 0, NY - 2)
        fx = gx / dx - ci
        fy = gy / dy - cj
        v00 = ci * NY + cj
        v10 = v00 + NY
        v01 = v00 + 1
        v11 = v10 + 1
        lower = fx >= fy            # triangle (v00, v10, v11)
        img = np.where(
            lower,
            pot[v00] * (1 - fx) + pot[v10] * (fx - fy) + pot[v11] * fy,
            pot[v00] * (1 - fy) + pot[v11] * fx + pot[v01] * (fy - fx),
        )
        expect = V_SCALE * gx / w
        assert np.abs(img - expect).max() < 1e-5 * V_SCALE
        # The rendered field actually varies across the image.
        assert img.std() > 0.2


class TestMatplotlibViewerAtScale:
    def test_decimated_redraw_stays_interactive(self, big_solution):
        from padne_tpu import ui

        t0 = time.time()
        viewer = ui.SolutionViewer(big_solution)
        first_draw = time.time() - t0
        stride = viewer._display_stride()
        assert stride >= 2, stride   # 502k faces over a 200k budget
        # Interactivity budget: construction + first draw.  Without
        # decimation a gouraud tripcolor at 502k faces takes minutes.
        assert first_draw < 60.0, f"first draw took {first_draw:.1f}s"
        # Probing uses the FULL data (no decimation error): the probe
        # at an arbitrary point matches the analytic field.
        val = viewer.probe_value(33.3, 50.0)
        # Nearest-vertex probe: within one grid step of the analytic
        # field (pitch 100/(NX-1) mm -> V_SCALE * pitch / 100 volts).
        assert val == pytest.approx(V_SCALE * 33.3 / 100.0,
                                    abs=V_SCALE * (100.0 / (NX - 1)) / 100.0)
        import matplotlib.pyplot as plt

        plt.close(viewer.fig)
