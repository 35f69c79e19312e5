"""Viewer at production scale (round-5 gate): a >= 1M-triangle
solution must export to the WebGL HTML viewer within explicit wall-time
and file-size budgets, its embedded quantized payload must round-trip
(u16 vertex grid within quantization tolerance, indices and f32 values
exactly), pass a rasterized-pixel probe, and the matplotlib viewer must
render a FULL-DATA raster (no decimation) prepared asynchronously.

Reference bar: the Qt/OpenGL GUI handles big solutions with VBO upload
and a 2-worker prep pool (reference ui.py:649-1142).
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

NX = NY = 709                      # 708*708*2 = 1,002,528 triangles
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
        assert n_tri >= 1_000_000, n_tri
        # Budgets: a million-triangle export is a routine save, not a
        # batch job; the quantized wire format keeps it browser-sized.
        assert seconds < 60.0, f"export took {seconds:.1f}s"
        size = out.stat().st_size
        assert size < 100e6, f"export is {size/1e6:.1f} MB"

    def _reassemble(self, data, w, h):
        """Map every chunk's dequantized vertices back to global grid
        ids (vertices sit exactly on the structured grid, and the u16
        quantization error is << the grid pitch) and reassemble the
        global triangle/potential arrays."""
        dx, dy = w / (NX - 1), h / (NY - 1)
        tris_g = []
        pot_g = np.full(NX * NY, np.nan)
        for got in data["layers"][0]["meshes"]:
            v = got["v"].astype(np.float64)
            gi = np.round(v[:, 0] / dx).astype(np.int64)
            gj = np.round(v[:, 1] / dy).astype(np.int64)
            glob = gi * NY + gj
            tris_g.append(glob[got["t"].astype(np.int64)])
            pot_g[glob] = got["pot"]
        return np.concatenate(tris_g), pot_g

    def test_payload_roundtrip(self, big_solution, exported):
        """Indices and f32 values round-trip exactly (through the
        chunked u16 remap); vertices round-trip within the u16
        quantization step (bbox/65535 ~ 1.5 um here)."""
        from tests.test_htmlview import _extract_data

        out, _ = exported
        data = _extract_data(out.read_text())
        m = big_solution.layer_solutions[0].meshes[0]
        pot = big_solution.layer_solutions[0].potentials[0].values
        w = m.vertices[:, 0].max()
        h = m.vertices[:, 1].max()
        # Quantization tolerance on raw coordinates.
        step = max(w, h) / 65535.0
        for got in data["layers"][0]["meshes"]:
            assert len(got["v"]) <= 65536   # u16-indexable chunks
        tris_g, pot_g = self._reassemble(data, w, h)
        np.testing.assert_array_equal(
            np.sort(tris_g, axis=0),
            np.sort(np.asarray(m.triangles, np.int64), axis=0))
        np.testing.assert_array_equal(pot_g, pot.astype(np.float32))
        # Vertex positions: reconstruct from grid ids and compare.
        got0 = data["layers"][0]["meshes"][0]
        dx = w / (NX - 1)
        gi = np.round(got0["v"][:, 0] / dx).astype(np.int64)
        assert np.abs(got0["v"][:, 0] - gi * dx).max() < step + 1e-9

    def test_rasterized_probe_matches_analytic_field(self, exported):
        """Rasterize the decoded payload (barycentric interpolation of
        the f32 potentials over a pixel grid) and probe it against the
        analytic field — the scale version of the jsmini pixel gate."""
        from tests.test_htmlview import _extract_data

        out, _ = exported
        data = _extract_data(out.read_text())
        w = max(float(m["v"][:, 0].max())
                for m in data["layers"][0]["meshes"])
        h = max(float(m["v"][:, 1].max())
                for m in data["layers"][0]["meshes"])
        _, pot = TestExportAtScale._reassemble(self, data, w, h)
        pot = pot.astype(np.float64)
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
    def test_full_data_raster_redraw(self, big_solution):
        """At 1M faces the viewer renders a FULL-DATA raster image
        (every triangle contributes; the round-4 decimation is gone),
        prepared asynchronously on the 2-worker pool (the reference's
        DeferedDict flow, ref ui.py:146-189)."""
        from padne_tpu import ui

        t0 = time.time()
        viewer = ui.SolutionViewer(big_solution)
        first_draw = time.time() - t0
        # The synchronous part (submit + placeholder) must stay
        # interactive; the raster lands asynchronously.
        assert first_draw < 60.0, f"first draw took {first_draw:.1f}s"
        assert "(full-data raster)" in viewer.ax.get_title()
        pend = viewer._pending_raster
        assert pend is not None
        pend[1].result(timeout=120)
        t0 = time.time()
        viewer._poll_raster()
        assert time.time() - t0 < 10.0       # apply is cheap
        assert viewer._raster_artists
        # The applied image reproduces the analytic linear field at a
        # sample pixel (center of the board: v = V_SCALE/2).
        img = viewer._raster_artists[-1].get_array()
        H, W = img.shape
        center = float(img[H // 2, W // 2])
        assert center == pytest.approx(V_SCALE * 0.5, rel=0.02)
        # Probing uses the FULL data: the probe at an arbitrary point
        # matches the analytic field within one grid step.
        val = viewer.probe_value(33.3, 50.0)
        assert val == pytest.approx(V_SCALE * 33.3 / 100.0,
                                    abs=V_SCALE * (100.0 / (NX - 1)) / 100.0)
        import matplotlib.pyplot as plt

        plt.close(viewer.fig)
