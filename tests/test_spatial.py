"""Spatial index tests (role parity with reference tests/test_ui.py,
which tests the GL-free picker indices on synthetic LayerSolutions)."""

import numpy as np
import pytest

from padne_tpu import geom, mesh, solver, spatial


@pytest.fixture(scope="module")
def layer_solution():
    m1 = mesh.Mesher(mesh.Mesher.Config.RELAXED).poly_to_mesh(geom.box(0, 0, 2, 2))
    m2 = mesh.Mesher(mesh.Mesher.Config.RELAXED).poly_to_mesh(geom.box(10, 10, 12, 12))
    pots = [
        mesh.ZeroForm(m1, m1.vertices[:, 0]),
        mesh.ZeroForm(m2, m2.vertices[:, 0]),
    ]
    pds = [
        mesh.TwoForm(m1, np.full(m1.num_faces, 1.5)),
        mesh.TwoForm(m2, np.full(m2.num_faces, 2.5)),
    ]
    return solver.LayerSolution(
        meshes=[m1, m2], potentials=pots, power_densities=pds,
        disconnected_meshes=[],
    )


class TestVertexIndex:
    def test_picks_nearest_vertex(self, layer_solution):
        idx = spatial.VertexSpatialIndex(layer_solution)
        r = idx.query(0.01, 0.01)
        assert r.mesh_index == 0
        assert r.distance < 0.1
        assert r.value == pytest.approx(0.0, abs=1e-9)  # value = x coord

    def test_picks_across_meshes(self, layer_solution):
        idx = spatial.VertexSpatialIndex(layer_solution)
        r = idx.query(11.9, 11.9)
        assert r.mesh_index == 1
        assert r.value == pytest.approx(12.0, abs=0.2)

    def test_empty_layer(self):
        ls = solver.LayerSolution(meshes=[], potentials=[])
        assert spatial.VertexSpatialIndex(ls).query(0, 0) is None


class TestFaceIndex:
    def test_picks_face_value(self, layer_solution):
        idx = spatial.FaceSpatialIndex(layer_solution)
        assert idx.query(1, 1).value == 1.5
        assert idx.query(11, 11).value == 2.5
