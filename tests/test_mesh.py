import numpy as np
import pytest

from padne_tpu import geom
from padne_tpu.geom import Point
from padne_tpu.mesh import Mesher, MeshingException, TriMesh, ZeroForm, OneForm, TwoForm


def mesh_quality(m: TriMesh):
    p = m.vertices[m.triangles]
    l2 = np.stack(
        [
            ((p[:, 1] - p[:, 2]) ** 2).sum(axis=1),
            ((p[:, 2] - p[:, 0]) ** 2).sum(axis=1),
            ((p[:, 0] - p[:, 1]) ** 2).sum(axis=1),
        ],
        axis=1,
    )
    area2 = np.abs(
        (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
        - (p[:, 1, 1] - p[:, 0, 1]) * (p[:, 2, 0] - p[:, 0, 0])
    )
    mx = l2.max(axis=1)
    mn = l2.min(axis=1)
    mid = l2.sum(axis=1) - mx - mn
    sine2 = area2**2 / (mx * mid)
    min_angle = np.degrees(np.arcsin(np.sqrt(sine2.min())))
    return min_angle, np.sqrt(mx.max())


class TestMesher:
    def test_square(self):
        m = Mesher(Mesher.Config(maximum_size=1.0, variable_size_maximum_factor=1.0)).poly_to_mesh(
            geom.box(0, 0, 10, 10)
        )
        assert m.total_area == pytest.approx(100.0, abs=1e-9)
        min_angle, max_edge = mesh_quality(m)
        assert min_angle >= 20.0 - 1e-6
        assert max_edge <= 1.0 + 1e-9

    def test_hole(self):
        poly = geom.difference(geom.box(0, 0, 10, 10), geom.box(4, 4, 6, 6)).geoms[0]
        m = Mesher(Mesher.Config(maximum_size=1.0, variable_size_maximum_factor=1.0)).poly_to_mesh(poly)
        assert m.total_area == pytest.approx(96.0, abs=1e-9)

    def test_seed_points_become_vertices(self):
        seeds = [Point(2.345, 6.789), Point(5.0, 5.0)]
        m = Mesher().poly_to_mesh(geom.box(0, 0, 10, 10), seeds)
        for s in seeds:
            d = np.hypot(m.vertices[:, 0] - s.x, m.vertices[:, 1] - s.y).min()
            assert d < 1e-9

    def test_variable_density_fewer_triangles(self):
        poly = geom.box(0, 0, 30, 30)
        dense = Mesher(Mesher.Config(variable_size_maximum_factor=1.0)).poly_to_mesh(poly)
        graded = Mesher(Mesher.Config()).poly_to_mesh(poly)
        assert graded.num_faces < dense.num_faces

    def test_relaxed_config(self):
        m = Mesher(Mesher.Config.RELAXED).poly_to_mesh(geom.box(0, 0, 5, 5))
        assert m.total_area == pytest.approx(25.0)
        # Relaxed = no size bound; expect very few triangles.
        assert m.num_faces < 20

    def test_self_intersecting_raises(self):
        bad = geom.Polygon.__new__(geom.Polygon)
        bad._rings = (
            np.array([[0.0, 0.0], [10.0, 10.0], [10.0, 0.0], [0.0, 10.0]]),
        )
        with pytest.raises(MeshingException):
            Mesher().poly_to_mesh(bad, strict=True)

    def test_euler_characteristic(self):
        m = Mesher(Mesher.Config(maximum_size=2.0, variable_size_maximum_factor=1.0)).poly_to_mesh(
            geom.box(0, 0, 10, 10)
        )
        # Disk: V - E + F = 1
        assert m.euler_characteristic() == 1
        poly = geom.difference(geom.box(0, 0, 10, 10), geom.box(4, 4, 6, 6)).geoms[0]
        mh = Mesher(Mesher.Config(maximum_size=2.0, variable_size_maximum_factor=1.0)).poly_to_mesh(poly)
        # Annulus-like: V - E + F = 0
        assert mh.euler_characteristic() == 0


class TestTriMeshDerived:
    @pytest.fixture
    def simple(self):
        # Unit square split into 4 triangles around the center.
        verts = np.array(
            [[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]], dtype=np.float64
        )
        tris = np.array(
            [[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]], dtype=np.int32
        )
        return TriMesh(verts, tris)

    def test_counts(self, simple):
        assert simple.num_vertices == 5
        assert simple.num_faces == 4
        assert len(simple.edges) == 8

    def test_boundary(self, simple):
        assert simple.boundary_edge_mask.sum() == 4
        assert simple.boundary_vertex_mask.tolist() == [True] * 4 + [False]

    def test_areas(self, simple):
        assert simple.face_areas.sum() == pytest.approx(1.0)

    def test_cotan_weights_unit_square(self, simple):
        # Spoke edges (corner <-> center) have two adjacent right-isoceles
        # faces, each contributing |cot 45|/2 = 0.5 -> weight 1.0.  Boundary
        # edges have one adjacent face whose opposite angle (at the center)
        # is 90 degrees -> cot = 0 -> weight 0.
        w = simple.cotan_edge_weights
        e = simple.edges
        for (a, b), wv in zip(e.tolist(), w.tolist()):
            if 4 in (a, b):
                assert wv == pytest.approx(1.0)
            else:
                assert wv == pytest.approx(0.0)

    def test_laplacian_properties(self, simple):
        L = simple.laplacian_coo().toarray()
        # Symmetric, zero row sums, nonpositive diagonal (reference sign
        # convention: L[i,i] = -sum of weights).
        assert np.allclose(L, L.T)
        assert np.allclose(L.sum(axis=1), 0)
        assert (np.diag(L) <= 0).all()

    def test_laplacian_analytic(self, simple):
        # The 5x5 matrix for the unit square with center vertex.
        L = simple.laplacian_coo().toarray()
        assert L[4, 4] == pytest.approx(-4.0)
        for c in range(4):
            assert L[4, c] == pytest.approx(1.0)
            assert L[c, c] == pytest.approx(-1.0)


class TestForms:
    @pytest.fixture
    def mesh(self):
        return Mesher(Mesher.Config(maximum_size=2.0, variable_size_maximum_factor=1.0)).poly_to_mesh(
            geom.box(0, 0, 6, 6)
        )

    def test_zero_form_d_constant(self, mesh):
        f = ZeroForm(mesh, np.full(mesh.num_vertices, 3.25))
        df = f.d()
        assert np.allclose(df.values, 0)

    def test_zero_form_d_linear(self, mesh):
        f = ZeroForm(mesh, 2.0 * mesh.vertices[:, 0] - mesh.vertices[:, 1])
        df = f.d()
        e = mesh.edges
        expected = (
            2.0 * (mesh.vertices[e[:, 1], 0] - mesh.vertices[e[:, 0], 0])
            - (mesh.vertices[e[:, 1], 1] - mesh.vertices[e[:, 0], 1])
        )
        assert np.allclose(df.values, expected)

    def test_one_form_antisymmetry(self, mesh):
        f = ZeroForm(mesh, mesh.vertices[:, 0])
        df = f.d()
        u, v = int(mesh.edges[0, 0]), int(mesh.edges[0, 1])
        assert df.on_edge(u, v) == pytest.approx(-df.on_edge(v, u))

    def test_arithmetic(self, mesh):
        a = ZeroForm(mesh, np.ones(mesh.num_vertices))
        b = ZeroForm(mesh, 2 * np.ones(mesh.num_vertices))
        assert np.allclose((a + b).values, 3)
        assert np.allclose((b - a).values, 1)
        assert np.allclose((2 * a).values, 2)
        assert np.allclose((b / 2).values, 1)
        assert np.allclose((-a).values, -1)

    def test_cross_mesh_rejected(self, mesh):
        other = Mesher(Mesher.Config.RELAXED).poly_to_mesh(geom.box(0, 0, 1, 1))
        with pytest.raises(ValueError):
            _ = ZeroForm(mesh) + ZeroForm(other)
        with pytest.raises(ZeroDivisionError):
            _ = ZeroForm(mesh) / 0

    def test_two_form(self, mesh):
        t = TwoForm(mesh)
        t[0] = 5.0
        assert t[0] == 5.0
        assert (2.0 * t).values[0] == 10.0

    def test_shape_validation(self, mesh):
        with pytest.raises(ValueError):
            ZeroForm(mesh, np.zeros(3))
        with pytest.raises(ValueError):
            OneForm(mesh, np.zeros(1))
        with pytest.raises(ValueError):
            TwoForm(mesh, np.zeros(1))


class TestMeshValidation:
    """TriMesh.validate() as the reusable topology gate over every
    mesher output (reference model: assert_mesh_topology_okay applied
    throughout tests/test_mesh.py:423-489)."""

    SHAPES = {
        "square": lambda: geom.box(0, 0, 10, 10),
        "hole": lambda: geom.difference(
            geom.box(0, 0, 10, 10), geom.box(4, 4, 6, 6)
        ).geoms[0],
        "two_holes": lambda: geom.difference(
            geom.difference(geom.box(0, 0, 20, 10), geom.box(3, 3, 6, 7)),
            geom.box(12, 2, 16, 8),
        ).geoms[0],
        "thin_notch": lambda: geom.difference(
            geom.box(0, 0, 10, 10), geom.box(4.8, 5, 5.2, 10.01)
        ).geoms[0],
    }
    CONFIGS = {
        "default": Mesher.Config(maximum_size=1.2),
        "fine": Mesher.Config(maximum_size=0.6, minimum_angle=25.0),
        "uniform": Mesher.Config(
            maximum_size=1.0, variable_size_maximum_factor=1.0
        ),
        "relaxed": Mesher.Config.RELAXED,
    }

    @pytest.mark.parametrize("shape", sorted(SHAPES))
    @pytest.mark.parametrize("config", sorted(CONFIGS))
    def test_every_mesher_output_validates(self, shape, config):
        cfg = self.CONFIGS[config]
        m = Mesher(cfg).poly_to_mesh(self.SHAPES[shape]())
        # Quality gates: the refinement targets the config promises.
        # minimum_angle gets 0.5 deg slack (constrained boundary
        # segments may pin angles right at the threshold); edge length
        # is bounded by the variable-density ceiling.
        m.validate(
            min_angle_deg=cfg.minimum_angle - 0.5,
            max_edge_length=cfg.maximum_size
            * cfg.variable_size_maximum_factor * 1.5,
        )

    def test_seeded_mesh_validates(self):
        cfg = Mesher.Config(maximum_size=1.0)
        seeds = [Point(2.5, 2.5), Point(7.5, 7.5), Point(5.0, 5.0)]
        m = Mesher(cfg).poly_to_mesh(self.SHAPES["square"](), seeds)
        m.validate(min_angle_deg=cfg.minimum_angle - 0.5)

    def test_detects_out_of_range_index(self):
        m = TriMesh(np.array([[0, 0], [1, 0], [0, 1]]),
                    np.array([[0, 1, 5]]))
        with pytest.raises(MeshingException, match="out of range"):
            m.validate()

    def test_detects_degenerate_face(self):
        m = TriMesh(np.array([[0, 0], [1, 0], [0, 1]]),
                    np.array([[0, 1, 1]]))
        with pytest.raises(MeshingException, match="degenerate"):
            m.validate()

    def test_detects_duplicate_face(self):
        m = TriMesh(np.array([[0, 0], [1, 0], [0, 1]]),
                    np.array([[0, 1, 2], [2, 0, 1]]))
        with pytest.raises(MeshingException, match="duplicate"):
            m.validate()

    def test_detects_flipped_orientation(self):
        m = TriMesh(np.array([[0, 0], [1, 0], [0, 1]]),
                    np.array([[0, 2, 1]]))  # CW
        with pytest.raises(MeshingException, match="non-CCW"):
            m.validate()

    def test_detects_nonmanifold_edge(self):
        # Three faces sharing edge (0, 1).
        m = TriMesh(
            np.array([[0, 0], [2, 0], [1, 1], [1, -1], [1, 0.5]]),
            np.array([[0, 1, 2], [0, 3, 1], [0, 1, 4]]),
        )
        with pytest.raises(MeshingException, match="non-manifold"):
            m.validate()

    def test_detects_isolated_vertex(self):
        m = TriMesh(np.array([[0, 0], [1, 0], [0, 1], [5, 5]]),
                    np.array([[0, 1, 2]]))
        with pytest.raises(MeshingException, match="isolated"):
            m.validate()

    def test_detects_nonfinite_vertex(self):
        m = TriMesh(np.array([[0, 0], [np.nan, 0], [0, 1]]),
                    np.array([[0, 1, 2]]))
        with pytest.raises(MeshingException, match="non-finite"):
            m.validate()

    def test_quality_gates_fire(self):
        # A single long sliver triangle: passes topology, fails quality.
        m = TriMesh(np.array([[0, 0], [10, 0], [5, 0.1]]),
                    np.array([[0, 1, 2]]))
        m.validate()  # structurally fine
        with pytest.raises(MeshingException, match="minimum angle"):
            m.validate(min_angle_deg=20.0)
        with pytest.raises(MeshingException, match="edge length"):
            m.validate(max_edge_length=5.0)
