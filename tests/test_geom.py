import numpy as np
import pytest

from padne_tpu import geom
from padne_tpu.geom import Point, Polygon


def sq(x0, y0, x1, y1):
    return geom.box(x0, y0, x1, y1)


class TestPolygonBasics:
    def test_area_and_bounds(self):
        p = sq(0, 0, 2, 3)
        assert p.area == pytest.approx(6.0)
        assert p.bounds == (0, 0, 2, 3)

    def test_orientation_normalized(self):
        cw = Polygon([(0, 0), (0, 1), (1, 1), (1, 0)])  # clockwise input
        assert cw.area == pytest.approx(1.0)

    def test_holes(self):
        p = Polygon(
            [(0, 0), (4, 0), (4, 4), (0, 4)],
            holes=[[(1, 1), (3, 1), (3, 3), (1, 3)]],
        )
        assert p.area == pytest.approx(16 - 4)

    def test_contains_and_intersects(self):
        p = sq(0, 0, 1, 1)
        assert p.contains(Point(0.5, 0.5))
        assert not p.contains(Point(0.0, 0.5))  # boundary excluded
        assert p.intersects(Point(0.0, 0.5))  # boundary included
        assert not p.intersects(Point(2, 2))

    def test_contains_respects_holes(self):
        p = Polygon(
            [(0, 0), (4, 0), (4, 4), (0, 4)],
            holes=[[(1, 1), (3, 1), (3, 3), (1, 3)]],
        )
        assert not p.contains(Point(2, 2))
        assert p.contains(Point(0.5, 0.5))

    def test_representative_point(self):
        p = Polygon(
            [(0, 0), (4, 0), (4, 4), (0, 4)],
            holes=[[(1, 1), (3, 1), (3, 3), (1, 3)]],
        )
        rp = p.representative_point()
        assert p.contains(rp)

    def test_distance_to_boundary(self):
        p = sq(0, 0, 10, 10)
        d = p.distance_to_boundary(np.array([[5.0, 5.0], [1.0, 5.0]]))
        assert d[0] == pytest.approx(5.0)
        assert d[1] == pytest.approx(1.0)


class TestBooleans:
    def test_union_overlapping(self):
        mp = geom.union_all([sq(0, 0, 1, 1), sq(0.5, 0, 1.5, 1)])
        assert len(mp.geoms) == 1
        assert mp.area == pytest.approx(1.5)

    def test_union_disjoint(self):
        mp = geom.union_all([sq(0, 0, 1, 1), sq(2, 0, 3, 1)])
        assert len(mp.geoms) == 2
        assert mp.area == pytest.approx(2.0)

    def test_union_shared_edge(self):
        mp = geom.union_all([sq(0, 0, 1, 1), sq(1, 0, 2, 1)])
        assert len(mp.geoms) == 1
        assert mp.area == pytest.approx(2.0)

    def test_difference_hole(self):
        mp = geom.difference(sq(0, 0, 4, 4), sq(1, 1, 3, 3))
        assert len(mp.geoms) == 1
        assert len(mp.geoms[0].interiors) == 1
        assert mp.area == pytest.approx(12.0)

    def test_difference_split(self):
        # Cutting a bar through the middle splits the square in two.
        mp = geom.difference(sq(0, 0, 4, 4), sq(1.8, -1, 2.2, 5))
        assert len(mp.geoms) == 2
        assert mp.area == pytest.approx(16 - 0.4 * 4 - 0)

    def test_intersection(self):
        mp = geom.intersection(sq(0, 0, 2, 2), sq(1, 1, 3, 3))
        assert mp.area == pytest.approx(1.0)

    def test_intersection_empty(self):
        mp = geom.intersection(sq(0, 0, 1, 1), sq(5, 5, 6, 6))
        assert mp.is_empty

    def test_union_many_tracks(self):
        rng = np.random.default_rng(7)
        prims = []
        for _ in range(150):
            x0, y0 = rng.uniform(0, 20, 2)
            ang = rng.uniform(0, 2 * np.pi)
            x1, y1 = x0 + 3 * np.cos(ang), y0 + 3 * np.sin(ang)
            prims.append(geom.stroke_segment(x0, y0, x1, y1, 0.3))
        mp = geom.union_all(prims)
        assert mp.area > 0
        total_prim_area = sum(p.area for p in prims)
        assert mp.area <= total_prim_area + 1e-9

    def test_nested_hole_island(self):
        # A square with a hole containing a smaller island.
        outer = sq(0, 0, 10, 10)
        hole = sq(2, 2, 8, 8)
        island = sq(4, 4, 6, 6)
        mp = geom.union_all([geom.difference(outer, hole), island])
        assert len(mp.geoms) == 2
        assert mp.area == pytest.approx(100 - 36 + 4)

    def test_degenerate_bowtie_nonzero(self):
        bow = Polygon.__new__(Polygon)
        bow._rings = (
            np.array([[0.0, 0.0], [1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]),
        )
        mp = geom.union_all([bow])
        assert mp.area == pytest.approx(0.5, abs=1e-6)


class TestPrimitives:
    def test_circle_area(self):
        c = geom.circle(0, 0, 1, segments=64)
        assert c.area == pytest.approx(np.pi, rel=1e-2)

    def test_stroke_segment(self):
        s = geom.stroke_segment(0, 0, 10, 0, 1)
        # rectangle 10x1 plus two half circles of r=0.5
        assert s.area == pytest.approx(10 + np.pi * 0.25, rel=1e-2)
        assert s.contains(Point(5, 0))
        assert s.contains(Point(-0.4, 0))
        assert not s.contains(Point(-0.6, 0))

    def test_bbox_index(self):
        geoms = [sq(0, 0, 1, 1), sq(5, 5, 6, 6), sq(0.5, 0.5, 2, 2)]
        idx = geom.BBoxIndex(geoms)
        hits = set(idx.query_point(Point(0.75, 0.75)).tolist())
        assert hits == {0, 2}


class TestDistanceMap:
    def test_interior_distance(self):
        p = sq(0, 0, 20, 20)
        dm = geom.DistanceMap(p, quantization=1.0)
        assert dm.query(10, 10) == pytest.approx(10.0, abs=1.0)
        assert dm.query(1, 10) == pytest.approx(1.0, abs=0.8)
        assert dm.query(-5, -5) == 0.0

    def test_query_many(self):
        p = sq(0, 0, 10, 10)
        dm = geom.DistanceMap(p, quantization=0.5)
        out = dm.query_many(np.array([[5.0, 5.0], [100.0, 100.0]]))
        assert out[0] == pytest.approx(5.0, abs=0.6)
        assert out[1] == 0.0


class TestBuffer:
    def test_dilate_square(self):
        d = geom.buffer(geom.box(0, 0, 10, 10), 1.0)
        # 12x12 minus square corners plus quarter circles: 144 - (4 - pi)
        assert d.area == pytest.approx(144 - (4 - np.pi), rel=0.01)

    def test_erode_square(self):
        e = geom.buffer(geom.box(0, 0, 10, 10), -1.0)
        assert e.area == pytest.approx(64.0, abs=1e-6)

    def test_erode_to_nothing(self):
        assert geom.buffer(geom.box(0, 0, 10, 0.5), -0.3).is_empty

    def test_erode_respects_holes(self):
        holey = geom.difference(geom.box(0, 0, 10, 10), geom.box(4, 4, 6, 6)).geoms[0]
        e = geom.buffer(holey, -0.5)
        # outer shrinks to 9x9; hole grows to 3x3 with rounded corners
        expected = 81 - (9 - (4 - np.pi) * 0.25)
        assert e.area == pytest.approx(expected, rel=0.01)

    def test_roundtrip_morphological_cleanup(self):
        # buffer(+d) then buffer(-d) closes small gaps (reference's
        # gerber cleanup idiom, kicad.py:1374)
        a = geom.box(0, 0, 5, 5)
        b = geom.box(5.05, 0, 10, 5)  # 50 um gap
        closed = geom.buffer(geom.buffer(geom.union_all([a, b]), 0.1), -0.1)
        assert len(closed.geoms) == 1
