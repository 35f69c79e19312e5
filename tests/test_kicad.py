"""Loader tests.

Uses the reference implementation's KiCad fixture boards as read-only
test data when mounted (they are real KiCad projects exercising the
format edge cases); pure-grammar tests run regardless.
"""

import pathlib

import numpy as np
import pytest

from padne_tpu import geom, kicad, problem

REF_BOARDS = pathlib.Path("/root/reference/tests/kicad")

needs_boards = pytest.mark.skipif(
    not REF_BOARDS.exists(), reason="reference fixture boards not mounted"
)


def load(name: str) -> problem.Problem:
    return kicad.load_kicad_project(REF_BOARDS / name / f"{name}.kicad_pro")


class TestDirectiveGrammar:
    def test_basic(self):
        d = kicad.Directive.parse("!padne VOLTAGE v=3.3V p=U1.1 n=U1.2")
        assert d.name == "VOLTAGE"
        assert d.params == {"v": "3.3V", "p": "U1.1", "n": "U1.2"}

    def test_quoted_values(self):
        d = kicad.Directive.parse('!padne VOLTAGE v="3.3V" p=U1.1 n=U1.2')
        assert d.params["v"] == "3.3V"

    def test_missing_prefix(self):
        with pytest.raises(ValueError):
            kicad.Directive.parse("VOLTAGE v=3.3V")

    def test_missing_name(self):
        with pytest.raises(ValueError):
            kicad.Directive.parse("!padne")

    def test_bad_param(self):
        with pytest.raises(ValueError):
            kicad.Directive.parse("!padne VOLTAGE novalue")
        with pytest.raises(ValueError):
            kicad.Directive.parse("!padne VOLTAGE =x")

    def test_multiline_text(self):
        text = "some text\n!padne VOLTAGE v=1V p=A.1 n=B.1\nother\n!padne CURRENT i=2A f=C.1 t=D.1"
        ds = kicad.extract_directives_from_text(text)
        assert [d.name for d in ds] == ["VOLTAGE", "CURRENT"]

    def test_endpoint_parse(self):
        ep = kicad.parse_endpoint("R10.2")
        assert ep == kicad.Endpoint(designator="R10", pad="2")
        with pytest.raises(ValueError):
            kicad.parse_endpoint("R10")

    def test_process_directives(self):
        ds = [
            kicad.Directive.parse("!padne VOLTAGE v=5V p=U1.1 n=U1.2"),
            kicad.Directive.parse("!padne COPPER conductivity=58MA"),
            kicad.Directive.parse("!padne PROBE p=R1.1"),
        ]
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = kicad.process_directives(
                ds + [kicad.Directive.parse("!padne BOGUS x=1")]
            )
        assert len(out.lumped_specs) == 1
        assert out.copper_spec is not None
        assert len(out.probe_specs) == 1

    def test_copper_spec_units(self):
        d = kicad.Directive.parse("!padne COPPER conductivity=58M")
        spec = kicad.CopperSpec.from_directive(d)
        # 58e6 S/m -> 58e3 S/mm
        assert spec.conductivity == pytest.approx(5.8e4)


class TestViaSpec:
    def test_resistance_model(self):
        vs = kicad.ViaSpec(
            point=geom.Point(0, 0), drill_diameter=0.3, layer_names=["F.Cu", "B.Cu"]
        )
        # Hollow cylinder: R = L / (sigma * pi * (ro^2 - ri^2))
        r = vs.compute_resistance(1.6, 0.035, 5.95e4)
        ro, ri = 0.15 + 0.035, 0.15
        expected = 1.6 / (5.95e4 * np.pi * (ro**2 - ri**2))
        assert r == pytest.approx(expected)

    def test_shape_is_drill_polygon(self):
        vs = kicad.ViaSpec(
            point=geom.Point(1, 2), drill_diameter=0.4, layer_names=["F.Cu"]
        )
        assert len(vs.shape.exterior) == kicad.DRILL_SEGMENTS
        assert vs.shape.area == pytest.approx(np.pi * 0.04, rel=0.05)


@needs_boards
class TestBoardLoading:
    def test_simple_geometry(self):
        prob = load("simple_geometry")
        assert [l.name for l in prob.layers] == ["F.Cu"]
        assert len(prob.networks) == 2
        kinds = sorted(
            type(e).__name__ for n in prob.networks for e in n.elements
        )
        assert kinds == ["Resistor", "VoltageSource"]

    def test_layer_order_4layer(self):
        prob = load("via_tht_4layer")
        assert [l.name for l in prob.layers] == [
            "F.Cu", "In1.Cu", "In2.Cu", "B.Cu",
        ]

    def test_all_layers_multipolygons(self):
        prob = load("degenerate_hole_geometry")
        for layer in prob.layers:
            assert isinstance(layer.shape, geom.MultiPolygon)
            assert not layer.shape.is_empty

    def test_flipped_pads(self):
        prob = load("simple_via")
        vs_net = next(
            n for n in prob.networks
            if any(isinstance(e, problem.VoltageSource) for e in n.elements)
        )
        vs = next(
            e for e in vs_net.elements if isinstance(e, problem.VoltageSource)
        )
        conn_p = next(c for c in vs_net.connections if c.node_id == vs.p)
        conn_n = next(c for c in vs_net.connections if c.node_id == vs.n)
        by_layer = {c.layer.name: c for c in (conn_p, conn_n)}
        assert set(by_layer) == {"F.Cu", "B.Cu"}
        f, b = by_layer["F.Cu"], by_layer["B.Cu"]
        assert (f.point.x, f.point.y) == pytest.approx((122, 100), abs=1e-3)
        assert (b.point.x, b.point.y) == pytest.approx((142, 100), abs=1e-3)

    def test_via_creates_resistor_stack(self):
        prob = load("simple_via")
        resistor_nets = [
            n for n in prob.networks
            if n.elements and all(isinstance(e, problem.Resistor) for e in n.elements)
        ]
        assert resistor_nets, "via should produce resistor-stack networks"
        # All via resistors in one stack share the same distributed value.
        rs = resistor_nets[0]
        values = {e.resistance for e in rs.elements}
        assert len(values) == 1

    def test_via_holes_punched(self):
        prob = load("simple_via")
        # The drill point itself must not be inside copper.
        via_nets = [
            n for n in prob.networks
            if n.elements and all(isinstance(e, problem.Resistor) for e in n.elements)
        ]
        conn = via_nets[0].connections[0]
        # Boundary points of the drill are on (or just at) the copper edge;
        # the center must be outside.
        cx = np.mean([c.point.x for c in via_nets[0].connections])
        cy = np.mean([c.point.y for c in via_nets[0].connections])
        for layer in prob.layers:
            assert not layer.shape.contains(geom.Point(cx, cy))

    def test_custom_conductivity(self):
        base = load("long_trace_current")
        custom = load("long_trace_current_custom_conductivity")
        assert base.layers[0].conductance != custom.layers[0].conductance

    def test_overlapping_vias_load(self):
        prob = load("overlapping_vias")
        assert prob.layers  # loads without geometry errors

    def test_nested_schematic_directives(self):
        prob = load("nested_schematic")
        # Directives live in a nested sheet; they must still be found.
        assert any(
            isinstance(e, (problem.VoltageSource, problem.CurrentSource))
            for n in prob.networks
            for e in n.elements
        )

    def test_nested_twoinstances_warns(self):
        with pytest.warns(UserWarning, match="multiple instances"):
            load("nested_schematic_twoinstances")

    def test_probe_directive(self):
        prob = load("probe_directive")
        probe_nets = [n for n in prob.networks if not n.elements]
        assert probe_nets, "PROBE should emit element-less networks"
        for n in probe_nets:
            assert len(n.connections) == 1

    def test_stackup_conductance(self):
        prob = load("via_tht_4layer")
        for layer in prob.layers:
            # 0.035 mm x 5.95e4 S/mm = 2082.5 S
            assert layer.conductance == pytest.approx(2082.5)


@needs_boards
class TestViaStacks:
    def test_4layer_via_resistor_stack_pairs(self):
        """A through via on a 4-layer board stitches each ADJACENT layer
        pair around the drill boundary (reference test_kicad.py:333+)."""
        prob = load("via_tht_4layer")
        via_center = geom.Point(118.8, 105.9)
        expected_radius = 0.15
        tol = expected_radius * 0.1
        found_pairs = set()
        boundary_resistors = 0
        for net in prob.networks:
            for e in net.elements:
                if not isinstance(e, problem.Resistor):
                    continue
                ca = next((c for c in net.connections if c.node_id == e.a), None)
                cb = next((c for c in net.connections if c.node_id == e.b), None)
                if not ca or not cb:
                    continue
                da = ca.point.distance(via_center)
                db = cb.point.distance(via_center)
                if abs(da - expected_radius) < tol and abs(db - expected_radius) < tol:
                    boundary_resistors += 1
                    found_pairs.add(tuple(sorted([ca.layer.name, cb.layer.name])))
        layers = ["F.Cu", "In1.Cu", "In2.Cu", "B.Cu"]
        for i in range(3):
            pair = tuple(sorted([layers[i], layers[i + 1]]))
            assert pair in found_pairs, f"missing resistor stack {pair}"
        # ~16 boundary points per adjacent pair
        assert boundary_resistors >= 12

    def test_via_boundary_points_on_ring(self):
        prob = load("simple_via")
        via_nets = [
            n for n in prob.networks
            if n.elements and all(isinstance(e, problem.Resistor) for e in n.elements)
        ]
        assert via_nets
        n0 = via_nets[0]
        assert len(n0.elements) >= 4
