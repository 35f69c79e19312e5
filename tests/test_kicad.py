"""Loader tests.

Uses the reference implementation's KiCad fixture boards as read-only
test data when mounted (they are real KiCad projects exercising the
format edge cases); pure-grammar tests run regardless.
"""

import pathlib

import numpy as np
import pytest

from padne_tpu import geom, kicad, problem, sexp

REF_BOARDS = pathlib.Path("/root/reference/tests/kicad")

needs_boards = pytest.mark.skipif(
    not REF_BOARDS.exists(), reason="reference fixture boards not mounted"
)


_LOAD_CACHE: dict[str, problem.Problem] = {}


def load(name: str) -> problem.Problem:
    """Load a fixture board, memoized across tests (loading the big
    boards costs seconds; the Problem IR is immutable)."""
    if name not in _LOAD_CACHE:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            _LOAD_CACHE[name] = kicad.load_kicad_project(
                REF_BOARDS / name / f"{name}.kicad_pro"
            )
    return _LOAD_CACHE[name]


# Every fixture project directory (a directory with a .kicad_pro of the
# same name).  The sweep tests below parametrize over this list so a new
# fixture is covered automatically.
ALL_BOARDS = sorted(
    p.name for p in REF_BOARDS.iterdir()
    if (p / f"{p.name}.kicad_pro").exists()
) if REF_BOARDS.exists() else []

# Load-only sweeps skip the largest fixtures by default (many seconds
# each on the 1-core CI host); PADNE_TPU_ALL_BOARDS=1 includes them.
import os as _os

SLOW_BOARDS = (
    set()
    if _os.environ.get("PADNE_TPU_ALL_BOARDS")
    else {"many_meshes", "many_meshes_many_vias", "two_big_planes",
          "test_set_1"}
)
SWEEP_BOARDS = [b for b in ALL_BOARDS if b not in SLOW_BOARDS]


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
        name = "nested_schematic_twoinstances"
        with pytest.warns(UserWarning, match="multiple instances"):
            # Direct load: the memoizing helper suppresses warnings.
            kicad.load_kicad_project(REF_BOARDS / name / f"{name}.kicad_pro")

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


class TestDirectiveGrammarMatrix:
    """Corner-case matrix for the directive grammar (reference coverage
    model: tests/test_kicad.py:379-498)."""

    def test_numeric_values_kept_verbatim(self):
        d = kicad.Directive.parse("!padne CURRENT i=2.5A f=U1.1 t=U1.2")
        assert d.params["i"] == "2.5A"
        d = kicad.Directive.parse("!padne RESISTANCE r=1e-3 a=A.1 b=B.1")
        assert d.params["r"] == "1e-3"

    def test_special_characters_in_values(self):
        d = kicad.Directive.parse("!padne FOO path=a/b-c_d:e ref=R10.2")
        assert d.params == {"path": "a/b-c_d:e", "ref": "R10.2"}

    def test_no_params_is_valid(self):
        d = kicad.Directive.parse("!padne RELAXED")
        assert d.name == "RELAXED"
        assert d.params == {}

    def test_duplicate_keys_last_wins(self):
        d = kicad.Directive.parse("!padne VOLTAGE v=1V v=2V p=A.1 n=B.1")
        assert d.params["v"] == "2V"

    def test_value_containing_equals(self):
        # Only the first '=' splits key from value.
        d = kicad.Directive.parse("!padne FOO expr=a=b")
        assert d.params["expr"] == "a=b"

    def test_empty_value_allowed_at_parse(self):
        d = kicad.Directive.parse("!padne FOO k=")
        assert d.params["k"] == ""

    def test_quotes_stripped_only_when_balanced(self):
        d = kicad.Directive.parse('!padne FOO a="x" b="y c=z')
        assert d.params["a"] == "x"
        assert d.params["b"] == '"y'  # unbalanced quote kept verbatim

    def test_whitespace_variants(self):
        d = kicad.Directive.parse("!padne\tVOLTAGE   v=1V\t p=A.1  n=B.1")
        assert d.name == "VOLTAGE"
        assert set(d.params) == {"v", "p", "n"}

    def test_extract_ignores_non_padne_and_empty_lines(self):
        text = "\n".join([
            "", "   ", "This net is important", "padne VOLTAGE v=1V",
            "  !padne VOLTAGE v=1V p=A.1 n=B.1  ", "", "trailing note",
        ])
        ds = kicad.extract_directives_from_text(text)
        assert len(ds) == 1 and ds[0].name == "VOLTAGE"

    def test_extract_strips_indentation(self):
        ds = kicad.extract_directives_from_text(
            "\t  !padne CURRENT i=1A f=A.1 t=B.1"
        )
        assert len(ds) == 1 and ds[0].params["i"] == "1A"

    def test_extract_propagates_malformed_directive(self):
        with pytest.raises(ValueError):
            kicad.extract_directives_from_text("!padne VOLTAGE ==")

    def test_endpoint_list_parsing(self):
        eps = kicad._parse_endpoints_param("U1.1, U2.3 ,U4.12,")
        assert [(e.designator, e.pad) for e in eps] == [
            ("U1", "1"), ("U2", "3"), ("U4", "12"),
        ]
        assert kicad._parse_endpoints_param(None) == []
        assert kicad._parse_endpoints_param("") == []

    def test_endpoint_rejects_extra_dots(self):
        with pytest.raises(ValueError):
            kicad.parse_endpoint("U1.2.3")


class TestLumpedSpecGrammar:
    """LumpedSpec.from_directive validation across all directive kinds
    (reference model: kicad.py spec classes; tests 745-816)."""

    def parse(self, text):
        return kicad.LumpedSpec.from_directive(kicad.Directive.parse(text))

    def test_missing_terminal_raises(self):
        with pytest.raises(ValueError, match="'n='"):
            self.parse("!padne VOLTAGE v=1V p=A.1")

    def test_empty_endpoint_list_raises(self):
        with pytest.raises(ValueError, match="'a='"):
            self.parse("!padne RESISTANCE r=1R a= b=B.1")

    def test_missing_scalar_raises(self):
        with pytest.raises(ValueError, match="'r='"):
            self.parse("!padne RESISTANCE a=A.1 b=B.1")

    def test_scalar_units_parsed(self):
        spec = self.parse("!padne RESISTANCE r=10m a=A.1 b=B.1")
        assert spec.scalars["r"] == pytest.approx(0.01)

    def test_esr_defaults_to_zero(self):
        spec = self.parse("!padne VOLTAGE v=5V p=A.1 n=B.1")
        assert spec.scalars["esr"] == 0.0

    def test_esr_parsed(self):
        spec = self.parse("!padne VOLTAGE v=5V esr=10m p=A.1 n=B.1")
        assert spec.scalars["esr"] == pytest.approx(0.01)

    def test_coupling_override(self):
        spec = self.parse("!padne CURRENT i=1A coupling=5m f=A.1 t=B.1")
        assert spec.coupling == pytest.approx(0.005)
        default = self.parse("!padne CURRENT i=1A f=A.1 t=B.1")
        assert default.coupling == kicad.COUPLING_RESISTANCE_DEFAULT

    def test_regulator_needs_all_four_terminals(self):
        with pytest.raises(ValueError):
            self.parse("!padne REGULATOR v=3.3V gain=100 p=A.1 n=B.1 f=C.1")
        spec = self.parse(
            "!padne REGULATOR v=3.3V gain=100 p=A.1 n=B.1 f=C.1 t=D.1"
        )
        assert set(spec.pads) == {"p", "n", "f", "t"}
        assert spec.scalars["gain"] == 100.0

    def test_multi_endpoint_terminal(self):
        spec = self.parse("!padne VOLTAGE v=1V p=U1.1,U1.2,U1.3 n=B.1")
        assert len(spec.pads["p"]) == 3


class TestCopperSpecMatrix:
    def test_missing_conductivity_raises(self):
        with pytest.raises(KeyError):
            kicad.CopperSpec.from_directive(
                kicad.Directive.parse("!padne COPPER")
            )

    def test_zero_conductivity_raises(self):
        with pytest.raises(ValueError):
            kicad.CopperSpec.from_directive(
                kicad.Directive.parse("!padne COPPER conductivity=0")
            )

    def test_negative_conductivity_raises(self):
        with pytest.raises(ValueError):
            kicad.CopperSpec.from_directive(
                kicad.Directive.parse("!padne COPPER conductivity=-5M")
            )


class TestProbeSpecGrammar:
    def test_missing_p_raises(self):
        with pytest.raises(ValueError):
            kicad.ProbeSpec.from_directive(
                kicad.Directive.parse("!padne PROBE x=R1.1")
            )

    def test_multiple_probe_points(self):
        spec = kicad.ProbeSpec.from_directive(
            kicad.Directive.parse("!padne PROBE p=R1.1,R2.2")
        )
        assert len(spec.endpoints) == 2


class TestProcessDirectivesMatrix:
    def test_duplicate_copper_warns_first_wins(self):
        ds = [
            kicad.Directive.parse("!padne COPPER conductivity=10M"),
            kicad.Directive.parse("!padne COPPER conductivity=99M"),
        ]
        with pytest.warns(UserWarning, match="Multiple COPPER"):
            out = kicad.process_directives(ds)
        assert out.copper_spec.conductivity == pytest.approx(1e4)

    def test_unknown_directive_warns_but_others_survive(self):
        ds = [
            kicad.Directive.parse("!padne NONSENSE x=1"),
            kicad.Directive.parse("!padne CURRENT i=1A f=A.1 t=B.1"),
        ]
        with pytest.warns(UserWarning, match="Unknown directive: NONSENSE"):
            out = kicad.process_directives(ds)
        assert len(out.lumped_specs) == 1


@needs_boards
class TestProjectFiles:
    def test_from_pro_file_paths(self):
        pro = REF_BOARDS / "simple_geometry" / "simple_geometry.kicad_pro"
        project = kicad.KiCadProject.from_pro_file(pro)
        assert project.name == "simple_geometry"
        assert project.pcb_path.suffix == ".kicad_pcb"
        assert project.sch_path.suffix == ".kicad_sch"
        assert project.pcb_path.exists() and project.sch_path.exists()

    def test_missing_project_file(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="Project file"):
            kicad.KiCadProject.from_pro_file(tmp_path / "nope.kicad_pro")

    def test_missing_pcb_file(self, tmp_path):
        (tmp_path / "x.kicad_pro").write_text("{}")
        with pytest.raises(FileNotFoundError, match="PCB file"):
            kicad.KiCadProject.from_pro_file(tmp_path / "x.kicad_pro")

    def test_missing_sch_file(self, tmp_path):
        (tmp_path / "x.kicad_pro").write_text("{}")
        (tmp_path / "x.kicad_pcb").write_text("(kicad_pcb)")
        with pytest.raises(FileNotFoundError, match="Schematic file"):
            kicad.KiCadProject.from_pro_file(tmp_path / "x.kicad_pro")

    def test_load_missing_project(self):
        with pytest.raises(FileNotFoundError):
            kicad.load_kicad_project("/nonexistent/board.kicad_pro")


def _copper_distance(layer_shape, pts: np.ndarray) -> np.ndarray:
    """Distance from each point to the nearest copper (0 when inside)."""
    cls = layer_shape.classify_points(pts)
    dist = np.full(len(pts), np.inf)
    dist[cls >= 1] = 0.0
    out = ~(cls >= 1)
    if out.any():
        d = np.full(out.sum(), np.inf)
        for poly in layer_shape.geoms:
            d = np.minimum(d, poly.distance_to_boundary(pts[out]))
        dist[out] = d
    return dist


@needs_boards
class TestBoardSweeps:
    """Invariant sweeps over every fixture board (reference model:
    test_kicad.py:794-938 lumped-points/layer-shape/stackup sweeps)."""

    @pytest.mark.parametrize("board", SWEEP_BOARDS)
    def test_loads_and_layer_shapes_are_multipolygons(self, board):
        prob = load(board)
        assert prob.layers, board
        for layer in prob.layers:
            assert isinstance(layer.shape, geom.MultiPolygon)
            assert layer.conductance > 0

    @pytest.mark.parametrize("board", SWEEP_BOARDS)
    def test_layer_names_unique_and_ordered(self, board):
        prob = load(board)
        names = [l.name for l in prob.layers]
        assert len(set(names)) == len(names)
        if "F.Cu" in names:
            assert names[0] == "F.Cu"
        if "B.Cu" in names:
            assert names[-1] == "B.Cu"

    @pytest.mark.parametrize("board", SWEEP_BOARDS)
    def test_connection_points_on_copper(self, board):
        """Every network connection must land on (or within 1 um of)
        its layer's copper — a floating connection means a pad was
        resolved against stale geometry."""
        prob = load(board)
        for net in prob.networks:
            for layer in prob.layers:
                pts = np.array([
                    (c.point.x, c.point.y) for c in net.connections
                    if c.layer is layer
                ])
                if not len(pts):
                    continue
                if layer.shape.is_empty:
                    pytest.fail(f"{board}: connections on empty layer")
                dist = _copper_distance(layer.shape, pts)
                assert dist.max() < 1e-3, (
                    f"{board}/{layer.name}: connection {dist.max():.2e} mm "
                    "off copper"
                )

    @pytest.mark.parametrize("board", SWEEP_BOARDS)
    def test_stackup_extraction(self, board):
        from padne_tpu import sexp

        pro = kicad.KiCadProject.from_pro_file(
            REF_BOARDS / board / f"{board}.kicad_pro"
        )
        tree = sexp.load_path(pro.pcb_path)
        names = kicad.extract_copper_layer_names(tree)
        stackup = kicad.extract_stackup(tree)
        stack_names = [it.name for it in stackup.items]
        for n in names:
            assert n in stack_names, f"{board}: {n} missing from stackup"
        for it in stackup.items:
            if it.conductivity is not None:
                assert it.thickness > 0 and it.conductance > 0


@needs_boards
class TestThtComponent:
    """THT pads punch holes and stitch layers exactly like vias
    (reference model: test_kicad.py:249-331)."""

    def test_tht_pad_specs_extracted(self):
        from padne_tpu import sexp

        pro = kicad.KiCadProject.from_pro_file(
            REF_BOARDS / "tht_component" / "tht_component.kicad_pro"
        )
        tree = sexp.load_path(pro.pcb_path)
        names = kicad.extract_copper_layer_names(tree)
        specs = kicad.extract_tht_pad_specs(tree, names)
        assert specs, "tht_component must yield THT pad specs"
        for s in specs:
            assert s.drill_diameter > 0
            assert len(s.layer_names) >= 2

    def test_tht_board_loads_with_stitching(self):
        prob = load("tht_component")
        names = [l.name for l in prob.layers]
        assert len(names) >= 2
        stitch_nets = [
            n for n in prob.networks
            if n.elements
            and all(isinstance(e, problem.Resistor) for e in n.elements)
            and len({c.layer.name for c in n.connections}) >= 2
        ]
        assert stitch_nets, "THT pads must produce interlayer resistor nets"

    def test_tht_holes_punched(self):
        from padne_tpu import sexp

        pro = kicad.KiCadProject.from_pro_file(
            REF_BOARDS / "tht_component" / "tht_component.kicad_pro"
        )
        tree = sexp.load_path(pro.pcb_path)
        names = kicad.extract_copper_layer_names(tree)
        specs = kicad.extract_tht_pad_specs(tree, names)
        prob = load("tht_component")
        for s in specs:
            for layer in prob.layers:
                assert not layer.shape.contains(s.point), (
                    f"drill center on copper of {layer.name}"
                )


@needs_boards
class TestViaInPad:
    def test_no_floating_connections(self):
        prob = load("via_in_pad")
        for net in prob.networks:
            for c in net.connections:
                dist = _copper_distance(
                    c.layer.shape, np.array([[c.point.x, c.point.y]])
                )
                assert dist[0] < 1e-3, "via-in-pad left a floating pad"


@needs_boards
class TestOutlineClipping:
    def test_castellated_outline_extracted_and_clips(self):
        from padne_tpu import sexp

        name = "castellated_vias_internal_cutout"
        pro = kicad.KiCadProject.from_pro_file(
            REF_BOARDS / name / f"{name}.kicad_pro"
        )
        tree = sexp.load_path(pro.pcb_path)
        outline = kicad.extract_board_outline(tree)
        assert outline is not None and not outline.is_empty
        prob = load(name)
        ox0, oy0, ox1, oy1 = outline.bounds
        for layer in prob.layers:
            if layer.shape.is_empty:
                continue
            x0, y0, x1, y1 = layer.shape.bounds
            assert x0 >= ox0 - 1e-6 and x1 <= ox1 + 1e-6
            assert y0 >= oy0 - 1e-6 and y1 <= oy1 + 1e-6
            assert layer.shape.area <= outline.area + 1e-6

    def test_simple_geometry_has_no_outline(self):
        from padne_tpu import sexp

        pro = kicad.KiCadProject.from_pro_file(
            REF_BOARDS / "simple_geometry" / "simple_geometry.kicad_pro"
        )
        tree = sexp.load_path(pro.pcb_path)
        assert kicad.extract_board_outline(tree) is None


@needs_boards
class TestScenarioBoards:
    def test_long_trace_esr_inserts_series_resistor(self):
        prob = load("long_trace_esr")
        vs_nets = [
            n for n in prob.networks
            if any(isinstance(e, problem.VoltageSource) and e.voltage != 0
                   for e in n.elements)
        ]
        assert vs_nets
        assert any(
            isinstance(e, problem.Resistor)
            for n in vs_nets for e in n.elements
        ), "esr= must add a series resistor in the source network"

    def test_multipad_coupling_star(self):
        prob = load("voltage_source_multipad_degeneration")
        vs_nets = [
            n for n in prob.networks
            if any(isinstance(e, problem.VoltageSource) for e in n.elements)
        ]
        assert vs_nets
        net = vs_nets[0]
        zero_v_glue = [
            e for e in net.elements
            if isinstance(e, problem.VoltageSource) and e.voltage == 0.0
        ]
        assert zero_v_glue, (
            "multi-pad voltage terminal must ride 0 V glue sources"
        )

    def test_two_lumped_elements_one_pad(self):
        prob = load("two_lumped_elements_one_pad")
        elems = [e for n in prob.networks for e in n.elements]
        assert len(elems) >= 2

    def test_degenerate_and_broken_boards_load(self):
        for name in ("empty_via", "detached_via", "unconnected_via",
                     "broken_trace_geometry",
                     "different_layer_and_net_same_xy"):
            prob = load(name)
            assert prob.layers, name

    def test_ldo_regulator_network(self):
        prob = load("ldo")
        regs = [
            e for n in prob.networks for e in n.elements
            if isinstance(e, problem.VoltageRegulator)
        ]
        assert regs, "ldo board must produce a VoltageRegulator element"


class TestZoneFillSemantics:
    """Stored zone fills are the exact copper in KiCad 6+ files
    ("filled_areas_thickness no"); rule areas are never copper.
    Regression: stroking modern fills bridged test_set_1's 0.2 mm
    keepout slots (min_thickness 0.25) and broke four bench readings."""

    def _render(self, zone_body: str):
        tree = sexp.loads(f"(kicad_pcb {zone_body})")
        return kicad.render_copper_primitives(tree, ["F.Cu"])["F.Cu"]

    FILL = ("(filled_polygon (layer \"F.Cu\") (pts"
            " (xy 0 0) (xy 10 0) (xy 10 1) (xy 5.1 1) (xy 5.1 0.2)"
            " (xy 4.9 0.2) (xy 4.9 1) (xy 0 1)))")

    def test_modern_fill_taken_exactly(self):
        import numpy as np

        polys = self._render(
            "(zone (net 0) (layer \"F.Cu\") (min_thickness 0.25) "
            "(filled_areas_thickness no) " + self.FILL + ")"
        )
        assert len(polys) == 1
        # the 0.2 mm slot at x ~ 5 survives: its midpoint is not copper
        pt = np.array([[5.0, 0.6]])
        assert polys[0].classify_points(pt)[0] <= 0

    def test_legacy_fill_is_stroked(self):
        polys = self._render(
            "(zone (net 0) (layer \"F.Cu\") (min_thickness 0.25) "
            + self.FILL + ")"
        )
        # legacy (no filled_areas_thickness token): fill + outline stroke
        assert len(polys) > 1

    def test_rule_area_is_not_copper(self):
        polys = self._render(
            "(zone (net 0) (layer \"F.Cu\") (min_thickness 0.25) "
            "(keepout (copperpour not_allowed)) "
            "(filled_areas_thickness no) " + self.FILL + ")"
        )
        assert polys == []

    def test_unfilled_zone_warns_and_drops_copper(self):
        """A zone saved without refilling (no filled_polygon stored)
        must warn loudly (ref kicad.py:1354-1364 warns on the empty
        gerber it produces) instead of silently dropping the copper."""
        body = (
            '(zone (net 1) (net_name "VDD") (layer "F.Cu") '
            "(min_thickness 0.25) (filled_areas_thickness no) "
            "(polygon (pts (xy 0 0) (xy 10 0) (xy 10 1) (xy 0 1))))"
        )
        with pytest.warns(UserWarning, match="no stored fill"):
            polys = self._render(body)
        assert polys == []  # the dead-copper outcome, surfaced not silent

    def test_unfilled_zone_end_to_end_dead_network(self, tmp_path):
        """Full-loader version: a generated project whose only plane
        zone has no stored fill loads with the warning and yields no
        copper on that layer."""
        import sys

        sys.path.insert(0, str(pathlib.Path(__file__).parent))
        import boardgen

        filled = boardgen.zone(
            "F.Cu", [(0, 0), (20, 0), (20, 10), (0, 10)],
            [(0, 0), (20, 0), (20, 10), (0, 10)])
        # strip the stored fill line -> an unfilled zone
        unfilled = "\n".join(
            ln for ln in filled.splitlines()
            if "filled_polygon" not in ln) + "\n"
        body = unfilled + boardgen.gr_rect(-1, -1, 21, 11)
        boardgen.write_project(tmp_path, "gen_unfilled_zone", body, [])
        with pytest.warns(UserWarning, match="no stored fill"):
            prob = kicad.load_kicad_project(
                tmp_path / "gen_unfilled_zone"
                / "gen_unfilled_zone.kicad_pro")
        front = [l for l in prob.layers if l.name == "F.Cu"]
        assert all(not layer.geoms for layer in front)
