"""Standalone generated-board tests: loader + solver end-to-end without
the reference fixture mount."""

import warnings

import numpy as np
import pytest

from padne_tpu import kicad, problem, solver


def load(boards_dir, name):
    return kicad.load_kicad_project(boards_dir / name / f"{name}.kicad_pro")


class TestGeneratedBoards:
    def test_strip_loads_and_solves(self, boards_dir):
        prob = load(boards_dir, "gen_strip")
        assert [l.name for l in prob.layers] == ["F.Cu"]
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sol = solver.solve(prob)
        assert sol.solver_info.residual_norm < 1e-9
        # 1 V source across the trace.
        net = prob.networks[0]
        vs = next(e for e in net.elements if isinstance(e, problem.VoltageSource))
        vals = np.concatenate(
            [p.values for p in sol.layer_solutions[0].potentials]
        )
        assert vals.max() - vals.min() == pytest.approx(1.0, abs=1e-6)

    def test_two_layer_via(self, boards_dir):
        prob = load(boards_dir, "gen_two_layer_via")
        assert {l.name for l in prob.layers} == {"F.Cu", "B.Cu"}
        # Via resistor stack present.
        via_nets = [
            n for n in prob.networks
            if n.elements and all(isinstance(e, problem.Resistor) for e in n.elements)
        ]
        assert via_nets
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sol = solver.solve(prob)
        assert sol.solver_info.residual_norm < 1e-9
        # Current flows F.Cu -> via -> B.Cu; potentials differ across layers.
        for ls in sol.layer_solutions:
            for p in ls.potentials:
                assert np.all(np.isfinite(p.values))

    def test_zone_plane_tht(self, boards_dir):
        prob = load(boards_dir, "gen_zone_plane")
        assert len(prob.layers) == 2
        # THT pads punch holes: drill center not in copper.
        assert not prob.layers[0].shape.contains(
            __import__("padne_tpu.geom", fromlist=["Point"]).Point(100, 100)
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sol = solver.solve(prob)
        assert sol.solver_info.residual_norm < 1e-9

    def test_rotated_pads(self, boards_dir):
        prob = load(boards_dir, "gen_rotated_pads")
        # Footprint at (110,103) angle -90: pads (-3,0),(3,0) land at
        # (110,106) and (110,100).
        pts = sorted(
            (c.point.x, c.point.y)
            for n in prob.networks
            if any(isinstance(e, problem.CurrentSource) for e in n.elements)
            for c in n.connections
        )
        assert pts[0] == pytest.approx((110.0, 100.0), abs=1e-9)
        assert pts[1] == pytest.approx((110.0, 106.0), abs=1e-9)
