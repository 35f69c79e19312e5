"""Headless tests for the matplotlib viewer (padne_tpu.ui).

The reference's Qt viewer is exercised manually; here the matplotlib
viewer is driven programmatically under the Agg backend: layer/mode
switching, colorbar rebinding on mode change (regression: the colorbar
used to keep the Potential norm after switching to Power Density), the
probe pipeline, and scale overrides.
"""

import warnings

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from padne_tpu import kicad, solver


@pytest.fixture(scope="module")
def strip_solution(boards_dir):
    prob = kicad.load_kicad_project(
        boards_dir / "gen_strip" / "gen_strip.kicad_pro"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return solver.solve(prob)


class FakeKeyEvent:
    def __init__(self, key):
        self.key = key


class FakeClickEvent:
    def __init__(self, x, y):
        self.xdata = x
        self.ydata = y


class TestSolutionViewer:
    def test_initial_render_potential(self, strip_solution):
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        assert v.mode.name == "Potential"
        lo, hi = v.value_range()
        assert hi - lo == pytest.approx(1.0, abs=1e-6)
        # Colorbar norm matches the potential range.
        assert v._cbar.mappable.norm.vmax == pytest.approx(hi)

    def test_mode_switch_rebinds_colorbar(self, strip_solution):
        """Regression: the colorbar must track the active mode's norm and
        colormap, not the one it was created with."""
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        pot_hi = v.value_range()[1]
        v.on_key(FakeKeyEvent("m"))
        assert v.mode.name == "Power Density"
        pd_lo, pd_hi = v.value_range()
        assert pd_hi != pytest.approx(pot_hi)  # W/mm² scale, not volts
        assert v._cbar.mappable.norm.vmax == pytest.approx(pd_hi)
        assert v._cbar.mappable.get_cmap().name == "inferno"
        # And back.
        v.on_key(FakeKeyEvent("m"))
        assert v._cbar.mappable.norm.vmax == pytest.approx(pot_hi)
        assert v._cbar.mappable.get_cmap().name == "plasma"

    def test_probe_and_scale_override(self, strip_solution):
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        m = v.layer_solution.meshes[0]
        # Click exactly on a vertex (note the viewer's -y display flip).
        vx, vy = m.vertices[0]
        v.on_click(FakeClickEvent(float(vx), float(-vy)))
        assert v.last_probe is not None
        expected = float(v.layer_solution.potentials[0].values[0])
        assert v.last_probe == pytest.approx(expected, abs=1e-9)
        # 'n' pins the minimum of the scale to the probed value.
        v.on_key(FakeKeyEvent("n"))
        assert v.scale_override is not None
        assert v.scale_override[0] == pytest.approx(expected)
        assert v._cbar.mappable.norm.vmin == pytest.approx(expected)
        # 'r' resets.
        v.on_key(FakeKeyEvent("r"))
        assert v.scale_override is None

    def test_mode_switch_clears_scale_override(self, strip_solution):
        """An override is in the previous mode's units; it must not clamp
        the other mode's scale."""
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        m = v.layer_solution.meshes[0]
        vx, vy = m.vertices[0]
        v.on_click(FakeClickEvent(float(vx), float(-vy)))
        v.on_key(FakeKeyEvent("x"))
        assert v.scale_override is not None
        v.on_key(FakeKeyEvent("m"))
        assert v.scale_override is None
        assert v._cbar.mappable.norm.vmax == pytest.approx(v.value_range()[1])

    def test_edge_and_connection_toggles(self, strip_solution):
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        lines_before = len(v.ax.lines)
        v.on_key(FakeKeyEvent("e"))
        assert v.show_edges
        v.on_key(FakeKeyEvent("c"))
        assert v.show_connections
        # connection markers drawn (strip has 2 pads on a sourced net)
        assert len(v.ax.lines) > lines_before
        v.on_key(FakeKeyEvent("e"))
        v.on_key(FakeKeyEvent("c"))
        assert not v.show_edges and not v.show_connections

    def test_layer_key_out_of_range_ignored(self, strip_solution):
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        v.on_key(FakeKeyEvent("9"))  # single-layer board: no-op
        assert v.layer_idx == 0

    def test_click_outside_axes_ignored(self, strip_solution):
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        v.on_click(FakeClickEvent(None, None))
        assert v.last_probe is None
