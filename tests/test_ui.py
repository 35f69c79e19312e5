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


class FakeScrollEvent:
    def __init__(self, x, y, button):
        self.xdata = x
        self.ydata = y
        self.button = button


class TestProbeAndZoom:
    def test_power_density_probe_returns_face_value(self, strip_solution):
        """In Power Density mode the click probe must resolve through the
        face index (regression: it used to index face values with a
        vertex index)."""
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        v.on_key(FakeKeyEvent("m"))  # switch to Power Density
        assert v.mode.kind == "face"
        ls = v.layer_solution
        m = ls.meshes[0]
        fi = m.num_faces // 2
        cx, cy = m.face_centroids[fi]
        got = v.probe_value(float(cx), float(cy))
        assert got is not None
        expected = float(ls.power_densities[0].values[fi])
        assert got == pytest.approx(expected, rel=1e-12)
        v.on_click(FakeClickEvent(float(cx), float(-cy)))
        assert v.last_probe == pytest.approx(expected, rel=1e-12)

    def test_vertex_probe_exact(self, strip_solution):
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        m = v.layer_solution.meshes[0]
        k = m.num_vertices // 3
        x, y = m.vertices[k]
        got = v.probe_value(float(x), float(y))
        assert got == pytest.approx(
            float(v.layer_solution.potentials[0].values[k]), rel=1e-12)

    def test_scroll_zooms_toward_cursor(self, strip_solution):
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        x0, x1 = v.ax.get_xlim()
        y0, y1 = v.ax.get_ylim()
        cx, cy = (x0 + x1) / 3, (y0 + y1) / 3
        v.on_scroll(FakeScrollEvent(cx, cy, "up"))
        nx0, nx1 = v.ax.get_xlim()
        ny0, ny1 = v.ax.get_ylim()
        assert (nx1 - nx0) < (x1 - x0)  # zoomed in
        # Cursor point keeps its relative position inside the view.
        rel_before = (cx - x0) / (x1 - x0)
        rel_after = (cx - nx0) / (nx1 - nx0)
        assert rel_after == pytest.approx(rel_before, abs=1e-9)
        v.on_scroll(FakeScrollEvent(cx, cy, "down"))
        assert v.ax.get_xlim()[1] - v.ax.get_xlim()[0] == pytest.approx(
            x1 - x0)
        v.on_scroll(FakeScrollEvent(None, None, "up"))  # off-axes: no-op


class TestEditableScaleBoxes:
    def test_boxes_prefill_with_si_text(self, strip_solution):
        from padne_tpu import ui, units

        v = ui.SolutionViewer(strip_solution)
        lo, hi = v.value_range()
        assert v._box_lo.text == units.Value(
            lo, v.mode.unit).pretty_format().replace("μ", "u")
        assert v._box_hi.text == units.Value(
            hi, v.mode.unit).pretty_format().replace("μ", "u")

    def test_si_edit_overrides_scale(self, strip_solution):
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        v._scale_edited(1, "5V")
        assert v.scale_override is not None
        assert v.scale_override[1] == pytest.approx(5.0)
        assert v._cbar.mappable.norm.vmax == pytest.approx(5.0)
        # min edit composes with the max override; SI prefix parses.
        v._scale_edited(0, "250m")
        assert v.scale_override == (pytest.approx(0.25),
                                    pytest.approx(5.0))

    def test_invalid_edit_restores_display(self, strip_solution):
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        before = v.scale_override
        txt = v._box_hi.text
        v._scale_edited(1, "garbage")
        assert v.scale_override == before
        assert v._box_hi.text == txt        # display restored
        # An inverted range (hi <= lo) is rejected too.
        lo, _ = v.value_range()
        v._scale_edited(1, f"{lo - 1.0}")
        assert v.scale_override == before

    def test_programmatic_setval_does_not_reenter(self, strip_solution):
        """redraw() mirrors values into the boxes via set_val; the guard
        must keep that from recursing into _scale_edited."""
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        v.redraw()
        assert v.scale_override is None


class TestRasterPath:
    """Full-data raster path (ref ui.py:649-1142 renders every triangle
    via VBOs; here every triangle contributes to a viewport raster —
    no decimation — prepared on a worker pool like the reference's
    DeferedDict flow, ref ui.py:146-189)."""

    def _viewer(self, strip_solution):
        from padne_tpu import ui

        v = ui.SolutionViewer(strip_solution)
        # Force the raster path regardless of board size.
        v.DECIMATE_FACES = 1
        return v

    def test_raster_matches_field(self, strip_solution):
        """The synchronous raster of the strip's linear potential
        reproduces the analytic field at pixel centers."""
        v = self._viewer(strip_solution)
        extent = v._data_extent()
        field, gmask = v._compute_raster(extent)
        H, W = v.RASTER_SHAPE
        assert np.isfinite(field).any()
        # Sample a horizontal line through the strip: potential is
        # linear in x, so the finite pixels along it must be monotone
        # (up to raster noise at the edges).
        ys = np.nonzero(np.isfinite(field).sum(axis=1)
                        > 0.5 * np.isfinite(field).sum(axis=1).max())[0]
        row = field[ys[len(ys) // 2]]
        xs = np.nonzero(np.isfinite(row))[0]
        vals = row[xs]
        # The strip potential is linear in x away from the pads: a
        # linear fit along the row must explain the data to within a
        # few % of the range (raster pixels interpolate within real
        # triangles, so gross decimation/indexing errors would blow
        # this up by orders of magnitude).
        coef = np.polyfit(xs, vals, 1)
        resid = vals - np.polyval(coef, xs)
        rng = vals.max() - vals.min()
        assert rng > 0
        assert np.abs(resid).max() < 0.05 * rng
        lo, hi = v.value_range()
        assert np.nanmin(field) >= lo - 1e-6
        assert np.nanmax(field) <= hi + 1e-6

    def test_redraw_uses_raster_and_applies_async(self, strip_solution):
        v = self._viewer(strip_solution)
        v.redraw()
        assert v._pending_raster is not None
        gen, fut, extent, vmin, vmax = v._pending_raster
        fut.result(timeout=60)
        v._poll_raster()
        assert v._pending_raster is None
        assert len(v._raster_artists) >= 1
        assert "(full-data raster)" in v.ax.get_title()

    def test_zoom_triggers_reraster(self, strip_solution):
        v = self._viewer(strip_solution)
        v.redraw()
        v._pending_raster[1].result(timeout=60)
        v._poll_raster()
        gen0 = v._raster_gen
        x0, x1 = v.ax.get_xlim()
        y0, y1 = v.ax.get_ylim()
        v.on_scroll(FakeScrollEvent((x0 + x1) / 2, (y0 + y1) / 2, "up"))
        assert v._raster_gen == gen0 + 1
        v._pending_raster[1].result(timeout=60)
        v._poll_raster()
        assert len(v._raster_artists) >= 1

    def test_probe_still_full_data(self, strip_solution):
        """Raster mode never decimates the probe path."""
        v = self._viewer(strip_solution)
        v.redraw()
        ls = v.layer_solution
        m = ls.meshes[0]
        vx, vy = m.vertices[0]
        val = v.probe_value(float(vx), float(vy))
        assert val == pytest.approx(
            float(ls.potentials[0].values[0]), abs=1e-9)
