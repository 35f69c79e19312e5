"""Interactive solution viewer.

The reference ships a Qt6/OpenGL application (ui.py, 2.3k LoC).  This
framework's primary interactive viewer is matplotlib-based (always
available in scientific environments, works over X11/ssh/notebooks) and
shares its rendering model with the zero-dependency WebGL HTML export
(padne_tpu.io.htmlview) for production use.

Features (parity targets from the reference viewer):
  * per-layer display with keyboard switching (keys 1..9)
  * Potential / Power density rendering modes (key m), plasma / inferno
    colormaps respectively (ui.py:959-976)
  * disconnected copper drawn in gray (ui.py:700-707)
  * click to probe the nearest vertex value (status line, V formatting
    via padne_tpu.units)
  * min/max color-scale setting from probed points (keys n / x, reset r)
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import numpy as np

from . import solver as solver_mod
from . import units

log = logging.getLogger(__name__)


@dataclass
class RenderingMode:
    name: str
    unit: str
    cmap_name: str

    @property
    def kind(self) -> str:
        """"vertex" (per-vertex field) or "face" (per-face field)."""
        return "vertex" if self.name == "Potential" else "face"

    def values_for(self, ls: solver_mod.LayerSolution, mesh_idx: int):
        if self.kind == "vertex":
            return ls.potentials[mesh_idx].values, "vertex"
        return ls.power_densities[mesh_idx].values, "face"


MODES = [
    RenderingMode("Potential", "V", "plasma"),
    RenderingMode("Power Density", "W/mm²", "inferno"),
]


class SolutionViewer:
    """Matplotlib figure wrapping one Solution."""

    def __init__(self, solution: solver_mod.Solution):
        import matplotlib.pyplot as plt

        self.solution = solution
        self.layer_idx = 0
        self.mode_idx = 0
        self.scale_override: Optional[tuple[float, float]] = None
        self.last_probe: Optional[float] = None
        self.show_edges = False
        self.show_connections = False
        self.fig, self.ax = plt.subplots(figsize=(10, 8))
        self.fig.canvas.mpl_connect("key_press_event", self.on_key)
        self.fig.canvas.mpl_connect("button_press_event", self.on_click)
        self.fig.canvas.mpl_connect("scroll_event", self.on_scroll)
        self._build_scale_boxes()
        self.redraw()

    def _build_scale_boxes(self):
        """Editable color-scale bounds (the reference toolbar's
        EditableValueLabel, ui.py:1922-1994): two text boxes accepting
        SI-prefixed values via units.Value.parse; invalid input leaves
        the scale untouched and restores the displayed value."""
        from matplotlib.widgets import TextBox

        self.fig.subplots_adjust(bottom=0.14)
        ax_lo = self.fig.add_axes([0.12, 0.02, 0.16, 0.05])
        ax_hi = self.fig.add_axes([0.38, 0.02, 0.16, 0.05])
        self._box_lo = TextBox(ax_lo, "min ")
        self._box_hi = TextBox(ax_hi, "max ")
        self._box_lo.on_submit(lambda text: self._scale_edited(0, text))
        self._box_hi.on_submit(lambda text: self._scale_edited(1, text))
        self._box_guard = False

    def _scale_edited(self, which: int, text: str):
        if self._box_guard:   # programmatic set_val during redraw
            return
        try:
            parsed = units.Value.parse(text.replace("μ", "u"))
        except ValueError:
            self.redraw()     # restore the displayed value
            return
        lo, hi = self.value_range()
        new = (parsed.value, hi) if which == 0 else (lo, parsed.value)
        if new[1] > new[0]:
            self.scale_override = new
        self.redraw()

    # -- data access --------------------------------------------------------
    @property
    def layer_solution(self) -> solver_mod.LayerSolution:
        return self.solution.layer_solutions[self.layer_idx]

    @property
    def mode(self) -> RenderingMode:
        return MODES[self.mode_idx]

    def value_range(self):
        if self.scale_override:
            return self.scale_override
        vals = []
        for mi in range(len(self.layer_solution.meshes)):
            v, _ = self.mode.values_for(self.layer_solution, mi)
            if len(v):
                vals.append((v.min(), v.max()))
        if not vals:
            return (0.0, 1.0)
        lo = min(v[0] for v in vals)
        hi = max(v[1] for v in vals)
        return (lo, hi if hi > lo else lo + 1e-12)

    # -- drawing ------------------------------------------------------------
    # Display-side face budget: beyond it, triangles are strided for
    # DRAWING only (probing/scaling always use the full data).  The
    # reference keeps its GUI responsive on big solutions with VBOs +
    # a 2-worker prep pool (ui.py:649-1142); matplotlib has no such
    # path, so a 1M-triangle tripcolor would hang the figure for
    # minutes — decimation is the equivalent interactivity guarantee.
    DECIMATE_FACES = 200_000

    def _display_stride(self) -> int:
        ls = self.layer_solution
        total = sum(m.num_faces for m in ls.meshes) + sum(
            m.num_faces for m in ls.disconnected_meshes)
        return max(1, -(-total // self.DECIMATE_FACES))

    def redraw(self):
        self.ax.clear()
        ls = self.layer_solution
        vmin, vmax = self.value_range()
        stride = self._display_stride()
        tp = None
        for m in ls.disconnected_meshes:
            tris = m.triangles[::stride]
            self.ax.tripcolor(
                m.vertices[:, 0], -m.vertices[:, 1], tris,
                facecolors=np.zeros(len(tris)),
                cmap="gray", vmin=-1, vmax=1, alpha=0.6,
            )
        for mi, m in enumerate(ls.meshes):
            vals, kind = self.mode.values_for(ls, mi)
            if kind == "vertex":
                tp = self.ax.tripcolor(
                    m.vertices[:, 0], -m.vertices[:, 1],
                    m.triangles[::stride], vals,
                    shading="gouraud", cmap=self.mode.cmap_name,
                    vmin=vmin, vmax=vmax,
                )
            else:
                tp = self.ax.tripcolor(
                    m.vertices[:, 0], -m.vertices[:, 1],
                    m.triangles[::stride], facecolors=vals[::stride],
                    cmap=self.mode.cmap_name,
                    vmin=vmin, vmax=vmax,
                )
        if self.show_edges:
            for m in ls.meshes:
                self.ax.triplot(
                    m.vertices[:, 0], -m.vertices[:, 1],
                    m.triangles[::stride],
                    color="black", linewidth=0.15, alpha=0.5,
                )
        if self.show_connections:
            layer = self.solution.problem.layers[self.layer_idx]
            for net in self.solution.problem.networks:
                color = "red" if net.has_source else "gray"
                pts = [c.point for c in net.connections if c.layer is layer]
                if pts:
                    self.ax.plot(
                        [p.x for p in pts], [-p.y for p in pts], "o",
                        color=color, markersize=4, markeredgecolor="black",
                        markeredgewidth=0.3, zorder=5,
                    )
        layer_name = self.solution.problem.layers[self.layer_idx].name
        if stride > 1:
            layer_name += f" (display decimated 1/{stride})"
        lo = units.Value(vmin, self.mode.unit).pretty_format()
        hi = units.Value(vmax, self.mode.unit).pretty_format()
        if getattr(self, "_box_lo", None) is not None:
            # Mirror the displayed bounds into the editable boxes
            # without re-entering the submit callbacks ("μ" -> "u" so
            # the prefilled text round-trips through Value.parse).
            self._box_guard = True
            try:
                self._box_lo.set_val(lo.replace("μ", "u"))
                self._box_hi.set_val(hi.replace("μ", "u"))
            finally:
                self._box_guard = False
        self.ax.set_title(
            f"{layer_name} — {self.mode.name} [{lo} .. {hi}]\n"
            "keys: 1-9 layer, m mode, e edges, c connections, "
            "n/x scale from probe, r reset"
        )
        self.ax.set_aspect("equal")
        if tp is not None:
            if not getattr(self, "_cbar", None):
                self._cbar = self.fig.colorbar(tp, ax=self.ax, fraction=0.04)
            else:
                # Rebind the colorbar to the freshly drawn mappable so a
                # mode/layer/scale change updates its norm and colormap.
                self._cbar.update_normal(tp)
        self.fig.canvas.draw_idle()

    # -- interaction --------------------------------------------------------
    def on_key(self, event):
        if event.key and event.key.isdigit():
            idx = int(event.key) - 1
            if 0 <= idx < len(self.solution.layer_solutions):
                self.layer_idx = idx
                self.redraw()
        elif event.key == "m":
            self.mode_idx = (self.mode_idx + 1) % len(MODES)
            # The override is in the previous mode's units (V vs W/mm²);
            # carrying it across modes would clamp with the wrong scale.
            self.scale_override = None
            self.last_probe = None
            self.redraw()
        elif event.key == "e":
            self.show_edges = not self.show_edges
            self.redraw()
        elif event.key == "c":
            self.show_connections = not self.show_connections
            self.redraw()
        elif event.key == "r":
            self.scale_override = None
            self.redraw()
        elif event.key in ("n", "x") and self.last_probe is not None:
            lo, hi = self.value_range()
            if event.key == "n":
                self.scale_override = (self.last_probe, hi)
            else:
                self.scale_override = (lo, self.last_probe)
            self.redraw()

    def _probe_index(self):
        """Lazily built picker for the current layer + mode (replaces an
        O(V) scan per click; same indexes the reference wires into its
        tools, reference ui.py:191-267).  Vertex values (potential) pick
        the nearest mesh vertex; face values (power density) pick the
        CONTAINING face via FaceSpatialIndex."""
        from . import spatial

        kind = self.mode.kind
        key = (id(self.layer_solution), kind)
        if getattr(self, "_probe_key", None) != key:
            self._probe_key = key
            index_cls = (spatial.FaceSpatialIndex if kind == "face"
                         else spatial.VertexSpatialIndex)
            self._probe_tree = index_cls(self.layer_solution)
        return self._probe_tree

    def probe_value(self, x: float, y: float) -> Optional[float]:
        """Value under board point (x, y) in the current mode, or None
        off-copper.  Vertex modes: nearest vertex; face modes: the
        containing face's density."""
        ls = self.layer_solution
        if not ls.meshes:
            return None
        pick = self._probe_index().query(x, y)
        if pick is None:
            return None
        vals, _ = self.mode.values_for(ls, pick.mesh_index)
        return float(vals[pick.item_index])

    def on_click(self, event):
        if event.xdata is None:
            return
        x, y = float(event.xdata), -float(event.ydata)
        value = self.probe_value(x, y)
        if value is not None:
            self.last_probe = value
            txt = units.Value(value, self.mode.unit).pretty_format(4)
            log.info("Probe at (%.3f, %.3f): %s", x, y, txt)
            self.ax.set_xlabel(f"probe: {txt}")
            self.fig.canvas.draw_idle()

    def on_scroll(self, event):
        """Zoom toward/away from the cursor (reference ui.py zoom-to-
        cursor behavior)."""
        if event.xdata is None:
            return
        f = 1 / 1.25 if event.button == "up" else 1.25
        x0, x1 = self.ax.get_xlim()
        y0, y1 = self.ax.get_ylim()
        cx, cy = float(event.xdata), float(event.ydata)
        self.ax.set_xlim(cx + (x0 - cx) * f, cx + (x1 - cx) * f)
        self.ax.set_ylim(cy + (y0 - cy) * f, cy + (y1 - cy) * f)
        self.fig.canvas.draw_idle()


def main(solution: solver_mod.Solution, captured_warnings=None) -> int:
    """Open the viewer.  Falls back to writing an HTML viewer next to the
    CWD when no interactive display is available."""
    captured_warnings = captured_warnings or []
    for w in captured_warnings:
        log.warning("Solver warning: %s", w.message)

    try:
        import matplotlib

        backend = matplotlib.get_backend().lower()
        headless = "agg" in backend and "webagg" not in backend
    except Exception:
        headless = True

    if headless:
        from .io import htmlview

        out = "padne_tpu_view.html"
        htmlview.export_html(solution, out)
        print(
            f"No interactive display available; wrote standalone viewer to "
            f"{out} — open it in any browser."
        )
        return 0

    import matplotlib.pyplot as plt

    SolutionViewer(solution)
    plt.show()
    return 0
