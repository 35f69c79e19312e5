"""Colormaps for field visualization.

Equivalent of the reference's embedded 256-entry viridis/plasma/inferno
tables (colormaps.py:25-803): a UniformColorMap with nearest-sample
lookup.  Tables are sampled from matplotlib when available; otherwise a
compact polynomial approximation generates them (keeps the viewer
dependency-free).
"""

from __future__ import annotations

import numpy as np


class UniformColorMap:
    """Nearest-sample lookup into a (N, 3) float RGB table in [0, 1]."""

    def __init__(self, table: np.ndarray):
        self.table = np.asarray(table, dtype=np.float64)
        if self.table.ndim != 2 or self.table.shape[1] != 3:
            raise ValueError("Colormap table must have shape (N, 3)")

    def __call__(self, value: float) -> tuple[float, float, float]:
        v = min(max(float(value), 0.0), 1.0)
        idx = min(int(v * len(self.table)), len(self.table) - 1)
        return tuple(self.table[idx])

    def map_array(self, values: np.ndarray) -> np.ndarray:
        v = np.clip(np.asarray(values, dtype=np.float64), 0.0, 1.0)
        idx = np.minimum((v * len(self.table)).astype(int), len(self.table) - 1)
        return self.table[idx]


def _poly_cmap(coeffs_r, coeffs_g, coeffs_b, n=256) -> np.ndarray:
    t = np.linspace(0.0, 1.0, n)
    rgb = np.stack(
        [np.polyval(coeffs_r, t), np.polyval(coeffs_g, t), np.polyval(coeffs_b, t)],
        axis=1,
    )
    return np.clip(rgb, 0.0, 1.0)


def _load_table(name: str) -> np.ndarray:
    try:
        import matplotlib

        cmap = matplotlib.colormaps[name]
        return np.asarray(
            [cmap(i / 255.0)[:3] for i in range(256)], dtype=np.float64
        )
    except Exception:
        # Low-order polynomial fits of the matplotlib colormaps.
        fits = {
            "viridis": (
                [2.36, -1.92, 0.51, 0.28],
                [-0.45, 0.29, 1.08, 0.0],
                [-3.74, 4.52, -1.42, 0.55],
            ),
            "plasma": (
                [-1.84, 1.85, 0.93, 0.06],
                [2.24, -1.62, 0.40, 0.02],
                [1.44, -3.03, 1.56, 0.53],
            ),
            "inferno": (
                [-2.68, 3.03, 0.66, 0.0],
                [1.85, -1.44, 0.58, 0.0],
                [6.00, -10.93, 5.05, 0.18],
            ),
        }
        return _poly_cmap(*fits[name])


VIRIDIS = UniformColorMap(_load_table("viridis"))
PLASMA = UniformColorMap(_load_table("plasma"))
INFERNO = UniformColorMap(_load_table("inferno"))
