"""padne_tpu — a TPU-native DC power-delivery-network analyzer.

A ground-up rebuild of the capabilities of the reference padne tool:
KiCad project loading, copper geometry extraction, constrained-Delaunay
meshing (native C++ core), FEM assembly and linear solve (JAX/XLA/Pallas,
designed for TPUs), field post-processing, visualization and export.

Keep this import light: heavy numerical dependencies (jax) load lazily in
the modules that need them.
"""

__version__ = "0.1.0"

from . import units, sexp  # noqa: F401  (cheap, no heavy deps)

__all__ = [
    "units",
    "sexp",
    "geom",
    "mesh",
    "problem",
    "kicad",
    "solver",
    "ops",
    "parallel",
]
