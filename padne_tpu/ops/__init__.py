"""Device-side numerical core (JAX/XLA/Pallas).

Everything from FEM stiffness assembly through the linear solve and field
post-processing runs here as jittable functions over flat arrays — the
TPU-native replacement for the reference's scipy-sparse pipeline
(solver.py:171-213, 469-560, 767-780).

64-bit floats are enabled globally: the solver's accuracy gates (1e-9
residual, 1e-6 V parity vs scipy) are defined in f64.  On TPU, f64 is
emulated; performance-critical paths offer f32 + iterative refinement.
"""

import jax

jax.config.update("jax_enable_x64", True)

from . import assembly, cg, schur, spmv, postproc  # noqa: E402,F401
