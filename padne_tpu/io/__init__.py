from . import solution, paraview  # noqa: F401
