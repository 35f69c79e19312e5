"""Meta-test proving the runtime contract checker is armed during tests
(reference tests/test_tests.py pattern)."""

import numpy as np
import pytest

from padne_tpu.utils import validation


def test_checker_is_armed_suite_wide():
    """conftest.py arms PADNE_TPU_CHECKS=1 for the whole suite; this
    test deliberately does NOT set the env itself."""
    import os

    assert os.environ.get("PADNE_TPU_CHECKS") == "1"
    assert validation.checks_enabled()
    with pytest.raises(TypeError, match="return"):
        validation.add_numbers(1, 2)


def test_pipeline_surface_is_decorated():
    """The public pipeline entry points actually carry @checked (the
    contracts are wired, not just available)."""
    import padne_tpu.solver as solver
    import padne_tpu.mesh as mesh
    from padne_tpu.io import solution
    from padne_tpu.ops import amg, assembly, schur

    for fn in (solver.solve, solver.build_system, solver.compute_connectivity,
               mesh.Mesher.poly_to_mesh, solution.save_solution,
               solution.load_solution, schur.solve_bordered,
               amg.build_hierarchy_dia, assembly.build_ell):
        assert fn.__wrapped__ is not None, fn.__qualname__


def test_wrong_argument_type():
    with pytest.raises(TypeError):
        validation.wrong_argument_type([1, 2, 3])  # list, not ndarray
    assert validation.wrong_argument_type(np.array([1.0, 2.0])) == 3.0


def test_disabled_is_no_op(monkeypatch):
    monkeypatch.setenv("PADNE_TPU_CHECKS", "0")
    # Wrong types pass silently when disarmed (zero-overhead mode).
    assert validation.add_numbers(1, 2) == "3"


def test_array_spec():
    @validation.checked
    def f(x: validation.Array[np.floating, 2]) -> float:
        return float(x.sum())

    assert f(np.zeros((2, 2))) == 0.0
    with pytest.raises(TypeError, match="ndim"):
        f(np.zeros(3))
    with pytest.raises(TypeError, match="dtype"):
        f(np.zeros((2, 2), dtype=np.int32))
