"""Meta-test proving the runtime contract checker is armed during tests
(reference tests/test_tests.py pattern)."""

import numpy as np
import pytest

from padne_tpu.utils import validation


@pytest.fixture(autouse=True)
def armed(monkeypatch):
    monkeypatch.setenv("PADNE_TPU_CHECKS", "1")


def test_checker_is_armed():
    assert validation.checks_enabled()
    with pytest.raises(TypeError, match="return"):
        validation.add_numbers(1, 2)


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
