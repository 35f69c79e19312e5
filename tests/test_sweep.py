"""Design-sweep solver tests: shared-structure batched solves."""

import numpy as np
import pytest

from padne_tpu import geom, problem, sweep


def make_strip_problem(voltage=1.0):
    rect = geom.Polygon([(0, 0), (10, 0), (10, 1), (0, 1)])
    layer = problem.Layer(
        shape=geom.MultiPolygon([rect]), name="L", conductance=2.0
    )
    c_a = problem.Connection(layer=layer, point=geom.Point(0, 0))
    c_b = problem.Connection(layer=layer, point=geom.Point(10, 0))
    net = problem.Network(
        connections=[c_a, c_b],
        elements=[
            problem.VoltageSource(p=c_b.node_id, n=c_a.node_id, voltage=voltage)
        ],
    )
    return problem.Problem(layers=[layer], networks=[net])


def make_current_problem(current=1.0):
    rect = geom.Polygon([(0, 0), (10, 0), (10, 1), (0, 1)])
    layer = problem.Layer(
        shape=geom.MultiPolygon([rect]), name="L", conductance=2.0
    )
    c_a = problem.Connection(layer=layer, point=geom.Point(0, 0))
    c_b = problem.Connection(layer=layer, point=geom.Point(10, 0))
    net = problem.Network(
        connections=[c_a, c_b],
        elements=[
            problem.CurrentSource(f=c_b.node_id, t=c_a.node_id, current=current)
        ],
    )
    return problem.Problem(layers=[layer], networks=[net])


class TestSweep:
    def test_voltage_sweep_residuals(self):
        prob = make_strip_problem()
        specs = [
            sweep.SweepSpec(conductance_scale=s, source_scale=v)
            for s in (0.5, 1.0, 2.0)
            for v in (1.0, 3.3)
        ]
        results = sweep.solve_sweep(prob, specs)
        assert len(results) == 6
        for r in results:
            assert r.residual_norm < 1e-8
            # Voltage-source-driven field: potential span equals the
            # (scaled) source voltage, independent of conductance.
            span = r.v.max() - r.v.min()
            assert span == pytest.approx(r.spec.source_scale, abs=1e-6)

    def test_current_sweep_scaling(self):
        """With a current source, the drop scales with I/sigma."""
        prob = make_current_problem(current=1.0)
        specs = [
            sweep.SweepSpec(conductance_scale=1.0),
            sweep.SweepSpec(conductance_scale=2.0),
            sweep.SweepSpec(conductance_scale=1.0, source_scale=2.0),
        ]
        r1, r2, r3 = sweep.solve_sweep(prob, specs)
        span1 = r1.v.max() - r1.v.min()
        span2 = r2.v.max() - r2.v.min()
        span3 = r3.v.max() - r3.v.min()
        assert span2 == pytest.approx(span1 / 2, rel=1e-9)
        assert span3 == pytest.approx(span1 * 2, rel=1e-9)

    def test_sweep_matches_single_solve(self):
        import warnings

        from padne_tpu import solver

        prob = make_strip_problem(voltage=2.5)
        [r] = sweep.solve_sweep(prob, [sweep.SweepSpec()])
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sol = solver.solve(prob)
        full = np.concatenate(
            [p.values for p in sol.layer_solutions[0].potentials]
        )
        # Same mesh structure (same mesher config) -> same vertex order.
        assert np.abs(np.sort(full) - np.sort(r.v[: len(full)])).max() < 1e-8


class TestBenchTracking:
    """Regression-gate logic of benchmarks/track.py (the runner itself
    is exercised by the benchmark CI job, not under pytest)."""

    def _rec(self, rev, **vals):
        return {
            "rev": rev, "machine": "m", "quick": True,
            "rows": [
                {"suite": "s", "name": k, "value": v, "unit": "s"}
                for k, v in vals.items()
            ],
        }

    def test_compare_flags_regression(self):
        import importlib
        track = importlib.import_module("benchmarks.track")
        base = [self._rec("a", solve=1.0, mesh=2.0),
                self._rec("b", solve=1.1, mesh=2.1),
                self._rec("c", solve=0.9, mesh=1.9)]
        newest = self._rec("d", solve=2.0, mesh=2.05)
        regs = track.compare_records(newest, base, threshold=1.3)
        assert [r["name"] for r in regs] == ["solve"]
        assert regs[0]["ratio"] == pytest.approx(2.0)

    def test_compare_ok_within_threshold(self):
        import importlib
        track = importlib.import_module("benchmarks.track")
        base = [self._rec("a", solve=1.0)]
        newest = self._rec("b", solve=1.2)
        assert track.compare_records(newest, base, threshold=1.3) == []

    def test_new_benchmark_not_flagged(self):
        import importlib
        track = importlib.import_module("benchmarks.track")
        base = [self._rec("a", solve=1.0)]
        newest = self._rec("b", solve=1.0, extra=9.9)
        assert track.compare_records(newest, base, threshold=1.3) == []
