"""Hardware-in-the-loop validation: compare solves against bench
measurements of a physically manufactured board.

Role parity with the reference's tests/test_sets.py harness: a
measurement set (JSON) holds point-to-point voltage readings taken with
a bench multimeter; calibration entries (e.g. rungs of a trace-width
ladder) fit a global sheet-conductance scale by least squares before the
remaining measurements are validated within a relative tolerance.

Measurement-set JSON schema:

    {
      "board": "relative/path/to/project.kicad_pro",
      "rel_tol": 0.4,
      "calibration": [
        {"p": [x, y], "n": [x, y], "layer": "F.Cu", "expected_v": 0.012}
      ],
      "measurements": [ ...same shape... ]
    }

Points are probed at the nearest mesh vertex (the reference probes pads
the same way, test_sets.py:199-258).  Calibration fits a multiplicative
sheet-conductance factor and, with --fit-overetch, a manufacturing
overetch (uniform copper erosion via geom.buffer) — the same two-parameter
model the reference fits from its trace-width ladder.
"""

from __future__ import annotations

import json
import logging
import pathlib
import warnings
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from . import kicad, mesh, problem, solver

log = logging.getLogger(__name__)


@dataclass
class ProbePair:
    p: tuple[float, float]
    n: tuple[float, float]
    layer: str
    expected_v: float


@dataclass
class MeasurementSet:
    board: pathlib.Path
    calibration: list[ProbePair]
    measurements: list[ProbePair]
    rel_tol: float = 0.4

    @classmethod
    def load(cls, path) -> "MeasurementSet":
        path = pathlib.Path(path)
        data = json.loads(path.read_text())

        def pairs(key):
            return [
                ProbePair(
                    p=tuple(e["p"]), n=tuple(e["n"]),
                    layer=e.get("layer", "F.Cu"),
                    expected_v=float(e["expected_v"]),
                )
                for e in data.get(key, [])
            ]

        return cls(
            board=(path.parent / data["board"]).resolve(),
            calibration=pairs("calibration"),
            measurements=pairs("measurements"),
            rel_tol=float(data.get("rel_tol", 0.4)),
        )


def probe_voltage(solution: solver.Solution, layer_name: str,
                  point: tuple[float, float]) -> float:
    """Voltage at the mesh vertex nearest to `point` on the named layer."""
    layer_idx = next(
        i for i, l in enumerate(solution.problem.layers)
        if l.name == layer_name
    )
    ls = solution.layer_solutions[layer_idx]
    best = (np.inf, 0.0)
    for m, pot in zip(ls.meshes, ls.potentials):
        d = np.hypot(m.vertices[:, 0] - point[0], m.vertices[:, 1] - point[1])
        k = int(np.argmin(d))
        if d[k] < best[0]:
            best = (float(d[k]), float(pot.values[k]))
    if best[0] > 1.0:
        raise ValueError(
            f"No mesh vertex within 1 mm of probe point {point} on {layer_name}"
        )
    return best[1]


def probe_pair(solution: solver.Solution, pair: ProbePair) -> float:
    return probe_voltage(solution, pair.layer, pair.p) - probe_voltage(
        solution, pair.layer, pair.n
    )


def _solve_scaled(prob: problem.Problem, conductance_scale: float,
                  mesher_config=None) -> solver.Solution:
    scaled_layers = [
        problem.Layer(
            shape=l.shape, name=l.name,
            conductance=l.conductance * conductance_scale,
        )
        for l in prob.layers
    ]
    remap = dict(zip((id(l) for l in prob.layers), scaled_layers))
    networks = []
    for net in prob.networks:
        conns = [
            problem.Connection(
                layer=remap[id(c.layer)], point=c.point, node_id=c.node_id
            )
            for c in net.connections
        ]
        networks.append(problem.Network(connections=conns, elements=net.elements))
    scaled = problem.Problem(
        layers=scaled_layers, networks=networks, project_name=prob.project_name
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return solver.solve(scaled, mesher_config=mesher_config)


def _overetched(prob: problem.Problem, overetch: float) -> problem.Problem:
    """Erode all copper by `overetch` mm (manufacturing etch model,
    reference test_sets.py overetch parameter)."""
    from . import geom

    if overetch == 0.0:
        return prob
    new_layers = []
    for l in prob.layers:
        shrunk = geom.buffer(l.shape, -overetch)
        new_layers.append(
            problem.Layer(shape=shrunk, name=l.name, conductance=l.conductance)
        )
    remap = dict(zip((id(l) for l in prob.layers), new_layers))
    networks = []
    for net in prob.networks:
        conns = [
            problem.Connection(
                layer=remap[id(c.layer)], point=c.point, node_id=c.node_id
            )
            for c in net.connections
        ]
        networks.append(problem.Network(connections=conns, elements=net.elements))
    return problem.Problem(
        layers=new_layers, networks=networks, project_name=prob.project_name
    )


def _fit_scale(v: np.ndarray, e: np.ndarray) -> tuple[float, float]:
    """Optimal conductance scale + SSE for measured-vs-expected drops.

    Drops scale as 1/s: minimize sum (v_i/s - e_i)^2 over s."""
    denom = float(np.dot(v, e))
    if abs(denom) < 1e-30:
        return 1.0, float(np.dot(v - e, v - e))
    s = float(np.dot(v, v)) / denom
    resid = v / s - e
    return s, float(np.dot(resid, resid))


def calibrate(prob: problem.Problem, pairs: list[ProbePair],
              mesher_config=None, fit_overetch: bool = False,
              overetch_candidates=(0.0, 0.01, 0.02, 0.03, 0.05)
              ) -> tuple[float, float]:
    """Fit sheet-conductance scale (and optionally overetch) by least
    squares over the calibration pairs (reference test_sets.py:261-290).

    Conductance enters linearly (one solve per geometry suffices);
    overetch changes geometry, so candidates are swept with the scale
    fitted analytically per candidate.  Returns (scale, overetch).
    """
    if not pairs:
        return 1.0, 0.0
    e = np.array([p.expected_v for p in pairs])

    def eval_overetch(oe: float):
        p_oe = _overetched(prob, oe) if oe else prob
        sol = _solve_scaled(p_oe, 1.0, mesher_config)
        v = np.array([probe_pair(sol, pp) for pp in pairs])
        return _fit_scale(v, e)

    if not fit_overetch:
        scale, _ = eval_overetch(0.0)
        log.info("Calibrated conductance scale: %.6f", scale)
        return scale, 0.0

    best = (np.inf, 1.0, 0.0)
    for oe in overetch_candidates:
        try:
            scale, sse = eval_overetch(oe)
        except Exception as exc:  # geometry may vanish at large overetch
            log.warning("Overetch %.3f failed: %s", oe, exc)
            continue
        if sse < best[0]:
            best = (sse, scale, oe)
    log.info(
        "Calibrated: conductance scale %.6f, overetch %.3f mm (sse %.3e)",
        best[1], best[2], best[0],
    )
    return best[1], best[2]


@dataclass
class ValidationReport:
    scale: float
    overetch: float = 0.0
    results: list[dict] = field(default_factory=list)

    @property
    def num_pass(self) -> int:
        return sum(r["ok"] for r in self.results)

    @property
    def all_pass(self) -> bool:
        return all(r["ok"] for r in self.results)


def run_validation(ms: MeasurementSet, mesher_config=None,
                   do_calibrate: bool = True,
                   fit_overetch: bool = False) -> ValidationReport:
    prob = kicad.load_kicad_project(ms.board)
    if do_calibrate:
        scale, overetch = calibrate(
            prob, ms.calibration, mesher_config, fit_overetch=fit_overetch
        )
    else:
        scale, overetch = 1.0, 0.0
    if overetch:
        prob = _overetched(prob, overetch)
    solution = _solve_scaled(prob, scale, mesher_config)
    report = ValidationReport(scale=scale, overetch=overetch)
    for pair in ms.measurements:
        got = probe_pair(solution, pair)
        expected = pair.expected_v
        rel = abs(got - expected) / max(abs(expected), 1e-12)
        report.results.append(
            {
                "p": pair.p,
                "n": pair.n,
                "layer": pair.layer,
                "expected_v": expected,
                "measured_v": got,
                "rel_err": rel,
                "ok": rel <= ms.rel_tol,
            }
        )
    return report


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="padne-tpu-validate")
    ap.add_argument("measurement_set", type=pathlib.Path)
    ap.add_argument("--no-calibrate", action="store_true")
    ap.add_argument("--fit-overetch", action="store_true",
                    help="also fit a manufacturing overetch (geometry erosion)")
    args = ap.parse_args(argv)
    ms = MeasurementSet.load(args.measurement_set)
    report = run_validation(
        ms, do_calibrate=not args.no_calibrate,
        fit_overetch=args.fit_overetch,
    )
    print(f"conductance scale: {report.scale:.6f}, overetch: {report.overetch:.3f} mm")
    for r in report.results:
        mark = "OK  " if r["ok"] else "FAIL"
        print(
            f"{mark} {r['layer']} {r['p']}->{r['n']}: "
            f"expected {r['expected_v']:.6f} V, got {r['measured_v']:.6f} V "
            f"(rel {r['rel_err']:.3f})"
        )
    print(f"{report.num_pass}/{len(report.results)} within tolerance")
    return 0 if report.all_pass else 1


if __name__ == "__main__":
    raise SystemExit(main())
