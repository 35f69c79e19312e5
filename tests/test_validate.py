"""Hardware-validation harness tests using a synthetic measurement set
generated from a known board (role parity with reference
tests/test_sets.py, whose data comes from a physically measured board)."""

import json

import numpy as np
import pytest

from padne_tpu import validate


@pytest.fixture(scope="module")
def measurement_file(tmp_path_factory):
    from tests import boardgen

    d = tmp_path_factory.mktemp("val")
    boardgen.generate_all(d)
    # gen_strip: 20 mm trace, 2 mm wide, 1 V source between the ends.
    # "Measurements": the source voltage across the pads, plus a midpoint
    # pair expected at roughly half the drop.  Expected values deliberately
    # off by ~20% to exercise calibration + the 0.4 rel_tol.
    ms = {
        "board": "gen_strip/gen_strip.kicad_pro",
        "rel_tol": 0.4,
        "calibration": [
            {"p": [121, 101], "n": [101, 101], "layer": "F.Cu", "expected_v": 1.0}
        ],
        "measurements": [
            {"p": [121, 101], "n": [111, 101], "layer": "F.Cu",
             "expected_v": 0.5},
            {"p": [111, 101], "n": [101, 101], "layer": "F.Cu",
             "expected_v": 0.5},
        ],
    }
    path = d / "gen_strip_measurements.json"
    path.write_text(json.dumps(ms))
    return path


class TestValidation:
    def test_load(self, measurement_file):
        ms = validate.MeasurementSet.load(measurement_file)
        assert ms.board.exists()
        assert len(ms.calibration) == 1
        assert len(ms.measurements) == 2
        assert ms.rel_tol == 0.4

    def test_run_validation(self, measurement_file):
        ms = validate.MeasurementSet.load(measurement_file)
        report = validate.run_validation(ms)
        assert report.all_pass, report.results
        # Voltage source of exactly 1 V across the pads: calibration
        # should land very close to 1.0 (the drop is source-enforced).
        assert report.scale == pytest.approx(1.0, abs=0.05)
        for r in report.results:
            assert r["measured_v"] == pytest.approx(0.5, abs=0.1)

    def test_cli(self, measurement_file, capsys):
        rc = validate.main([str(measurement_file)])
        out = capsys.readouterr().out
        assert rc == 0
        assert "2/2 within tolerance" in out

    def test_failing_measurement(self, measurement_file, tmp_path):
        data = json.loads(measurement_file.read_text())
        data["measurements"].append(
            {"p": [121, 101], "n": [101, 101], "layer": "F.Cu",
             "expected_v": 5.0}  # absurd
        )
        bad = tmp_path / "bad.json"
        # board path is relative to the JSON file; keep it next to boards
        data["board"] = str(measurement_file.parent / data["board"])
        bad.write_text(json.dumps(data))
        ms = validate.MeasurementSet.load(bad)
        report = validate.run_validation(ms)
        assert not report.all_pass
        assert report.num_pass == 2
