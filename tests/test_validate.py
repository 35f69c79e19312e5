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

    def test_cli_json(self, measurement_file, capsys):
        rc = validate.main([str(measurement_file), "--json"])
        out = capsys.readouterr().out
        assert rc == 0
        data = json.loads(out)
        assert data["num_pass"] == 2 and data["num_total"] == 2
        assert len(data["results"]) == 2
        assert data["results"][0]["ok"] is True

    def test_pad_reference_probes(self, measurement_file, tmp_path):
        """Probe points given as pad references ("TP1", "J4.2") resolve
        against the board footprints."""
        from padne_tpu import kicad

        data = json.loads(measurement_file.read_text())
        board = measurement_file.parent / data["board"]
        x, y, layer = kicad.find_pad_location(
            board.with_suffix(".kicad_pcb"), "TP2"
        )
        assert (x, y, layer) == (121.0, 101.0, "F.Cu")
        # bare designator with one pad == explicit ref
        assert kicad.find_pad_location(
            board.with_suffix(".kicad_pcb"), "TP2.1"
        ) == (x, y, layer)
        with pytest.raises(ValueError, match="No pad"):
            kicad.find_pad_location(board.with_suffix(".kicad_pcb"), "TP99")

        data["board"] = str(board)
        data["calibration"] = [
            {"p": "TP2", "n": "TP1.1", "expected_v": 1.0}
        ]
        refs = tmp_path / "refs.json"
        refs.write_text(json.dumps(data))
        ms = validate.MeasurementSet.load(refs)
        assert ms.calibration[0].p == (121.0, 101.0)
        assert ms.calibration[0].n == (101.0, 101.0)
        assert ms.calibration[0].p_layer == "F.Cu"
        report = validate.run_validation(ms)
        assert report.all_pass

    def test_real_measurement_set_loads(self):
        """The shipped test_set_1 bench-measurement set parses and all 37
        probe references resolve to board pads (the full solve is gated
        behind PADNE_TPU_ALL_BOARDS; see test_boards.py)."""
        import os
        import pathlib

        ms_path = (
            pathlib.Path(__file__).parent / "measurements" / "test_set_1.json"
        )
        board = json.loads(ms_path.read_text())["board"]
        if not (ms_path.parent / board).exists():
            pytest.skip("reference board mount not available")
        ms = validate.MeasurementSet.load(ms_path)
        assert len(ms.calibration) == 4
        assert len(ms.measurements) == 33
        for pair in ms.calibration + ms.measurements:
            assert isinstance(pair.p, tuple) and len(pair.p) == 2

    def test_real_measurement_set_validates(self):
        """End-to-end hardware validation of the physically measured
        test_set_1 board (default-run regression gate, reference
        tests/test_sets.py:306-318): ladder calibration must recover a
        plausible sheet conductance and overetch, and ALL 33 bench
        readings must fall within the 0.4 relative tolerance — the same
        pass set the reference achieves."""
        import pathlib

        from padne_tpu import mesh

        ms_path = (
            pathlib.Path(__file__).parent / "measurements" / "test_set_1.json"
        )
        board = json.loads(ms_path.read_text())["board"]
        if not (ms_path.parent / board).exists():
            pytest.skip("reference board mount not available")
        ms = validate.MeasurementSet.load(ms_path)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            report = validate.run_validation(
                ms, mesher_config=mesh.Mesher.Config(maximum_size=2.0)
            )
        # 35 um/mil-scale etch and ~20% conductance correction are the
        # physically sensible ranges for a 35 um foil Aisler run.
        assert 0.8 < report.scale < 1.6
        assert 0.02 < report.overetch < 0.06
        assert report.num_pass == 33, [
            r for r in report.results if not r["ok"]
        ]

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
