import pytest

from padne_tpu.units import Value


class TestParse:
    @pytest.mark.parametrize(
        "text,value,unit",
        [
            ("100mA", 0.1, "A"),
            ("0.1A", 0.1, "A"),
            ("1e4A", 10000.0, "A"),
            ("100 mA", 0.1, "A"),
            ("50uV", 50e-6, "V"),
            ("50μV", 50e-6, "V"),
            ("10", 10.0, ""),
            ("1k", 1000.0, ""),
            ("3.3V", 3.3, "V"),
            ("2.5R", 2.5, "R"),
            ("1mR", 1e-3, "R"),
            ("-5V", -5.0, "V"),
            ("4n", 4e-9, ""),
            ("2p", 2e-12, ""),
            ("7T", 7e12, ""),
            ("1.5G", 1.5e9, ""),
            ("2M", 2e6, ""),
            ("+0.5A", 0.5, "A"),
            ("1e-3 V", 1e-3, "V"),
        ],
    )
    def test_valid(self, text, value, unit):
        v = Value.parse(text)
        assert v.value == pytest.approx(value, rel=1e-12)
        assert v.unit == unit

    @pytest.mark.parametrize("text", ["", "   ", "V", "mA", "x5V", "5x", "1..2"])
    def test_invalid(self, text):
        with pytest.raises(ValueError):
            Value.parse(text)


class TestFormat:
    @pytest.mark.parametrize(
        "value,unit,expected",
        [
            (0.000001, "A", "1 μA"),
            (1500, "V", "1.5 kV"),
            (0, "A", "0 A"),
            (1e-12, "V", "0 V"),  # below display threshold
            (-3.3, "V", "-3.3 V"),
            (234.5, "V", "234.5 V"),
            (23.97, "V", "23.97 V"),
            (1.0, "A", "1 A"),
        ],
    )
    def test_smart(self, value, unit, expected):
        assert Value(value, unit).pretty_format() == expected

    def test_fixed_places(self):
        assert Value(23.97, "V").pretty_format(3) == "23.970 V"
        assert Value(23.97, "V").pretty_format(5) == "23.97000 V"

    def test_roundtrip(self):
        for v in [1e-9, 3.3, 470, 1.2e6]:
            s = Value(v, "V").pretty_format(6)
            back = Value.parse(s)
            assert back.value == pytest.approx(v, rel=1e-5)
