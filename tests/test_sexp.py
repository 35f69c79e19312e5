import pytest

from padne_tpu import sexp
from padne_tpu.sexp import Symbol


def test_atoms():
    assert sexp.loads("(a 1 2.5 \"str\")") == [Symbol("a"), 1, 2.5, "str"]


def test_symbol_vs_string():
    parsed = sexp.loads('(x yes "yes")')
    assert isinstance(parsed[1], Symbol)
    assert not isinstance(parsed[2], Symbol)
    assert parsed[1] == "yes" and parsed[2] == "yes"


def test_nested():
    parsed = sexp.loads("(kicad_pcb (version 20240108) (layers (0 \"F.Cu\" signal)))")
    assert parsed[0] == Symbol("kicad_pcb")
    assert parsed[1] == [Symbol("version"), 20240108]
    assert parsed[2][1] == [0, "F.Cu", Symbol("signal")]


def test_escapes():
    assert sexp.loads(r'(t "a\"b\\c\nd")') == [Symbol("t"), 'a"b\\c\nd']


def test_multiline_string():
    assert sexp.loads('(text "line1\nline2")')[1] == "line1\nline2"


def test_negative_and_float():
    parsed = sexp.loads("(at -1.5 2 90)")
    assert parsed == [Symbol("at"), -1.5, 2, 90]


def test_unbalanced():
    with pytest.raises(ValueError):
        sexp.loads("(a (b)")
    with pytest.raises(ValueError):
        sexp.loads("(a)) extra")


def test_helpers():
    tree = sexp.loads("(root (item 1) (item 2) (other (item 3)))")
    assert len(list(sexp.find_all(tree, "item"))) == 3
    assert sexp.find_child(tree, "other") == [
        Symbol("other"),
        [Symbol("item"), 3],
    ]
    assert len(sexp.find_children(tree, "item")) == 2
