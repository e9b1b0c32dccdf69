"""Row-operator tests, mirroring the reference's tiny-frame exact-equality
style (reference betl/betl-test/test_dataflow_changeRow*.py pattern)."""

from tests.conftest import rows


def make(dfl, name, data):
    dfl.createDataset(name, data)
    return dfl


def test_dedupe(dfl):
    make(dfl, "d", {"a": ["1", "1", "2"], "b": ["x", "x", "y"]})
    out = dfl.dedupe("d")
    assert rows(out) == [("1", "x"), ("2", "y")]


def test_filter_equality_and_ops(dfl):
    make(dfl, "d", {"a": ["1", "2", "3", "4"], "b": ["w", "x", "y", "z"]})
    out = dfl.filter("d", {"a": ("<", "3")}, targetDataset="lt")
    assert rows(out) == [("1", "w"), ("2", "x")]
    out = dfl.filter("d", {"a": (">", "1"), "b": ("!=", "y")}, targetDataset="gt")
    assert rows(out) == [("2", "x"), ("4", "z")]
    out = dfl.filter("d", {"b": "x"}, targetDataset="eq")
    assert rows(out) == [("2", "x")]
    out = dfl.filter("d", {"b": ("not in", ["x", "y"])}, targetDataset="ni")
    assert rows(out) == [("1", "w"), ("4", "z")]


def test_filter_predicates_compose_with_and(dfl):
    # DEVIATION from reference bug (SURVEY §2.14.2): both predicates land
    make(dfl, "d", {"a": ["1", "2", "3"], "b": ["x", "x", "y"]})
    out = dfl.filter("d", {"a": (">", "1"), "b": "x"}, targetDataset="t")
    assert rows(out) == [("2", "x")]


def test_filter_where_not_in_multicol(dfl):
    make(dfl, "data", {"k1": ["a", "a", "b"], "k2": ["1", "2", "1"], "v": ["p", "q", "r"]})
    make(dfl, "exclude", {"x1": ["a"], "x2": ["2"]})
    out = dfl.filterWhereNotIn("data", ["k1", "k2"], "exclude", ["x1", "x2"])
    assert rows(out) == [("a", "1", "p"), ("b", "1", "r")]
