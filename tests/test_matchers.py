"""Unit tests for matcher semantics and the regex fast path
(label.go:80-163, 166-184, 305-319) and series identity invariants
(label_test.go:74-82)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mandodb_spark.matchers import (
    LabelMatcher,
    _literal_parts,
    add_metric_name,
    matcher_predicate,
    sanitize,
)
from mandodb_spark.model import series_key


def _match(spark, labels: dict, m: LabelMatcher) -> bool:
    df = spark.createDataFrame([(labels,)], "labels map<string,string>")
    return df.select(matcher_predicate(F.col("labels"), m).alias("ok")).first()["ok"]


def test_equality_matcher(spark):
    assert _match(spark, {"a": "b"}, LabelMatcher("a", "b"))
    assert not _match(spark, {"a": "b"}, LabelMatcher("a", "c"))
    assert not _match(spark, {"a": "b"}, LabelMatcher("missing", "b"))


def test_regex_is_fully_anchored(spark):
    """label.go:88: ^(?:expr)$ — 'disk' must NOT match 'disk.used'."""
    m = LabelMatcher("n", "disk", is_regex=True)
    assert _match(spark, {"n": "disk"}, m)
    assert not _match(spark, {"n": "disk.used"}, m)
    m2 = LabelMatcher("n", "disk.*", is_regex=True)
    assert _match(spark, {"n": "disk.used"}, m2)
    assert not _match(spark, {"n": "xdisk"}, m2)


def test_regex_alternation_and_classes(spark):
    m = LabelMatcher("n", "vm[01]|vm9", is_regex=True)
    assert _match(spark, {"n": "vm0"}, m)
    assert _match(spark, {"n": "vm9"}, m)
    assert not _match(spark, {"n": "vm2"}, m)


def test_fast_path_literal_extraction():
    """optimizeConcatRegex semantics (label.go:123-163)."""
    assert _literal_parts("foo.*bar") == ("foo", "bar", None)
    assert _literal_parts("foo.*mid.*bar") == ("foo", "bar", "mid")
    assert _literal_parts("foo.*") == ("foo", None, None)
    assert _literal_parts("f[0-9]o.*bar") == (None, None, None)  # metachar chunk → no fast path


def test_fast_path_agrees_with_plain_regex(spark):
    """The rewritten predicate must be semantically identical to the
    anchored regex alone."""
    cases = [
        ("disk.*", ["disk", "disk.used", "xdisk", ""]),
        ("cpu.*busy", ["cpu.busy", "cpuXbusy", "cpu.busyX", "busy"]),
        ("a.*b.*c", ["abc", "aXbXc", "ac", "c"]),
    ]
    import re

    for pattern, values in cases:
        for v in values:
            got = _match(spark, {"n": v}, LabelMatcher("n", pattern, is_regex=True))
            want = re.fullmatch(f"(?:{pattern})", v) is not None
            assert got == want, (pattern, v)


def test_sanitize_first_wins():
    out = sanitize(
        [
            LabelMatcher("", "x"),
            LabelMatcher("a", ""),
            LabelMatcher("a", "1"),
            LabelMatcher("a", "2"),
            LabelMatcher("b", "3"),
        ]
    )
    assert out == [LabelMatcher("a", "1"), LabelMatcher("b", "3")]


def test_add_metric_name():
    out = add_metric_name("cpu", [LabelMatcher("a", "1")])
    assert out[0] == LabelMatcher("__name__", "cpu")


def test_series_key_invariants(spark):
    """label_test.go:74-82: same set → same key regardless of map build
    order; different sets → different keys."""
    df = spark.createDataFrame(
        [
            ({"a": "1", "b": "2"},),
            ({"b": "2", "a": "1"},),
            ({"a": "1", "b": "3"},),
        ],
        "labels map<string,string>",
    ).select(series_key(F.col("labels")).alias("k"))
    k1, k2, k3 = [r["k"] for r in df.collect()]
    assert k1 == k2
    assert k1 != k3
