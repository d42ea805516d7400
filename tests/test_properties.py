"""Property-based tests (hypothesis) for the identity/merge invariants the
reference pins in label_test.go:74-82 and tsdb.go:295-321."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mandodb_spark.model import canonical_labels_json, series_key

label_dicts = st.dictionaries(
    st.text(st.characters(codec="ascii", exclude_characters='"\\'), min_size=1, max_size=8),
    st.text(st.characters(codec="ascii", exclude_characters='"\\'), min_size=1, max_size=8),
    min_size=1,
    max_size=5,
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(labels=label_dicts)
def test_series_key_is_order_insensitive_and_injective_on_sets(spark, labels):
    """label_test.go:74-82: same label set in any insertion order → same
    hash; a perturbed set → different hash (overwhelmingly)."""
    items = list(labels.items())
    perm = list(reversed(items))
    perturbed = dict(items)
    k0 = next(iter(perturbed))
    perturbed[k0] = perturbed[k0] + "_x"

    def mk(d):
        return F.create_map(*[F.lit(x) for kv in d for x in kv])

    row = spark.range(1).select(
        series_key(mk(items)).alias("a"),
        series_key(mk(perm)).alias("b"),
        series_key(mk(list(perturbed.items()))).alias("c"),
        canonical_labels_json(mk(items)).alias("ja"),
        canonical_labels_json(mk(perm)).alias("jb"),
    ).first()
    assert row.a == row.b and row.ja == row.jb
    assert row.a != row.c
