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


N_BITS, N_BANDS, MAX_HAMMING = 16, 4, 3


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    base=st.integers(min_value=0, max_value=(1 << N_BITS) - 1),
    flip_bits=st.sets(st.integers(min_value=0, max_value=N_BITS - 1), max_size=MAX_HAMMING),
)
def test_simhash_band_lsh_is_lossless_within_hamming_bound(spark, base, flip_bits):
    """The pigeonhole claim of simhash_band_pairs (dedup.py): with 4 bands
    over 16 bits, ANY pair within Hamming distance <= 3 = bands-1 must
    share at least one untouched band, so the band equi-join finds it —
    lossless candidate generation, not a recall heuristic."""
    from mandodb_spark.operators.dedup import simhash_band_pairs

    other = base
    for b in flip_bits:
        other ^= 1 << b
    df = spark.createDataFrame([(1, base), (2, other)], "doc_id long, simhash long")
    out = simhash_band_pairs(
        df, "doc_id", n_bits=N_BITS, n_bands=N_BANDS, max_hamming=MAX_HAMMING
    ).collect()
    if flip_bits:
        assert [(r.id_a, r.id_b, r.hamming) for r in out] == [(1, 2, len(flip_bits))]
    else:
        # identical hashes: still a pair at hamming 0
        assert [(r.id_a, r.id_b, r.hamming) for r in out] == [(1, 2, 0)]
