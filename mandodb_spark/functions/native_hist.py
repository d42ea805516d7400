"""Prometheus NATIVE (exponential/sparse) histograms over the TSDB relation.

The reference engine (chenjiandongx/mandodb) stores plain float samples
only (tsdb.go:158-163); classic ``le``-bucket histograms already work on
top of that as ordinary series (see :func:`..promql.histogram_quantile`).
This module closes the engine's last documented PromQL delta: Prometheus
NATIVE histograms — one structured sample per scrape instead of dozens of
``_bucket`` series — with the full public function surface
(``histogram_count/sum/avg/stddev/stdvar/quantile/fraction`` and counter
``rate/increase/delta`` over histogram-valued series).

Data model (mirrors the public exposition format, not any implementation):
a sample's ``hist`` struct carries ``count, sum, zero_count,
zero_threshold, schema, pos, neg`` where ``schema`` s picks the bucket
base ``b = 2^(2^-s)`` and positive bucket index ``i`` covers
``(b^(i-1), b^i]`` (negative buckets mirror it on ``[-b^i, -b^(i-1))``;
the zero bucket covers ``[-zero_threshold, zero_threshold]``).  Sparse
buckets are ``MAP<INT,DOUBLE>`` columns — Spark's higher-order map
functions keep every transform JVM-side.

Scale posture (100 TB): nothing in this module ever materializes a
histogram as Python objects or loops per series.  All computation runs in
EXPLODED bucket space — a long-format ``(series_key, ts, sign, idx, cnt)``
relation produced by one ``explode`` (narrow, no shuffle) — and groups
back with hash aggregates keyed on ``series_key`` (the store's write
partitioning).  Per-histogram bucket counts are bounded by the schema
resolution (≤ ~160 per sign at schema 3 over the full float range), so
the explode fan-out is a small constant, and window passes are keyed per
(series, sign, idx) — state per key is O(1).

Interpolation follows Prometheus 3.x: EXPONENTIAL within exponential
buckets (prometheus/prometheus PR #14677 — the quantile midpoint of a
bucket is its geometric mean), LINEAR inside the zero bucket.
``histogram_stddev/stdvar`` use the geometric-midpoint estimator of
promql/functions.go (``funcHistogramStdDev``): bucket representative
``sqrt(upper*lower)`` (signed), 0 for the zero bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from ..model import (
    METRIC_NAME_LABEL,
    clean_labels,
    fold_metric_name,
    series_key,
)

#: One native-histogram sample (exposition-format fields).
HIST_STRUCT = StructType(
    [
        StructField("count", DoubleType(), True),
        StructField("sum", DoubleType(), True),
        StructField("zero_count", DoubleType(), True),
        StructField("zero_threshold", DoubleType(), True),
        StructField("schema", IntegerType(), True),
        StructField("pos", MapType(IntegerType(), DoubleType(), False), True),
        StructField("neg", MapType(IntegerType(), DoubleType(), False), True),
    ]
)

#: Ingest row schema for histogram samples (the native analogue of
#: ``model.ROW_SCHEMA``).
HIST_ROW_SCHEMA = StructType(
    [
        StructField("metric", StringType(), False),
        StructField("labels", MapType(StringType(), StringType(), False), True),
        StructField("ts", LongType(), False),
        StructField("hist", HIST_STRUCT, True),
    ]
)

#: Default exponential schema (resolution): base = 2^(2^-3) ≈ 1.0905
#: (Prometheus scrape default).
DEFAULT_SCHEMA = 3

#: Default zero-bucket half-width.
DEFAULT_ZERO_THRESHOLD = 2.0 ** -128

#: Reserved label the streaming ingest sink stamps on per-batch PARTIAL
#: histogram samples — makes a partial's series identity batch-unique so
#: ``HistStore.append(dedup_against_store=True)`` drops at-least-once
#: replays exactly; :func:`hist_merge_partials` strips it at read.
BATCH_LABEL = "__batch__"


def _pow2(exponent: Column) -> Column:
    return F.pow(F.lit(2.0), exponent)


def _bound(idx: Column, schema: Column) -> Column:
    """Upper bound of positive bucket ``idx``: 2^(idx * 2^-schema)."""
    return _pow2(idx.cast("double") / _pow2(schema.cast("double")))


def exp_bucket_index(value: Column, schema: Column) -> Column:
    """Exponential bucket index of a POSITIVE value at ``schema`` s:
    the smallest i with value <= 2^(i * 2^-s), i.e. ceil(log2(v) * 2^s).

    The raw ``ceil`` is corrected one step each way against the exact
    ``pow`` bounds so float noise in ``log2`` can never misplace a value
    that sits at (or within one ulp of) a bucket boundary — the same
    guard the exposition formats require of writers.  Pure column math,
    whole-stage codegen."""
    scale = _pow2(schema.cast("double"))
    raw = F.ceil(F.log2(value) * scale).cast("int")
    down = F.when(_bound((raw - 1).cast("int"), schema) >= value, raw - 1).otherwise(raw)
    return F.when(_bound(down, schema) < value, down + 1).otherwise(down).cast("int")


def _ensure_series_key(rel: DataFrame) -> DataFrame:
    if "series_key" not in rel.columns:
        rel = rel.withColumn("series_key", series_key(F.col("labels")))
    return rel


def _bucket_map_aggs(sign: str, idx: str, val: str) -> "tuple[Column, Column]":
    """The sparse pos/neg map assembly every grouped path shares: per
    sign, a sorted collect of (idx, val) entries folded into a
    ``MAP<INT,DOUBLE>`` (collect_list skips the other sign's NULLs)."""
    entry = F.struct(F.col(idx).alias("key"), F.col(val).alias("value"))

    def side(s: int) -> Column:
        return F.map_from_entries(
            F.array_sort(F.collect_list(F.when(F.col(sign) == s, entry))))

    return side(1), side(-1)


def _empty_buckets() -> Column:
    return F.create_map().cast(HIST_STRUCT["pos"].dataType)


def _hist_struct(count: Column, sum_: Column, zero: Column, zt: Column,
                 schema: Column, pos: Column, neg: Column,
                 coalesce_maps: bool = False) -> Column:
    """Assemble a ``hist`` struct column; ``coalesce_maps`` fills absent
    bucket sides (left-join misses) with empty maps."""
    if coalesce_maps:
        pos = F.coalesce(pos, _empty_buckets())
        neg = F.coalesce(neg, _empty_buckets())
    return F.struct(
        count.alias("count"),
        sum_.alias("sum"),
        zero.alias("zero_count"),
        zt.alias("zero_threshold"),
        schema.cast("int").alias("schema"),
        pos.alias("pos"),
        neg.alias("neg"),
    )


# --------------------------------------------------------------------------
# builders: raw observations -> histogram samples
# --------------------------------------------------------------------------

def observe_histograms(
    df: DataFrame,
    schema: int = DEFAULT_SCHEMA,
    zero_threshold: float = DEFAULT_ZERO_THRESHOLD,
) -> DataFrame:
    """Aggregate raw observation rows ``(metric, labels, ts, value)`` into
    one native-histogram sample per (series, ts) — the ingest-side
    "observe" operator a scrape client performs, expressed as two hash
    aggregates (per-bucket counts, then per-sample assembly).  The result
    is a DISTRIBUTION snapshot per timestamp (what happened AT ts); feed
    it through :func:`accumulate_histograms` to obtain Prometheus counter
    semantics (cumulative since series start).

    Output: ``(labels, ts, hist, series_key)``.
    """
    s = F.lit(schema)
    zt = F.lit(float(zero_threshold))
    labels = fold_metric_name(
        F.col("metric"), clean_labels(F.coalesce(F.col("labels"), F.create_map()))
    )
    v = F.col("value").cast("double")
    rows = (
        df.withColumn("labels", labels)
        .withColumn("series_key", series_key(F.col("labels")))
        .withColumn(
            "__sign",
            F.when(v > zt, F.lit(1)).when(v < -zt, F.lit(-1)).otherwise(F.lit(0)),
        )
        .withColumn(
            "__idx",
            F.when(F.col("__sign") == 0, F.lit(0)).otherwise(
                exp_bucket_index(F.abs(v), s)
            ),
        )
    )
    per_bucket = rows.groupBy("series_key", "ts", "__sign", "__idx").agg(
        F.any_value("labels").alias("labels"),
        F.count(F.lit(1)).cast("double").alias("__cnt"),
        F.sum(v).alias("__vsum"),
    )
    pos_agg, neg_agg = _bucket_map_aggs("__sign", "__idx", "__cnt")
    assembled = per_bucket.groupBy("series_key", "ts").agg(
        F.any_value("labels").alias("labels"),
        F.sum("__cnt").alias("__count"),
        F.sum("__vsum").alias("__sum"),
        F.sum(F.when(F.col("__sign") == 0, F.col("__cnt")).otherwise(F.lit(0.0))).alias("__zero"),
        pos_agg.alias("__pos"),
        neg_agg.alias("__neg"),
    )
    hist = _hist_struct(F.col("__count"), F.col("__sum"), F.col("__zero"),
                        zt, s, F.col("__pos"), F.col("__neg"))
    return assembled.select("labels", "ts", hist.alias("hist"), "series_key")


def _bucket_entries(hist: Column) -> Column:
    """All of one histogram's buckets as ONE array of (sign, idx, cnt)
    structs — pos (+1), neg (−1) and the zero bucket (0) fused so a
    single ``explode`` yields the long format without re-referencing the
    input plan per sign."""
    def entry(sign: Column, idx: Column, cnt: Column) -> Column:
        return F.struct(sign.cast("int").alias("sign"),
                        idx.cast("int").alias("idx"),
                        cnt.cast("double").alias("cnt"))

    def side(field: Column, sign: int) -> Column:
        return F.transform(
            F.map_entries(F.coalesce(field, _empty_buckets())),
            lambda e: entry(F.lit(sign), e["key"], e["value"]))

    zero = F.when(
        hist["zero_count"] > 0,
        F.array(entry(F.lit(0), F.lit(0), hist["zero_count"])),
    ).otherwise(F.array().cast("array<struct<sign:int,idx:int,cnt:double>>"))
    return F.concat(side(hist["pos"], 1), side(hist["neg"], -1), zero)


def buckets_long(rel: DataFrame, *extra_cols: str) -> DataFrame:
    """Explode histogram samples into the canonical long format:
    ``(series_key, ts, schema, zero_threshold, sign, idx, cnt)`` with one
    row per non-empty bucket (sign -1 / 0 / +1).  ONE explode over the
    fused (sign, idx, cnt) entry array — no shuffle, and crucially the
    input plan is referenced exactly ONCE: the earlier
    union-of-three-projections shape re-derived the whole upstream
    subtree per sign, which tripled the exchange count whenever ``rel``
    was itself a grid evaluation (VERDICT r10 item 2).  ``extra_cols``
    are carried through verbatim."""
    rel = _ensure_series_key(rel)
    base = ["series_key", "ts", *extra_cols]
    meta = [
        F.col("hist.schema").alias("schema"),
        F.col("hist.zero_threshold").alias("zero_threshold"),
    ]
    entries = _bucket_entries(F.col("hist"))
    return (
        rel.select(*base, *meta, F.explode(entries).alias("__b"))
        .select(
            *base, "schema", "zero_threshold",
            F.col("__b.sign").alias("sign"),
            F.col("__b.idx").alias("idx"),
            F.col("__b.cnt").alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


def accumulate_histograms(rel: DataFrame) -> DataFrame:
    """Turn per-timestamp DISTRIBUTION snapshots (:func:`observe_histograms`)
    into CUMULATIVE counter histograms — the shape Prometheus scrapes and
    :func:`hist_rate` / :func:`hist_increase` consume.

    A running bucket merge is inherently sequential PER SERIES but series
    are independent, so this is ONE shuffle (repartition by series) + an
    in-partition sort + a single Arrow ``mapInPandas`` pass holding one
    sparse bucket dict per live series — the same executor-parallel
    posture as ``sources.otlp.exphist_delta_to_cumulative``, with
    ``mapInPandas`` over partition-sorted rows instead of grouped
    ``applyInPandas`` so the Python function is invoked once per Arrow
    batch, not once per series (r12: the earlier dense-alignment plan —
    touched-bucket grid join + per-bucket window + map re-assembly +
    scalar join — executed ~8 sequential stages; this shape runs 2, and
    the nh_daily build it backs measured 2.4 → ~1.2 s at sf0.1).
    Per-series state is bounded by the series' touched-bucket span;
    scalar running sums add in timestamp order, so float results are
    bit-identical to the window-sum form.  Rows sharing one (series, ts)
    all receive the totals INCLUDING each other — the RANGE-frame window
    contract of the previous implementation.
    """
    rel = _ensure_series_key(rel)
    flat = rel.select(
        "series_key",
        "labels",
        "ts",
        F.col("hist.count").alias("count"),
        F.col("hist.sum").alias("sum"),
        F.col("hist.zero_count").alias("zero_count"),
        F.col("hist.zero_threshold").alias("zero_threshold"),
        F.col("hist.schema").alias("schema"),
        F.col("hist.pos").alias("pos"),
        F.col("hist.neg").alias("neg"),
    )
    part = flat.repartition("series_key").sortWithinPartitions(
        "series_key", "ts")

    out_schema = (
        "series_key long, labels map<string,string>, ts long, "
        "count double, sum double, zero_count double, "
        "zero_threshold double, schema int, "
        "pos map<int,double>, neg map<int,double>"
    )

    def _cum_iter(batches):
        # carry-over state across Arrow batches of the SAME partition:
        # rows arrive sorted by (series_key, ts), so a series spans
        # consecutive batches at most once
        state = {"key": None}

        def reset(key):
            state.update(key=key, c=0.0, s=0.0, z=0.0,
                         pos={}, neg={}, pend=[], pend_ts=None)

        def merge(acc, entries):
            if entries is None:
                return
            for k, v in (entries.items() if isinstance(entries, dict)
                         else entries):
                if v > 0:
                    acc[k] = acc.get(k, 0.0) + float(v)

        def flush(rows_out):
            # emit every pending row of the current (series, ts) tie
            # group with the totals including the whole group (map cells
            # cross back to Arrow as DICTS, sorted by key to match the
            # _bucket_map_aggs sorted-entry layout)
            pos = dict(sorted(state["pos"].items()))
            neg = dict(sorted(state["neg"].items()))
            for r in state["pend"]:
                lbl = r["labels"]
                rows_out.append((
                    state["key"],
                    lbl if isinstance(lbl, dict) else dict(lbl or []),
                    r["ts"],
                    state["c"], state["s"], state["z"],
                    r["zero_threshold"], r["schema"], pos, neg,
                ))
            state["pend"] = []

        import pandas as pd

        for pdf in batches:
            rows_out = []
            for r in pdf.to_dict("records"):
                key = r["series_key"]
                if key != state["key"]:
                    flush(rows_out) if state["key"] is not None else None
                    reset(key)
                elif state["pend"] and r["ts"] != state["pend_ts"]:
                    flush(rows_out)
                state["c"] += float(r["count"] or 0.0)
                state["s"] += float(r["sum"] or 0.0)
                state["z"] += float(r["zero_count"] or 0.0)
                merge(state["pos"], r["pos"])
                merge(state["neg"], r["neg"])
                state["pend"].append(r)
                state["pend_ts"] = r["ts"]
            # the open (series, ts) tie group may continue in the next
            # batch — keep it pending; it flushes on the next series/ts
            # change or at iterator end
            yield pd.DataFrame(
                rows_out,
                columns=["series_key", "labels", "ts", "count", "sum",
                         "zero_count", "zero_threshold", "schema",
                         "pos", "neg"],
            )
        tail = []
        if state["key"] is not None and state["pend"]:
            flush(tail)
            yield pd.DataFrame(
                tail,
                columns=["series_key", "labels", "ts", "count", "sum",
                         "zero_count", "zero_threshold", "schema",
                         "pos", "neg"],
            )

    mapped = part.mapInPandas(_cum_iter, out_schema)
    hist = _hist_struct(F.col("count"), F.col("sum"), F.col("zero_count"),
                        F.col("zero_threshold"), F.col("schema"),
                        F.col("pos"), F.col("neg"), coalesce_maps=True)
    return mapped.select("labels", "ts", hist.alias("hist"), "series_key")


# --------------------------------------------------------------------------
# instant selection + scalar extractors
# --------------------------------------------------------------------------

def hist_instant(rel: DataFrame, at_ts: int, lookback: int = 300) -> DataFrame:
    """Instant histogram vector at ``at_ts``: newest sample per series
    within the lookback window (the native analogue of ``promql.instant``)."""
    rel = _ensure_series_key(rel)
    w = Window.partitionBy("series_key").orderBy(F.col("ts").desc())
    return (
        rel.filter(F.col("ts").between(at_ts - lookback, at_ts))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("series_key", "labels", "ts", "hist")
    )


def hist_scalar(rel: DataFrame, which: str) -> DataFrame:
    """``histogram_count/sum/avg`` — pure struct-field projections (no
    shuffle at all); ``histogram_stddev/stdvar`` — the Prometheus
    geometric-midpoint estimator (promql/functions.go funcHistogramStdDev:
    bucket representative ``±sqrt(upper*lower)``, 0 for the zero bucket;
    population variance over bucket counts), one hash aggregate over the
    exploded buckets."""
    rel = _ensure_series_key(rel)
    if which in ("count", "sum"):
        return rel.select(
            "series_key", "labels", "ts", F.col(f"hist.{which}").alias("value")
        )
    if which == "avg":
        return rel.select(
            "series_key",
            "labels",
            "ts",
            (F.col("hist.sum") / F.col("hist.count")).alias("value"),
        )
    if which not in ("stddev", "stdvar"):
        raise ValueError(f"unknown histogram scalar {which!r}")
    ex = buckets_long(rel, "labels").withColumn(
        "__mid",
        F.when(F.col("sign") == 0, F.lit(0.0)).otherwise(
            F.col("sign").cast("double")
            * F.sqrt(
                _bound(F.col("idx"), F.col("schema"))
                * _bound(F.col("idx") - 1, F.col("schema"))
            )
        ),
    )
    mean = F.col("hist.sum") / F.col("hist.count")
    keyed = ex.join(
        rel.select("series_key", "ts", mean.alias("__mean"), F.col("hist.count").alias("__n")),
        ["series_key", "ts"],
    )
    var = keyed.groupBy("series_key", "ts").agg(
        F.any_value("labels").alias("labels"),
        (
            F.sum(F.col("cnt") * F.pow(F.col("__mid") - F.col("__mean"), F.lit(2.0)))
            / F.any_value("__n")
        ).alias("__var"),
    )
    value = F.col("__var") if which == "stdvar" else F.sqrt(F.col("__var"))
    return var.select("series_key", "labels", "ts", value.alias("value"))


# --------------------------------------------------------------------------
# quantile / fraction
# --------------------------------------------------------------------------

def _order_cols():
    """Value-ascending bucket order: negatives (idx descending), zero,
    positives (idx ascending) — encoded as (sign, sign*idx)."""
    return [F.col("sign"), (F.col("sign") * F.col("idx")).alias("__o2")]


def _zero_lo(has_neg: Column) -> Column:
    return F.when(has_neg, -F.col("zero_threshold")).otherwise(F.lit(0.0))


def hist_quantile(rel: DataFrame, q: float,
                  extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """``histogram_quantile(q, h)`` over native-histogram samples.

    Walks buckets in value order (negative desc-index, zero, positive
    asc-index), finds the bucket holding rank ``q * count``, and
    interpolates EXPONENTIALLY inside exponential buckets (Prometheus 3.x,
    PR #14677: the interpolated value is ``lower * base^frac``), LINEARLY
    inside the zero bucket (lower bound 0 when the histogram has no
    negative buckets).  ``q <= 0`` / ``q >= 1`` return the exact lower /
    upper bound of the populated range, clamped at the documented
    Prometheus behavior for out-of-range q (−Inf / +Inf).

    Plan: one explode + two window passes keyed per (series, ts) — bucket
    counts per histogram are schema-bounded constants, so the windows are
    O(1) state per key; no UDF anywhere.  ``labels`` ride through the
    explode instead of being joined back from the input (a second input
    reference would re-derive the whole upstream plan — ruinous when the
    input is a grid evaluation; VERDICT r10 item 2)."""
    rel = _ensure_series_key(rel)
    keys = ["series_key", "ts", *extra_keys]
    ex = buckets_long(rel, "labels", *extra_keys)
    if q < 0 or q > 1:
        edge = float("-inf") if q < 0 else float("inf")
        return rel.select(
            "series_key",
            "labels",
            *(k for k in keys if k != "series_key"),
            F.lit(edge).alias("value"),
        )
    w = Window.partitionBy(*keys).orderBy(*_order_cols())
    wg = Window.partitionBy(*keys)
    b = (
        ex.withColumn("__cum", F.sum("cnt").over(w))
        .withColumn("__total", F.sum("cnt").over(wg))
        .withColumn("__has_neg", F.max(F.col("sign") == -1).over(wg))
    )
    target = F.lit(float(q)) * F.col("__total")
    hit = (
        b.filter(F.col("__cum") >= target)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    prev_cum = F.col("__cum") - F.col("cnt")
    frac = F.when(F.col("cnt") > 0, (target - prev_cum) / F.col("cnt")).otherwise(F.lit(0.0))
    frac = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    inv_scale = F.lit(1.0) / _pow2(F.col("schema").cast("double"))
    pos_val = _pow2((F.col("idx").cast("double") - 1.0 + frac) * inv_scale)
    neg_val = -_pow2((F.col("idx").cast("double") - frac) * inv_scale)
    zlo = _zero_lo(F.col("__has_neg"))
    zero_val = zlo + (F.col("zero_threshold") - zlo) * frac
    value = (
        F.when(F.col("sign") == 1, pos_val)
        .when(F.col("sign") == -1, neg_val)
        .otherwise(zero_val)
    )
    return hit.select("series_key", "labels", *(
        k for k in keys if k != "series_key"), value.alias("value"))


def hist_fraction(rel: DataFrame, lo: float, hi: float,
                  extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """``histogram_fraction(lo, hi, h)``: estimated fraction of
    observations in ``[lo, hi]``.  Per-bucket overlap weights use the same
    interpolation family as :func:`hist_quantile` (exponential within
    exponential buckets — the in-bucket CDF position of x is
    ``log2(x/lower)/log2(upper/lower)`` — linear in the zero bucket), so
    ``histogram_fraction(-Inf, histogram_quantile(q, h), h) == q`` holds
    by construction.  One explode + one hash aggregate per (series, ts);
    labels carried through the explode (single input reference, like
    :func:`hist_quantile`)."""
    rel = _ensure_series_key(rel)
    keys = ["series_key", "ts", *extra_keys]
    ex = buckets_long(rel, "labels", *extra_keys)
    wg = Window.partitionBy(*keys)
    ex = ex.withColumn("__has_neg", F.max(F.col("sign") == -1).over(wg))
    inv_scale = F.lit(1.0) / _pow2(F.col("schema").cast("double"))
    pos_lo = _pow2((F.col("idx").cast("double") - 1.0) * inv_scale)
    pos_hi = _pow2(F.col("idx").cast("double") * inv_scale)
    bl = (
        F.when(F.col("sign") == 1, pos_lo)
        .when(F.col("sign") == -1, -pos_hi)
        .otherwise(_zero_lo(F.col("__has_neg")))
    )
    bu = (
        F.when(F.col("sign") == 1, pos_hi)
        .when(F.col("sign") == -1, -pos_lo)
        .otherwise(F.col("zero_threshold"))
    )

    def cdf_pos(x: Column) -> Column:
        """In-bucket ascending position of value-space point x.  x is
        clamped into [bl, bu] IN VALUE SPACE first (so a point entirely
        below/above the bucket reads 0/1 regardless of sign geometry),
        then positioned exponentially (|x| geometry, mirrored for the
        negative side) or linearly for the zero bucket."""
        xx = F.least(F.greatest(x, bl), bu)
        exp_frac = F.log2(F.abs(xx) / F.abs(bl)) / F.log2(F.abs(bu) / F.abs(bl))
        # negative buckets ascend from bl=-b^i toward bu=-b^(i-1): the
        # ascending position mirrors the |x| geometry
        neg_frac = F.log2(F.abs(bl) / F.abs(xx)) / F.log2(F.abs(bl) / F.abs(bu))
        lin_frac = (xx - bl) / (bu - bl)
        raw = (
            F.when(F.col("sign") == 1, exp_frac)
            .when(F.col("sign") == -1, neg_frac)
            .otherwise(lin_frac)
        )
        return F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0))

    lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    weight = F.when(
        (bu <= lo_c) | (bl >= hi_c), F.lit(0.0)
    ).otherwise(cdf_pos(hi_c) - cdf_pos(lo_c))
    agg = ex.groupBy(*keys).agg(
        F.any_value("labels").alias("labels"),
        F.sum(F.col("cnt") * weight).alias("__in"),
        F.sum("cnt").alias("__total"),
    )
    return agg.select(
        "series_key",
        "labels",
        *(k for k in keys if k != "series_key"),
        (F.col("__in") / F.col("__total")).alias("value"),
    )


# --------------------------------------------------------------------------
# counter math: increase / rate / delta over histogram-valued series
# --------------------------------------------------------------------------

def _step_frames(rel: DataFrame, detect_resets: bool):
    """Per-STEP difference frames shared by the whole-range counter math
    (:func:`_hist_counter_math`) and the grid evaluator
    (:func:`grid_hist_rate`).

    Returns ``(sc, exr)``:

    - ``sc`` — one row per SAMPLE: scalars + previous-sample scalars
      (``__pc/__ps/__pz``), ``__prev_ts`` and the step's ``__reset`` flag;
    - ``exr`` — one row per (sample, bucket) at the series-min schema:
      ``cnt``, ``__aligned_prev`` (0 when the bucket was absent from the
      previous sample) and the same ``__reset``/``__prev_ts``.

    Counter-reset contract (Prometheus histogram counter semantics): a
    step resets iff ``count`` or ``zero_count`` drops OR ANY bucket's
    cumulative count drops; a reset step contributes the new sample
    verbatim (the counter restarted from empty).  Mixed schemas are first
    normalized to the series' coarsest schema (bucket i at schema s maps
    to ceil(i / 2^(s-s')) at coarser s' — the exact exponential-boundary
    merge), so map keys align before any subtraction.

    Everything is derived from ONE window pass over the sample frame —
    JOIN-FREE and bucket-window-free (r12 restructure): each sample row
    first normalizes its bucket maps to the series-min schema IN MAP
    SPACE (an expression — no explode/groupBy pass), then a single
    ``lag`` carries the PREVIOUS sample's normalized maps alongside the
    previous scalars, and every per-bucket fact the step math needs —
    aligned previous count, shrink, vanish — is an ``element_at`` lookup
    against the lagged map on the row itself.  The earlier shape needed
    a per-(series, bucket) window for alignment plus an exploded
    drop-set ``distinct`` joined back for the reset verdict; AQE's
    runtime exchange reuse deduplicated the *exchanges*, but the chain
    still executed ~12 sequential stages per grid query where this one
    runs ~5 (measured: grid_hist_rate over a materialized daily relation
    2.05 → ~1.1 s at sf0.1; the A/B that motivated it — checkpointing
    the drop set — moved nothing, proving the cost was stage count, not
    re-execution).  Self-joins would be worse still: the first
    join-based version audited at ~300 exchanges through grid_hist_rate
    (VERDICT r10 item 2)."""
    ws = Window.partitionBy("series_key").orderBy("ts")
    wall = Window.partitionBy("series_key")

    def norm_map(field: str) -> Column:
        """hist.pos/neg normalized to the series-min schema, as a map:
        positive-count entries only; bucket i at schema s maps to
        ceil(i / 2^(s-smin)) with colliding buckets summed (counts are
        integer-valued, so the in-expression sum order is exact).  The
        uniform-schema fast path (schema == smin, the common case) is
        the >0 filter alone."""
        m = F.map_filter(
            F.coalesce(F.col(f"hist.{field}"), _empty_buckets()),
            lambda _, v: v > 0,
        )
        down = _pow2((F.col("hist.schema") - F.col("__smin")).cast("double"))
        ent = F.map_entries(m)
        newk = lambda e: F.ceil(e["key"].cast("double") / down).cast("int")  # noqa: E731
        keys = F.array_distinct(F.transform(ent, newk))
        vals = F.transform(
            keys,
            lambda k: F.aggregate(
                ent, F.lit(0.0),
                lambda acc, e: acc + F.when(newk(e) == k, e["value"]
                                            ).otherwise(F.lit(0.0))),
        )
        return F.when(F.col("hist.schema") == F.col("__smin"), m).otherwise(
            F.map_from_arrays(keys, vals))

    base = (
        rel.select(
            "series_key",
            "labels",
            "ts",
            "hist",
            F.col("hist.count").alias("__c"),
            F.col("hist.sum").alias("__s"),
            F.col("hist.zero_count").alias("__z"),
            F.col("hist.zero_threshold").alias("__zt"),
            F.col("hist.schema").alias("__schema"),
        )
        .withColumn("__smin", F.min("__schema").over(wall))
        .withColumn("__npos", norm_map("pos"))
        .withColumn("__nneg", norm_map("neg"))
        .withColumn("__prev_ts", F.lag("ts").over(ws))
        .withColumn("__pc", F.lag("__c").over(ws))
        .withColumn("__ps", F.lag("__s").over(ws))
        .withColumn("__pz", F.lag("__z").over(ws))
        .withColumn("__ppos", F.lag("__npos").over(ws))
        .withColumn("__pneg", F.lag("__nneg").over(ws))
    )
    if detect_resets:
        # Prometheus DetectReset: a reset at a sample iff count or
        # zero_count drops OR any PREVIOUS-sample bucket shrank or
        # vanished — i.e. ∃ k ∈ prev map: cur[k] (0 when absent) < prev[k].
        # A pure expression against the lagged maps; no drop-set subtree.
        bucket_drop = lambda cur, prev: F.exists(  # noqa: E731
            F.map_entries(F.coalesce(F.col(prev), _empty_buckets())),
            lambda e: F.coalesce(F.element_at(F.col(cur), e["key"]),
                                 F.lit(0.0)) < e["value"],
        )
        reset = F.col("__prev_ts").isNotNull() & (
            (F.col("__c") < F.col("__pc"))
            | (F.col("__z") < F.col("__pz"))
            | bucket_drop("__npos", "__ppos")
            | bucket_drop("__nneg", "__pneg")
        )
    else:
        reset = F.lit(False)
    base = base.withColumn("__reset", reset)

    # -- per-step bucket DELTA MAPS on the sample row itself (r13): the
    #    map-space analogue of _step_bucket, so grid_hist_rate can run
    #    ONE aggregation (collect + expression-merge) instead of the
    #    exploded per-bucket groupBy + map regroup + join.  Counts are
    #    integer-valued doubles, so the subtraction and any later merge
    #    order are exact.  Consumers that only need the scalars
    #    (_hist_counter_math) never reference these columns and Catalyst
    #    prunes them with the rest of the map lag state.
    def step_map(sign: int) -> Column:
        cur = F.col("__npos") if sign == 1 else F.col("__nneg")
        prev = F.coalesce(F.col("__ppos") if sign == 1 else F.col("__pneg"),
                          _empty_buckets())
        if detect_resets:
            keys = F.map_keys(cur)  # counter mode: current buckets only
        else:
            keys = F.array_distinct(F.concat(F.map_keys(cur),
                                             F.map_keys(prev)))
        diff = F.map_from_arrays(
            keys,
            F.transform(
                keys,
                lambda k: F.coalesce(F.element_at(cur, k), F.lit(0.0))
                - F.coalesce(F.element_at(prev, k), F.lit(0.0))))
        return (
            F.when(F.col("__prev_ts").isNull(), _empty_buckets())
            .when(F.col("__reset"), cur)
            .otherwise(diff)
        )

    sc = (
        base.withColumn("__dpos", step_map(1))
        .withColumn("__dneg", step_map(-1))
        .drop("__npos", "__nneg", "__ppos", "__pneg")
    )

    # -- bucket step frame: ONE explode over the fused ± entry array, the
    #    aligned previous count read from the lagged map on the same row.
    #    Counter mode iterates CURRENT-sample buckets (a vanished bucket
    #    implies a reset, where each bucket contributes the new sample
    #    verbatim — absent buckets contribute nothing).  Gauge mode
    #    iterates cur ∪ prev keys so a vanished bucket still emits its
    #    explicit zero-count step (cnt 0, aligned_prev = its previous
    #    count) — without it the per-bucket deltas would stop telescoping
    #    to last-minus-first and the bucket sum would contradict count.
    carried = ["series_key", "ts", "__prev_ts", "__c", "__pc", "__z", "__pz",
               "__reset"]

    def sided(sign: int) -> Column:
        cur = F.col("__npos") if sign == 1 else F.col("__nneg")
        prev = F.coalesce(F.col("__ppos") if sign == 1 else F.col("__pneg"),
                          _empty_buckets())
        if detect_resets:
            keys = F.map_keys(cur)
        else:
            keys = F.array_distinct(F.concat(F.map_keys(cur),
                                             F.map_keys(prev)))
        return F.transform(
            keys,
            lambda k: F.struct(
                F.lit(sign).cast("int").alias("sign"),
                k.cast("int").alias("idx"),
                F.coalesce(F.element_at(cur, k), F.lit(0.0)).alias("cnt"),
                F.when(
                    F.col("__prev_ts").isNotNull(),
                    F.coalesce(F.element_at(prev, k), F.lit(0.0)),
                ).otherwise(F.lit(0.0)).alias("ap"),
            ),
        )

    exr = (
        base.select(
            *carried,
            F.col("__schema").alias("schema"),
            F.explode(F.concat(sided(1), sided(-1))).alias("__b"),
        )
        .select(*carried, "schema",
                F.col("__b.sign").alias("sign"),
                F.col("__b.idx").alias("idx"),
                F.col("__b.cnt").alias("cnt"),
                F.col("__b.ap").alias("__aligned_prev"))
    )
    return sc, exr


def _step_scalar(cur: Column, prev: Column) -> Column:
    """Per-step contribution of one scalar component (0 on the baseline
    sample, the new value verbatim on a reset)."""
    return (
        F.when(F.col("__prev_ts").isNull(), F.lit(0.0))
        .when(F.col("__reset"), cur)
        .otherwise(cur - prev)
    )


def _step_bucket() -> Column:
    """Per-step contribution of one bucket (same contract as
    :func:`_step_scalar`, over the exploded bucket step frame)."""
    return (
        F.when(F.col("__prev_ts").isNull(), F.lit(0.0))
        .when(F.col("__reset"), F.col("cnt"))
        .otherwise(F.col("cnt") - F.col("__aligned_prev"))
    )


def _hist_counter_math(rel: DataFrame, start: int, end: int,
                       detect_resets: bool) -> DataFrame:
    """Whole-range counter math for :func:`hist_increase`
    (detect_resets=True) and :func:`hist_delta` (False): per-series
    element-wise sum of the per-step differences of :func:`_step_frames`
    over [start, end] — per-component hash sums, ~3 shuffles total."""
    rel = _ensure_series_key(rel).filter(F.col("ts").between(start, end))
    sc, exr = _step_frames(rel, detect_resets)
    step = _step_scalar

    agg_scalars = sc.groupBy("series_key").agg(
        F.any_value("labels").alias("labels"),
        F.sum(step(F.col("__c"), F.col("__pc"))).alias("count"),
        F.sum(step(F.col("__s"), F.col("__ps"))).alias("sum"),
        F.sum(step(F.col("__z"), F.col("__pz"))).alias("zero_count"),
        F.max("__zt").alias("zero_threshold"),
        F.min("__schema").alias("schema"),
        (F.max("ts") - F.min("ts")).alias("__span"),
        F.count(F.lit(1)).alias("__n"),
    )
    binc = _step_bucket()
    per_bucket = (
        exr.groupBy("series_key", "sign", "idx")
        .agg(F.sum(binc).alias("__v"))
        .filter(F.col("__v") != 0)
    )
    pos_agg, neg_agg = _bucket_map_aggs("sign", "idx", "__v")
    maps = per_bucket.groupBy("series_key").agg(
        pos_agg.alias("__pos"), neg_agg.alias("__neg"))
    joined = agg_scalars.join(maps, "series_key", "left").filter(F.col("__n") >= 2)
    hist = _hist_struct(F.col("count"), F.col("sum"), F.col("zero_count"),
                        F.col("zero_threshold"), F.col("schema"),
                        F.col("__pos"), F.col("__neg"), coalesce_maps=True)
    return joined.select(
        "series_key", "labels", hist.alias("hist"), "__span"
    ).withColumn("ts", F.lit(int(end)).cast("long"))


def hist_increase(rel: DataFrame, start: int, end: int) -> DataFrame:
    """``increase(h[range])`` over native-histogram counters: element-wise
    sum of per-step increases with histogram-level reset handling (see
    :func:`_hist_counter_math`).  No extrapolation — consistent with this
    engine's scalar ``promql.increase`` contract.  Output rows are
    stamped ``ts = end`` (the evaluation time), so the result composes
    directly with :func:`hist_quantile` / :func:`hist_fraction`."""
    return _hist_counter_math(rel, start, end, True).select(
        "series_key", "labels", "ts", "hist"
    )


def hist_rate(rel: DataFrame, start: int, end: int) -> DataFrame:
    """``rate(h[range])``: :func:`hist_increase` divided element-wise by
    the observed span — one map_from... transform_values, still a
    histogram-valued vector (feed to :func:`hist_quantile` for the
    canonical ``histogram_quantile(q, rate(h[5m]))``)."""
    out = _hist_counter_math(rel, start, end, True).filter(F.col("__span") > 0)
    span = F.col("__span").cast("double")
    scale = lambda c: c / span  # noqa: E731
    hist = F.struct(
        scale(F.col("hist.count")).alias("count"),
        scale(F.col("hist.sum")).alias("sum"),
        scale(F.col("hist.zero_count")).alias("zero_count"),
        F.col("hist.zero_threshold").alias("zero_threshold"),
        F.col("hist.schema").alias("schema"),
        F.transform_values("hist.pos", lambda _, v: v / span).alias("pos"),
        F.transform_values("hist.neg", lambda _, v: v / span).alias("neg"),
    )
    return out.select("series_key", "labels", "ts", hist.alias("hist"))


def hist_delta(rel: DataFrame, start: int, end: int) -> DataFrame:
    """``delta(h[range])`` for GAUGE histograms: last − first element-wise
    (per-step differences telescope; no reset detection).  ``ts = end``,
    as :func:`hist_increase`."""
    return _hist_counter_math(rel, start, end, False).select(
        "series_key", "labels", "ts", "hist"
    )


# --------------------------------------------------------------------------
# cross-series aggregation
# --------------------------------------------------------------------------

def hist_sum_by(rel: DataFrame, by: list[str] | None,
                group_ts: bool = True, mean: bool = False,
                extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """``sum by (labels) (h)`` over histogram vectors: element-wise
    histogram addition per group (and per ts when ``group_ts``).  Mixed
    schemas downscale to the group's coarsest before the bucket merge
    (same exponential-boundary mapping as counter math); the zero
    threshold widens to the group max.  Two hash aggregates over exploded
    buckets — never a pairwise merge loop.

    ``by=None`` keeps the FULL label set as the group — the partial-merge
    form (see :func:`hist_merge_partials`).  ``mean=True`` divides every
    component by the group's series count — PromQL's ``avg`` over
    histogram vectors (sum / n, element-wise).  ``extra_keys`` are extra
    group columns already on ``rel`` (carried into the output) — the grid
    evaluator groups per eval point with them."""
    rel = _ensure_series_key(rel)
    if by is None:
        glabels = F.col("labels")
    else:
        glabels = F.map_from_entries(
            F.filter(
                F.map_entries(F.col("labels")),
                lambda e: e.key.isin(*[F.lit(b) for b in by]) if by else F.lit(False),
            )
        )
    from ..model import canonical_labels_json

    rel = rel.withColumn("__glabels", glabels).withColumn(
        "__gk", canonical_labels_json(F.col("__glabels"))
    )
    keys = ["__gk", *extra_keys] + (["ts"] if group_ts else [])
    scalars = rel.select(
        *keys,
        F.col("__glabels").alias("labels"),
        F.col("hist.count").alias("__c"),
        F.col("hist.sum").alias("__s"),
        F.col("hist.zero_count").alias("__z"),
        F.col("hist.zero_threshold").alias("__zt"),
        F.col("hist.schema").alias("__schema"),
    )
    agg_scalars = scalars.groupBy(*keys).agg(
        F.any_value("labels").alias("labels"),
        F.sum("__c").alias("count"),
        F.sum("__s").alias("sum"),
        F.sum("__z").alias("zero_count"),
        F.max("__zt").alias("zero_threshold"),
        F.min("__schema").alias("schema"),
        F.count(F.lit(1)).cast("double").alias("__n"),
    )
    # group stats ride out of agg_scalars (schema=min, zero_threshold=max
    # already) — a separate scalars pass would re-reference the input plan
    gstats = agg_scalars.select(
        *keys, F.col("schema").alias("__smin"),
        F.col("zero_threshold").alias("__gzt"))
    ex = buckets_long(rel, "__gk", *extra_keys).filter(F.col("sign") != 0)
    ex = ex.join(gstats, keys)
    down = _pow2((F.col("schema") - F.col("__smin")).cast("double"))
    ex = ex.withColumn(
        "idx", F.ceil(F.col("idx").cast("double") / down).cast("int"))
    # Zero-threshold reconciliation (Prometheus histogram add): when series
    # with different zero thresholds merge, buckets that fall inside the
    # widened (group-max) threshold fold into the zero bucket; a populated
    # bucket STRADDLING the threshold widens it to that bucket's upper
    # boundary so the zero bucket always ends on a bucket boundary.  All
    # buckets are grid-aligned at the group schema by this point, so one
    # widening pass converges (the widened threshold is itself a boundary,
    # which no aligned bucket can straddle).  Without this, small-value
    # buckets would overlap the zero bucket and quantile walks would order
    # them AFTER it, skewing low quantiles.
    upper = _bound(F.col("idx"), F.col("__smin"))
    lower = _bound(F.col("idx") - 1, F.col("__smin"))
    wgrp = Window.partitionBy(*keys)
    ex = ex.withColumn(
        "__wzt",
        F.greatest(
            F.col("__gzt"),
            F.coalesce(
                F.max(F.when(lower < F.col("__gzt"), upper)).over(wgrp),
                F.col("__gzt"),
            ),
        ),
    )
    ex = ex.withColumn("__folded", upper <= F.col("__wzt"))
    folded = F.col("__folded")
    per_bucket = (
        ex.filter(~folded)
        .groupBy(*keys, "sign", "idx")
        .agg(F.sum("cnt").alias("__v"))
    )
    zfix = ex.groupBy(*keys).agg(
        F.max("__wzt").alias("__wzt"),
        F.sum(F.when(folded, F.col("cnt"))).alias("__zfold"),
    )
    pos_agg, neg_agg = _bucket_map_aggs("sign", "idx", "__v")
    maps = per_bucket.groupBy(*keys).agg(
        pos_agg.alias("__pos"), neg_agg.alias("__neg"))
    joined = (
        agg_scalars.join(maps, keys, "left").join(zfix, keys, "left")
    )
    div = F.col("__n") if mean else F.lit(1.0)
    hist = _hist_struct(
        F.col("count") / div,
        F.col("sum") / div,
        (F.col("zero_count") + F.coalesce(F.col("__zfold"), F.lit(0.0))) / div,
        F.coalesce(F.col("__wzt"), F.col("zero_threshold")),
        F.col("schema"),
        F.transform_values(F.coalesce(F.col("__pos"), _empty_buckets()),
                           lambda _, v: v / div),
        F.transform_values(F.coalesce(F.col("__neg"), _empty_buckets()),
                           lambda _, v: v / div),
    )
    out_cols = (["labels", *extra_keys] + (["ts"] if group_ts else [])
                + [hist.alias("hist")])
    return joined.select(*out_cols).withColumn(
        "series_key", series_key(F.col("labels"))
    )


#: over-time aggregates defined for native-histogram windows (Prometheus:
#: avg/sum produce a histogram, count/present floats, last the newest
#: histogram; min/max/stddev/quantile skip histogram samples and stay
#: undefined here).
HIST_OVER_TIME = ("avg", "sum", "count", "last", "present")


def hist_over_time(rel: DataFrame, start: int, end: int,
                   mode: str) -> DataFrame:
    """``<mode>_over_time`` over a native-histogram window ``[start, end]``
    (VERDICT r10 item 6 — histogram-valued subqueries under over-time
    aggregates).  ``avg``/``sum`` are element-wise per series (mixed
    schemas downscale, zero thresholds widen — :func:`hist_sum_by`'s
    contract, reused verbatim with ``by=None``); ``count`` is the float
    sample count; ``last`` the newest histogram sample.  Output stamped
    ``ts = end``."""
    if mode not in HIST_OVER_TIME:
        raise ValueError(f"hist_over_time mode {mode!r}")
    rel = _ensure_series_key(rel).filter(F.col("ts").between(start, end))
    if mode in ("count", "present"):
        val = (F.lit(1.0) if mode == "present"
               else F.count(F.lit(1)).cast("double"))
        return (
            rel.groupBy("series_key")
            .agg(F.any_value("labels").alias("labels"), val.alias("value"))
            .withColumn("ts", F.lit(int(end)).cast("long"))
            .select("series_key", "labels", "ts", "value")
        )
    if mode == "last":
        return (
            rel.groupBy("series_key")
            .agg(F.any_value("labels").alias("labels"),
                 F.max_by("hist", F.col("ts")).alias("hist"))
            .withColumn("ts", F.lit(int(end)).cast("long"))
            .select("series_key", "labels", "ts", "hist")
        )
    out = hist_sum_by(rel, by=None, group_ts=False, mean=(mode == "avg"))
    return out.withColumn("ts", F.lit(int(end)).cast("long")).select(
        "series_key", "labels", "ts", "hist")


def grid_hist_over_time(rel: DataFrame, start: int, end: int, window: int,
                        step: int, mode: str) -> DataFrame:
    """``<mode>_over_time(h[window])`` at every grid eval point over
    histogram samples/pseudo-samples — the range-mode companion of
    :func:`hist_over_time`.  Samples explode to their covering eval
    points (``promql._grid_points``, fan-out capped like every grid
    lowering), then ONE aggregation per (series, t): the
    :func:`hist_sum_by` component merge keyed additionally by the eval
    point for avg/sum, a plain hash aggregate for count/last."""
    from .promql import _check_fanout, _grid_points

    if mode not in HIST_OVER_TIME:
        raise ValueError(f"grid_hist_over_time mode {mode!r}")
    _check_fanout(window - 1, step, f"grid_hist_over_time({mode})")
    rel = _ensure_series_key(rel).filter(
        F.col("ts").between(start - window + 1, end))
    covered = rel.withColumn("__t", _grid_points(window - 1, start, end, step))
    if mode in ("count", "present"):
        val = (F.lit(1.0) if mode == "present"
               else F.count(F.lit(1)).cast("double"))
        return (
            covered.groupBy("series_key", "__t")
            .agg(F.any_value("labels").alias("labels"), val.alias("value"))
            .select("series_key", "labels", F.col("__t").alias("ts"), "value")
        )
    if mode == "last":
        return (
            covered.groupBy("series_key", "__t")
            .agg(F.any_value("labels").alias("labels"),
                 F.max_by("hist", F.col("ts")).alias("hist"))
            .select("series_key", "labels", F.col("__t").alias("ts"), "hist")
        )
    out = hist_sum_by(covered, by=None, group_ts=False,
                      mean=(mode == "avg"), extra_keys=("__t",))
    return out.select("series_key", "labels", F.col("__t").alias("ts"),
                      "hist")


# --------------------------------------------------------------------------
# range-query grid evaluation (the dashboard surface)
# --------------------------------------------------------------------------

def grid_hist_instant(rel: DataFrame, start: int, end: int, step: int,
                      lookback: int = 300) -> DataFrame:
    """Instant HISTOGRAM vector at every eval point t = start + k·step:
    the newest sample per series within the lookback window of each t —
    the native analogue of ``promql.grid_instant`` (same explode-to-
    covering-points + one hash agg; fan-out capped identically)."""
    from .promql import _check_fanout, _grid_points

    _check_fanout(lookback, step, "grid_hist_instant")
    rel = _ensure_series_key(rel).filter(
        F.col("ts").between(start - lookback, end))
    covered = rel.withColumn("__t", _grid_points(lookback, start, end, step))
    return (
        covered.groupBy("series_key", "__t")
        .agg(
            F.any_value("labels").alias("labels"),
            F.max_by(F.col("hist"), F.col("ts")).alias("hist"),
        )
        .select("series_key", "labels", F.col("__t").alias("ts"), "hist")
    )


def _step_points(start: int, end: int, step: int, window: int):
    """Covering eval points of a STEP (prev_ts → ts): the t = start + k·step
    with ts ≤ t AND prev_ts ≥ t − window + 1 — i.e. both step endpoints
    inside (t − window, t].  Column-reach variant of
    ``promql._grid_points`` (the upper bound depends on prev_ts)."""
    k_lo = F.greatest(
        F.ceil((F.col("ts") - F.lit(start)) / F.lit(step)).cast("long"),
        F.lit(0).cast("long"),
    )
    k_hi = F.least(
        F.floor(
            (F.col("__prev_ts") + F.lit(window - 1) - F.lit(start)) / F.lit(step)
        ).cast("long"),
        F.lit((end - start) // step).cast("long"),
    )
    seq = F.when(
        k_lo <= k_hi,
        F.transform(F.sequence(k_lo, k_hi),
                    lambda k: (F.lit(start) + k * step).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    return F.explode(seq)


def grid_hist_rate(rel: DataFrame, start: int, end: int, window: int,
                   step: int, mode: str = "rate") -> DataFrame:
    """rate / increase / delta over ``h[window]`` at every grid eval point,
    HISTOGRAM-valued — the distributed lowering behind range-mode
    ``histogram_quantile(q, rate(h[5m]))`` dashboards.

    Design mirrors ``promql.grid_rate``: the per-step difference frames
    (:func:`_step_frames`) are computed ONCE per series — never per eval
    point — then each step explodes to the eval points whose window
    contains BOTH its endpoints (per-(series, t) recomputation would give
    identical steps, since restricting to a window only truncates the
    sample sequence's ends).  A window's first sample is its baseline;
    per-(series, t) span/sample-count derive from the contributing steps
    themselves (consecutive steps chain: span = max ts − min prev_ts), so
    no second sample-level explode is needed.  Fan-out is capped by
    ``promql.GRID_FANOUT_CAP`` exactly like the scalar grid."""
    from .promql import _check_fanout

    if mode not in ("rate", "increase", "delta"):
        raise ValueError(f"grid_hist_rate mode {mode!r}")
    _check_fanout(window - 1, step, f"grid_hist_rate({mode})")
    rel = _ensure_series_key(rel).filter(
        F.col("ts").between(start - window + 1, end))
    sc, _ = _step_frames(rel, mode != "delta")
    pts = _step_points(start, end, step, window)
    scg = sc.filter(F.col("__prev_ts").isNotNull()).withColumn("__t", pts)
    # ONE aggregation for scalars AND bucket maps (r13, guide §2.4): the
    # per-step delta maps from _step_frames are collected per (series, t)
    # and merged in expression space — map_zip_with union-sum, zero
    # totals dropped, entries re-sorted to _bucket_map_aggs' key order.
    # Replaces the exploded per-bucket groupBy + map regroup + join
    # (3 exchanges → 1 on this branch); exact because bucket counts are
    # integer-valued doubles (sum order immaterial).
    agg = scg.groupBy("series_key", "__t").agg(
        F.any_value("labels").alias("labels"),
        F.sum(_step_scalar(F.col("__c"), F.col("__pc"))).alias("count"),
        F.sum(_step_scalar(F.col("__s"), F.col("__ps"))).alias("sum"),
        F.sum(_step_scalar(F.col("__z"), F.col("__pz"))).alias("zero_count"),
        F.max("__zt").alias("zero_threshold"),
        F.min("__smin").alias("schema"),
        (F.max("ts") - F.min("__prev_ts")).alias("__span"),
        F.collect_list("__dpos").alias("__lp"),
        F.collect_list("__dneg").alias("__ln"),
    )

    def merged(col: str) -> Column:
        total = F.aggregate(
            F.col(col), _empty_buckets(),
            lambda acc, m: F.map_zip_with(
                acc, m,
                lambda _, a, b: (F.coalesce(a, F.lit(0.0))
                                 + F.coalesce(b, F.lit(0.0)))))
        return F.map_from_entries(F.array_sort(F.map_entries(
            F.map_filter(total, lambda _, v: v != 0))))

    joined = (
        agg.withColumn("__pos", merged("__lp"))
        .withColumn("__neg", merged("__ln"))
        .drop("__lp", "__ln")
    )
    if mode == "rate":
        joined = joined.filter(F.col("__span") > 0)
        span = F.col("__span").cast("double")
    else:
        span = F.lit(1.0)
    hist = _hist_struct(
        F.col("count") / span,
        F.col("sum") / span,
        F.col("zero_count") / span,
        F.col("zero_threshold"),
        F.col("schema"),
        F.transform_values(F.col("__pos"), lambda _, v: v / span),
        F.transform_values(F.col("__neg"), lambda _, v: v / span),
    )
    return joined.select(
        "series_key", "labels", F.col("__t").alias("ts"), hist.alias("hist")
    )


# --------------------------------------------------------------------------
# exposition wire format: spans + delta-encoded counts <-> sparse maps
# --------------------------------------------------------------------------

def _span_indices(spans: Column) -> Column:
    """Absolute bucket indices encoded by a prompb/exposition span list:
    one fold over ``(offset, length)`` runs — ``offset`` = indices skipped
    from the end of the previous span (absolute start for the first)."""
    return F.aggregate(
        spans,
        F.struct(
            F.lit(0).alias("next"),
            F.array().cast("array<int>").alias("idxs"),
        ),
        lambda acc, s: F.struct(
            (acc["next"] + s["offset"] + s["length"]).cast("int").alias("next"),
            F.concat(
                acc["idxs"],
                # zero-length spans are legal pure gap markers in the
                # exposition protobuf; F.sequence(start, start-1) would
                # produce a DESCENDING 2-element array and desync the
                # index/delta arrays (same guard as histograms_from_otlp)
                F.when(
                    s["length"] > 0,
                    F.sequence(
                        (acc["next"] + s["offset"]).cast("int"),
                        (acc["next"] + s["offset"] + s["length"] - 1).cast("int"),
                    ),
                ).otherwise(F.array().cast("array<int>")),
            ).alias("idxs"),
        ),
        lambda acc: acc["idxs"],
    )


def spans_to_buckets(spans: Column, deltas: Column) -> Column:
    """Decode the Prometheus protobuf exposition encoding of one bucket
    side into the engine's sparse ``MAP<INT,DOUBLE>``.

    Wire form (io.prometheus.client.Histogram): ``spans`` is an array of
    ``(offset, length)`` runs and ``deltas`` delta-encodes the bucket
    counts across all spans (first entry absolute).  Both decodes are
    single ``aggregate`` folds over arrays whose length is the
    histogram's bucket count (schema-bounded), entirely JVM-side — the
    scrape-ingest path never touches Python."""
    idxs = _span_indices(spans)
    counts = F.aggregate(
        deltas,
        F.array().cast("array<double>"),
        lambda acc, d: F.concat(
            acc,
            F.array(F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0.0))
                    + d.cast("double")),
        ),
    )
    return F.map_from_arrays(idxs, counts)


def buckets_to_spans(bmap: Column) -> Column:
    """Inverse of :func:`spans_to_buckets`: encode a sparse bucket map as
    ``struct(spans array<struct<offset int, length int>>, deltas
    array<long>)`` — the exposition writer.  One fold over the
    index-sorted entries; a new span opens whenever the index gap
    exceeds 1."""
    entries = F.array_sort(F.map_entries(bmap))
    folded = F.aggregate(
        entries,
        F.struct(
            F.array().cast(
                "array<struct<offset:int,length:int>>").alias("spans"),
            F.array().cast("array<bigint>").alias("deltas"),
            F.lit(None).cast("int").alias("prev_idx"),
            F.lit(0.0).alias("prev_cnt"),
        ),
        lambda acc, e: F.struct(
            F.when(
                acc["prev_idx"].isNull(),
                F.array(F.struct(e["key"].alias("offset"),
                                 F.lit(1).cast("int").alias("length"))),
            ).when(
                e["key"] - acc["prev_idx"] == 1,
                F.concat(
                    F.slice(acc["spans"], 1, F.size(acc["spans"]) - 1),
                    F.array(F.struct(
                        F.element_at(acc["spans"], -1)["offset"].alias("offset"),
                        (F.element_at(acc["spans"], -1)["length"] + 1)
                        .cast("int").alias("length"),
                    )),
                ),
            ).otherwise(
                F.concat(
                    acc["spans"],
                    F.array(F.struct(
                        (e["key"] - acc["prev_idx"] - 1).cast("int")
                        .alias("offset"),
                        F.lit(1).cast("int").alias("length"),
                    )),
                ),
            ).alias("spans"),
            F.concat(
                acc["deltas"],
                F.array((e["value"] - acc["prev_cnt"]).cast("bigint")),
            ).alias("deltas"),
            e["key"].cast("int").alias("prev_idx"),
            e["value"].alias("prev_cnt"),
        ),
        lambda acc: F.struct(acc["spans"].alias("spans"),
                             acc["deltas"].alias("deltas")),
    )
    return folded


def histograms_from_exposition(df: DataFrame,
                               segment_duration: int | None = None) -> DataFrame:
    """Scrape-ingest decoder: rows shaped like the protobuf exposition
    message — ``(metric, labels, ts, count, sum, zero_count,
    zero_threshold, schema, pos_spans, pos_deltas, neg_spans,
    neg_deltas)`` with spans as ``array<struct<offset int, length int>>``
    and deltas as ``array<bigint>`` — into the engine's
    ``HIST_ROW_SCHEMA`` (metric, labels, ts, hist), ready for
    ``TSDB.insert_histograms``.  Pure column decode (two aggregate folds
    per side), no shuffle of its own."""
    hist = F.struct(
        F.col("count").cast("double").alias("count"),
        F.col("sum").cast("double").alias("sum"),
        F.col("zero_count").cast("double").alias("zero_count"),
        F.col("zero_threshold").cast("double").alias("zero_threshold"),
        F.col("schema").cast("int").alias("schema"),
        spans_to_buckets(F.col("pos_spans"), F.col("pos_deltas")).alias("pos"),
        spans_to_buckets(F.col("neg_spans"), F.col("neg_deltas")).alias("neg"),
    )
    return df.select("metric", "labels", "ts", hist.alias("hist"))


def hist_merge_partials(rel: DataFrame) -> DataFrame:
    """Merge PARTIAL histogram samples sharing (series, ts) into one —
    histogram addition is associative and commutative, so a store may
    hold per-micro-batch partials (the streaming ingest shape:
    ``StreamingIngestor(nh_dest=…)`` appends one partial per batch per
    open window) and this read-side merge reconstructs the exact
    full-window histogram regardless of how ingestion split it.  The
    ingest sink stamps each partial with the reserved :data:`BATCH_LABEL`
    (its replay-idempotency key) — stripped here before grouping so
    partials from different batches land in the same series."""
    rel = rel.withColumn(
        "labels",
        F.map_filter(F.col("labels"), lambda k, _: k != F.lit(BATCH_LABEL)))
    return hist_sum_by(rel, None, group_ts=True)


def materialize_hist_rollup(spark, rel: DataFrame, dest: str,
                            step: int = 21600,
                            segment_duration: int | None = None,
                            incremental: bool = False,
                            since_seg: int | None = None) -> None:
    """Downsampled NATIVE-HISTOGRAM tier: merge window samples/partials
    into ``step``-aligned histograms and write them seg-partitioned at
    ``dest``.  Unlike float downsampling (which picks an aggregate and
    loses the distribution), histogram bucket merge is EXACT — every
    quantile/fraction over the rollup equals the raw answer for
    step-aligned ranges, so raw windows the tier covers are purgeable
    without losing percentile history (the continuous-aggregate ladder,
    applied to distributions).

    Same watermark protocol as the other rollups
    (operators/histogram.materialize): ``incremental=True`` refreshes
    only partitions at/after the high-watermark via dynamic partition
    overwrite; a ``step`` wider than a segment re-aligns the watermark to
    the containing window's start so straddling windows refresh whole.
    ``since_seg`` overrides (late backfill)."""
    from ..model import DEFAULT_SEGMENT_DURATION, seg_bucket

    segment_duration = segment_duration or DEFAULT_SEGMENT_DURATION
    use_dynamic = False
    if incremental or since_seg is not None:
        w = since_seg
        if w is None:
            from pathlib import Path as _Path

            if _Path(dest).exists():
                w = spark.read.parquet(dest).agg(F.max("seg")).first()[0]
        if w is not None:
            # re-align to the window containing the watermark segment's
            # start: a step > segment_duration window straddles segments
            w = (w * segment_duration // step) * step // segment_duration
            rel = rel.filter(F.col("seg") >= w)
            use_dynamic = True
    stamped = rel.withColumn(
        "ts", (F.floor(F.col("ts") / step) * step).cast("long"))
    rolled = hist_merge_partials(stamped).withColumn(
        "seg", seg_bucket(F.col("ts"), segment_duration))
    (
        rolled.select("labels", "ts", "hist", "series_key", "seg")
        .repartition(F.col("seg"))
        .sortWithinPartitions("series_key", "ts")
        .write.option("compression", "zstd")
        .option("partitionOverwriteMode", "dynamic" if use_dynamic else "static")
        .partitionBy("seg").mode("overwrite").parquet(dest)
    )


# --------------------------------------------------------------------------
# histogram arithmetic (PromQL binary operators over histogram vectors)
# --------------------------------------------------------------------------

def hist_scale(rel: DataFrame, factor: float) -> DataFrame:
    """``h * scalar`` / ``h / scalar``: every component scales (counts and
    sum alike — PromQL histogram-by-scalar multiplication).  Pure
    projection, no shuffle."""
    f = F.lit(float(factor))
    hist = F.struct(
        (F.col("hist.count") * f).alias("count"),
        (F.col("hist.sum") * f).alias("sum"),
        (F.col("hist.zero_count") * f).alias("zero_count"),
        F.col("hist.zero_threshold").alias("zero_threshold"),
        F.col("hist.schema").alias("schema"),
        F.transform_values("hist.pos", lambda _, v: v * f).alias("pos"),
        F.transform_values("hist.neg", lambda _, v: v * f).alias("neg"),
    )
    keep = [c for c in rel.columns if c != "hist"]
    return rel.select(*keep, hist.alias("hist"))


def hist_add(lhs: DataFrame, rhs: DataFrame, subtract: bool = False,
             drop_name: bool = True) -> DataFrame:
    """``h1 + h2`` / ``h1 - h2`` with PromQL one-to-one vector matching:
    series match on their full label sets (metric name dropped first, as
    arithmetic binops do) per timestamp; unmatched series drop (inner
    semantics).  Lowered as: semi-join each side onto the matched key
    set, negate the right side for subtraction, then one element-wise
    bucket merge (:func:`hist_merge_partials`) — mixed schemas and zero
    thresholds reconcile exactly like every other merge."""
    from ..model import canonical_labels_json

    def prep(df: DataFrame) -> DataFrame:
        labels = F.col("labels")
        if drop_name:
            from ..model import METRIC_NAME_LABEL

            labels = F.map_filter(labels,
                                  lambda k, _: k != F.lit(METRIC_NAME_LABEL))
        return df.select(labels.alias("labels"), "ts", "hist").withColumn(
            "__mk", canonical_labels_json(F.col("labels")))

    left, right = prep(lhs), prep(rhs)
    keys = right.select("__mk", "ts").distinct()
    lm = left.join(keys, ["__mk", "ts"], "left_semi")
    rm = right.join(left.select("__mk", "ts").distinct(),
                    ["__mk", "ts"], "left_semi")
    if subtract:
        rm = hist_scale(rm, -1.0)
    merged = hist_merge_partials(lm.unionByName(rm).drop("__mk"))
    return merged


# --------------------------------------------------------------------------
# distribution drift + OTLP interop
# --------------------------------------------------------------------------

def hist_tv_distance(lhs: DataFrame, rhs: DataFrame) -> DataFrame:
    """Total-variation distance between two histogram vectors, per series:
    ``TV = 0.5 · Σ_i |p_i − q_i|`` over bucket PROBABILITIES (counts /
    h.count, zero bucket included) — the distribution-drift signal for
    monitoring pipelines ("did this series' latency shape change?"),
    bounded in [0, 1] and exactly computable from the sparse buckets.

    Series match one-to-one on their full label sets.  Mixed schemas
    downscale pairwise to the coarser side before differencing (the same
    exponential boundary merge as everywhere else).  Lowered as one
    union + two hash aggregates in exploded space: signed probability
    contributions per (series, sign, idx) sum to p_i − q_i, then
    ``0.5 · Σ|·|`` per series — no join of bucket rows at all."""
    from ..model import canonical_labels_json

    def prep(df: DataFrame, side: float) -> DataFrame:
        # NEWEST sample per series: the operator contract is one
        # distribution per series per side — without this reduction, a
        # multi-timestamp input would fan the total join out and mix
        # probabilities across time.
        df = (
            df.select("labels", "ts", "hist")
            .withColumn("__mk", canonical_labels_json(F.col("labels")))
            .groupBy("__mk")
            .agg(F.any_value("labels").alias("labels"),
                 F.max("ts").alias("ts"),
                 F.max_by("hist", "ts").alias("hist"))
        )
        ex = buckets_long(df.withColumn("series_key", F.lit(0)), "__mk", "labels")
        total = df.select("__mk", F.col("hist.count").alias("__total"))
        return ex.join(total, "__mk").select(
            "__mk",
            "labels",
            "schema",
            "sign",
            "idx",
            (F.col("cnt") / F.col("__total") * F.lit(side)).alias("__p"),
        )

    both = prep(lhs, 1.0).unionByName(prep(rhs, -1.0))
    wk = Window.partitionBy("__mk")
    both = both.withColumn("__smin", F.min("schema").over(wk))
    down = _pow2((F.col("schema") - F.col("__smin")).cast("double"))
    aligned = both.withColumn(
        "idx",
        F.when(F.col("sign") == 0, F.lit(0)).otherwise(
            F.ceil(F.col("idx").cast("double") / down).cast("int")),
    )
    per_bucket = aligned.groupBy("__mk", "sign", "idx").agg(
        F.any_value("labels").alias("labels"),
        F.sum("__p").alias("__d"),
        # bucket rows carry their side in __p's sign (cnt > 0 upstream)
        F.max(F.when(F.col("__p") > 0, 1).otherwise(0)).alias("__has_l"),
        F.max(F.when(F.col("__p") < 0, 1).otherwise(0)).alias("__has_r"),
    )
    out = per_bucket.groupBy("__mk").agg(
        F.any_value("labels").alias("labels"),
        (F.lit(0.5) * F.sum(F.abs(F.col("__d")))).alias("value"),
        F.max("__has_l").alias("__l"),
        F.max("__has_r").alias("__r"),
    )
    # inner matching: a series must appear on BOTH sides (even with fully
    # disjoint buckets, where TV = 1)
    return out.filter((F.col("__l") == 1) & (F.col("__r") == 1)).select(
        "labels", "value")


def histograms_from_otlp(df: DataFrame) -> DataFrame:
    """OpenTelemetry ExponentialHistogram decoder: rows shaped like the
    OTLP data point — ``(metric, labels, ts, count, sum, zero_count,
    zero_threshold, scale, pos_offset, pos_counts, neg_offset,
    neg_counts)`` with counts as DENSE ``array<bigint>`` from the offset
    — into ``HIST_ROW_SCHEMA``.  OTel and Prometheus share the base
    ``2^(2^-scale)`` but index one apart: OTel bucket index i covers
    ``(base^i, base^(i+1)]`` while this engine's idx covers
    ``(base^(idx-1), base^idx]``, so the j-th array element (index
    ``offset + j - 1``) lands at ``idx = offset + j``.  Pure column
    transform, zero-count buckets dropped to keep the maps sparse."""

    def side(offset: str, counts: str) -> Column:
        dense = F.map_from_arrays(
            F.transform(
                # sequence(1, 0) would DESCEND; guard the empty side
                F.when(F.size(F.col(counts)) > 0,
                       F.sequence(F.lit(1), F.size(F.col(counts))))
                .otherwise(F.array().cast("array<int>")),
                lambda j: (F.col(offset) + j).cast("int"),
            ),
            F.transform(F.col(counts), lambda c: c.cast("double")),
        )
        return F.map_filter(dense, lambda _, v: v > 0)

    hist = F.struct(
        F.col("count").cast("double").alias("count"),
        F.col("sum").cast("double").alias("sum"),
        F.col("zero_count").cast("double").alias("zero_count"),
        F.col("zero_threshold").cast("double").alias("zero_threshold"),
        F.col("scale").cast("int").alias("schema"),
        side("pos_offset", "pos_counts").alias("pos"),
        side("neg_offset", "neg_counts").alias("neg"),
    )
    return df.select("metric", "labels", "ts", hist.alias("hist"))


# --------------------------------------------------------------------------
# Prometheus remote-write (prompb) shaper — the scrape-loop ingress
# --------------------------------------------------------------------------

def histograms_from_remote_write(df: DataFrame) -> DataFrame:
    """prompb remote-write NATIVE-HISTOGRAM decoder: one input row per
    ``TimeSeries`` (``sources.loaders.REMOTE_WRITE_TIMESERIES_SCHEMA`` —
    labels as ``array<struct<name,value>>`` INCLUDING ``__name__``,
    ``histograms`` as the types.proto ``Histogram`` message fields) into
    ``HIST_ROW_SCHEMA`` rows ready for ``TSDB.insert_histograms``.

    Wire semantics (prometheus/prompb/types.proto, public): INTEGER
    histograms carry delta-encoded bucket counts (``positive_deltas`` /
    ``negative_deltas``, first absolute) while FLOAT histograms carry
    absolute counts (``positive_counts``/``negative_counts``) — exactly
    one form is populated per message, both over the same span layout as
    the exposition codec.  ``count``/``zero_count`` are the matching
    ``count_int``-or-``count_float`` oneof.  Timestamps are milliseconds
    → floored to the engine's seconds.  Pure column decode (the
    ``aggregate`` span folds), one ``explode`` — no shuffle of its own;
    the protobuf byte parse itself is an edge concern, as for the
    exposition/OTLP decoders above."""
    lbl = F.map_from_entries(F.col("labels"))
    ex = df.select(lbl.alias("__lbl"), F.explode("histograms").alias("h"))

    def side(prefix: str) -> Column:
        spans = F.coalesce(
            F.col(f"h.{prefix}_spans"),
            F.array().cast("array<struct<offset:int,length:int>>"))
        counts = F.col(f"h.{prefix}_counts")
        deltas = F.coalesce(F.col(f"h.{prefix}_deltas"),
                            F.array().cast("array<bigint>"))
        dec = F.when(
            counts.isNotNull() & (F.size(counts) > 0),
            F.map_from_arrays(
                _span_indices(spans),
                F.transform(counts, lambda c: c.cast("double"))),
        ).otherwise(spans_to_buckets(spans, deltas))
        return F.map_filter(dec, lambda _, v: v != 0)

    hist = _hist_struct(
        F.coalesce(F.col("h.count_float"),
                   F.col("h.count_int").cast("double")),
        F.col("h.sum").cast("double"),
        F.coalesce(F.col("h.zero_count_float"),
                   F.col("h.zero_count_int").cast("double")),
        F.col("h.zero_threshold").cast("double"),
        F.col("h.schema").cast("int"),
        side("positive"),
        side("negative"),
    )
    return ex.select(
        F.col("__lbl").getItem(METRIC_NAME_LABEL).alias("metric"),
        F.map_filter(F.col("__lbl"),
                     lambda k, _: k != F.lit(METRIC_NAME_LABEL)).alias("labels"),
        F.floor(F.col("h.timestamp") / 1000).cast("long").alias("ts"),
        hist.alias("hist"),
    )


def histograms_to_remote_write(rel: DataFrame,
                               float_counts: bool = True) -> DataFrame:
    """HIST rows → prompb remote-write ``TimeSeries`` rows (the write-side
    inverse of :func:`histograms_from_remote_write`): one row per series
    with the canonical sorted label list (``__name__`` included) and the
    series' histogram messages sorted by timestamp.

    ``float_counts=True`` emits FLOAT histograms (absolute double bucket
    counts); ``False`` emits INTEGER histograms (delta-encoded counts via
    :func:`buckets_to_spans`) — lossless only when every bucket count is
    integral, as integer-histogram sources guarantee.  One hash aggregate
    per series; span/delta encodes are per-row column folds."""
    rel = _ensure_series_key(rel)

    def side(field: str):
        enc = buckets_to_spans(F.col(f"hist.{field}"))
        spans = enc["spans"]
        if float_counts:
            counts = F.transform(
                F.array_sort(F.map_entries(F.col(f"hist.{field}"))),
                lambda e: e["value"].cast("double"))
            return spans, F.lit(None).cast("array<bigint>"), counts
        return spans, enc["deltas"], F.lit(None).cast("array<double>")

    pspans, pdeltas, pcounts = side("pos")
    nspans, ndeltas, ncounts = side("neg")
    cnt = F.col("hist.count")
    zc = F.col("hist.zero_count")
    msg = F.struct(
        (F.col("ts") * 1000).cast("long").alias("timestamp"),
        (F.lit(None).cast("long") if float_counts
         else cnt.cast("long")).alias("count_int"),
        (cnt.cast("double") if float_counts
         else F.lit(None).cast("double")).alias("count_float"),
        F.col("hist.sum").cast("double").alias("sum"),
        F.col("hist.schema").cast("int").alias("schema"),
        F.col("hist.zero_threshold").cast("double").alias("zero_threshold"),
        (F.lit(None).cast("long") if float_counts
         else zc.cast("long")).alias("zero_count_int"),
        (zc.cast("double") if float_counts
         else F.lit(None).cast("double")).alias("zero_count_float"),
        pspans.alias("positive_spans"),
        pdeltas.alias("positive_deltas"),
        pcounts.alias("positive_counts"),
        nspans.alias("negative_spans"),
        ndeltas.alias("negative_deltas"),
        ncounts.alias("negative_counts"),
    )
    entries = F.transform(
        F.array_sort(F.map_entries(F.col("labels"))),
        lambda e: F.struct(e["key"].alias("name"), e["value"].alias("value")))
    return (
        rel.select("series_key", entries.alias("__labels"), msg.alias("__h"))
        .groupBy("series_key")
        .agg(F.any_value("__labels").alias("labels"),
             F.array_sort(F.collect_list("__h")).alias("histograms"))
        .select("labels", "histograms")
    )
