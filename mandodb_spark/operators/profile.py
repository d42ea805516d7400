"""Column-profiling operator: per-column stats for data-quality monitoring.

Beyond-reference surface: every curation pipeline fronts its tables with a
profiling pass (null rates, cardinalities, ranges) to catch upstream
schema/content drift — the operational complement of the schema-drift
loader contract in workloads/common.py.

Shape, exact mode: one aggregate branch PER COLUMN, unioned.  Each branch
is a single-distinct aggregate, which Catalyst plans as a fully parallel
two-phase (partial distinct-by-value → final), and column pruning gives
each branch a one-column scan.  The superficially cheaper single-agg form
(all five ``count_distinct`` in one ``df.agg``) is the trap: Catalyst
rewrites multi-distinct via Expand (input fans ×N-distincts) and, with no
grouping keys, the final aggregate runs in ONE task over every surviving
distinct value — measured 7.8s vs 0.62s for the union shape on lineitem
at sf0.1 (12×).  N single-column scans beat one all-column scan + a
serial reducer at any scale.  Caveat: the branches each re-execute the
INPUT plan, which is the right trade for a column-prunable table scan
(the declared use) but an N-fold recompute for an expensive derived
relation — cache/checkpoint such an input first, or use approximate
mode (single-scan).

``approximate=True`` swaps in ``approx_count_distinct`` (HLL) and DOES
use the single-agg single-scan form — HLL sketches merge in the partial
phase, no Expand, so one pass over the table computes every column; the
±2% path for 100 TB monitoring (same output schema, not oracle-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str], approximate: bool = False) -> DataFrame:
    """One row per column: (column, n_nonnull, n_null, n_distinct,
    min_value, max_value) — min/max rendered as strings so heterogeneous
    column types share one schema."""
    if not cols:
        raise ValueError("profile_table needs at least one column")
    if approximate:
        aggs = []
        for c in cols:
            aggs += [
                F.count(F.col(c)).alias(f"__n_{c}"),
                F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
                F.approx_count_distinct(F.col(c)).alias(f"__d_{c}"),
                F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            ]
        one = df.agg(*aggs)
        stacked = ", ".join(
            f"'{c}', __n_{c}, __nn_{c}, __d_{c}, __min_{c}, __max_{c}" for c in cols
        )
        return one.selectExpr(
            f"stack({len(cols)}, {stacked}) AS "
            "(column, n_nonnull, n_null, n_distinct, min_value, max_value)"
        )
    out = None
    for c in cols:
        branch = df.agg(
            F.count(F.col(c)).alias("n_nonnull"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            F.min(F.col(c)).cast("string").alias("min_value"),
            F.max(F.col(c)).cast("string").alias("max_value"),
        ).select(
            F.lit(c).alias("column"),
            "n_nonnull", "n_null", "n_distinct", "min_value", "max_value",
        )
        out = branch if out is None else out.unionByName(branch)
    return out


def profile_table_sql(table: str, cols: list[str]) -> str:
    """DuckDB mirror of :func:`profile_table` (exact mode)."""
    parts = [
        f"""SELECT '{c}' AS column,
       CAST(count({c}) AS BIGINT) AS n_nonnull,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value,
       CAST(max({c}) AS VARCHAR) AS max_value
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


def skew_report(df: DataFrame, key_cols: list[str], top_n: int = 10) -> DataFrame:
    """Key-distribution skew diagnostics for a prospective join/agg key:
    the top-``top_n`` heaviest keys with their row share, alongside the
    global distribution shape (key count, max/avg ratio, median and p99
    per-key counts).  This is the pre-flight check behind every salting/
    broadcast decision at scale — "is this key safe to shuffle on?" —
    and the measurement the salted ``query_range`` variant exists to fix.

    Two hash aggregations (per-key count → 1-row global fold) + a
    ``top_n``-bounded TakeOrdered; the 1-row stats join is a broadcast.
    Output: (key_cols..., n, share, skew_ratio, n_keys, p50_n, p99_n),
    ordered (n desc, keys) — total, so cross-engine deterministic.
    """
    missing = [c for c in key_cols if c not in df.columns]
    if missing:
        # fail fast: Spark silently resolves some absent names to niladic
        # functions ("user" → current_user()), which would collapse the
        # report to one meaningless key
        raise ValueError(f"skew_report key columns not in relation: {missing}")
    kc = [F.col(c) for c in key_cols]
    counts = df.groupBy(*kc).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("__total"),
        (F.max("n") / F.avg("n")).alias("__skew"),
        F.expr("percentile(n, 0.5d)").alias("p50_n"),
        F.expr("percentile(n, 0.99d)").alias("p99_n"),
    )
    top = counts.orderBy(F.col("n").desc(), *kc).limit(top_n)
    return top.crossJoin(F.broadcast(stats)).select(
        *kc,
        "n",
        F.round(F.col("n") / F.col("__total"), 6).alias("share"),
        F.round(F.col("__skew"), 4).alias("skew_ratio"),
        "n_keys",
        "p50_n",
        "p99_n",
    ).orderBy(F.col("n").desc(), *kc)


def skew_report_sql(table: str, key_cols: list[str], top_n: int = 10) -> str:
    """DuckDB mirror of :func:`skew_report`."""
    keys = ", ".join(key_cols)
    return f"""
WITH counts AS (
    SELECT {keys}, CAST(count(*) AS BIGINT) AS n FROM {table} GROUP BY {keys}
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           sum(n) AS total,
           max(n) / avg(n) AS skew,
           quantile_cont(n, 0.5) AS p50_n,
           quantile_cont(n, 0.99) AS p99_n
    FROM counts
)
SELECT {keys}, n,
       round(n / CAST(total AS DOUBLE), 6) AS share,
       round(skew, 4) AS skew_ratio,
       n_keys, p50_n, p99_n
FROM counts, stats
ORDER BY n DESC, {keys}
LIMIT {top_n}
"""


def psi_report(expected: DataFrame, actual: DataFrame, col: str,
               edges: list[float], eps: float = 1e-6) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard drift monitor for quality scores, lengths, or
    model features between corpus versions (PSI < 0.1 stable, 0.1-0.25
    drifting, > 0.25 shifted).

    ``edges`` are EXPLICIT interior bucket boundaries (take them from a
    calibration run — e.g. ``approxQuantile`` deciles of the reference
    snapshot); passing them in keeps the operator deterministic and
    exactly SQL-mirrorable (engine-specific quantile sketches never agree
    bit-for-bit).  Buckets are ``(-inf, e1), [e1, e2), …, [ek, inf)``;
    NULLs get their own bucket.  ``eps`` floors empty-bucket shares the
    textbook way so the log term stays finite.

    Output: one row per bucket ``(bucket, n_expected, n_actual, share_
    expected, share_actual, psi_term)`` — total PSI = sum(psi_term).
    Scale shape: two map-side-combined single-pass aggregates (one per
    snapshot) over a sum-of-comparisons bucket rank; join is on the
    O(buckets) result.
    """
    if sorted(edges) != list(edges) or len(set(edges)) != len(edges):
        raise ValueError("edges must be strictly increasing")

    def bucketize(df: DataFrame, out: str) -> DataFrame:
        rank = F.lit(0)
        for e in edges:
            rank = rank + F.when(F.col(col) >= F.lit(float(e)), 1).otherwise(0)
        b = F.when(F.col(col).isNull(), F.lit(-1)).otherwise(rank).cast("long")
        return df.select(b.alias("bucket")).groupBy("bucket").agg(
            F.count(F.lit(1)).alias(out)
        )
    e = bucketize(expected, "n_expected")
    a = bucketize(actual, "n_actual")
    j = e.join(a, "bucket", "full").select(
        "bucket",
        F.coalesce("n_expected", F.lit(0)).alias("n_expected"),
        F.coalesce("n_actual", F.lit(0)).alias("n_actual"),
    )
    te = F.sum("n_expected").over(Window.partitionBy())
    ta = F.sum("n_actual").over(Window.partitionBy())
    j = j.withColumn(
        "share_expected", F.greatest(F.lit(float(eps)), F.col("n_expected") / te)
    ).withColumn(
        "share_actual", F.greatest(F.lit(float(eps)), F.col("n_actual") / ta)
    )
    term = (F.col("share_actual") - F.col("share_expected")) * F.log(
        F.col("share_actual") / F.col("share_expected")
    )
    return j.select(
        "bucket", "n_expected", "n_actual",
        F.round("share_expected", 6).alias("share_expected"),
        F.round("share_actual", 6).alias("share_actual"),
        F.round(term, 6).alias("psi_term"),
    )


def psi_report_sql(expected_table: str, actual_table: str, col: str,
                   edges: list[float], eps: float = 1e-6) -> str:
    """DuckDB mirror of :func:`psi_report` (oracle)."""
    rank = " + ".join(f"CASE WHEN {col} >= {float(e)} THEN 1 ELSE 0 END" for e in edges)
    b = f"CAST(CASE WHEN {col} IS NULL THEN -1 ELSE ({rank}) END AS BIGINT)"
    return f"""
WITH e AS (
    SELECT {b} AS bucket, count(*) AS n_expected FROM {expected_table} GROUP BY 1
), a AS (
    SELECT {b} AS bucket, count(*) AS n_actual FROM {actual_table} GROUP BY 1
), j AS (
    SELECT coalesce(e.bucket, a.bucket) AS bucket,
           coalesce(n_expected, 0) AS n_expected,
           coalesce(n_actual, 0) AS n_actual
    FROM e FULL JOIN a ON e.bucket = a.bucket
), s AS (
    SELECT *,
           greatest({float(eps)}, CAST(n_expected AS DOUBLE) / sum(n_expected) OVER ()) AS se,
           greatest({float(eps)}, CAST(n_actual AS DOUBLE) / sum(n_actual) OVER ()) AS sa
    FROM j
)
SELECT bucket, n_expected, n_actual,
       round(se, 6) AS share_expected,
       round(sa, 6) AS share_actual,
       round((sa - se) * ln(sa / se), 6) AS psi_term
FROM s
"""


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str] | None = None,
                  include_unchanged: bool = False) -> DataFrame:
    """Keyed diff between two snapshots of a table: which rows were
    ``added`` / ``removed`` / ``changed`` (and *which columns* changed) —
    the regression gate a curation pipeline runs between corpus versions
    before republishing, and the batch analogue of CDC.

    Contract: the key must be unique within each snapshot — duplicate
    keys fan out through the full-outer join (pre-aggregate or dedup
    first; :func:`~mandodb_spark.operators.dedup.exact_dedup_best` is
    the usual upstream).  Comparison is null-safe
    (``IS NOT DISTINCT FROM``); ``changed_cols``
    is a comma-joined list of differing column names for ``changed`` rows
    and ``''`` otherwise, so the output schema is flat and
    oracle-comparable.  ``compare_cols`` defaults to every shared non-key
    column (ordered as in ``old``).

    Scale shape: ONE full-outer sort-merge join on the key columns —
    column pruning reduces both scans to keys + compared columns, and the
    single shuffle is on the key (store both snapshots bucketed by the
    same key and even that shuffle disappears).  No window functions, no
    driver-side state; presence is tracked via literal marker columns so
    legitimately-NULL compare columns can't masquerade as absence.
    """
    if not key_cols:
        raise ValueError("snapshot_diff needs at least one key column")
    if compare_cols is None:
        shared = set(new.columns)
        compare_cols = [c for c in old.columns
                        if c in shared and c not in key_cols]
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__o_present"),
    )
    n = new.select(
        *key_cols,
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__n_present"),
    )
    j = o.join(n, key_cols, "full_outer")
    differs = [
        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in compare_cols
    ]
    any_diff = F.lit(False)
    for d in differs:
        any_diff = any_diff | d
    status = (
        F.when(F.col("__o_present").isNull(), F.lit("added"))
        .when(F.col("__n_present").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    changed = F.when(
        status == "changed",
        F.concat_ws(",", *[
            F.when(d, F.lit(c)) for c, d in zip(compare_cols, differs)
        ]),
    ).otherwise(F.lit(""))
    out = j.select(*key_cols, status.alias("status"),
                   changed.alias("changed_cols"))
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def snapshot_diff_sql(old_table: str, new_table: str, key_cols: list[str],
                      compare_cols: list[str],
                      include_unchanged: bool = False) -> str:
    """DuckDB mirror of :func:`snapshot_diff` (oracle generator)."""
    on = " AND ".join(f"o.{k} = n.{k}" for k in key_cols)
    keys = ", ".join(f"coalesce(o.{k}, n.{k}) AS {k}" for k in key_cols)
    any_diff = " OR ".join(
        f"(o.{c} IS DISTINCT FROM n.{c})" for c in compare_cols
    )
    named = ", ".join(
        f"CASE WHEN o.{c} IS DISTINCT FROM n.{c} THEN '{c}' END"
        for c in compare_cols
    )
    where = "" if include_unchanged else "WHERE status <> 'unchanged'"
    return f"""
WITH j AS (
    SELECT {keys},
           CASE WHEN o.__p IS NULL THEN 'added'
                WHEN n.__p IS NULL THEN 'removed'
                WHEN {any_diff} THEN 'changed'
                ELSE 'unchanged' END AS status,
           CASE WHEN o.__p IS NOT NULL AND n.__p IS NOT NULL
                     AND ({any_diff})
                THEN concat_ws(',', {named}) ELSE '' END AS changed_cols
    FROM (SELECT *, TRUE AS __p FROM {old_table}) o
    FULL JOIN (SELECT *, TRUE AS __p FROM {new_table}) n ON {on}
)
SELECT * FROM j {where}
"""


def dataset_card(df: DataFrame, group_cols: list[str], text_col: str) -> DataFrame:
    """Dataset-card summary: one row per group (source × lang, typically)
    with exact corpus-composition stats — the table a data-release report
    leads with (HF dataset cards, Dolma/RedPajama composition tables).

    One shuffle total: a single partial-aggregated groupBy; the corpus
    share divides two exact BIGINT counts (IEEE division is deterministic
    cross-engine — no rounding, per the repo's cross-engine rounding
    rule).  The grand total rides in via a 1-row broadcast, not a window
    over the grouped result, so the plan stays two stages at any scale.
    """
    from ..operators.text import token_count

    t = F.col(text_col)
    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(F.length(t), F.lit(0))).cast("long").alias("total_chars"),
        F.sum(F.when(t.isNull() | (t == ""), F.lit(0))
               .otherwise(token_count(t))).cast("long").alias("total_tokens"),
        F.max(F.coalesce(F.length(t), F.lit(0))).cast("long").alias("max_chars"),
    )
    total = df.groupBy().agg(F.count(F.lit(1)).alias("__total"))
    return (
        g.join(F.broadcast(total))
        .withColumn("corpus_share",
                    F.col("n_docs").cast("double") / F.col("__total").cast("double"))
        .drop("__total")
    )


def dataset_card_sql(table: str, group_cols: list[str], text_col: str) -> str:
    """DuckDB mirror of :func:`dataset_card` (oracle generator)."""
    gc = ", ".join(group_cols)
    return f"""
WITH g AS (
    SELECT {gc},
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(coalesce(length({text_col}), 0)) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN {text_col} IS NULL OR {text_col} = '' THEN 0
                         ELSE len(string_split({text_col}, ' ')) END) AS BIGINT) AS total_tokens,
           CAST(max(coalesce(length({text_col}), 0)) AS BIGINT) AS max_chars
    FROM {table} GROUP BY {gc}
), t AS (SELECT count(*) AS __total FROM {table})
SELECT g.*, CAST(n_docs AS DOUBLE) / CAST(__total AS DOUBLE) AS corpus_share
FROM g, t
"""


#: Rule kinds understood by :func:`expectations_report`.
_EXPECTATION_KINDS = ("not_null", "unique", "accepted_values", "min", "max",
                      "matches")


def expectations_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Declarative data-quality expectations (the dbt-tests /
    Great-Expectations contract, DataFrame-native): evaluate every rule
    in ONE aggregate pass over the data (plus one distinct-count pass per
    ``unique`` rule — exact uniqueness is a shuffle by definition) and
    return a report row per rule: ``(col_name, kind, detail,
    n_violations, passed)``.

    Rule forms (dicts):
      ``{"col": c, "kind": "not_null"}``
      ``{"col": c, "kind": "unique"}``
      ``{"col": c, "kind": "accepted_values", "values": [...]}``
      ``{"col": c, "kind": "min", "value": x}`` (violation: col < x)
      ``{"col": c, "kind": "max", "value": x}`` (violation: col > x)
      ``{"col": c, "kind": "matches", "pattern": regex}`` (non-null rows
      failing an RLIKE)

    Feeds :func:`mandodb_spark.sources.publish.write_audit_publish`
    directly: ``checks={"contract": lambda d:
    expectations_report(d, rules).filter(~F.col("passed")).isEmpty()}``.
    NULLs only violate ``not_null`` (bound/pattern/set rules skip NULLs —
    add an explicit not_null rule to forbid them), matching SQL
    three-valued logic so the DuckDB mirror is exact.
    """
    aggs = []
    meta = []
    for i, r in enumerate(rules):
        c, kind = F.col(r["col"]), r["kind"]
        if kind == "not_null":
            v = F.count(F.when(c.isNull(), 1))
            detail = ""
        elif kind == "accepted_values":
            v = F.count(F.when(c.isNotNull() & ~c.isin(*r["values"]), 1))
            detail = ",".join(map(str, r["values"]))
        elif kind == "min":
            v = F.count(F.when(c < F.lit(r["value"]), 1))
            detail = str(r["value"])
        elif kind == "max":
            v = F.count(F.when(c > F.lit(r["value"]), 1))
            detail = str(r["value"])
        elif kind == "matches":
            v = F.count(F.when(c.isNotNull() & ~c.rlike(r["pattern"]), 1))
            detail = r["pattern"]
        elif kind == "unique":
            # non-null count rides in the shared pass; only the exact
            # distinct count needs its own shuffle (uniqueness IS a
            # shuffle) — one extra job per unique rule, not two
            aggs.append(F.count(c).cast("long").alias(f"__v{i}"))
            meta.append((i, r["col"], kind, ""))
            continue
        else:
            raise ValueError(f"unknown expectation kind: {kind!r}")
        aggs.append(v.cast("long").alias(f"__v{i}"))
        meta.append((i, r["col"], kind, detail))
    spark = df.sparkSession
    one = df.agg(*aggs) if aggs else None
    rows = []
    viol = one.collect()[0] if one is not None else {}
    for i, col, kind, detail in meta:
        if kind == "unique":
            n = viol[f"__v{i}"] - (
                df.filter(F.col(col).isNotNull()).select(col).distinct().count()
            )
        else:
            n = viol[f"__v{i}"]
        rows.append((col, kind, detail, int(n), int(n) == 0))
    return spark.createDataFrame(
        rows, "col_name string, kind string, detail string, "
              "n_violations long, passed boolean")


def expectations_report_sql(table: str, rules: list[dict]) -> str:
    """DuckDB mirror of :func:`expectations_report` (oracle generator)."""
    selects = []
    for r in rules:
        c, kind = r["col"], r["kind"]
        if kind == "not_null":
            v, detail = f"count(CASE WHEN {c} IS NULL THEN 1 END)", ""
        elif kind == "accepted_values":
            vals = ", ".join(
                f"'{x}'" if isinstance(x, str) else str(x) for x in r["values"])
            v = (f"count(CASE WHEN {c} IS NOT NULL AND {c} NOT IN ({vals}) "
                 f"THEN 1 END)")
            detail = ",".join(map(str, r["values"]))
        elif kind == "min":
            v, detail = f"count(CASE WHEN {c} < {r['value']} THEN 1 END)", str(r["value"])
        elif kind == "max":
            v, detail = f"count(CASE WHEN {c} > {r['value']} THEN 1 END)", str(r["value"])
        elif kind == "matches":
            # regexp_matches = unanchored search, matching Spark's rlike
            v = (f"count(CASE WHEN {c} IS NOT NULL AND NOT "
                 f"regexp_matches({c}, '{r['pattern']}') THEN 1 END)")
            detail = r["pattern"]
        elif kind == "unique":
            v = (f"count({c}) - count(DISTINCT {c})")
            detail = ""
        else:
            raise ValueError(f"unknown expectation kind: {kind!r}")
        d = detail.replace("'", "''")
        selects.append(
            f"SELECT '{r['col']}' AS col_name, '{kind}' AS kind, '{d}' AS detail, "
            f"CAST({v} AS BIGINT) AS n_violations, "
            f"({v}) = 0 AS passed FROM {table}")
    return " UNION ALL ".join(selects)
