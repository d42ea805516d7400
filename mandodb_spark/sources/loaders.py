"""Ingestion adapters: external formats → the canonical ROW_SCHEMA shape.

The reference's only ingress is Go structs via ``InsertRows`` (tsdb.go:205).
A Spark engine ingests from files/streams; these adapters normalize the
common wire shapes into ``(metric, labels, ts, value)`` rows ready for
``TSDB.insert_rows`` / ``StreamingIngestor`` — each works identically on
``spark.read`` and ``spark.readStream`` inputs (batch/streaming duality).

Supported shapes:
- JSON lines: ``{"metric": "...", "labels": {...}, "ts": 1700000000,
  "value": 0.5}`` (the natural JSON rendering of tsdb.go:158-163).
- Prometheus-style flat JSON: all labels inline with ``__name__``
  (prometheus remote-read rendering); labels = everything except ts/value.
- CSV with a fixed (metric, ts, value) prefix and label columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: Schema for the JSON-lines wire shape (pass to read/readStream).
JSONL_SCHEMA = StructType(
    [
        StructField("metric", StringType(), False),
        StructField("labels", MapType(StringType(), StringType(), True), True),
        StructField("ts", LongType(), False),
        StructField("value", DoubleType(), True),
    ]
)


def rows_from_jsonl(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """JSON-lines files → ROW_SCHEMA rows (batch or streaming source)."""
    reader = spark.readStream if streaming else spark.read
    return reader.schema(JSONL_SCHEMA).json(path).select("metric", "labels", "ts", "value")


def rows_from_flat(df: DataFrame, metric_label: str = "__name__",
                   ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Flat wide relation → ROW_SCHEMA: every column except ts/value is a
    label; ``metric_label`` names the metric column (Prometheus flat form).

    Null label values are dropped per-row (map_filter) mirroring label
    sanitation (label.go:189-203).
    """
    label_cols = [c for c in df.columns if c not in (ts_col, value_col)]
    if metric_label not in label_cols:
        raise ValueError(f"metric column {metric_label!r} not present")
    entries: list = []
    for c in label_cols:
        entries.append(F.lit(c))
        entries.append(F.col(c).cast("string"))
    labels = F.map_filter(F.create_map(*entries), lambda _, v: v.isNotNull())
    return df.select(
        F.col(metric_label).cast("string").alias("metric"),
        labels.alias("labels"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    ).where(F.col("metric").isNotNull())


def rows_from_csv(spark: SparkSession, path: str, label_cols: list[str],
                  streaming: bool = False) -> DataFrame:
    """CSV with header ``metric,ts,value,<label columns...>`` → ROW_SCHEMA."""
    fields = [
        StructField("metric", StringType(), False),
        StructField("ts", LongType(), False),
        StructField("value", DoubleType(), True),
        *[StructField(c, StringType(), True) for c in label_cols],
    ]
    reader = spark.readStream if streaming else spark.read
    df = reader.schema(StructType(fields)).option("header", "true").csv(path)
    flat = df.withColumn("__name__", F.col("metric")).drop("metric")
    return rows_from_flat(flat)


def rows_from_influx_line(lines: DataFrame, text_col: str = "value",
                          default_field: str = "value") -> DataFrame:
    """InfluxDB line protocol → ROW_SCHEMA rows, parsed entirely JVM-side.

    ``measurement,tag1=v1,tag2=v2 value=3.14 1700000000`` →
    (metric=measurement, labels={tag1:v1, tag2:v2}, ts, value).  Works on
    any DataFrame with a string column (``spark.read.text``, Kafka value,
    socket source) in batch or streaming — the parse is pure column
    expressions (split / map_from_entries / regexp_extract), no UDF, so it
    runs inside whole-stage codegen at scan speed.

    Simplified dialect: no escaped commas/spaces in identifiers, one field
    per line (``default_field``), timestamp in seconds.  Unparseable lines
    are dropped via try_cast→null (ANSI-safe), mirroring label sanitation (F11).
    """
    line = F.trim(F.col(text_col))
    head = F.split(line, " ").getItem(0)          # measurement,tag=v,...
    fieldset = F.split(line, " ").getItem(1)      # value=3.14
    ts_str = F.split(line, " ").getItem(2)

    parts = F.split(head, ",")
    metric = parts.getItem(0)
    tag_entries = F.transform(
        F.filter(F.slice(parts, 2, 1_000_000), lambda t: t.contains("=")),
        lambda t: F.struct(
            F.split(t, "=").getItem(0).alias("key"),
            F.split(t, "=").getItem(1).alias("value"),
        ),
    )
    # Proper float literal (sign, fraction, signed exponent) — a bare char
    # class like [0-9.eE+] can't match a negative exponent (1.5e-3) and the
    # sample would silently ingest with a null value.
    float_re = r"-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"
    value = F.regexp_extract(fieldset, rf"^{default_field}=({float_re})$", 1).try_cast("double")
    return (
        lines.select(
            metric.alias("metric"),
            F.map_from_entries(tag_entries).alias("labels"),
            ts_str.try_cast("long").alias("ts"),
            value.alias("value"),
        )
        .where(
            F.col("metric").isNotNull()
            & (F.col("metric") != "")
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
    )


def to_influx_line(rel: DataFrame, metric_label: str = "__name__",
                   default_field: str = "value") -> DataFrame:
    """Canonical relation → InfluxDB line-protocol text (the write-side
    inverse of :func:`rows_from_influx_line`, same simplified dialect:
    no identifier escaping, one field, seconds timestamps).

    Pure column expressions: tags render from the sorted label entries
    (canonical order — the same total order the series key hashes), so
    the round trip ``rows → lines → rows`` is the identity on canonical
    rows.  One output column ``line``; feed to ``df.write.text`` or a
    Kafka value sink, batch or streaming.
    """
    labels = F.col("labels")
    tags = F.filter(
        F.array_sort(F.map_entries(labels)), lambda e: e["key"] != F.lit(metric_label)
    )
    tag_str = F.array_join(
        F.transform(tags, lambda e: F.concat(e["key"], F.lit("="), e["value"])), ","
    )
    metric = F.coalesce(labels.getItem(metric_label), F.lit(""))
    head = F.when(tag_str == "", metric).otherwise(F.concat(metric, F.lit(","), tag_str))
    return rel.select(
        F.concat(
            head,
            F.lit(f" {default_field}="),
            F.col("value").cast("string"),
            F.lit(" "),
            F.col("ts").cast("string"),
        ).alias("line")
    )


#: Float-literal regex shared by the text codecs (sign, fraction, signed
#: exponent, and the Prometheus specials).
_FLOAT_RE = r"[+-]?(?:[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?|Inf|NaN)"
#: ``k="v"`` pairs inside a labels brace blob.  Values follow the
#: Prometheus text-format escape rules: ``\\``, ``\"`` and ``\n`` are the
#: three escape pairs, so the value body is any run of escape pairs or
#: plain (non-quote, non-backslash) characters.
_LBL_RE = r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:\\.|[^"\\])*)"'
#: The INSIDE of a labels brace blob at the line level: quoted values may
#: contain ``}`` and escaped quotes, so the blob is a run of quoted
#: strings and non-``}``/non-quote filler (names, ``=``, ``,``).
_BRACE_BODY = r'(?:"(?:\\.|[^"\\])*"|[^}"])*'
#: A full optional ``{...}`` blob (non-capturing inner).
_BRACED = r"\{" + _BRACE_BODY + r"\}"


def _unescape_label_value(v: Column) -> Column:
    """Prometheus text-format unescape: ``\\\\``→``\\``, ``\\n``→newline,
    ``\\"``→``"``.  Escaped backslashes are parked on a NUL sentinel first
    so ``\\\\n`` (backslash + literal n) is not confused with ``\\n``
    (newline); NUL cannot appear in exposition text.  The 4-pass
    regexp_replace chain only runs when a backslash is present — escaped
    values are rare in real exposition, so the common path is a single
    non-regex ``contains`` probe (round-11 verdict: the unconditional
    chain made the codec ~2× slower)."""
    s = F.regexp_replace(v, r"\\\\", "\x00")
    s = F.regexp_replace(s, r"\\n", "\n")
    s = F.regexp_replace(s, r"\\" + '"', '"')
    s = F.regexp_replace(s, "\x00", r"\\")
    return F.when(v.contains("\\"), s).otherwise(v)


def _escape_label_value(v: Column) -> Column:
    """Prometheus text-format escape (write side): backslash first, then
    quote and newline.  Same rare-path gating as the unescape side —
    three non-regex ``contains`` probes decide whether the replace chain
    runs at all."""
    s = F.regexp_replace(v, r"\\", r"\\\\")
    s = F.regexp_replace(s, '"', r"\\" + '"')
    s = F.regexp_replace(s, "\n", r"\\n")
    needs = v.contains("\\") | v.contains('"') | v.contains("\n")
    return F.when(needs, s).otherwise(v)


def _brace_labels(blob: Column) -> Column:
    """``k1="v1",k2="v2"`` → MAP<STRING,STRING> (empty blob → empty map),
    pure column expressions; values unescaped per the text-format rules.

    ONE ``regexp_extract_all`` pass over the blob (whole ``k="v"`` pairs,
    group 0), then each pair splits with non-regex string ops: label
    names cannot contain ``=`` or ``"``, so the FIRST ``="`` in a pair is
    always the name/value separator, and the value is everything between
    it and the closing quote.  (Two full-blob alternation passes were the
    other half of the round-11 codec regression.)"""
    pairs = F.regexp_extract_all(blob, F.lit(_LBL_RE), 0)
    keys = F.transform(pairs, lambda e: F.substring_index(e, '="', 1))

    def _value(e: Column) -> Column:
        klen = F.length(F.substring_index(e, '="', 1))
        return _unescape_label_value(
            e.substr(klen + F.lit(3), F.length(e) - klen - F.lit(3)))

    return F.map_from_arrays(keys, F.transform(pairs, _value))


def rows_from_openmetrics(lines: DataFrame, text_col: str = "value",
                          default_ts: int | None = None) -> DataFrame:
    """OpenMetrics / Prometheus TEXT exposition → ROW_SCHEMA rows, parsed
    entirely JVM-side (regexp column expressions, no UDF).

    ``name{l1="v1",l2="v2"} 3.14 1700000000`` → (metric=name, labels,
    ts, value); the labels blob and the timestamp are both optional
    (``default_ts`` stamps timestamp-less samples — the scrape time; if
    None they are dropped).  ``# HELP``/``# TYPE``/``# EOF`` metadata
    lines and blanks are skipped; an OpenMetrics exemplar suffix
    (``… # {trace_id="abc"} 0.9 1700000000``) is ignored HERE and decoded
    by :func:`exemplars_from_openmetrics` over the same lines.
    Timestamps are unix SECONDS (the OpenMetrics unit), floored to the
    engine's integer seconds.  Label values follow the text-format escape
    rules (``\\``, ``\"``, ``\n``) and may contain ``}``/``#`` inside the
    quotes.  Unparseable lines drop via try_cast→null, like the influx
    codec.

    ONE regex execution per line: the full anchored sample grammar runs
    once as a ``regexp_replace`` rewriting a matching line to its four
    captures joined on NUL (which cannot appear in exposition text —
    the same sentinel the unescape chain relies on), then a plain
    ``split`` fans the captures out.  The previous shape ran the
    brace-blob alternation four separate times per line (body guard +
    blob + value + timestamp extractions) and dominated the codec's
    profile (r11 verdict #2); an unmatched line rewrites to itself
    (no NUL → one split part) and drops on the arity check."""
    line = F.trim(F.col(text_col))
    grammar = (
        rf'^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{{({_BRACE_BODY})\}})?'
        rf'\s+({_FLOAT_RE})(?:\s+({_FLOAT_RE}))?\s*(?:#.*)?$'
    )
    parts = F.split(F.regexp_replace(line, grammar,
                                     "$1\x00$2\x00$3\x00$4"), "\x00", -1)
    metric = parts.getItem(0)
    blob = parts.getItem(1)
    val = parts.getItem(2)
    ts = parts.getItem(3)
    ts_col = F.floor(ts.try_cast("double")).cast("long")
    if default_ts is not None:
        ts_col = F.coalesce(ts_col, F.lit(int(default_ts)).cast("long"))
    return (
        # input-referencing predicates BEFORE the select: the output
        # `value` column shadows the input text column, so the match
        # check would silently re-resolve against the parsed double
        lines.where(F.size(parts) == 4)
        .select(
            metric.alias("metric"),
            _brace_labels(blob).alias("labels"),
            ts_col.alias("ts"),
            val.try_cast("double").alias("value"),
        )
        .where(F.col("ts").isNotNull() & F.col("value").isNotNull())
    )


def exemplars_from_openmetrics(lines: DataFrame,
                               text_col: str = "value",
                               default_ts: int | None = None) -> DataFrame:
    """OpenMetrics exemplar suffixes → ``EXEMPLAR_ROW_SCHEMA`` rows: the
    ``# {labels} value [timestamp]`` tail attaches a sampled raw
    observation (trace ids) to its series.  Exemplar-less lines drop; an
    exemplar without its own timestamp inherits the sample's, and when
    BOTH are absent ``default_ts`` (the scrape time — same contract as
    :func:`rows_from_openmetrics`) stamps it; if that is also None the
    exemplar drops.

    Same one-regex-per-line discipline as :func:`rows_from_openmetrics`:
    the full exemplar-carrying sample grammar rewrites a matching line
    to its six captures NUL-joined, split once; exemplar-less lines
    rewrite to themselves and drop on the arity check."""
    line = F.trim(F.col(text_col))
    grammar = (
        rf'^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{{({_BRACE_BODY})\}})?'
        rf'\s+{_FLOAT_RE}(?:\s+({_FLOAT_RE}))?'
        rf'\s*#\s*\{{({_BRACE_BODY})\}}\s+({_FLOAT_RE})'
        rf'(?:\s+({_FLOAT_RE}))?\s*$'
    )
    parts = F.split(
        F.regexp_replace(line, grammar,
                         "$1\x00$2\x00$3\x00$4\x00$5\x00$6"),
        "\x00", -1)
    metric = parts.getItem(0)
    blob = parts.getItem(1)
    sample_ts = parts.getItem(2)
    eblob = parts.getItem(3)
    eval_ = parts.getItem(4)
    ets = parts.getItem(5)
    ts_col = F.floor(
        F.coalesce(ets.try_cast("double"), sample_ts.try_cast("double"))
    ).cast("long")
    if default_ts is not None:
        ts_col = F.coalesce(ts_col, F.lit(int(default_ts)).cast("long"))
    return (
        lines.where(F.size(parts) == 6)
        .select(
            metric.alias("metric"),
            _brace_labels(blob).alias("labels"),
            ts_col.alias("ts"),
            eval_.try_cast("double").alias("value"),
            _brace_labels(eblob).alias("exemplar"),
        )
        .where((F.col("metric") != "") & F.col("value").isNotNull()
               & F.col("ts").isNotNull())
    )


def to_openmetrics(rel: DataFrame,
                   metric_label: str = "__name__") -> DataFrame:
    """Canonical relation → OpenMetrics text lines (the write-side inverse
    of :func:`rows_from_openmetrics`, same simplified dialect): labels
    render in canonical sorted order, so ``rows → lines → rows`` is the
    identity on canonical rows — like :func:`to_influx_line`'s contract.
    Label values are escaped per the text-format rules and non-finite
    values render as ``+Inf``/``-Inf``/``NaN`` (Spark's double→string cast
    says ``Infinity``, which is not OpenMetrics and the reader would
    silently drop).  One output column ``line``; ``df.write.text`` or a
    Kafka sink."""
    labels = F.col("labels")
    tags = F.filter(
        F.array_sort(F.map_entries(labels)),
        lambda e: e["key"] != F.lit(metric_label))
    tag_str = F.array_join(
        F.transform(tags, lambda e: F.concat(
            e["key"], F.lit('="'), _escape_label_value(e["value"]),
            F.lit('"'))), ",")
    metric = F.coalesce(labels.getItem(metric_label), F.lit(""))
    head = F.when(tag_str == "", metric).otherwise(
        F.concat(metric, F.lit("{"), tag_str, F.lit("}")))
    fval = F.col("value")
    val_str = (
        F.when(F.isnan(fval), F.lit("NaN"))
        .when(fval == F.lit(float("inf")), F.lit("+Inf"))
        .when(fval == F.lit(float("-inf")), F.lit("-Inf"))
        .otherwise(fval.cast("string")))
    return rel.select(
        F.concat(
            head,
            F.lit(" "),
            val_str,
            F.lit(" "),
            F.col("ts").cast("string"),
        ).alias("line")
    )


def _unescape_help(v: Column) -> Column:
    """OpenMetrics HELP-text unescape (``\\\\`` and ``\\n`` only — the
    spec escapes no quote in metadata text), NUL-sentinel ordered like
    :func:`_unescape_label_value`, gated on the same rare-path probe."""
    s = F.regexp_replace(v, r"\\\\", "\x00")
    s = F.regexp_replace(s, r"\\n", "\n")
    s = F.regexp_replace(s, "\x00", r"\\")
    return F.when(v.contains("\\"), s).otherwise(v)


def _escape_help(v: Column) -> Column:
    s = F.regexp_replace(v, r"\\", r"\\\\")
    s = F.regexp_replace(s, "\n", r"\\n")
    needs = v.contains("\\") | v.contains("\n")
    return F.when(needs, s).otherwise(v)


def metadata_from_openmetrics(lines: DataFrame,
                              text_col: str = "value") -> DataFrame:
    """OpenMetrics metadata lines (``# HELP <name> <text>``,
    ``# TYPE <name> <counter|gauge|histogram|gaugehistogram|summary|
    info|stateset|unknown>``, ``# UNIT <name> <unit>``) → one row per
    metric ``(metric, type, help, unit)`` — the ``/api/v1/metadata``
    data layout (Prometheus serves scrape metadata through exactly this
    shape; absent TYPE defaults to ``unknown`` like its
    target-metadata store).  Sample lines and ``# EOF`` simply fail the
    grammar; HELP text unescapes per the metadata escape rules
    (``\\\\``, ``\\n``).  One regex pass per line, then a hash
    aggregate per metric — duplicate declarations collapse
    last-wins."""
    line = F.trim(F.col(text_col))
    parts = F.split(
        F.regexp_replace(
            line,
            r'^#\s+(HELP|TYPE|UNIT)\s+([a-zA-Z_:][a-zA-Z0-9_:]*)'
            r'(?:\s+(.*?))?\s*$',
            "$1\x00$2\x00$3"),
        "\x00", -1)
    kind, metric, text = (parts.getItem(0), parts.getItem(1),
                          parts.getItem(2))
    rows = (lines.where(F.size(parts) == 3)
            .select(metric.alias("metric"), kind.alias("kind"),
                    text.alias("text")))

    def last_of(k: str) -> Column:
        return F.last(F.when(F.col("kind") == k, F.col("text")),
                      ignorenulls=True)

    return (rows.groupBy("metric").agg(
        F.coalesce(last_of("TYPE"), F.lit("unknown")).alias("type"),
        _unescape_help(last_of("HELP")).alias("help"),
        last_of("UNIT").alias("unit"),
    ))


def metadata_to_openmetrics(meta: DataFrame) -> DataFrame:
    """The write-side inverse of :func:`metadata_from_openmetrics`:
    ``(metric, type, help, unit)`` rows → ``# HELP`` / ``# TYPE`` /
    ``# UNIT`` exposition lines (one output column ``line``; union with
    :func:`to_openmetrics` sample lines for a federation-style export
    that carries metadata).  Null help/unit emit no line; the round
    trip ``meta → lines → meta`` is the identity on rows whose type is
    set (absent TYPE reads back as ``unknown``)."""
    m = F.col("metric")

    def tagged(k: str, v: Column) -> Column:
        return F.when(v.isNotNull(),
                      F.concat(F.lit(f"# {k} "), m, F.lit(" "), v))

    lines = F.array(
        tagged("TYPE", F.col("type")),
        tagged("HELP", _escape_help(F.col("help"))),
        tagged("UNIT", F.col("unit")),
    )
    return (meta.select(F.explode(F.filter(
        lines, lambda x: x.isNotNull())).alias("line")))


#: Row shape of one decoded prompb ``TimeSeries`` (the public
#: prometheus/prompb/remote.proto ``WriteRequest.timeseries`` entry):
#: labels as ``name``/``value`` structs INCLUDING ``__name__``, float
#: samples with MILLISECOND timestamps, and native-histogram messages
#: carrying spans + EITHER delta-encoded integer counts OR absolute float
#: counts (types.proto ``Histogram``; exactly one form per message).  The
#: protobuf byte parse itself is an edge/driver concern — the engine
#: consumes rows of this shape, the same contract as the exposition and
#: OTLP decoders in ``functions/native_hist.py``.
REMOTE_WRITE_TIMESERIES_SCHEMA = (
    "labels array<struct<name:string,value:string>>, "
    "samples array<struct<timestamp:bigint,value:double>>, "
    "histograms array<struct<"
    "timestamp:bigint,count_int:bigint,count_float:double,sum:double,"
    "schema:int,zero_threshold:double,zero_count_int:bigint,"
    "zero_count_float:double,"
    "positive_spans:array<struct<offset:int,length:int>>,"
    "positive_deltas:array<bigint>,positive_counts:array<double>,"
    "negative_spans:array<struct<offset:int,length:int>>,"
    "negative_deltas:array<bigint>,negative_counts:array<double>>>, "
    "exemplars array<struct<labels:array<struct<name:string,value:string>>,"
    "value:double,timestamp:bigint>>"
)


def rows_from_remote_write(df: DataFrame,
                           metric_label: str = "__name__") -> DataFrame:
    """prompb remote-write float samples → ROW_SCHEMA rows: explode each
    ``TimeSeries``'s samples, fold the label list to a map, split
    ``__name__`` out as the metric, floor millisecond timestamps to the
    engine's seconds.  Pure column decode + one explode — works on batch
    and streaming inputs alike.  Native-histogram messages ride in the
    sibling ``functions.native_hist.histograms_from_remote_write``."""
    lbl = F.map_from_entries(F.col("labels"))
    ex = df.select(lbl.alias("__lbl"), F.explode("samples").alias("s"))
    return ex.select(
        F.col("__lbl").getItem(metric_label).alias("metric"),
        F.map_filter(F.col("__lbl"),
                     lambda k, _: k != F.lit(metric_label)).alias("labels"),
        F.floor(F.col("s.timestamp") / 1000).cast("long").alias("ts"),
        F.col("s.value").alias("value"),
    )


def exemplars_from_remote_write(df: DataFrame,
                                metric_label: str = "__name__") -> DataFrame:
    """prompb remote-write exemplars → ``EXEMPLAR_ROW_SCHEMA`` rows ready
    for ``TSDB.insert_exemplars``: explode each ``TimeSeries``'s
    exemplars, keep the SERIES labels as identity and the exemplar's own
    label list (trace/span ids) as the ``exemplar`` map, floor ms → s.
    Same pure-column shape as :func:`rows_from_remote_write`."""
    lbl = F.map_from_entries(F.col("labels"))
    ex = df.select(lbl.alias("__lbl"), F.explode("exemplars").alias("e"))
    empty = F.array().cast("array<struct<name:string,value:string>>")
    return ex.select(
        F.col("__lbl").getItem(metric_label).alias("metric"),
        F.map_filter(F.col("__lbl"),
                     lambda k, _: k != F.lit(metric_label)).alias("labels"),
        F.floor(F.col("e.timestamp") / 1000).cast("long").alias("ts"),
        F.col("e.value").alias("value"),
        F.map_from_entries(
            F.coalesce(F.col("e.labels"), empty)).alias("exemplar"),
    )


def exemplars_to_remote_write(rel: DataFrame) -> DataFrame:
    """Exemplar rows (canonical: labels incl ``__name__``, ts, value,
    exemplar map) → prompb ``TimeSeries`` rows carrying only the
    ``exemplars`` field — the write-side inverse of
    :func:`exemplars_from_remote_write`.  Exemplars sort by
    (timestamp, value); their own label lists render in canonical sorted
    order like the series labels."""
    from ..model import series_key

    entries = F.transform(
        F.array_sort(F.map_entries(F.col("labels"))),
        lambda e: F.struct(e["key"].alias("name"), e["value"].alias("value")))
    ex_entries = F.transform(
        F.array_sort(F.map_entries(F.col("exemplar"))),
        lambda e: F.struct(e["key"].alias("name"), e["value"].alias("value")))
    msg = F.struct(
        ex_entries.alias("labels"),
        F.col("value").cast("double").alias("value"),
        (F.col("ts") * 1000).cast("long").alias("timestamp"),
    )

    def cmp(a, b):
        return (
            F.when(a["timestamp"] < b["timestamp"], -1)
            .when(a["timestamp"] > b["timestamp"], 1)
            .when(a["value"] < b["value"], -1)
            .when(a["value"] > b["value"], 1)
            .otherwise(0)
        ).cast("int")

    return (
        rel.select(series_key(F.col("labels")).alias("__sk"),
                   entries.alias("__labels"), msg.alias("__e"))
        .groupBy("__sk")
        .agg(F.any_value("__labels").alias("labels"),
             F.array_sort(F.collect_list("__e"), cmp).alias("exemplars"))
        .select("labels", "exemplars")
    )


def to_remote_write(rel: DataFrame,
                    metric_label: str = "__name__") -> DataFrame:
    """Canonical relation → prompb remote-write ``TimeSeries`` rows (the
    write-side inverse of :func:`rows_from_remote_write`): one row per
    series carrying the canonical sorted label list (``__name__``
    included, as the wire format requires) and the series' samples sorted
    by timestamp (seconds → milliseconds).  One hash aggregate per
    series; the round trip ``rows → timeseries → rows`` is the identity
    on canonical rows, like :func:`to_influx_line`'s."""
    from ..model import series_key

    entries = F.transform(
        F.array_sort(F.map_entries(F.col("labels"))),
        lambda e: F.struct(e["key"].alias("name"), e["value"].alias("value")))
    sample = F.struct(
        (F.col("ts") * 1000).cast("long").alias("timestamp"),
        F.col("value").cast("double").alias("value"))
    return (
        rel.select(series_key(F.col("labels")).alias("__sk"),
                   entries.alias("__labels"), sample.alias("__s"))
        .groupBy("__sk")
        .agg(F.any_value("__labels").alias("labels"),
             F.array_sort(F.collect_list("__s")).alias("samples"))
        .select("labels", "samples")
    )


def with_provenance(df: DataFrame, id_col: str = "prov_id") -> DataFrame:
    """Attach row-level lineage columns from the file reader's hidden
    ``_metadata`` struct: ``src_file`` (path), ``src_row`` (row index
    within the file) and a stable ``prov_id`` — the provenance a curation
    pipeline needs to trace any training example back to its exact source
    byte range months later (and the key for surgical re-processing:
    delete/reprocess by file without touching neighbors).

    Zero-cost at scale: ``_metadata`` is generated by the scan itself
    (constant per file + a per-row counter), no shuffle, no extra I/O;
    the id is ``md5(path)#row`` so it survives directory moves of equal
    layout and never collides within a file.  Only valid on file-source
    DataFrames (parquet/csv/json/orc reads) — raises the analyzer error
    otherwise, loudly, at plan time.
    """
    return df.select(
        "*",
        F.col("_metadata.file_path").alias("src_file"),
        F.col("_metadata.row_index").alias("src_row"),
        F.concat(
            F.md5(F.col("_metadata.file_path")), F.lit("#"),
            F.col("_metadata.row_index").cast("string"),
        ).alias(id_col),
    )
