#!/usr/bin/env python
"""Wire-codec throughput rung (round 12): measure the OpenMetrics text
parser and the prompb encode→decode loop at two synthetic scales to pin
(a) absolute per-core rates and (b) linearity — the scale evidence for
the wire tier, like third_rung.py/fourth_rung.py for the heavy
operators.

Synthetic corpus: `n` samples over `n // 100` series (3 labels each,
escaped-value-free — the common path), generated distributively with
spark.range and MATERIALIZED to parquet before any timing, so the
measured wall is codec work, not generation.  Each measurement is
noop-sink, min-of-2.

Usage: python tools/wire_rung.py [n_small] [n_large]   (default 1M, 4M)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _noop_time(df) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000

    from pyspark.sql import functions as F

    from mandodb_spark.session import get_spark
    from mandodb_spark.sources.loaders import (
        rows_from_openmetrics,
        rows_from_remote_write,
        to_remote_write,
    )
    from mandodb_spark.sources.prompb import (
        prompb_from_timeseries,
        timeseries_from_prompb,
    )

    spark = get_spark("wire-rung", shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="wire_rung_")
    out: dict[str, dict] = {}
    try:
        for n in (n_small, n_large):
            series = max(1, n // 100)
            i = F.col("id")
            rows = spark.range(n, numPartitions=32).select(
                F.create_map(
                    F.lit("__name__"), F.lit("wire_rung_metric"),
                    F.lit("node"),
                    F.concat(F.lit("vm"), (i % series).cast("string")),
                    F.lit("dc"),
                    F.concat(F.lit("dc"), (i % 8).cast("string")),
                ).alias("labels"),
                (F.lit(1_700_000_000) + F.floor(i / series)).cast("long")
                .alias("ts"),
                ((i % 997).cast("double") / 10.0).alias("value"),
            )

            # --- OpenMetrics text parse: materialize lines first
            from mandodb_spark.sources.loaders import to_openmetrics

            # fan the re-read out to all cores: a small parquet coalesces
            # into 1-2 splits and would serialize the codec (the same
            # single-split trap SCALE.md round-12 documents)
            lines_path = f"{root}/lines_{n}"
            to_openmetrics(rows).write.mode("overwrite").parquet(lines_path)
            lines = spark.read.parquet(lines_path).repartition(32)
            t_text = _noop_time(
                rows_from_openmetrics(lines, text_col="line"))

            # --- prompb: materialize TimeSeries rows, then time
            # encode→decode→unfold (the full wire loop)
            tw_path = f"{root}/tw_{n}"
            to_remote_write(rows).write.mode("overwrite").parquet(tw_path)
            tw = spark.read.parquet(tw_path).repartition(32)
            t_prompb = _noop_time(
                rows_from_remote_write(timeseries_from_prompb(
                    prompb_from_timeseries(tw))))

            out[str(n)] = {
                "text_parse_s": round(t_text, 2),
                "text_lines_per_s": round(n / t_text),
                "prompb_loop_s": round(t_prompb, 2),
                "prompb_samples_per_s": round(n / t_prompb),
            }
            print(f"# n={n}: {out[str(n)]}", file=sys.stderr)
        r = out[str(n_large)]; s = out[str(n_small)]
        out["scaling"] = {
            "n_ratio": n_large / n_small,
            "text_time_ratio": round(
                r["text_parse_s"] / s["text_parse_s"], 2),
            "prompb_time_ratio": round(
                r["prompb_loop_s"] / s["prompb_loop_s"], 2),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
