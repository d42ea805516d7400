"""Sharded JSONL export with an integrity manifest — the physical
release artifact of a training-data pipeline (Dolma/RedPajama-style
drops ship exactly this: hash-sharded ``*.jsonl`` files plus a manifest
of per-file byte size, SHA-256, and record count).

Division of labor with the rest of the repo: ``operators/sampling.py``
and ``workloads/docs.py`` plan WHICH rows land in which shard
(mixture, packing, shuffle plans); this module owns the physical write
and its verifiability.  The manifest is the contract a downstream
trainer checks before touching a single row — corruption, truncation,
and partial-copy bugs surface as a hash mismatch, not as a silent
mid-epoch parse error.

Scale shape: the export is one partitioned text write (shard =
``pmod(xxhash64(key), n)`` so membership is stable under reruns);
manifest computation is two distributed scans of the written tree
(binaryFile for bytes+sha256, text for record counts) joined on file
name — no driver-side hashing, O(files) collect for the tiny manifest
itself (same bounded-collect budget as the segment catalog)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "MANIFEST.json"


def _manifest_df(spark: SparkSession, path: str) -> DataFrame:
    """(file, bytes, sha256, n_records) per data file under ``path`` —
    distributed; ``file`` is relative to ``path``."""
    root = os.path.abspath(path)
    # binaryFile reports "file:/x" while input_file_name() reports
    # "file:///x" — normalize both to a bare absolute path before joining.
    norm = lambda c: F.regexp_replace(c, r"^file:/*", "/")  # noqa: E731
    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(
            norm(F.col("path")).alias("__p"),
            F.length(F.col("content")).cast("long").alias("bytes"),
            F.lower(F.hex(F.sha2(F.col("content"), 256))).alias("sha256"),
        )
    )
    txt_df = (
        spark.read.format("text")
        .option("pathGlobFilter", "part-*")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(norm(F.input_file_name()).alias("__p"))
        .groupBy("__p")
        .agg(F.count(F.lit(1)).alias("n_records"))
    )
    rel = F.substring(F.col("__p"), len(root) + 2, 2**30)
    return (
        bin_df.join(txt_df, "__p", "left")
        .select(
            rel.alias("file"), "bytes", "sha256",
            F.coalesce(F.col("n_records"), F.lit(0)).alias("n_records"),
        )
    )


def export_jsonl_shards(spark: SparkSession, df: DataFrame, path: str,
                        key_col: str, n_shards: int,
                        compression: str | None = None) -> dict:
    """Export ``df`` as ``n_shards`` hash-keyed JSONL shard directories
    under ``path`` (``shard=K/part-*``), then write :data:`MANIFEST_NAME`
    with per-file size / SHA-256 / record count and corpus totals.

    Shard assignment is content-keyed (``pmod(xxhash64(key_col), n)``) so
    a re-export after upstream growth moves only new keys — the same
    stability argument as ``sampling.hash_split``.  Row serialization is
    ``to_json(struct(*))`` in the DataFrame's column order; one file per
    shard directory (each shard repartitions to 1 file — shards are the
    parallelism unit downstream, so intra-shard splits would defeat the
    manifest's file-level accounting).

    Returns the manifest dict (also persisted at ``path/MANIFEST.json``).
    """
    cols = [c for c in df.columns]
    out = df.select(
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
        .cast("long").alias("shard"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value"),
    ).repartition(n_shards, "shard")
    # Sorting by serialized value makes the export byte-reproducible:
    # same input rows => same shard files => same manifest hashes, so two
    # independent export runs can be diffed by manifest alone.
    w = out.sortWithinPartitions("shard", "value").write.mode("overwrite").partitionBy("shard")
    if compression:
        w = w.option("compression", compression)
    w.text(path)
    files = [r.asDict() for r in _manifest_df(spark, path)
             .orderBy("file").collect()]
    manifest = {
        "format": "jsonl",
        "key_col": key_col,
        "n_shards": n_shards,
        "columns": cols,
        "files": files,
        "total_bytes": sum(f["bytes"] for f in files),
        "total_records": sum(f["n_records"] for f in files),
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def verify_export(spark: SparkSession, path: str) -> dict:
    """Re-derive the manifest from the bytes on disk and diff it against
    the stored one.  Returns ``{"ok": bool, "missing": [...], "extra":
    [...], "mismatched": [...]}`` — a trainer gates on ``ok`` before the
    first epoch.  Raises FileNotFoundError when no manifest exists
    (an unmanifested tree is unverifiable, not trivially OK)."""
    mpath = os.path.join(path, MANIFEST_NAME)
    with open(mpath) as fh:
        stored = json.load(fh)
    actual = {r["file"]: r.asDict() for r in _manifest_df(spark, path).collect()}
    expect = {f["file"]: f for f in stored["files"]}
    missing = sorted(set(expect) - set(actual))
    extra = sorted(set(actual) - set(expect))
    mismatched = sorted(
        f for f in set(expect) & set(actual)
        if (expect[f]["bytes"], expect[f]["sha256"], expect[f]["n_records"])
        != (actual[f]["bytes"], actual[f]["sha256"], actual[f]["n_records"])
    )
    return {"ok": not (missing or extra or mismatched),
            "missing": missing, "extra": extra, "mismatched": mismatched}


def read_export(spark: SparkSession, path: str) -> DataFrame:
    """Read an export back: JSON scan over the shard files (schema
    inferred from the data, as any downstream consumer would), columns
    reordered to the manifest's original order; the ``shard=`` directory
    column is dropped — the content already carries every original
    column."""
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        stored = json.load(fh)
    j = (
        spark.read
        .option("pathGlobFilter", "part-*")
        .option("recursiveFileLookup", "true")
        .json(os.path.abspath(path))
    )
    return j.select(*stored["columns"])
