"""Process-once file ledger: incremental BATCH processing over a growing
directory — the batch analogue of Structured Streaming's file-source
checkpoint, for pipelines that run as scheduled jobs rather than
always-on streams.

A curation pipeline re-run nightly must not re-ingest the files it
already processed (exactly-once per FILE — the natural unit, since
upstream drops are whole immutable parquet files).  The ledger is a tiny
parquet table of processed file paths; each run:

1. ``unprocessed(...)`` — scan minus ledger = the new files;
2. process that DataFrame (bounded, pruned scan);
3. ``mark(...)`` — append the just-processed paths.

Crash contract: mark AFTER the batch's output commits (the
write-audit-publish gate composes here) — a crash between commit and
mark reprocesses one batch (at-least-once), never skips one.  The scan
is pruned to the new files natively (one ``parquet(*paths)`` read), so
old data costs zero I/O — no full-scan-then-filter.

Scale: the ledger is O(files) rows of strings — thousands per petabyte —
read once per run and broadcast; the file listing itself is the same
driver-side metadata operation every Spark scan already performs.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class FileLedger:
    """Ledger over a source directory of immutable data files."""

    def __init__(self, spark: SparkSession, ledger_path: str):
        self.spark = spark
        self.ledger_path = ledger_path

    def processed_paths(self) -> set[str]:
        if not Path(self.ledger_path).exists():
            return set()
        return {
            r.path for r in self.spark.read.parquet(self.ledger_path).collect()
        }

    def _list_source(self, source_dir: str, suffix: str) -> list[str]:
        return sorted(
            str(p) for p in Path(source_dir).rglob(f"*{suffix}")
            if not p.name.startswith(("_", "."))
        )

    def unprocessed(self, source_dir: str, suffix: str = ".parquet",
                    max_files: int | None = None) -> tuple[DataFrame | None, list[str]]:
        """(DataFrame over exactly the new files, their paths) — or
        ``(None, [])`` when nothing is new.  ``max_files`` bounds a run
        (backfill throttling); files are taken in sorted order so
        successive runs drain deterministically."""
        new = [p for p in self._list_source(source_dir, suffix)
               if p not in self.processed_paths()]
        if max_files is not None:
            new = new[:max_files]
        if not new:
            return None, []
        return self.spark.read.parquet(*new), new

    def mark(self, paths: list[str]) -> None:
        """Record ``paths`` as processed (append — call after the batch's
        output has committed)."""
        if not paths:
            return
        self.spark.createDataFrame(
            [(p,) for p in paths], "path string"
        ).coalesce(1).write.mode("append").parquet(self.ledger_path)
