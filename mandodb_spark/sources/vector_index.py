"""Persistent cell-partitioned IVF vector index: the storage half of the
ANN story.

`operators/similarity.py::ivf_topk` computes the cell assignment inline
and notes that at 100 TB it is "computed once at ingest and stored as a
partition/bucket column, so the probe IS partition pruning".  This module
is that claim as code: vectors land in ``cell=N`` Parquet partitions at
build/append time, the codebook persists next to them, and a probe reads
only the ``n_probe`` partitions whose centroids are nearest the query —
a PartitionFilters-level scan cut (pinned by
``test_plans.py::test_vector_index_probe_prunes_cell_partitions``), not a
post-scan filter.

Mirrors the :class:`SegmentStore` design (time partitions → cell
partitions, rollup maintenance → index maintenance):

- ``build`` — one full pass: assign (Arrow-batched matmul, shuffle-free)
  → repartition(cell) → one file per cell partition.
- ``append`` — incremental batch: assign ONLY the new rows against the
  frozen codebook, append into their cell partitions.  Works as-is under
  ``foreachBatch`` for streaming index maintenance; new files per
  partition accumulate like the store's micro-batch files (bounded by
  compaction if needed).
- ``topk`` — probe-cell selection is O(cells) driver-side numpy on the
  cached codebook (the codebook is small by design — same contract as
  ivf_assign's collect), then a pruned scan + exact cosine inside.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VectorIndex:
    """Cell-partitioned persistent ANN index over ``(id, vec)`` rows."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = str(root)
        self._codebook_cache: list | None = None

    # ------------------------------------------------------------- paths
    @property
    def _data(self) -> str:
        return f"{self.root}/data"

    @property
    def _codebook(self) -> str:
        return f"{self.root}/codebook"

    # ------------------------------------------------------------- build
    def _assigned_rows(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        """``(vec_id, vec, cell)`` in ONE Arrow pass: same vectorized
        argmax-cosine as ``ivf_assign`` (identical rounding and tie rule),
        but the vector rides along in the batch output, so there is no
        join-back shuffle — the partitioned write's repartition(cell) is
        the only exchange in build/append."""
        import numpy as np
        import pandas as pd

        cb = self.centroids().orderBy("cell").collect()  # O(cells) by design
        cells = np.array([r.cell for r in cb], dtype="int64")
        M = np.stack([np.asarray(r.cvec, dtype="float64") for r in cb])
        cnorm = np.sqrt((M * M).sum(axis=1))

        def batches(it):
            for pdf in it:
                V = np.stack(pdf[vec_col].to_numpy()).astype("float64")
                vnorm = np.sqrt((V * V).sum(axis=1))
                sims = np.round((V @ M.T) / np.outer(vnorm, cnorm), 6)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf[id_col].to_numpy(),
                        "vec": pdf[vec_col],
                        "cell": cells[np.argmax(sims, axis=1)],
                    }
                )

        vec_type = dict(df.dtypes)[vec_col]
        return df.select(id_col, vec_col).mapInPandas(
            batches, f"vec_id long, vec {vec_type}, cell long"
        )

    def _write(self, rows: DataFrame, mode: str) -> None:
        (
            rows.repartition(F.col("cell"))
            .write.option("compression", "zstd")
            .partitionBy("cell").mode(mode).parquet(self._data)
        )

    def build(self, df: DataFrame, id_col: str, vec_col: str,
              centroids: DataFrame) -> None:
        """Full (re)build: persist the codebook, assign every vector to its
        max-cosine cell, write ``cell=N`` partitions (one file per cell —
        the assign output is repartitioned on the partition column so each
        cell lands in one task)."""
        centroids.coalesce(1).write.mode("overwrite").parquet(self._codebook)
        self._codebook_cache = None
        self._write(self._assigned_rows(df, id_col, vec_col), "overwrite")

    def append(self, df: DataFrame, id_col: str, vec_col: str) -> None:
        """Incremental maintenance: assign ONLY the new batch against the
        frozen codebook and append into the existing cell partitions.  The
        historical index is never re-read or re-shuffled — per-batch cost
        is O(batch), the Bloom-gate property applied to ANN.  Run inside
        ``foreachBatch`` for streaming index maintenance."""
        self._write(self._assigned_rows(df, id_col, vec_col), "append")

    def compact(self) -> None:
        """Rewrite each cell partition into one file, restoring the
        one-file-per-cell invariant streaming appends erode (one file per
        trigger per cell otherwise).  Same staging-then-rename-aside swap
        as :meth:`SegmentStore._swap_in` — crash at any point leaves the
        full old index recoverable, and a reader re-probing mid-compact
        sees a consistent snapshot.  No-op on an empty index."""
        import shutil

        from .segment_store import swap_in

        if not Path(self._data).exists():
            return
        staging = f"{self._data}__compact"
        shutil.rmtree(staging, ignore_errors=True)
        (
            self.relation()
            .repartition(F.col("cell"))
            .sortWithinPartitions("vec_id")
            .write.option("compression", "zstd")
            .partitionBy("cell").mode("overwrite").parquet(staging)
        )
        swap_in(self._data, staging)

    # ------------------------------------------------------------- read
    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(self._codebook)

    def relation(self) -> DataFrame:
        """The indexed rows with their partition-derived cell column."""
        return self.spark.read.parquet(self._data)

    def exists(self) -> bool:
        return Path(self._codebook).exists()

    def probe_cells(self, query_vec: list[float], n_probe: int) -> list[int]:
        """The ``n_probe`` cells nearest the query — O(cells) numpy on the
        (cached) codebook, ties broken toward the lower cell id exactly
        like ``ivf_topk``'s ORDER BY csim DESC, cell."""
        import numpy as np

        if self._codebook_cache is None:
            self._codebook_cache = self.centroids().orderBy("cell").collect()
        cb = self._codebook_cache
        cells = np.array([r.cell for r in cb], dtype="int64")
        M = np.stack([np.asarray(r.cvec, dtype="float64") for r in cb])
        q = np.asarray(query_vec, dtype="float64")
        sims = np.round(
            (M @ q) / (np.sqrt((M * M).sum(axis=1)) * np.sqrt((q * q).sum())), 6
        )
        order = np.lexsort((cells, -sims))  # csim desc, cell asc
        return [int(c) for c in cells[order[:n_probe]]]

    def topk(self, query: DataFrame, n_probe: int, k: int) -> DataFrame:
        """Approximate top-k against the persisted index: select probe
        cells driver-side, scan ONLY those partitions (``cell IN (...)``
        is a partition filter — the pruned scan is the point of the
        index), exact cosine inside.  ``query``: 1-row DataFrame with
        column ``qe``."""
        from ..operators.similarity import cosine_topk

        qvec = query.select("qe").first()[0]
        cells = self.probe_cells(list(qvec), n_probe)
        cand = self.relation().where(F.col("cell").isin(cells))
        return cosine_topk(cand, "vec_id", "vec", query, k)
