"""Sequence-packing plan for LLM pretraining pipelines.

Beyond-reference surface (the reference engine stops at storage/query;
a training pipeline also has to turn a curated corpus into fixed-length
token sequences).  This operator computes the standard concat-and-chunk
packing plan: documents are concatenated in a deterministic order and the
token stream is chunked into ``seq_len``-token training sequences; each
document is assigned the sequence its first token lands in plus its token
offset inside that sequence.

Why a *plan* (assignment columns) and not materialized sequences: the
packer's output is what a data loader consumes — (shard, sequence, offset)
per document — and keeping it relational means the whole thing stays one
shuffle and is oracle-checkable row by row.

Scale shape (the part that must survive 100 TB):

- A single global concatenation order would be one worldwide window — a
  1-partition sort.  Instead documents are first split into ``n_groups``
  deterministic hash groups ("shards"); each shard is packed
  independently.  That is exactly how distributed trainers shard data
  (each data-parallel rank reads its own shard), and it makes the plan
  one hash-partition shuffle + per-partition sort: embarrassingly
  parallel, no global ordering anywhere.  ``n_groups`` scales with the
  cluster (one or a few groups per executor core).
- Ordering within a shard is by a second independent hash (plus id
  tie-break), which is the deterministic stand-in for the usual
  shuffle-before-packing: reproducible across reruns, retries, engines.
- All arithmetic is integer; the only floats are the md5-prefix hashes,
  shared bit-for-bit with the DuckDB oracle (see operators/sampling.py).

Reference scope note: packing has no mandodb counterpart (its ingest is
point-based, tsdb.go:205-216); this extends SURVEY.md's training-data
pipeline section.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_unit, hash_unit_sql

#: Salts for the two independent hash draws (group split vs. intra-group
#: order).  Distinct salts make the draws independent: the group id must
#: not correlate with the position inside the group.
GROUP_SALT = "pack.grp"
ORDER_SALT = "pack.ord"


def pack_plan(
    df: DataFrame,
    id_col: str,
    token_col: str,
    seq_len: int,
    n_groups: int,
) -> DataFrame:
    """Assign each document a (grp, seq, offset) packing slot.

    ``token_col`` is the document's token count (BIGINT).  Returns the
    input's id column plus:

    - ``grp``: deterministic hash shard in [0, n_groups);
    - ``seq``: 0-based index of the ``seq_len``-token training sequence
      (within the shard) that the document's first token lands in;
    - ``offset``: token offset of the document inside that sequence;
    - ``crosses``: whether the document straddles a sequence boundary
      (gets split across two or more training sequences).

    One shuffle (hash partition on ``grp``) + one per-partition sort.
    """
    key = F.col(id_col)
    grp = F.floor(hash_unit(key, GROUP_SALT) * n_groups).cast("int")
    order = hash_unit(key, ORDER_SALT)
    w = (
        Window.partitionBy("grp")
        .orderBy("ord", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = F.col(token_col).cast("long")
    out = (
        df.select(key.alias(id_col), toks.alias("n_tokens"),
                  grp.alias("grp"), order.alias("ord"))
        .withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            id_col,
            "grp",
            F.expr(f"cum_before DIV {seq_len}").alias("seq"),
            (F.col("cum_before") % seq_len).alias("offset"),
            "n_tokens",
            (
                (F.col("cum_before") % seq_len) + F.col("n_tokens") > seq_len
            ).alias("crosses"),
        )
    )
    return out


def pack_plan_sql(
    table: str, id_expr: str, token_expr: str, seq_len: int, n_groups: int
) -> str:
    """DuckDB oracle generator mirroring :func:`pack_plan` exactly."""
    h_grp = hash_unit_sql(id_expr, GROUP_SALT)
    h_ord = hash_unit_sql(id_expr, ORDER_SALT)
    return f"""
WITH base AS (
    SELECT {id_expr} AS id,
           CAST({token_expr} AS BIGINT) AS n_tokens,
           CAST(floor({h_grp} * {n_groups}) AS INTEGER) AS grp,
           {h_ord} AS ord
    FROM {table}
),
packed AS (
    SELECT id, grp, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY grp ORDER BY ord, id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS cum_before
    FROM base
)
SELECT id AS {id_expr}, grp,
       CAST(cum_before // {seq_len} AS BIGINT) AS seq,
       CAST(cum_before % {seq_len} AS BIGINT) AS offset,
       n_tokens,
       (cum_before % {seq_len}) + n_tokens > {seq_len} AS crosses
FROM packed
"""


def write_shards(plan_with_text: DataFrame, path: str) -> None:
    """Materialize a packing plan as trainer-consumable shard files.

    Input is :func:`pack_plan` output joined back with whatever payload
    columns the trainer needs (text/tokens).  Written as one directory per
    shard (``grp=N/``) with rows sorted by (seq, offset) inside each file —
    a data-parallel rank reads its own directory start-to-finish and sees
    the exact concatenation order the plan promised.  ``partitionBy`` keeps
    the write scan-parallel; the per-shard sort is per-partition.
    """
    (
        plan_with_text.repartition("grp")
        .sortWithinPartitions("grp", "seq", "offset")
        .write.mode("overwrite")
        .partitionBy("grp")
        .parquet(path)
    )


def pack_plan_nosplit(
    df: DataFrame,
    id_col: str,
    token_col: str,
    seq_len: int,
    n_groups: int,
) -> DataFrame:
    """First-fit no-split packing: documents never straddle a sequence
    boundary — a doc that doesn't fit the current sequence's remainder
    starts the next one (the other standard trainer mode, trading fill
    fraction for intact documents).  Oversized docs (> seq_len tokens)
    start fresh and consume ceil(t/seq_len) consecutive sequences.

    The state (current seq, current fill) is inherently sequential per
    shard, so the fold runs inside one ``applyInPandas`` per hash shard —
    same single co-locating shuffle as :func:`pack_plan`, with the
    sequential pass Arrow-batched per shard instead of a window cumsum.
    Same deterministic hash split/order, same DuckDB-mirrorable math.

    Output: id, grp, seq, offset, n_tokens.
    """
    import pandas as pd

    key = F.col(id_col)
    grp = F.floor(hash_unit(key, GROUP_SALT) * n_groups).cast("int")
    order = hash_unit(key, ORDER_SALT)
    prepared = df.select(
        key.alias(id_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        grp.alias("grp"),
        order.alias("ord"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ord", id_col], ignore_index=True)
        seq = 0
        fill = 0
        seqs, offs = [], []
        for t in pdf["n_tokens"]:
            t = int(t)
            need_new = fill > 0 and fill + t > seq_len
            if need_new:
                seq += 1
            off = 0 if need_new else fill
            spill = (off + t - 1) // seq_len
            seqs.append(seq)
            offs.append(off)
            seq += spill
            fill = off + t - spill * seq_len
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "grp": pdf["grp"],
                "seq": seqs,
                "offset": offs,
                "n_tokens": pdf["n_tokens"],
            }
        )

    return prepared.groupBy("grp").applyInPandas(
        pack, f"{id_col} long, grp int, seq long, offset long, n_tokens long"
    )


def pack_plan_nosplit_sql(
    table: str, id_expr: str, token_expr: str, seq_len: int, n_groups: int
) -> str:
    """DuckDB mirror of :func:`pack_plan_nosplit` via a recursive CTE
    replaying the identical first-fit recurrence per shard."""
    h_grp = hash_unit_sql(id_expr, GROUP_SALT)
    h_ord = hash_unit_sql(id_expr, ORDER_SALT)
    return f"""
WITH RECURSIVE base AS (
    SELECT {id_expr} AS id,
           CAST({token_expr} AS BIGINT) AS n_tokens,
           CAST(floor({h_grp} * {n_groups}) AS INTEGER) AS grp,
           {h_ord} AS ord
    FROM {table}
),
ordered AS (
    SELECT id, n_tokens, grp,
           row_number() OVER (PARTITION BY grp ORDER BY ord, id) AS rn,
           count(*) OVER (PARTITION BY grp) AS n
    FROM base
),
packed AS (
    SELECT id, n_tokens, grp, rn, n,
           CAST(0 AS BIGINT) AS seq,
           CAST(0 AS BIGINT) AS offset,
           -- state after placing this doc:
           CAST((n_tokens - 1) // {seq_len} AS BIGINT) AS cur_seq,
           CAST(n_tokens - ((n_tokens - 1) // {seq_len}) * {seq_len} AS BIGINT) AS fill
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.id, o.n_tokens, o.grp, o.rn, o.n,
           p.cur_seq + CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > {seq_len} THEN 1 ELSE 0 END AS seq,
           CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > {seq_len} THEN 0 ELSE p.fill END AS offset,
           p.cur_seq + CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > {seq_len} THEN 1 ELSE 0 END
             + (CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > {seq_len} THEN 0 ELSE p.fill END
                + o.n_tokens - 1) // {seq_len} AS cur_seq,
           CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > {seq_len} THEN 0 ELSE p.fill END
             + o.n_tokens
             - ((CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > {seq_len} THEN 0 ELSE p.fill END
                 + o.n_tokens - 1) // {seq_len}) * {seq_len} AS fill
    FROM packed p JOIN ordered o ON o.grp = p.grp AND o.rn = p.rn + 1
    WHERE p.rn < p.n
)
SELECT id AS {id_expr}, grp, seq, "offset" AS offset, n_tokens
FROM packed
"""
