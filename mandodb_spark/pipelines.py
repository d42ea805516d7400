"""Declarative curation pipeline: one config dict from raw documents to
a shipped, manifested training drop.

Every stage already exists as an independently-tested operator; this
module is the COMPOSITION a data team actually runs — gates → exact
dedup → near-dup collapse → PII scrub → mixture sampling → contract
gate → sharded export — with a per-stage accounting report, so "where
did my tokens go" has an answer.  The config is plain data (JSON-able),
which is what makes the pipeline reviewable and re-runnable.

Scale notes: stages are lazy DataFrame transforms end to end — the only
actions are the per-stage counts (each a partial-aggregated count over
the current frame) and the export write.  Counts can be disabled
(``report_counts=False``) to collapse the whole pipeline into the
export's single job.  Near-dup collapse is the LSH → verified-pairs →
checkpointed-CC path (no O(n²) stage, see operators/dedup.py); the
export is the manifest-verified JSONL drop (sources/export.py).

Config keys (all optional except ``shards`` when exporting):

    gates:   {"min_tokens": int, "max_tokens": int, "langs": [..],
              "gopher": bool}
    quality_model: {"path": str}           (persisted classifier), or
              {"train": true, "lo_q": f, "hi_q": f}  (weak-label inline),
              + "min_prob": f              (keep threshold, default 0.5)
    dedup:   {"exact": bool, "near": {"threshold": float}}
    pii:     bool
    mixture: {"weights": {source: w}, "default_weight": w,
              "budget_frac": f}            (content-keyed, deterministic)
    expectations: [rule, ...]              (profile.expectations_report;
                                            any violation aborts export)
    export:  {"path": str, "shards": int, "compression": str|None}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_curation(spark: SparkSession, df: DataFrame, config: dict,
                 id_col: str = "doc_id", text_col: str = "text",
                 source_col: str = "source",
                 report_counts: bool = True) -> dict:
    """Run the configured curation pipeline over ``df``.

    Returns ``{"stages": [{name, rows}...], "exported": manifest|None,
    "aborted": str|None}``.  When an expectations rule fails, the export
    is SKIPPED (fail-closed, write_audit_publish semantics) and the
    failing rules are reported — the data never ships unaudited.
    """
    from .operators import dedup as D
    from .operators import text as T

    report: dict = {"stages": [], "exported": None, "aborted": None}

    def stage(name: str, frame: DataFrame) -> DataFrame:
        if report_counts:
            report["stages"].append({"name": name, "rows": frame.count()})
        else:
            report["stages"].append({"name": name, "rows": None})
        return frame

    cur = stage("input", df)
    tcol = F.col(text_col)

    g = config.get("gates") or {}
    if g:
        cond = tcol.isNotNull()
        if "min_tokens" in g:
            cond = cond & (T.token_count(tcol) >= g["min_tokens"])
        if "max_tokens" in g:
            cond = cond & (T.token_count(tcol) <= g["max_tokens"])
        if g.get("langs"):
            cond = cond & T.lang_guess(tcol).isin(list(g["langs"]))
        if g.get("gopher"):
            # scalar Gopher rules are pure column expressions — the last
            # flag is the conjunction (text.gopher_flags contract)
            cond = cond & (T.gopher_flags(tcol)[-1] == 1)
        cur = stage("gates", cur.filter(cond))

    qm = config.get("quality_model")
    if qm:
        # trained quality gate (operators/quality_model): either a
        # persisted model ({"path": ...}) or trained in-line from the
        # heuristic weak-label bootstrap ({"train": true}); scoring is a
        # zero-shuffle broadcast-coefficient transform
        from .operators import quality_model as QM

        if qm.get("path"):
            model = QM.load_model(spark, qm["path"])
        else:
            wl = QM.weak_labels_from_heuristics(
                cur.select(id_col, text_col), text_col=text_col,
                lo_q=qm.get("lo_q", 0.3), hi_q=qm.get("hi_q", 0.7))
            model = QM.train_quality_classifier(wl, text_col=text_col)
        scored = QM.score_quality(cur, model)
        cur = stage("quality_model", scored.filter(
            F.col("quality_prob") >= qm.get("min_prob", 0.5)
        ).drop("quality_prob"))

    d = config.get("dedup") or {}
    if d.get("exact"):
        keep = D.exact_dedup_groups(cur, id_col, F.md5(tcol)) \
            .select(F.col("keep_id").alias(id_col))
        cur = stage("exact_dedup", cur.join(keep, id_col, "left_semi"))
    near = d.get("near")
    if near:
        pairs = D.minhash_lsh_pairs(cur, id_col, text_col,
                                    threshold=near.get("threshold", 0.5))
        clusters = D.connected_components(pairs)
        drop = (
            clusters.groupBy("cluster_id")
            .agg(F.min("id").alias("__keep"), F.collect_list("id").alias("__ids"))
            .select(F.explode("__ids").alias(id_col), "__keep")
            .filter(F.col(id_col) != F.col("__keep"))
            .select(id_col)
        )
        cur = stage("near_dedup", cur.join(drop, id_col, "left_anti"))

    if config.get("pii"):
        cur = stage("pii_scrub",
                    cur.withColumn(text_col, T.redact_pii(tcol)))

    m = config.get("mixture")
    if m:
        from .operators.sampling import mixture_sample

        cur = cur.withColumn("__tok", T.token_count(tcol))
        cur = mixture_sample(
            cur, id_col, source_col, "__tok",
            weights=m.get("weights") or {},
            default_weight=m.get("default_weight", 1.0),
            budget_frac=m.get("budget_frac"),
        ).drop("__tok")
        cur = stage("mixture", cur)

    rules = config.get("expectations")
    if rules:
        from .operators.profile import expectations_report

        rep = expectations_report(cur, rules)
        failed = [r.asDict() for r in rep.filter(~F.col("passed")).collect()]
        if failed:
            report["aborted"] = f"expectations failed: " + ", ".join(
                f"{f['col_name']}:{f['kind']}" for f in failed)
            report["failed_rules"] = failed
            return report

    ex = config.get("export")
    if ex:
        from .sources.export import export_jsonl_shards

        report["exported"] = export_jsonl_shards(
            spark, cur, ex["path"], id_col, ex["shards"],
            compression=ex.get("compression"),
        )
    else:
        report["result"] = cur
    return report
