"""Offline ranking-evaluation metrics as declarative DataFrame plans.

The eval loop every search team runs before shipping a ranking change
(BM25 vs BM25F vs +static-boost vs hybrid RRF — all configs this
engine serves): join a run file against graded judgments, emit
per-query nDCG@k / MRR@k / recall@k / AP@k and a macro average.

Shapes (TREC conventions):
  results — (query_id, doc_id, rank)   rank 1-based, one row per
            retrieved doc; ties must already be broken (every serving
            path here emits deterministic score-desc/doc_id-asc order)
  qrels   — (query_id, doc_id, rel)    graded relevance, rel >= 0;
            rel > 0 counts as relevant for the binary metrics
            (MRR/recall/AP), graded rel feeds nDCG's gain.

Everything is joins + windows + aggregates (whole-stage codegen; no
Python): at 10^12-doc scale an eval run is one equi-join of a
|queries|×k run table against a qrels table, partitioned by query_id —
embarrassingly parallel, no skew (per-query group ≤ k rows).

Metric definitions (Järvelin & Kekäläinen 2002 for DCG; standard
TREC): DCG@k = Σ_{i≤k} (2^rel_i − 1) / log2(i + 1); nDCG@k = DCG@k /
IDCG@k where IDCG is the DCG of the qrels sorted by rel desc
(truncated at k). AP@k = (Σ_{i≤k, rel_i>0} precision@i) / min(R, k)
with R = total relevant for the query. Queries with zero relevant
docs are dropped (undefined denominators), matching trec_eval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def _judged(results: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """Ranked rows ≤ k with their (0-defaulted) relevance grades."""
    r = results.where(F.col("rank") <= k)
    return r.join(
        qrels.select("query_id", "doc_id",
                     F.col("rel").cast("double").alias("rel")),
        ["query_id", "doc_id"], "left",
    ).fillna({"rel": 0.0})


def _ideal_dcg(qrels: DataFrame, k: int) -> DataFrame:
    """(query_id, idcg) — DCG of the best possible ordering at k."""
    w = W.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    return (
        qrels.where(F.col("rel") > 0)
        .withColumn("i", F.row_number().over(w))
        .where(F.col("i") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("i") + 1.0)
            ).alias("idcg")
        )
    )


def ndcg_at_k(results: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, ndcg) — graded, position-discounted quality at k."""
    dcg = (
        _judged(results, qrels, k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("rank") + 1.0)
            ).alias("dcg")
        )
    )
    return (
        _ideal_dcg(qrels, k)
        .join(dcg, "query_id", "left")
        .fillna({"dcg": 0.0})
        .select(
            "query_id",
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
    )


def mrr_at_k(results: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, mrr) — reciprocal rank of the first relevant hit
    (0.0 when none in the top k). Queries absent from qrels drop."""
    first_rel = (
        _judged(results, qrels, k)
        .where(F.col("rel") > 0)
        .groupBy("query_id")
        .agg(F.min("rank").alias("first_rank"))
    )
    has_rel = qrels.where(F.col("rel") > 0).select("query_id").distinct()
    return (
        has_rel.join(first_rel, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(1.0 / F.col("first_rank"), F.lit(0.0)), 6
            ).alias("mrr"),
        )
    )


def recall_at_k(results: DataFrame, qrels: DataFrame,
                k: int = 10) -> DataFrame:
    """(query_id, recall) — fraction of the query's relevant docs
    retrieved in the top k."""
    total = (
        qrels.where(F.col("rel") > 0)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    hit = (
        _judged(results, qrels, k)
        .where(F.col("rel") > 0)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        total.join(hit, "query_id", "left")
        .fillna({"n_hit": 0})
        .select(
            "query_id",
            F.round(F.col("n_hit") / F.col("n_rel"), 6).alias("recall"),
        )
    )


def ap_at_k(results: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, ap) — average precision at k (MAP when macro-
    averaged). precision@i is computed with a rank-ordered running
    count of relevant hits (window cumsum per query — ≤ k rows per
    group, so the window never concentrates data)."""
    w = (
        W.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    j = _judged(results, qrels, k).withColumn(
        "cum_rel", F.sum((F.col("rel") > 0).cast("int")).over(w)
    )
    num = (
        j.where(F.col("rel") > 0)
        .groupBy("query_id")
        .agg(F.sum(F.col("cum_rel") / F.col("rank")).alias("sum_prec"))
    )
    total = (
        qrels.where(F.col("rel") > 0)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    return (
        total.join(num, "query_id", "left")
        .fillna({"sum_prec": 0.0})
        .select(
            "query_id",
            F.round(
                F.col("sum_prec") / F.least(F.col("n_rel"), F.lit(k)), 6
            ).alias("ap"),
        )
    )


def eval_run(results: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Per-query metric table: (query_id, ndcg, mrr, recall, ap).
    Four metric plans over one shared judged join, stitched with
    query_id equi-joins (each side is |queries| rows post-agg)."""
    out = ndcg_at_k(results, qrels, k)
    for other in (mrr_at_k(results, qrels, k),
                  recall_at_k(results, qrels, k),
                  ap_at_k(results, qrels, k)):
        out = out.join(other, "query_id")
    return out


def eval_run_local(
    run: dict[str, list],
    qrels: list[tuple],
    k: int = 10,
) -> tuple[dict, dict]:
    """Driver-side twin of ``eval_run`` for serving-path evaluation
    (``query.py --eval``): the run is already in memory (|queries|×k
    rows — spinning a Spark job to join it would be absurd), so the
    same metric definitions run as plain Python. Property-tested
    value-identical to the DataFrame plans (tests/test_ireval.py).

    run:   {query_id: [(doc_id, score), ...] ranked} (score ignored —
           order is the ranking)
    qrels: [(query_id, doc_id, rel), ...]
    Returns (per_query, macro): {qid: {ndcg, mrr, recall, ap}} and the
    macro average over evaluated queries (those with ≥1 relevant doc).
    """
    import math

    rel_of = {(q, d): r for q, d, r in qrels}
    by_q: dict = {}
    for q, d, r in qrels:
        if r > 0:
            by_q.setdefault(q, []).append((d, r))
    per_query: dict = {}
    for qid, judged in sorted(by_q.items()):
        ranked = [d for d, _ in run.get(qid, [])][:k]
        gains = [rel_of.get((qid, d), 0) for d in ranked]
        dcg = sum(
            (2.0 ** g - 1.0) / math.log2(i + 2)
            for i, g in enumerate(gains)
        )
        ideal = sorted((r for _, r in judged), reverse=True)[:k]
        idcg = sum(
            (2.0 ** g - 1.0) / math.log2(i + 2)
            for i, g in enumerate(ideal)
        )
        first = next((i + 1 for i, g in enumerate(gains) if g > 0), None)
        hits = sum(1 for g in gains if g > 0)
        sum_prec, cum = 0.0, 0
        for i, g in enumerate(gains):
            if g > 0:
                cum += 1
                sum_prec += cum / (i + 1)
        n_rel = len(judged)
        per_query[qid] = {
            "ndcg": round(dcg / idcg, 6) if idcg else 0.0,
            "mrr": round(1.0 / first, 6) if first else 0.0,
            "recall": round(hits / n_rel, 6),
            "ap": round(sum_prec / min(n_rel, k), 6),
        }
    macro = {"n_queries": len(per_query)}
    for m in ("ndcg", "mrr", "recall", "ap"):
        macro[f"mean_{m}"] = round(
            sum(v[m] for v in per_query.values()) / len(per_query), 6
        ) if per_query else 0.0
    return per_query, macro


def macro_avg(per_query: DataFrame) -> DataFrame:
    """One-row macro average over every metric column."""
    cols = [c for c in per_query.columns if c != "query_id"]
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        *[F.round(F.avg(c), 6).alias(f"mean_{c}") for c in cols],
    )


def tune_blend(
    candidates: DataFrame,
    qrels: DataFrame,
    weights: list,
    k: int = 10,
    metric: str = "ndcg",
) -> DataFrame:
    """Grid-search a linear score blend — ranking experiments as ONE
    data-parallel job instead of a per-config rerun.

    candidates: (query_id, doc_id, base_score, boost) — first-stage
    top-N per query with a second signal (static prior, recency,
    embedding score…). For every w in ``weights`` the ranking
    ``base_score + w * boost`` (ties doc_id asc) is evaluated with
    the chosen ``metric`` ("ndcg" | "mrr" | "recall" | "ap") against
    ``qrels`` and macro-averaged; returns (w, n_queries, mean_<metric>)
    sorted best-first.

    Plan shape: candidates × broadcast(weights) (a |grid|-row frame),
    one window per (w, query_id) group — the sweep costs |grid| ×
    first-stage-size, all inside one shuffle. The (w, query) pair is
    packed into the existing metric plans' query_id key, so the whole
    eval stack is reused verbatim.
    """
    spark = candidates.sparkSession
    wdf = F.broadcast(
        spark.createDataFrame([(float(w),) for w in weights], "w double")
    )
    blended = (
        candidates.select(
            F.col("query_id").cast("string").alias("qid"),
            "doc_id",
            F.col("base_score").cast("double").alias("base_score"),
            F.col("boost").cast("double").alias("boost"),
        )
        .crossJoin(wdf)
        .withColumn("blend",
                    F.col("base_score") + F.col("w") * F.col("boost"))
    )
    key = F.concat_ws("\x1f", F.col("w").cast("string"), F.col("qid"))
    rw = W.partitionBy("w", "qid").orderBy(
        F.desc("blend"), F.asc("doc_id")
    )
    results = (
        blended.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= k)
        .select(key.alias("query_id"), "doc_id", "rank")
    )
    qrels_w = (
        qrels.select(F.col("query_id").cast("string").alias("qid"),
                     "doc_id", "rel")
        .crossJoin(wdf)
        .select(key.alias("query_id"), "doc_id", "rel")
    )
    metric_fns = {"ndcg": ndcg_at_k, "mrr": mrr_at_k,
                  "recall": recall_at_k, "ap": ap_at_k}
    if metric not in metric_fns:
        raise ValueError(
            f"metric must be one of {sorted(metric_fns)}, got {metric!r}"
        )
    per = metric_fns[metric](results, qrels_w, k).select(
        F.split("query_id", "\x1f")[0].alias("w_str"),
        metric,
    )
    mean_col = f"mean_{metric}"
    return (
        per.groupBy("w_str")
        .agg(F.count(F.lit(1)).alias("n_queries"),
             F.round(F.avg(metric), 6).alias(mean_col))
        .select(
            F.col("w_str").cast("double").alias("w"),
            "n_queries", mean_col,
        )
        .orderBy(F.desc(mean_col), F.asc("w"))
    )
