"""Ranking-evaluation metrics (operators/ireval.py) vs an independent
pandas/numpy reference and hand-computed goldens."""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest

from search_engine_spark.operators.ireval import (
    ap_at_k,
    eval_run,
    macro_avg,
    mrr_at_k,
    ndcg_at_k,
    recall_at_k,
)


def _ref_metrics(results: pd.DataFrame, qrels: pd.DataFrame, k: int):
    """Independent reference: plain-Python trec_eval-style loops."""
    rel = {
        (q, d): r
        for q, d, r in qrels.itertuples(index=False, name=None)
    }
    out = {}
    for qid in sorted(qrels[qrels.rel > 0].query_id.unique()):
        ranked = (
            results[results.query_id == qid]
            .sort_values("rank")
            .head(k)
        )
        gains = [rel.get((qid, d), 0) for d in ranked.doc_id]
        dcg = sum(
            (2 ** g - 1) / math.log2(i + 2) for i, g in enumerate(gains)
        )
        ideal = sorted(
            (r for (q, _), r in rel.items() if q == qid and r > 0),
            reverse=True,
        )[:k]
        idcg = sum(
            (2 ** g - 1) / math.log2(i + 2) for i, g in enumerate(ideal)
        )
        n_rel = sum(1 for (q, _), r in rel.items() if q == qid and r > 0)
        first = next(
            (i + 1 for i, g in enumerate(gains) if g > 0), None
        )
        hits = sum(1 for g in gains if g > 0)
        sum_prec, cum = 0.0, 0
        for i, g in enumerate(gains):
            if g > 0:
                cum += 1
                sum_prec += cum / (i + 1)
        out[qid] = {
            "ndcg": dcg / idcg if idcg else 0.0,
            "mrr": 1.0 / first if first else 0.0,
            "recall": hits / n_rel,
            "ap": sum_prec / min(n_rel, k),
        }
    return out


def _dfs(spark, results_rows, qrels_rows):
    results = spark.createDataFrame(
        results_rows, "query_id long, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        qrels_rows, "query_id long, doc_id long, rel int"
    )
    return results, qrels


def test_hand_computed_golden(spark):
    # q1: ranked [A rel2, B rel0, C rel1]; qrels also has D rel1 unretrieved
    results, qrels = _dfs(
        spark,
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        [(1, 10, 2), (1, 12, 1), (1, 13, 1)],
    )
    got = {r["query_id"]: r.asDict() for r in eval_run(results, qrels, k=3).collect()}
    dcg = (2 ** 2 - 1) / math.log2(2) + 0 + (2 ** 1 - 1) / math.log2(4)
    idcg = (2 ** 2 - 1) / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert abs(got[1]["ndcg"] - dcg / idcg) < 1e-6
    assert got[1]["mrr"] == 1.0
    assert abs(got[1]["recall"] - 2 / 3) < 1e-6
    # AP: hits at rank 1 (prec 1/1) and rank 3 (prec 2/3), min(R,k)=3
    assert abs(got[1]["ap"] - (1.0 + 2 / 3) / 3) < 1e-6


def test_no_relevant_retrieved(spark):
    results, qrels = _dfs(
        spark, [(1, 10, 1), (1, 11, 2)], [(1, 99, 1)]
    )
    got = eval_run(results, qrels, k=10).collect()[0]
    assert got["ndcg"] == 0.0 and got["mrr"] == 0.0
    assert got["recall"] == 0.0 and got["ap"] == 0.0


def test_query_without_judgments_dropped(spark):
    results, qrels = _dfs(
        spark,
        [(1, 10, 1), (2, 20, 1)],
        [(1, 10, 1)],
    )
    got = eval_run(results, qrels, k=5).collect()
    assert [r["query_id"] for r in got] == [1]


def test_matches_independent_reference_fuzz(spark):
    rng = random.Random(42)
    results_rows, qrels_rows = [], []
    for qid in range(1, 21):
        docs = rng.sample(range(1000), 15)
        for i, d in enumerate(docs):
            results_rows.append((qid, d, i + 1))
        # judge a mix of retrieved and unretrieved docs
        judged = rng.sample(docs, 6) + rng.sample(range(1000, 1100), 4)
        for d in judged:
            qrels_rows.append((qid, d, rng.choice([0, 0, 1, 1, 2, 3])))
    results, qrels = _dfs(spark, results_rows, qrels_rows)
    for k in (5, 10, 15):
        got = {
            r["query_id"]: r.asDict()
            for r in eval_run(results, qrels, k=k).collect()
        }
        want = _ref_metrics(
            pd.DataFrame(results_rows,
                         columns=["query_id", "doc_id", "rank"]),
            pd.DataFrame(qrels_rows,
                         columns=["query_id", "doc_id", "rel"]),
            k,
        )
        assert set(got) == set(want)
        for qid in want:
            for m in ("ndcg", "mrr", "recall", "ap"):
                assert abs(got[qid][m] - want[qid][m]) < 1e-5, (
                    qid, m, got[qid][m], want[qid][m]
                )


def test_macro_avg(spark):
    results, qrels = _dfs(
        spark,
        [(1, 10, 1), (2, 20, 1)],
        [(1, 10, 1), (2, 99, 1)],
    )
    row = macro_avg(eval_run(results, qrels, k=5)).collect()[0]
    assert row["n_queries"] == 2
    assert abs(row["mean_mrr"] - 0.5) < 1e-6
    assert abs(row["mean_recall"] - 0.5) < 1e-6


def test_individual_metrics_match_eval_run(spark):
    results, qrels = _dfs(
        spark,
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        [(1, 11, 2), (1, 12, 1)],
    )
    combined = eval_run(results, qrels, k=3).collect()[0]
    assert combined["ndcg"] == ndcg_at_k(results, qrels, 3).collect()[0]["ndcg"]
    assert combined["mrr"] == mrr_at_k(results, qrels, 3).collect()[0]["mrr"]
    assert combined["recall"] == recall_at_k(results, qrels, 3).collect()[0]["recall"]
    assert combined["ap"] == ap_at_k(results, qrels, 3).collect()[0]["ap"]


def test_local_twin_matches_spark_plans(spark):
    """eval_run_local (the query.py --eval path) must be value-identical
    to the DataFrame plans on the same fuzzed runs."""
    from search_engine_spark.operators.ireval import eval_run_local

    rng = random.Random(7)
    results_rows, qrels_rows = [], []
    for qid in range(1, 16):
        docs = rng.sample(range(500), 12)
        for i, d in enumerate(docs):
            results_rows.append((qid, d, i + 1))
        for d in rng.sample(docs, 5) + rng.sample(range(500, 560), 3):
            qrels_rows.append((qid, d, rng.choice([0, 1, 1, 2])))
    results, qrels = _dfs(spark, results_rows, qrels_rows)
    for k in (5, 12):
        want = {
            r["query_id"]: r.asDict()
            for r in eval_run(results, qrels, k=k).collect()
        }
        run = {}
        for q, d, rank in sorted(results_rows, key=lambda r: (r[0], r[2])):
            run.setdefault(q, []).append((d, 0.0))
        got, macro = eval_run_local(
            run, [(q, d, r) for q, d, r in qrels_rows], k=k
        )
        assert set(got) == set(want)
        for qid in want:
            for m in ("ndcg", "mrr", "recall", "ap"):
                assert got[qid][m] == pytest.approx(want[qid][m], abs=1e-9)
        assert macro["n_queries"] == len(want)


def test_cli_batch_eval(tmp_path):
    """Drive query.py --batch --eval end to end against a real index."""
    import json as _json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    idx = tmp_path / "idx"
    r = subprocess.run(
        [sys.executable, "build_index.py", "--input",
         "/root/testdata/sf0.001/documents.parquet", "--input-format",
         "documents", "--index-dir", str(idx), "--n-buckets", "4"],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    batch = tmp_path / "queries.tsv"
    batch.write_text("q1\tspark join\nq2\thash filter\n")
    # judgments: top doc of each query marked relevant + one bogus doc
    r = subprocess.run(
        [sys.executable, "query.py", "--index-dir", str(idx),
         "--batch", str(batch), "-k", "5"],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    top = {}
    for line in r.stdout.splitlines():
        parts = line.split("\t")
        if len(parts) == 4 and parts[0] in ("q1", "q2") and parts[1] == "1":
            top[parts[0]] = int(parts[2])
    assert set(top) == {"q1", "q2"}
    qrels = tmp_path / "qrels.parquet"
    pq.write_table(pa.table({
        "query_id": ["q1", "q1", "q2"],
        "doc_id": [top["q1"], 999999, top["q2"]],
        "rel": [2, 1, 1],
    }), str(qrels))

    r = subprocess.run(
        [sys.executable, "query.py", "--index-dir", str(idx),
         "--batch", str(batch), "-k", "5", "--eval", str(qrels)],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    eval_lines = [l for l in r.stdout.splitlines()
                  if l.startswith("# eval\t")]
    assert len(eval_lines) == 2
    # q1's top doc is rel-2 at rank 1 -> mrr 1.0; q2 perfect single rel
    assert "mrr=1.0" in eval_lines[0] and "mrr=1.0" in eval_lines[1]
    summary = _json.loads(r.stdout.splitlines()[-1])
    assert summary["eval_macro"]["n_queries"] == 2
    assert summary["eval_macro"]["mean_mrr"] == 1.0


def test_tune_blend_recovers_planted_weight(spark):
    """qrels are generated by the boost signal -> high w must win;
    qrels from base ranking -> w=0 must win. Cross-checked per-weight
    against eval_run on the explicitly blended ranking."""
    from search_engine_spark.operators.ireval import tune_blend

    rng = random.Random(5)
    rows = []
    for q in range(10):
        for d in range(30):
            rows.append(
                (f"q{q}", d, rng.uniform(0, 1), rng.uniform(0, 1))
            )
    cands = spark.createDataFrame(
        rows, "query_id string, doc_id long, base_score double, "
              "boost double"
    )
    # judgments: top-5 docs by BOOST are relevant
    by_boost = {}
    for q, d, b, boost in rows:
        by_boost.setdefault(q, []).append((boost, d))
    qrels_rows = [
        (q, d, 1)
        for q, lst in by_boost.items()
        for _, d in sorted(lst, reverse=True)[:5]
    ]
    qrels = spark.createDataFrame(
        qrels_rows, "query_id string, doc_id long, rel int"
    )
    grid = [0.0, 0.5, 2.0, 10.0]
    out = tune_blend(cands, qrels, grid, k=10).collect()
    assert len(out) == len(grid)
    assert out[0]["w"] == 10.0          # boost-driven qrels -> big w wins
    assert all(r["n_queries"] == 10 for r in out)
    # monotone in this construction: more boost weight, better ndcg
    by_w = {r["w"]: r["mean_ndcg"] for r in out}
    assert by_w[10.0] >= by_w[2.0] >= by_w[0.5] >= by_w[0.0]

    # per-weight cross-check against the plain eval stack
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    for w_val in (0.0, 2.0):
        blended = cands.withColumn(
            "s", F.col("base_score") + w_val * F.col("boost")
        )
        rw = W.partitionBy("query_id").orderBy(
            F.desc("s"), F.asc("doc_id")
        )
        results = (
            blended.withColumn("rank", F.row_number().over(rw))
            .where(F.col("rank") <= 10)
            .select("query_id", "doc_id", "rank")
        )
        want = macro_avg(eval_run(results, qrels, k=10)).collect()[0]
        assert by_w[w_val] == pytest.approx(
            want["mean_ndcg"], abs=1e-6
        )


def test_tune_blend_alternate_metrics(spark):
    """metric= selects which eval plan the grid optimizes; each result
    must equal the plain metric plan on the explicitly blended run."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from search_engine_spark.operators.ireval import tune_blend

    rng = random.Random(11)
    rows = [
        (f"q{q}", d, rng.uniform(0, 1), rng.uniform(0, 1))
        for q in range(6) for d in range(20)
    ]
    cands = spark.createDataFrame(
        rows, "query_id string, doc_id long, base_score double, "
              "boost double"
    )
    qrels_rows = [(f"q{q}", d, 1) for q in range(6)
                  for d in rng.sample(range(20), 4)]
    qrels = spark.createDataFrame(
        qrels_rows, "query_id string, doc_id long, rel int"
    )
    for metric, fn in (("mrr", mrr_at_k), ("recall", recall_at_k),
                       ("ap", ap_at_k)):
        out = {r["w"]: r[f"mean_{metric}"]
               for r in tune_blend(cands, qrels, [0.0, 3.0], k=8,
                                   metric=metric).collect()}
        for w_val in (0.0, 3.0):
            blended = cands.withColumn(
                "s", F.col("base_score") + w_val * F.col("boost")
            )
            rw = W.partitionBy("query_id").orderBy(
                F.desc("s"), F.asc("doc_id")
            )
            results = (
                blended.withColumn("rank", F.row_number().over(rw))
                .where(F.col("rank") <= 8)
                .select("query_id", "doc_id", "rank")
            )
            want = fn(results, qrels, k=8).agg(
                F.round(F.avg(metric), 6)
            ).collect()[0][0]
            assert out[w_val] == pytest.approx(want, abs=1e-6), metric
    import pytest as _pt

    with _pt.raises(ValueError):
        tune_blend(cands, qrels, [0.5], metric="f1")
