"""Field collapse: the serving-side greedy collapse (collapse_ranked)
and its equivalence to the declarative collapse_top_hits plan."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.plans.scoring import (
    bm25_exhaustive,
    collapse_ranked,
    collapse_top_hits,
)


def test_collapse_ranked_greedy_semantics():
    hits = [(1, 9.0), (2, 8.0), (3, 7.0), (4, 6.0), (5, 5.0), (6, 4.0)]
    key = {1: "a", 2: "a", 3: "a", 4: "b", 5: "b", 6: "c"}
    got = collapse_ranked(hits, key, per_key=2, k=10)
    assert [(d, k) for d, _, k in got] == [
        (1, "a"), (2, "a"), (4, "b"), (5, "b"), (6, "c")
    ]
    # k cuts after the cap is applied, rank order preserved
    got = collapse_ranked(hits, key, per_key=1, k=2)
    assert [d for d, _, _ in got] == [1, 4]
    # callable key form
    got = collapse_ranked(hits, lambda d: d % 2, per_key=1, k=10)
    assert [d for d, _, _ in got] == [1, 2]


def test_collapse_ranked_matches_declarative_plan(spark, documents,
                                                  documents_pdf):
    """Greedy serving collapse over the full exhaustive ranking must
    equal the Spark collapse_top_hits plan (same keys, same cap)."""
    from search_engine_spark.operators.aggregates import postings_from_text

    post = postings_from_text(documents, stem=False)
    scored = bm25_exhaustive(spark, post, "the", k=10**6, stem=False)
    # synthetic collapse key: doc_id % 7 (deterministic, multi-member)
    meta = documents.select(
        "doc_id", (F.col("doc_id") % 7).alias("grp")
    )
    want = [
        (r.doc_id, r.grp)
        for r in collapse_top_hits(
            scored, meta, key="grp", per_key=2, k=15
        ).collect()
    ]
    hits = [(r.doc_id, r.score) for r in scored.collect()]
    hits.sort(key=lambda t: (-t[1], t[0]))
    got = [
        (d, k)
        for d, _, k in collapse_ranked(
            hits, lambda d: d % 7, per_key=2, k=15
        )
    ]
    assert got == want
