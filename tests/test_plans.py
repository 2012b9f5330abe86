"""Plan-quality regression tests: the physical plans the engine
relies on (pushdown, pruning, broadcast, two-phase aggregation,
top-k pushdown) must stay in place — a silently regressed plan is a
100x slowdown at 100 TB even when results stay correct."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from search_engine_spark.entry_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet(spark):
    plan = formatted_plan(QUERIES["shipping_priority"](spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "GreaterThan(l_shipdate" in plan  # date filter at the scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_column_pruning_reaches_parquet(spark):
    plan = formatted_plan(QUERIES["shipping_priority"](spark, SF_DIR))
    # lineitem scan must not read all 16 columns for a 4-column use
    scan = plan[plan.index("(1) Scan parquet"):]
    read_schema = scan[scan.index("ReadSchema"):].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_comment" not in read_schema


def test_dimension_joins_broadcast(spark):
    plan = formatted_plan(QUERIES["revenue_by_nation"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan  # dims must not shuffle


def test_two_phase_aggregation(spark):
    plan = formatted_plan(QUERIES["term_frequency"](spark, SF_DIR))
    # partial HashAggregate below the exchange, final above it
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_topk_is_take_ordered(spark):
    from search_engine_spark.operators.aggregates import postings_from_text
    from search_engine_spark.plans.scoring import bm25_exhaustive

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = bm25_exhaustive(
        spark, postings_from_text(docs, stem=False), "spark join", k=10,
        stem=False,
    )
    plan = formatted_plan(df)
    # limit+orderBy must fuse into TakeOrderedAndProject — no global sort
    assert "TakeOrderedAndProject" in plan


def test_no_cartesian_anywhere_in_battery(spark):
    """Only the two intentionally-brute-force similarity baselines may
    nested-loop-join; everything else must be hash/broadcast joins."""
    allowed_nested = {"ann_cosine_topk", "cosine_pairs_topk", "lsh_cosine_topk"}
    for name, fn in QUERIES.items():
        if name in allowed_nested:
            continue
        plan = formatted_plan(fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
