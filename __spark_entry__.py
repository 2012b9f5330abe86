"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Conventions used throughout so Spark and DuckDB hash-match:
- tokenization in oracle-checked queries is whitespace split (the
  synthetic corpus is space-separated lowercase words) computed with
  JVM built-ins on the Spark side and string_split on the DuckDB side;
  the engine's full analyzer (Unicode tokenize + Porter stem) is
  covered by rows-only entries and the pytest golden suite.
- every float column is rounded to 6 decimals on BOTH sides;
- every aggregate is aliased identically on both sides;
- counts are cast to long/BIGINT on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from search_engine_spark.entry_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-10 for "spark join" over sf0.001 docs."""
    from search_engine_spark.operators.aggregates import postings_from_text
    from search_engine_spark.plans.scoring import bm25_exhaustive

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    postings = postings_from_text(docs, stem=False)
    return bm25_exhaustive(spark, postings, "spark join", k=10, stem=False)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
