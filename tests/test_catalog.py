"""Catalog shim: parquet fallback now, Iceberg branch when jars exist.

The north rule mandates Iceberg tables; this sandbox has no Iceberg
jars (SURVEY.md section 7), so the Iceberg code path is exercised by a
skipped-unless-jars test — the same test body runs for real the moment
``org.apache.iceberg.spark.SparkCatalog`` appears on the classpath.
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.sources.catalog import Catalog, _iceberg_available


def test_parquet_fallback_roundtrip(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.range(0, 100).withColumn("b", (F.col("id") % 4).cast("int"))
    cat.write(df, "t1", partition_by=["b"])
    assert cat.exists("t1") and not cat.exists("nope")
    back = cat.read("t1")
    assert back.count() == 100
    # partition dirs exist -> partition-pruned reads at scale
    assert (tmp_path / "t1" / "b=0").is_dir()
    # append mode accumulates
    cat.write(df.limit(10), "t1", partition_by=["b"], mode="append")
    assert cat.read("t1").count() == 110


def test_iceberg_branch_when_jars_present(spark, tmp_path):
    """Runs only when Iceberg jars are on the classpath (never in this
    sandbox); the fallback assertion keeps the auto-detect honest."""
    if not _iceberg_available(spark):
        cat = Catalog(spark, str(tmp_path))
        assert cat.iceberg is False  # auto-detect must not lie
        pytest.skip("no Iceberg jars on classpath — parquet fallback active")
    cat = Catalog(spark, str(tmp_path))  # pragma: no cover
    assert cat.iceberg is True
    df = spark.range(0, 50).withColumn("b", (F.col("id") % 2).cast("int"))
    cat.write(df, "local.tdb.t_ice", partition_by=["b"])
    assert cat.read("local.tdb.t_ice").count() == 50
    cat.write(df.limit(5), "local.tdb.t_ice", mode="append")
    assert cat.read("local.tdb.t_ice").count() == 55


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed+sorted on the join key must join with ZERO
    Exchange operators — the co-located big-to-big join pattern (the
    shuffle is paid once at write time, never per query)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from search_engine_spark.sources.catalog import write_bucketed

    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "t_bkt_a", str(tmp_path / "a"), buckets=4, key="k")
    write_bucketed(b, "t_bkt_b", str(tmp_path / "b"), buckets=4, key="k")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # render final plan
    try:
        j = spark.table("t_bkt_a").join(spark.table("t_bkt_b"), "k")
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")
