"""Exercise the Iceberg branch of sources/catalog.Catalog.

The sandbox has no Iceberg jars (SURVEY.md §7 preamble), so the
branch can never run for real here — but it must at least EXECUTE:
these tests monkeypatch _iceberg_available and drive the
writeTo()/partitionedBy()/createOrReplace()/append() call chain
through recording stubs, pinning the API contract the real jars
would see (round-2 verdict item #7)."""

import types

import pytest

from search_engine_spark.sources import catalog as cat


class _RecordingWriter:
    def __init__(self, log, table):
        self._log = log
        self._table = table

    def partitionedBy(self, *cols):
        self._log.append(("partitionedBy", self._table,
                          tuple(str(c) for c in cols)))
        return self

    def createOrReplace(self):
        self._log.append(("createOrReplace", self._table))

    def append(self):
        self._log.append(("append", self._table))


class _FakeDF:
    def __init__(self, log):
        self._log = log

    def writeTo(self, table):
        self._log.append(("writeTo", table))
        return _RecordingWriter(self._log, table)

    @property
    def write(self):  # the parquet fallback must NOT be reached
        raise AssertionError("iceberg branch fell through to .write")


def _fake_spark(exists: bool):
    fake_catalog = types.SimpleNamespace(tableExists=lambda t: exists)
    reads = []
    fake_read = types.SimpleNamespace(
        table=lambda t: reads.append(t) or f"TABLE:{t}"
    )
    return types.SimpleNamespace(catalog=fake_catalog, read=fake_read), reads


@pytest.fixture()
def iceberg_on(monkeypatch):
    monkeypatch.setattr(cat, "_iceberg_available", lambda spark: True)


def test_iceberg_write_partitioned(spark, iceberg_on, tmp_path):
    log = []
    fake, _ = _fake_spark(exists=False)
    c = cat.Catalog(fake, str(tmp_path))
    assert c.iceberg
    c.write(_FakeDF(log), "pages", partition_by=["lang"])
    assert log[0] == ("writeTo", "pages")
    assert log[1][0] == "partitionedBy" and log[1][1] == "pages"
    assert "lang" in log[1][2][0]
    assert log[2] == ("createOrReplace", "pages")


def test_iceberg_write_unpartitioned_and_append(spark, iceberg_on, tmp_path):
    log = []
    fake, _ = _fake_spark(exists=True)
    c = cat.Catalog(fake, str(tmp_path))
    c.write(_FakeDF(log), "docs")
    assert log == [("writeTo", "docs"), ("createOrReplace", "docs")]
    log.clear()
    # append to an existing table routes writeTo(...).append()
    c.write(_FakeDF(log), "docs", mode="append")
    assert log == [("writeTo", "docs"), ("append", "docs")]
    log.clear()
    # append when the table does NOT exist falls through to create
    fake2, _ = _fake_spark(exists=False)
    c2 = cat.Catalog(fake2, str(tmp_path))
    c2.write(_FakeDF(log), "docs", mode="append")
    assert log == [("writeTo", "docs"), ("createOrReplace", "docs")]


def test_iceberg_read_and_exists(iceberg_on, tmp_path):
    fake, reads = _fake_spark(exists=True)
    c = cat.Catalog(fake, str(tmp_path))
    assert c.read("docs") == "TABLE:docs"
    assert reads == ["docs"]
    assert c.exists("docs") is True


def test_parquet_fallback_unchanged(spark, tmp_path):
    """Without jars the same API lands in partitioned parquet + meta
    sidecar (the shape every other module consumes)."""
    import os

    from pyspark.sql import functions as F

    c = cat.Catalog(spark, str(tmp_path))
    assert not c.iceberg
    df = spark.range(10).withColumn("lang", F.lit("en"))
    c.write(df, "t", partition_by=["lang"])
    assert c.exists("t")
    assert os.path.exists(os.path.join(str(tmp_path), "t",
                                       "_table_meta.json"))
    got = c.read("t")
    assert got.count() == 10
