"""SparkSession factory tuned for this engine.

Local-mode testing uses local[N]; the cluster launch path is
``spark-submit --py-files engine.zip build_index.py`` (BASELINE.json
north_rule) where master/executors come from the cluster manager and
these confs still apply.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "search_engine_spark", *, cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batches so Python workers stay memory-safe on
        # hot-term groups (SURVEY.md section 4, spill row)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # smaller split target than the 128m default: the corpus files
        # are few locally and the tokenize stage is CPU-bound Python —
        # splits must outnumber cores or the UDF stage under-parallelizes
        # (cluster deployments with many input files can raise this)
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_SPLIT_BYTES", "33554432"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cores}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
