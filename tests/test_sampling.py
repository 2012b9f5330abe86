"""operators/sampling: mixture weights + sequence packing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.sampling import (
    domain_mixture,
    sequence_packing,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c", "en", "web"),
        (1, "", "en", "web"),              # empty doc: 0 tokens
        (2, "d e", "en", "books"),
        (3, "f g h i j k", "de", "web"),
        (4, "l", "de", "web"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    )


def test_domain_mixture_weights_sum_to_one(spark, docs):
    out = {(r.lang, r.source): r for r in domain_mixture(docs).collect()}
    assert set(out) == {("en", "web"), ("en", "books"), ("de", "web")}
    assert sum(r.n_docs for r in out.values()) == 5
    assert sum(r.weight for r in out.values()) == pytest.approx(1.0, abs=1e-5)
    assert sum(r.share for r in out.values()) == pytest.approx(1.0, abs=1e-5)
    # T<1 flattens: the minority group's weight exceeds its share
    assert out[("en", "books")].weight > out[("en", "books")].share
    assert out[("en", "web")].weight < out[("en", "web")].share


def test_sequence_packing_deterministic_chunks(spark, docs):
    out = sorted(
        sequence_packing(docs, budget=4).collect(), key=lambda r: r.doc_id
    )
    # token counts: 3, 0, 2, 6, 1 -> exclusive prefix 0, 3, 3, 5, 11
    assert [r.n_tokens for r in out] == [3, 0, 2, 6, 1]
    assert [r.pack_id for r in out] == [0, 0, 0, 1, 2]
    # pack_pos is dense per pack in id order
    assert [r.pack_pos for r in out] == [1, 2, 3, 1, 1]
    # every token is budgeted exactly once: max pack == total // budget
    total = sum(r.n_tokens for r in out)
    assert max(r.pack_id for r in out) == (total - 1) // 4


def test_sequence_packing_matches_pandas_reference(spark, documents):
    got = sorted(
        sequence_packing(documents, budget=64).collect(),
        key=lambda r: r.doc_id,
    )
    pdf = documents.select("doc_id", "text").toPandas().sort_values("doc_id")
    start = 0
    for r, (_, row) in zip(got, pdf.iterrows()):
        n = len([t for t in row.text.split(" ") if t])
        assert r.n_tokens == n, r.doc_id
        assert r.pack_id == start // 64, r.doc_id
        start += n


@pytest.mark.parametrize("shards", [1, 3, 7])
def test_sequence_packing_shard_invariant(spark, docs, shards):
    """The sharded two-pass prefix sum assigns the SAME packs no
    matter where the range partitioner cuts the shards (including the
    degenerate 1-shard case == the old global window)."""
    out = sorted(
        sequence_packing(docs, budget=4, num_partitions=shards).collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.pack_id for r in out] == [0, 0, 0, 1, 2]
    assert [r.pack_pos for r in out] == [1, 2, 3, 1, 1]


def test_sequence_packing_no_single_partition_exchange(spark, documents):
    """Scale gate (round-3 verdict #3): the packing plan must not
    serialize the corpus through one task — no SinglePartition
    exchange may feed the cumsum (the pack_pos window partitions by
    pack_id, which is many bounded groups)."""
    plan = sequence_packing(documents, budget=64)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SinglePartition" not in plan, plan
