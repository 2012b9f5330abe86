"""Link-graph operators (operators/graph.py): PageRank properties,
synthetic-graph shape, boost derivation, synonym expansion."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.graph import (
    pagerank, pagerank_boosts, synthetic_link_graph,
)
from search_engine_spark.plans.scoring import expand_synonyms


@pytest.fixture(scope="module")
def graph(spark, documents):
    n = documents.count()
    edges = synthetic_link_graph(documents, n_docs=n)
    edges.cache().count()
    return n, documents.select("doc_id"), edges


def test_graph_is_irregular(graph):
    """The quadratic dst hash must give a skewed in-degree profile —
    an affine map would make every in-degree identical and PageRank
    flat (a test-blind fixture)."""
    _, _, edges = graph
    degs = {
        r.indeg
        for r in edges.groupBy("dst")
        .agg(F.count("*").alias("indeg")).collect()
    }
    assert len(degs) >= 3


def test_graph_no_self_links(graph):
    _, _, edges = graph
    assert edges.filter(F.col("dst") == F.col("src")).count() == 0


def test_pagerank_is_a_distribution(spark, graph):
    n, nodes, edges = graph
    pr = pagerank(nodes, edges, n_docs=n, iters=5)
    rows = pr.collect()
    assert len(rows) == n
    total = sum(r["rank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-9)
    assert all(r["rank"] > 0 for r in rows)
    # irregular graph -> non-uniform ranks
    assert max(r["rank"] for r in rows) > 1.5 * min(r["rank"] for r in rows)


def test_pagerank_checkpoint_invariant(spark, graph):
    """localCheckpoint is a lineage cut, never a value change."""
    n, nodes, edges = graph
    a = {r["doc_id"]: r["rank"]
         for r in pagerank(nodes, edges, n_docs=n, iters=3).collect()}
    b = {r["doc_id"]: r["rank"]
         for r in pagerank(nodes, edges, n_docs=n, iters=3,
                           checkpoint=False).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-12)


def test_pagerank_dangling_mass(spark):
    """A node with no out-links redistributes its mass uniformly —
    sum(rank) stays 1 and the dangling node itself keeps a rank."""
    nodes = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    # 3 is dangling; 0 <-> 1, 1 -> 2, 2 -> 3
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 3)], "src long, dst long"
    )
    rows = pagerank(nodes, edges, n_docs=4, iters=10).collect()
    assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    ranks = {r["doc_id"]: r["rank"] for r in rows}
    assert ranks[3] > 0
    # 1 has two in-links (from 0's only edge and 2? no: in-links of 1 =
    # {0}); 3 receives all of 2's rank -> more than the base share
    assert ranks[3] > (1 - 0.85) / 4


def test_pagerank_boosts_nonnegative(spark, graph):
    """Serving requires boosts >= 0 (block-max bound argument) —
    ln(1 + n*rank) with rank >= 0 guarantees it."""
    n, nodes, edges = graph
    pr = pagerank(nodes, edges, n_docs=n, iters=2)
    b = pagerank_boosts(pr, n_docs=n, weight=2.0)
    assert b.filter(F.col("boost") < 0).count() == 0


@pytest.fixture(scope="module")
def crawl(spark):
    """Deduped synthetic crawl + its urlmap (dense doc_ids)."""
    from search_engine_spark.operators.dedup import latest_snapshot
    from search_engine_spark.operators.ids import assign_dense_ids
    from search_engine_spark.sources.pages import generate_pages

    pages = latest_snapshot(
        generate_pages(spark, 300, partitions=4), "url", "warc_ts"
    )
    with_ids = assign_dense_ids(pages, "url").cache()
    with_ids.count()
    return with_ids


def test_extract_link_edges_real_graph(spark, crawl):
    """The REAL pipeline: <a href> targets parsed from html, resolved
    through the urlmap — endpoints in the id space, no self-links,
    dangling hrefs (targets past the crawl) dropped, deterministic."""
    from search_engine_spark.operators.graph import extract_link_edges

    urlmap = crawl.select("url", "doc_id")
    edges = extract_link_edges(crawl, urlmap).cache()
    n_edges = edges.count()
    assert n_edges > 200  # ~3 links/page, some dangling
    n = crawl.count()
    assert edges.filter(
        (F.col("src") < 0) | (F.col("src") >= n)
        | (F.col("dst") < 0) | (F.col("dst") >= n)
    ).count() == 0
    assert edges.filter(F.col("src") == F.col("dst")).count() == 0
    # the generator's link rule: page key k links to keys
    # {k+1, k//2, 2k+1} - {k} (in-corpus targets only)
    url10 = "https://src10.example.com/p/10"
    id_of = {r.url: r.doc_id for r in urlmap.collect()}
    got = sorted(
        r.dst for r in edges.join(
            urlmap.filter(F.col("url") == url10)
            .select(F.col("doc_id").alias("src")), "src",
        ).collect()
    )
    want = sorted(
        id_of[f"https://src{t % 20}.example.com/p/{t}"]
        for t in (11, 5, 21)
        if f"https://src{t % 20}.example.com/p/{t}" in id_of
    )
    assert got == want
    # pagerank over the real graph is a proper distribution
    from search_engine_spark.operators.graph import pagerank

    pr = pagerank(crawl.select("doc_id"), edges, n_docs=n, iters=3)
    total = pr.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)
    edges.unpersist()


def test_extract_link_edges_plan_is_jvm(spark, crawl):
    """The href parse must stay whole-stage codegen — a Python eval
    node here would put a UDF on the 10^12-row ingest path."""
    import io
    from contextlib import redirect_stdout

    from search_engine_spark.operators.graph import extract_link_edges

    edges = extract_link_edges(crawl, crawl.select("url", "doc_id"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        edges.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_pagerank_plan_has_no_cartesian(spark, graph):
    """Plan gate on the UN-checkpointed lineage (checkpoint=False —
    the eager localCheckpoint otherwise truncates what explain can
    see): each iteration must be keyed joins + aggregates; the only
    nested-loop join is the broadcast 1-row dangling-mass singleton,
    and nothing funnels through a CartesianProduct."""
    import io
    from contextlib import redirect_stdout

    n, nodes, edges = graph
    pr = pagerank(nodes, edges, n_docs=n, iters=2, checkpoint=False)
    buf = io.StringIO()
    with redirect_stdout(buf):
        pr.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row dangling sum
    assert "HashAggregate" in plan


def test_expand_synonyms_basic():
    got = expand_synonyms([["spark"], ["join"]], {"join": ["merge"]},
                          stem=False)
    assert got == [["spark"], ["join", "merge"]]


def test_expand_synonyms_stems_both_sides():
    # 'running' stems to 'run' on both the key and the alternative
    got = expand_synonyms([["run"]], {"running": ["sprinting"]}, stem=True)
    assert got == [["run", "sprint"]]


def test_expand_synonyms_no_duplicates():
    got = expand_synonyms([["join", "merge"]], {"join": ["merge"]},
                          stem=False)
    assert got == [["join", "merge"]]


def test_expand_synonyms_multiword_key_rejected():
    with pytest.raises(ValueError, match="exactly one term"):
        expand_synonyms([["a"]], {"two words": ["x"]}, stem=False)
