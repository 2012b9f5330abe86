"""Link-graph operators: PageRank and static-score derivation.

A web-scale search engine ranks with more than text statistics: the
link graph supplies a query-independent document prior (PageRank,
Brin & Page 1998) that serving blends into BM25. This module gives
the engine that leg:

``synthetic_link_graph`` derives a deterministic, irregular edge set
from the documents table itself (the sandbox corpus has no real
hyperlinks) — same integer arithmetic on the Spark and DuckDB sides,
so PageRank over it is value-oracle-checkable. Real deployments
replace this one function with an extracted <a href> edge table; the
PageRank and boost plumbing below is payload-agnostic.

``pagerank`` is the textbook damped iteration with dangling-mass
redistribution, shaped for Spark's execution model:

  * each iteration is two keyed shuffles (edges ⋈ ranks on src,
    then groupBy dst) — the canonical distributed PageRank plan;
  * the dangling-node mass is a 1-row aggregate broadcast back in
    (crossJoin with a broadcast singleton, NOT a driver collect —
    the iteration stays a single lazy plan);
  * every iteration ends in an eager ``localCheckpoint`` — five
    chained shuffles otherwise build a lineage whose re-evaluation
    (and optimizer planning time) grows per round; checkpointing is
    the standard Spark idiom for iterative graph algorithms
    (GraphX does the same internally).

At 10^12 docs: ranks/edges partition by id; per-iteration cost is
|E| shuffle + |V| agg, no driver materialization, no cross joins
(the only crossJoin is against a broadcast 1-row dangling sum).

``pagerank_boosts`` turns ranks into the bounded additive static
boost the serving path consumes (plans/wand.LocalSearcher
static_boosts): boost = weight * ln(1 + n * rank), which is 0 for a
rank-less doc and grows logarithmically — the shape Lucene's
FeatureField / elastic's rank_feature use for static signals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# edge-derivation constants (shared with the DuckDB oracle SQL —
# change in lockstep): out-degree 1 + doc_id % 3, dst by a quadratic
# hash so in-degree is irregular (an affine map would give every node
# identical in-degree and a flat, test-blind PageRank).
EDGE_SALT = 7919
EDGE_OFFSET = 13
DAMPING = 0.85


def synthetic_link_graph(docs: DataFrame, *, n_docs: int | None = None,
                         id_col: str = "doc_id") -> DataFrame:
    """Deterministic (src, dst) edge multiset over the documents table.

    src = doc_id; for j in 1..(1 + doc_id % 3):
    dst = (doc_id^2 + j*7919 + 13) % n_docs, self-links dropped.
    Duplicate (src, dst) pairs are KEPT (multiset semantics — a page
    linking twice contributes twice), matching the oracle exactly.

    n_docs may be passed to avoid a count() job when the caller
    already knows it; ids must be dense 0..n-1 (the engine's doc_id
    allocation invariant)."""
    n = int(n_docs) if n_docs is not None else docs.count()
    s = F.col("src")
    dst = (s * s + F.col("j") * F.lit(EDGE_SALT) + F.lit(EDGE_OFFSET)) % F.lit(n)
    return (
        docs.select(F.col(id_col).cast("long").alias("src"))
        .withColumn(
            "j",
            F.explode(F.sequence(F.lit(1), (F.lit(1) + s % 3).cast("int"))),
        )
        .select("src", dst.alias("dst"))
        .filter(F.col("dst") != F.col("src"))
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    n_docs: int | None = None,
    iters: int = 5,
    damping: float = DAMPING,
    id_col: str = "doc_id",
    checkpoint: bool = True,
) -> DataFrame:
    """Damped PageRank with dangling-mass redistribution.

    nodes: one row per document (``id_col``); edges: (src, dst)
    multiset. Returns (doc_id, rank) over ALL nodes; sum(rank) == 1
    up to float error every iteration.

      rank'(v) = (1-d)/n + d * (sum over in-edges u->v of
                 rank(u)/deg(u)  +  dangling_mass/n)

    checkpoint=False keeps the full lazy plan (used by tests that
    assert plan shape); the default eagerly truncates lineage per
    iteration — see module docstring."""
    n = int(n_docs) if n_docs is not None else nodes.count()
    if n == 0:
        return nodes.select(F.col(id_col).alias("doc_id"),
                            F.lit(0.0).alias("rank"))
    nodes = nodes.select(F.col(id_col).alias("doc_id"))
    deg = edges.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    out_nodes = deg.select(F.col("src").alias("doc_id"))
    ranks = nodes.select("doc_id", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iters):
        # dangling mass: 1-row aggregate, broadcast back in — no collect
        dang = (
            ranks.join(out_nodes, "doc_id", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        insum = (
            edges.join(deg, "src")
            .join(ranks.withColumnRenamed("doc_id", "src"), "src")
            .select(F.col("dst").alias("doc_id"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("doc_id")
            .agg(F.sum("c").alias("insum"))
        )
        ranks = (
            nodes.join(insum, "doc_id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "doc_id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("insum"), F.lit(0.0))
                       + F.col("_dang") / F.lit(float(n)))
                ).alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def extract_link_edges(pages: DataFrame, urlmap: DataFrame) -> DataFrame:
    """REAL link-graph extraction: parse ``<a href="...">`` targets out
    of the pages table's html and resolve both endpoints to doc_ids
    through the urlmap — (src, dst) edge multiset, self-links dropped,
    hrefs pointing outside the crawl (no urlmap row) dropped.

    Pure JVM end to end: `regexp_extract_all` over the decoded html
    (whole-stage codegen — no Python crosses the per-row path), then
    two url-keyed equi-joins against the urlmap. At 10^12 docs the
    joins shuffle on url — the same key the urlmap is already laid out
    by — and the href fan-out is bounded by per-page link counts.

    Callers pass the DEDUPED snapshot (operators.dedup.latest_snapshot)
    so a re-crawled url contributes its edges once, mirroring the
    build path's ingest semantics."""
    hrefs = pages.select(
        F.col("url").alias("src_url"),
        F.explode(
            F.regexp_extract_all(
                F.col("html").cast("string"),
                F.lit(r'<a href="([^"]+)"'),
                F.lit(1),
            )
        ).alias("dst_url"),
    )
    src = urlmap.select(F.col("url").alias("src_url"),
                        F.col("doc_id").alias("src"))
    dst = urlmap.select(F.col("url").alias("dst_url"),
                        F.col("doc_id").alias("dst"))
    return (
        hrefs.join(src, "src_url")
        .join(dst, "dst_url")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )


ANCHOR_RE = r'<a href="([^"]*)"[^>]*>([^<]+)</a>'


def extract_anchor_texts(
    pages: DataFrame,
    urlmap: DataFrame,
    *,
    max_anchors_per_doc: int = 1024,
) -> DataFrame:
    """Inbound-ANCHOR-TEXT pseudo-documents: for every crawled page,
    gather the display text of the ``<a href>`` links pointing AT it —
    the classic third ranking field of web search (body, title,
    anchor; Brin & Page 1998 §2.2, BM25F's canonical field set).
    Anchor text describes the TARGET better than the target's own
    words ('click here for the Spark join guide' indexes the guide).

    Returns (doc_id, text): doc_id is the link TARGET's id from the
    urlmap, text the concatenation of its inbound anchors in
    deterministic ((source url, link slot)) order — an ordinary
    (doc_id, text) source that plans/build_index indexes unchanged
    under ``fields/anchor``.

    Spark shape, 100 TB-safe:
      * (href, anchor) pairs come from TWO ``regexp_extract_all``
        calls over the same pattern (group 1 / group 2 — equal-length
        arrays by construction) zipped and exploded: whole-stage
        codegen, no Python on the per-row path;
      * target resolution is ONE url-keyed equi-join vs the urlmap
        (hrefs leaving the crawl drop out);
      * a celebrity page's unbounded inbound mass is CAPPED at
        ``max_anchors_per_doc`` by a per-target ranking window over
        (src_url, slot) BEFORE the string aggregation, so no
        aggregation group exceeds cap * anchor_len bytes (the window
        shuffles on the same dst key the groupBy needs anyway);
      * the final per-target order is pinned by sort_array over
        (src_url, slot, anchor) structs — deterministic under any
        partitioning.

    Callers pass the DEDUPED snapshot (operators.dedup.latest_snapshot)
    — a re-crawled url contributes its anchors once."""
    from pyspark.sql import Window

    pairs = pages.select(
        F.col("url").alias("src_url"),
        F.posexplode(
            F.arrays_zip(
                F.regexp_extract_all(
                    F.col("html").cast("string"), F.lit(ANCHOR_RE), F.lit(1)
                ).alias("href"),
                F.regexp_extract_all(
                    F.col("html").cast("string"), F.lit(ANCHOR_RE), F.lit(2)
                ).alias("anchor"),
            )
        ).alias("slot", "z"),
    ).select(
        "src_url", "slot",
        F.col("z.href").alias("dst_url"),
        F.trim(F.col("z.anchor")).alias("anchor"),
    ).filter(F.col("anchor") != "")
    dst = urlmap.select(F.col("url").alias("dst_url"),
                        F.col("doc_id").alias("doc_id"))
    resolved = pairs.join(dst, "dst_url").select(
        "doc_id", "src_url", "slot", "anchor"
    )
    w = Window.partitionBy("doc_id").orderBy("src_url", "slot")
    capped = (
        resolved.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_anchors_per_doc)
    )
    return (
        capped.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("src_url", "slot", "anchor")
                        )
                    ),
                    lambda s: s.anchor,
                ),
            ).alias("text")
        )
    )


def pagerank_boosts(ranks: DataFrame, *, n_docs: int,
                    weight: float = 2.0) -> DataFrame:
    """(doc_id, boost) static-boost table from PageRank output:
    boost = weight * ln(1 + n * rank). n*rank is ~1 for an average
    page, so an average boost is ~weight*ln(2); a rank-less doc_id
    (absent row) is an implicit 0.0 on the serving side."""
    return ranks.select(
        "doc_id",
        (F.lit(float(weight))
         * F.log(F.lit(1.0) + F.lit(float(n_docs)) * F.col("rank"))
         ).alias("boost"),
    )
