"""Physical-plan audit for the headline queries.

Prints `explain("formatted")` extracts for each headline entry at
$SPARK_GRAFT_SF_DIR (default sf0.01) and checks the plan properties
that matter at 100 TB:

- parquet scans carry PushedFilters / a pruned ReadSchema (no
  read-everything scans under a narrow projection);
- dimension joins are BroadcastHashJoin (no shuffle for small sides);
- expression work sits inside WholeStageCodegen spans;
- no CartesianProduct except the explicitly-quadratic exact baselines
  (ann_cosine_topk's 1-row broadcast crossjoin is allowed: it is a
  BroadcastNestedLoopJoin against a single query vector).

Usage: python tools/explain_audit.py [sf_dir] [query ...]
Exit code 1 if any REQUIRED property is missing.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# query -> (must-contain substrings, must-NOT-contain substrings)
CHECKS: dict[str, tuple[list[str], list[str]]] = {
    "pricing_summary": (["PushedFilters: [IsNotNull(l_shipdate)",
                         "codegen id"], ["CartesianProduct"]),
    "revenue_by_nation": (["BroadcastHashJoin", "codegen id"],
                          ["CartesianProduct", "SortMergeJoin"]),
    "shipping_priority": (["BroadcastHashJoin",
                           "PushedFilters: [IsNotNull(c_mktsegment)"],
                          ["CartesianProduct"]),
    "local_supplier_volume": (["BroadcastHashJoin"], ["CartesianProduct"]),
    "orders_with_late_ship": (["LeftSemi"], ["CartesianProduct"]),
    "term_frequency": (["codegen id"], []),
    "top_customers_per_nation": (["Window", "codegen id"], []),
    "dedup_exact_text": (["HashAggregate"], ["CartesianProduct"]),
    "minhash_lsh_pairs": (["ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin"],
                          ["CartesianProduct"]),
    # phrase/ngram scans must stay single-stage: pruned 2-column read,
    # no shuffle, no Python boundary (pure JVM higher-order functions)
    "phrase_match_counts": (["ReadSchema: struct<doc_id:bigint,text:string>"],
                            ["Exchange", "Python", "CartesianProduct"]),
    "dup_ngram_quality": (["ReadSchema: struct<doc_id:bigint,text:string>"],
                          ["Exchange", "Python", "CartesianProduct"]),
    # NOT-query exclusion must be an anti-join, never a cross/theta join
    "bm25_not_query": (["LeftAnti", "BroadcastHashJoin"],
                       ["CartesianProduct"]),
    # facet join rides the doc_id key; query-term fan-out is broadcast
    "bm25_facet_counts": (["BroadcastHashJoin", "HashAggregate"],
                          ["CartesianProduct"]),
    # decontamination shingle join is a keyed equi-join, never all-pairs
    "split_contamination": (["HashAggregate"],
                            ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # SymSpell deletion join: probes broadcast against the variant
    # table; candidate generation is an equi-join, never a vocab scan
    # paired with the probe set
    "symspell_suggest": (["BroadcastHashJoin"], ["CartesianProduct"]),
    # MLT: term selection and the OR query both broadcast the tiny
    # side (the 1-row stats crossjoin is a BroadcastNestedLoopJoin)
    "more_like_this": (["BroadcastHashJoin"], ["CartesianProduct"]),
    # grouped boolean: conjunction is a semi-join on doc_id, query
    # side broadcast
    "bm25_grouped_query": (["LeftSemi", "BroadcastHashJoin"],
                           ["CartesianProduct"]),
    # URL canonicalization is pure JVM regexp — no Python anywhere
    "url_canonical_dedup": (["HashAggregate", "codegen id"],
                            ["Python", "CartesianProduct"]),
    # unigram LM: per-token logprob aggregation, keyed joins only
    "unigram_lm_quality": (["HashAggregate"], ["CartesianProduct"]),
    # round 3: site collapse = keyed join + per-key window, never
    # all-pairs; the scored side joins documents on doc_id. ('Python'
    # is not forbidden: the 2-row query-term local relation shows as
    # applySchemaToPythonRDD — a driver-local literal, not a UDF.)
    "source_collapsed_topk": (["Window", "HashAggregate"],
                              ["CartesianProduct"]),
    # mixture weights: one aggregation + broadcast-sized window
    "domain_mixture": (["HashAggregate", "Window"],
                       ["CartesianProduct", "Python"]),
    # pack assignment: sharded two-pass prefix sum — the cumsum rides
    # a range-partitioned Arrow kernel, the pack_pos window partitions
    # by pack_id (many bounded groups); the corpus must NEVER funnel
    # through a single-partition exchange (round-3 verdict #3)
    "sequence_packing": (["Window", "rangepartitioning"],
                         ["CartesianProduct", "SinglePartition"]),
    # metadata-filtered ANN: the label predicate must reach the scan
    "filtered_ann_topk": (["EqualTo(label,3)", "TakeOrderedAndProject"],
                          ["CartesianProduct", "Python"]),
    # wildcard contains scan: aggregation in codegen, no Python
    "contains_term_stats": (["HashAggregate", "codegen id"], ["Python"]),
    # round 4 — msm: same keyed-join shape as plain OR scoring, the
    # match-count filter rides the existing aggregate
    "bm25_msm_topk": (["HashAggregate", "BroadcastHashJoin"],
                      ["CartesianProduct"]),
    # synonym expansion is a pure query rewrite: the expanded groups
    # keep the grouped plan (semi-join conjunction, broadcast terms)
    "synonym_expanded_topk": (["LeftSemi", "BroadcastHashJoin"],
                              ["CartesianProduct"]),
    # BM25F: per-field tf tables meet in a keyed (term, doc_id) join;
    # the only nested-loop is the broadcast 1-row avgdl constants
    "bm25f_topk": (["HashAggregate", "TakeOrderedAndProject"],
                   ["CartesianProduct"]),
    # static-score blend: boost table joins results on doc_id, ranked
    # by TakeOrderedAndProject (pagerank's iteration plan is gated in
    # tests/test_graph.py on the un-checkpointed lineage — here the
    # localCheckpoint truncation hides it by design)
    "bm25_pagerank_blend": (["TakeOrderedAndProject"],
                            ["CartesianProduct"]),
    # multiplicative time-decay: the decay factor is a pure projection
    # over the scored rows — no extra join. ('Python' not forbidden:
    # the 2-row query-term local relation shows as
    # applySchemaToPythonRDD — a driver-local literal, not a UDF.)
    "recency_boosted_topk": (["TakeOrderedAndProject"],
                             ["CartesianProduct", "BatchEvalPython",
                              "ArrowEvalPython"]),
    # repetition mass: pruned 2-column scan, JVM HOF n-grams, two
    # keyed aggregations
    "top_ngram_mass": (["ReadSchema: struct<doc_id:bigint,text:string>",
                        "HashAggregate"],
                       ["Python", "CartesianProduct"]),
    # round 4 session 2 — PII scrubbing: pure-JVM regexp chain over a
    # pruned 2-column scan, zero shuffle, zero Python
    "pii_redaction": (["ReadSchema: struct<doc_id:bigint,text:string>",
                       "codegen id"],
                      ["Python", "Exchange", "CartesianProduct"]),
    # dedup keep-policy: single groupBy argmax (struct max), keyed
    # joins only — no ranking window over the corpus, no all-pairs
    "dup_cluster_representatives": (["HashAggregate"],
                                    ["CartesianProduct",
                                     "BroadcastNestedLoopJoin"]),
    # site: scoping: the source filter is a semi-join/filter on the
    # scored side, ranked by TakeOrderedAndProject — never a re-scan
    "bm25_site_topk": (["TakeOrderedAndProject", "BroadcastHashJoin"],
                       ["CartesianProduct"]),
    # round 4 session 3 — anchor-text field pipeline: codegen regex
    # explode, url-keyed equi-join resolution, capped window + ordered
    # concat; no Python, no all-pairs (a celebrity page's in-link mass
    # is bounded by the row_number cap BEFORE aggregation)
    "anchor_text_agg": (["HashAggregate", "codegen id"],
                        ["Python", "CartesianProduct",
                         "BroadcastNestedLoopJoin"]),
    # round 4 session 4 — mixed phrase+boolean scoring: sliding-window
    # phrase tf in codegen (sequence+slice+aggregate), NOT as an
    # anti-join, 1-row stat frames broadcast, top-k via
    # TakeOrderedAndProject; no Python anywhere
    "phrase_boolean_topk": (["TakeOrderedAndProject", "LeftAnti",
                             "codegen id"],
                            ["Python", "CartesianProduct"]),
    # round 4 session 5 — ts-window filter: the crawl-day predicate is
    # a pure projection-side filter on the scored rows, ranked by
    # TakeOrderedAndProject; query terms broadcast like every BM25
    # entry. ('Python' not forbidden: the 2-row query-term local
    # relation shows as applySchemaToPythonRDD, a driver-local
    # literal, not a UDF.)
    "bm25_ts_window_topk": (["TakeOrderedAndProject",
                             "BroadcastHashJoin"],
                            ["CartesianProduct"]),
    # regex dictionary scan: aggregation in codegen, no Python (RLike
    # is a JVM expression)
    "regex_term_stats": (["HashAggregate", "codegen id"], ["Python"]),
    # LM-Dirichlet: same keyed-join shape as BM25 scoring — broadcast
    # query terms + per-term cf, 1-row collection total as the only
    # nested-loop, top-k via TakeOrderedAndProject
    "lm_dirichlet_topk": (["TakeOrderedAndProject", "BroadcastHashJoin",
                           "HashAggregate"],
                          ["CartesianProduct"]),
    # fielded clauses: cross-field conjunction is a doc_id equi-join
    # of per-clause match frames, ranked by TakeOrderedAndProject —
    # never all-pairs
    "fielded_topk": (["TakeOrderedAndProject", "BroadcastHashJoin",
                      "HashAggregate"],
                     ["CartesianProduct"]),
    # BPE iteration 0: text-only pruned scan, two hash aggregates
    # (word counts -> pair counts), zero Python on the path
    "bpe_pair_counts": (["ReadSchema: struct<text:string>",
                         "HashAggregate"],
                        ["Exchange hashpartitioning(doc_id",
                         "Python", "CartesianProduct"]),
    # eval metrics: keyed equi-joins + bounded per-query windows only
    "ranking_eval": (["Window", "HashAggregate"],
                     ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # round 5 — hybrid RRF: both ranking windows run over frames
    # already bounded to top-20 (TakeOrderedAndProject), never a
    # partitionless row_number over the whole embeddings table
    # (round-4 verdict item #2); the structural gate below walks the
    # plan tree and rejects any Window without a limit beneath it
    "hybrid_rrf_topk": (["TakeOrderedAndProject"], ["CartesianProduct"]),
}


def _windows_bounded(plan: str) -> list[str]:
    """Structural gate: every Window node in the physical-plan tree
    must have a bounding operator (TakeOrderedAndProject / *Limit) in
    its subtree — i.e. row_number ranking is only ever applied to a
    frame some other operator already reduced. A partitionless window
    straight over a table scan funnels the whole table through one
    task at scale; this parser catches that shape regardless of which
    substrings happen to appear elsewhere in the plan."""
    lines = plan.splitlines()
    try:
        start = next(i for i, ln in enumerate(lines)
                     if ln.startswith("== Physical Plan ==")) + 1
    except StopIteration:
        return ["no physical plan section in formatted explain"]
    tree: list[tuple[int, str]] = []
    for ln in lines[start:]:
        if not ln.strip():
            break  # blank line separates the tree from node details
        body = ln.lstrip(" :+-")
        tree.append((len(ln) - len(body), body))
    probs = []
    for i, (depth, body) in enumerate(tree):
        if not body.lstrip("* ").startswith("Window"):
            continue
        subtree = []
        for d2, b2 in tree[i + 1:]:
            if d2 <= depth:
                break
            subtree.append(b2)
        if not any("TakeOrderedAndProject" in b or "Limit" in b
                   for b in subtree):
            probs.append(f"Window at tree depth {depth} has no "
                         "limit/top-k below it (unbounded window input)")
    return probs


# query -> structural checker run on the formatted plan text in
# addition to the substring CHECKS
STRUCTURAL: dict[str, list] = {
    "hybrid_rrf_topk": [_windows_bounded],
}


def audit(spark, sf_dir: str, only=None, verbose: bool = True) -> list[str]:
    """Run the plan checks; returns the failing query names. AQE is
    toggled off around explain() RENDERING only (it hides the final
    codegen spans) and restored — codegen presence does not depend on
    AQE; production sessions keep AQE on."""
    from search_engine_spark.entry_queries import QUERIES

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    failures = []
    try:
        for name, (need, forbid) in CHECKS.items():
            if only and name not in only:
                continue
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            probs = []
            for frag in need:
                alts = frag.split("|")
                if not any(a in plan for a in alts):
                    probs.append(f"missing {frag!r}")
            for frag in forbid:
                if frag in plan:
                    probs.append(f"forbidden {frag!r} present")
            for checker in STRUCTURAL.get(name, ()):
                probs.extend(checker(plan))
            if verbose:
                status = "ok  " if not probs else "FAIL"
                print(f"{status} {name}: "
                      f"{'; '.join(probs) if probs else 'plan properties hold'}")
            if probs:
                failures.append(name)
                if verbose:
                    print(plan)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    return failures


def main() -> int:
    from search_engine_spark.session import get_spark

    spark = get_spark("explain-audit", cores=8, shuffle_partitions=8)
    failures = audit(spark, SF_DIR, only=set(sys.argv[2:]) or None)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
