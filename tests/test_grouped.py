"""Grouped boolean queries (parse_grouped_query semantics):
'(a|b) c -d' = docs with (a OR b) AND c, minus docs with d, scored as
the BM25 sum over all distinct matched query terms.

Ground truth is an independent pandas ranker sharing no code with the
engine. All three engine paths must agree: exhaustive plan
(bm25_exhaustive_grouped), local serving
(LocalSearcher.search_grouped), distributed
(IndexReader.search_grouped).
"""

import math
from collections import Counter

import pytest

from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.index_query import IndexReader
from search_engine_spark.plans.scoring import (
    bm25_exhaustive_grouped,
    parse_grouped_query,
)
from search_engine_spark.plans.wand import LocalSearcher

from search_engine_spark import B, K1

QUERIES = [
    "spark|window join",
    "the fast|slow",
    "spark|flink join",          # flink unknown: group satisfiable via spark
    "the -join fast|scan",       # NOT + group
    "spark|join spark",          # term repeated across clauses
    "window",                    # degenerate: plain single term
    "qqq|zzz join",              # fully-unknown group -> empty
    "spark^2 join^0.5",          # boosted AND
    "the^0 fast|scan^3 -join",   # zero boost + boosted alternative
]


@pytest.fixture(scope="module")
def index_dir(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_grp"))
    build_index(spark, documents, d, n_buckets=4, segment_size=64,
                stem=False, salt_threshold=100, max_salts=4)
    return d


def _brute(documents_pdf, qtext, k=400):
    groups, exclude, boosts = parse_grouped_query(qtext, stem=False)
    toks = {int(r.doc_id): r.text.split()
            for r in documents_pdf.itertuples()}
    tf = {d: Counter(ts) for d, ts in toks.items()}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    groups = [[t for t in g if df[t]] for g in groups]
    if not groups or any(not g for g in groups):
        return []
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    terms = list(dict.fromkeys(t for g in groups for t in g))

    def idf(t):
        return math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))

    out = []
    for d, c in tf.items():
        if any(all(not c[t] for t in g) for g in groups):
            continue
        if any(c[t] for t in exclude):
            continue
        dl = len(toks[d])
        s = sum(
            boosts.get(t, 1.0) * idf(t) * (c[t] * (K1 + 1.0))
            / (c[t] + K1 * (1.0 - B + B * dl / avgdl))
            for t in terms if c[t]
        )
        out.append((-s, d))
    out.sort()
    return [(d, -ns) for ns, d in out[:k]]


def _close(a, b):
    assert [d for d, _ in a] == [d for d, _ in b]
    for (_, x), (_, y) in zip(a, b):
        assert x == pytest.approx(y, abs=1e-9)


@pytest.mark.parametrize("qtext", QUERIES)
def test_all_paths_match_bruteforce(spark, documents, documents_pdf,
                                    index_dir, qtext):
    want = _brute(documents_pdf, qtext, k=50)
    qpos = " ".join(t for t in qtext.split() if not t.startswith("-"))
    qneg = " ".join(t[1:] for t in qtext.split() if t.startswith("-"))
    groups, _, boosts = parse_grouped_query(qpos, stem=False)
    exclude = qneg.split() or None

    from search_engine_spark.operators.aggregates import (
        doc_lengths,
        split_terms,
        term_frequencies,
    )
    tf = term_frequencies(split_terms(documents))
    post = tf.join(doc_lengths(tf), "doc_id").select(
        "term", "doc_id", "tf", "doclen"
    )
    exh = [
        (r.doc_id, r.score)
        for r in bm25_exhaustive_grouped(
            spark, post, groups, k=50, exclude=exclude, boosts=boosts
        ).collect()
    ]
    _close(exh, want)

    local = LocalSearcher(index_dir).search_grouped(
        qpos, k=50, stem=False, exclude=exclude
    )
    _close(local, want)

    dist = [
        (r.doc_id, r.score)
        for r in IndexReader(spark, index_dir)
        .search_grouped(qpos, k=50, stem=False, exclude=exclude)
        .collect()
    ]
    _close(dist, want)


def test_parser():
    g, e, b = parse_grouped_query("spark|flink join -slow -bad", stem=False)
    assert g == [["spark", "flink"], ["join"]]
    assert e == ["slow", "bad"]
    assert b == {"spark": 1.0, "flink": 1.0, "join": 1.0}
    g, e, b = parse_grouped_query("a|b a", stem=False)  # cross-group repeat
    assert g == [["a", "b"], ["a"]]
    g, e, b = parse_grouped_query("a|b a|b", stem=False)  # identical groups
    assert g == [["a", "b"]]
    g, e, b = parse_grouped_query("... -", stem=False)
    assert g == [] and e == []


def test_parser_boosts():
    g, e, b = parse_grouped_query("spark^2 a|b^0.5 -slow^9", stem=False)
    assert g == [["spark"], ["a", "b"]]
    assert e == ["slow"]  # boost on a NOT-term is ignored
    assert b == {"spark": 2.0, "a": 1.0, "b": 0.5}
    g, e, b = parse_grouped_query("a^1 a^7", stem=False)  # first boost wins
    assert b == {"a": 1.0}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_grouped_query("a^-1", stem=False)
    with _pytest.raises(ValueError):
        parse_grouped_query("a^x", stem=False)


def test_grouped_inline_not_syntax(index_dir):
    """search_grouped(str) parses '-term' itself when no explicit
    exclude is given."""
    s = LocalSearcher(index_dir)
    a = s.search_grouped("the fast|scan -join", k=20, stem=False)
    b = s.search_grouped("the fast|scan", k=20, stem=False,
                         exclude=["join"])
    assert a == b


def test_batch_mixed_grouped(spark, index_dir, documents_pdf):
    """ONE search_batch job answering plain, grouped, boosted, and
    NOT-carrying queries — each must equal the brute-force ranking."""
    queries = {
        "plain": "spark join",
        "grp": "spark|window join",
        "boost": "spark^2 join^0.5",
        "notq": "the fast|scan -join",
        "dead": "qqq|zzz join",
    }
    rows = (
        IndexReader(spark, index_dir)
        .search_batch(queries, k=20, stem=False)
        .collect()
    )
    got: dict[str, list] = {qid: [] for qid in queries}
    for row in sorted(rows, key=lambda x: (x.query_id, x.rank)):
        got[row.query_id].append((row.doc_id, row.score))
    for qid, q in queries.items():
        _close(got[qid], _brute(documents_pdf, q, k=20))


def test_randomized_queries_vs_bruteforce(index_dir, documents_pdf):
    """Fuzz the whole query language: 40 random queries (1-3 groups of
    1-3 terms, random boosts incl. 0 and fractions, unknown terms
    mixed in, 0-2 NOT-terms) — local serving must equal the
    brute-force ranker on every one."""
    import random

    rng = random.Random(1234)
    vocab = sorted({t for text in documents_pdf["text"][:200]
                    for t in text.split()})
    s = LocalSearcher(index_dir)
    n_nonempty = 0
    for _ in range(40):
        clauses = []
        for _ in range(rng.randint(1, 3)):
            alts = []
            for _ in range(rng.randint(1, 3)):
                t = (rng.choice(vocab) if rng.random() < 0.9
                     else f"zzz{rng.randint(0, 9)}")
                boost = rng.choice(["", "", "", "^2", "^0.5", "^0"])
                alts.append(t + boost)
            clauses.append("|".join(dict.fromkeys(alts)))
        for _ in range(rng.randint(0, 2)):
            clauses.append("-" + rng.choice(vocab))
        qtext = " ".join(clauses)
        want = _brute(documents_pdf, qtext, k=30)
        qpos = " ".join(c for c in clauses if not c.startswith("-"))
        excl = [c[1:] for c in clauses if c.startswith("-")] or None
        got = s.search_grouped(qpos, k=30, stem=False, exclude=excl)
        _close(got, want)
        n_nonempty += bool(want)
    assert n_nonempty >= 10  # the fuzz must actually exercise matches


def test_grouped_blockmax_bitidentical_to_exhaustive(index_dir):
    """Round-3 property: the cold group-level block-max path, the
    exhaustive vectorized path (prune=False), and the warm path must
    return BIT-identical (doc, score) lists — the fixed term-order
    contract makes float additions commute across paths."""
    import random

    rng = random.Random(99)
    s_cold = LocalSearcher(index_dir)
    s_ref = LocalSearcher(index_dir)
    qs = QUERIES + [
        "the|fast the|scan",
        "the^0.25 spark|window|join -slow",
        "fast|the join|the",
    ]
    for _ in range(10):
        qs.append(" ".join(
            "|".join(rng.choice(["the", "fast", "spark", "join", "scan",
                                 "window", "slow"])
                     + rng.choice(["", "^2", "^0.5"])
                     for _ in range(rng.randint(1, 3)))
            for _ in range(rng.randint(1, 3))
        ))
    for q in qs:
        ref = s_ref.search_grouped(q, k=25, stem=False, prune=False)
        cold = LocalSearcher(index_dir).search_grouped(q, k=25, stem=False)
        assert cold == ref, ("cold", q)
        # warm: repeat on a live searcher until promotion routes the
        # vectorized path, results must stay bit-equal throughout
        for _ in range(3):
            wm = s_cold.search_grouped(q, k=25, stem=False)
            assert wm == ref, ("warm", q)
    # the pruned path must actually skip segments on a pruning-friendly
    # query (hot term bounded by a rare driving group)
    LocalSearcher(index_dir).search_grouped("spark|join the", k=5,
                                            stem=False)


def test_grouped_pagination(index_dir):
    s = LocalSearcher(index_dir)
    full = s.search_grouped("the fast|slow", k=600, stem=False)
    pages, after = [], None
    while True:
        h = s.search_grouped("the fast|slow", k=7, stem=False, after=after)
        if not h:
            break
        pages.extend(h)
        after = h[-1]
    assert pages == full
