"""Independent brute-force BM25 oracle — pure pandas/python, sharing NO
code with the engine (SURVEY.md section 5.3). Deliberately naive."""

from __future__ import annotations

import math
from collections import Counter


def brute_force_topk(
    docs: list[tuple[int, str]],
    qterms: list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    analyzer=None,
    mode: str = "and",
    msm: int = 1,
    static_boosts: dict | None = None,
) -> list[tuple[int, float]]:
    """BM25 top-k over (doc_id, text) pairs. mode="and" requires every
    query term in the doc (reference semantics); mode="or" scores any
    doc containing at least one term, over the terms it contains.

    msm (mode="or"): require at least `msm` query terms present.
    static_boosts: {doc_id: additive boost} applied to every result.

    analyzer: callable text -> token list. Defaults to str.split (the
    synthetic corpus is space-separated lowercase words).
    """
    analyzer = analyzer or (lambda t: t.split())
    qterms = list(dict.fromkeys(qterms))
    toks = {did: analyzer(text) for did, text in docs}
    toks = {d: t for d, t in toks.items() if t}
    n = len(toks)
    if n == 0 or not qterms:
        return []
    avgdl = sum(len(t) for t in toks.values()) / n
    dfs = Counter()
    tf_by_doc = {}
    for did, t in toks.items():
        c = Counter(t)
        tf_by_doc[did] = c
        for term in c:
            dfs[term] += 1
    results = []
    for did, c in tf_by_doc.items():
        present = [t for t in qterms if t in c]
        if mode == "and" and len(present) != len(qterms):
            continue
        if not present or len(present) < msm:
            continue
        dl = len(toks[did])
        score = 0.0
        for t in present:
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            tf = c[t]
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        if static_boosts is not None:
            score += static_boosts.get(did, 0.0)
        results.append((did, score))
    results.sort(key=lambda r: (-r[1], r[0]))
    return results[:k]
