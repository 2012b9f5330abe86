"""Mixed phrase + boolean queries: Lucene-style quoted clauses inside
the boolean query language.

Syntax (query.py routes any query containing a double quote here):

    "climate change"^2 policy|law -draft -"minor edit"

* a quoted segment is an exact-phrase CLAUSE: candidate docs must
  contain the phrase (conjunctive, like every other clause), and it
  CONTRIBUTES to the score as a virtual term with tf = phrase tf
  (adjacency count, overlaps included) and df = |docs containing the
  phrase| — BM25's idf * tfnorm with the engine's k1/b, times an
  optional ^boost (Lucene PhraseQuery's scoring model);
* -"..." is a NOT-phrase: docs containing the phrase are suppressed,
  survivors' scores unaffected (the NOT-term contract, extended to
  phrases);
* a single-token quoted segment degrades to a plain term clause with
  its boost (Lucene's behavior — there is no 1-gram phrase);
* the unquoted remainder keeps the full existing grammar (OR-groups,
  ^boosts, NOT-terms, synonym expansion) with unchanged semantics.

Evaluation — exact, no approximation:

1. each positive phrase's FULL match list (doc_id, phrase_tf) comes
   from the positional machinery (PhraseSearcher.phrase_counts —
   which routes covered 2-token phrases through the bigram
   acceleration table when present, see plans/bigrams.py);
2. the phrase doc-set intersection is handed to the boolean engine as
   a `restrict` allow-list and NOT-phrase docs as `exclude_docs` —
   both removal-only, so the engine's block-max pruning stays exact;
3. the boolean engine scores every surviving candidate (inner k
   bounded by the allow-list size — phrase clauses are selective by
   construction: the allow-list is never larger than the rarest
   phrase's match list), phrase contributions are added on top, and
   the final (score desc, doc_id asc) top-k honors the standard
   `after` pagination cursor.

Document lengths for the phrase tfnorm come from the BODY postings of
the phrase's rarest token (every phrase match contains every phrase
token, so the lookup always hits); phrase df counts live (tombstone-
masked) matches — unlike term df, which is frozen until compaction,
a phrase's df is inherently computed at query time.

At cluster scale the same plan holds: phrase lists are partition-
pruned positional/bigram scans, the allow-list is a broadcast
semi-join against them, and scoring stays on the postings scan.
"""

from __future__ import annotations

import math
import re

import numpy as np

from search_engine_spark.functions.codec import decode_postings, decode_varints
from search_engine_spark.functions.text import analyze

_PHRASE_RE = re.compile(r'(-?)"([^"]*)"(\^\S+)?')


def parse_mixed_query(
    qtext: str, *, stem: bool = True,
) -> tuple[list[tuple[tuple[str, ...], float, bool]], str]:
    """Split quoted phrase clauses out of a query string.

    Returns (phrases, rest): phrases is a list of
    (tokens, boost, negated) with tokens analyzed by the SAME kernel
    as documents; rest is the unquoted remainder (single-token quotes
    already folded back in as plain clauses). Duplicate positive
    phrases collapse, first boost wins — mirroring the grouped
    parser's term-boost rule. Malformed/negative boosts raise, like
    _split_boost. An unbalanced quote is lenient: the stray mark is
    punctuation and vanishes in analysis."""
    phrases: list[tuple[tuple[str, ...], float, bool]] = []
    seen: set[tuple[tuple[str, ...], bool]] = set()

    def repl(m: re.Match) -> str:
        neg = m.group(1) == "-"
        raw_boost = m.group(3)
        boost = 1.0
        if raw_boost is not None:
            try:
                boost = float(raw_boost[1:])
            except ValueError:
                raise ValueError(
                    f"malformed boost in phrase clause {m.group(0)!r}"
                ) from None
            if boost < 0:
                raise ValueError(
                    f"negative boost in phrase clause {m.group(0)!r}"
                )
        toks = analyze(m.group(2), stem=stem)
        if not toks:
            return " "
        if len(toks) == 1:
            # degrade to a plain clause in the remainder grammar
            suffix = raw_boost if (raw_boost and not neg) else ""
            return f" {'-' if neg else ''}{toks[0]}{suffix} "
        key = (tuple(toks), neg)
        if key not in seen:
            seen.add(key)
            phrases.append((tuple(toks), boost, neg))
        return " "

    rest = _PHRASE_RE.sub(repl, qtext)
    return phrases, rest


def _doclens(searcher, term: str, docs: np.ndarray) -> np.ndarray:
    """Per-doc lengths for `docs` from `term`'s body postings
    (docs ⊆ term's doc list by construction — every phrase match
    contains every phrase token)."""
    segs = searcher._segments(term)
    parts_d: list[np.ndarray] = []
    parts_l: list[np.ndarray] = []
    for row in segs.itertuples(index=False):
        d, _ = decode_postings(row.doc_ids, row.tfs)
        parts_d.append(d)
        parts_l.append(decode_varints(row.doclens).astype(np.int64))
    if not parts_d:
        return np.zeros(docs.size, dtype=np.int64)
    ad = np.concatenate(parts_d)
    al = np.concatenate(parts_l)
    order = np.argsort(ad, kind="stable")
    ad, al = ad[order], al[order]
    pos = np.searchsorted(ad, docs)
    pos = np.minimum(pos, ad.size - 1)
    return al[pos]


def search_mixed(
    searcher,
    phraser,
    qtext: str,
    *,
    k: int = 10,
    stem: bool = True,
    after: tuple[int, float] | None = None,
    prune: bool = True,
    fast: bool = True,
    synonyms: dict[str, list[str]] | None = None,
    restrict=None,
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score) for a mixed phrase+boolean query —
    see the module docstring for syntax and semantics.

    `searcher` is a plans.wand.LocalSearcher; `phraser` a
    plans.positions.PhraseSearcher over the SAME index (None allowed
    when the query carries no multi-token phrase). Static boosts are
    applied once, inside the boolean engine (or directly for pure-
    phrase queries)."""
    from search_engine_spark.plans.scoring import (
        expand_synonyms,
        parse_grouped_query,
    )

    phrases, rest = parse_mixed_query(qtext, stem=stem)
    groups, excl_terms, boosts = parse_grouped_query(rest, stem=stem)
    if synonyms:
        groups = expand_synonyms(groups, synonyms, stem=stem)
    site = searcher._norm_restrict(restrict)
    if site is not None and site.size == 0:
        return []
    if not phrases:
        if not groups:
            return []
        return searcher.search_grouped(
            groups, k=k, boosts=boosts, exclude=excl_terms,
            after=after, prune=prune, fast=fast, restrict=site,
        )
    if phraser is None:
        raise ValueError(
            "phrase clauses need the positional table — rebuild with "
            "--positions"
        )
    if phraser.stem != stem:
        raise ValueError(
            f"positional table analyzer (stem={phraser.stem}) does not "
            f"match the query analysis (stem={stem})"
        )

    pos_lists: list[tuple[np.ndarray, np.ndarray, float, tuple[str, ...]]] = []
    neg_arrs: list[np.ndarray] = []
    allow: np.ndarray | None = None
    for toks, boost, neg in phrases:
        counts = phraser.phrase_counts(list(toks))
        d = np.asarray([c[0] for c in counts], dtype=np.int64)
        t = np.asarray([c[1] for c in counts], dtype=np.int64)
        if neg:
            if d.size:
                neg_arrs.append(d)
            continue
        if d.size == 0:
            return []  # a conjunctive clause with zero matches
        pos_lists.append((d, t, boost, toks))
        allow = d if allow is None else np.intersect1d(
            allow, d, assume_unique=True
        )
        if allow.size == 0:
            return []
    if allow is not None and site is not None:
        allow = np.intersect1d(allow, site, assume_unique=True)
        if allow.size == 0:
            return []
    neg_docs = (
        np.unique(np.concatenate(neg_arrs)) if neg_arrs else None
    )

    if not pos_lists:
        # NOT-phrases only: ordinary boolean query minus their docs
        if not groups:
            return []
        return searcher.search_grouped(
            groups, k=k, boosts=boosts, exclude=excl_terms,
            exclude_docs=neg_docs, after=after, prune=prune, fast=fast,
            restrict=site,
        )

    # phrase score component over a candidate doc array (all members
    # of `allow`, so every searchsorted lookup hits)
    def phrase_contrib(docs: np.ndarray) -> np.ndarray:
        out = np.zeros(docs.size, dtype=np.float64)
        if docs.size == 0:
            return out
        known = [t for t in pos_lists[0][3] if t in searcher._df]
        if known:
            anchor = min(known, key=lambda t: searcher._df[t])
            dl = _doclens(searcher, anchor, docs)
        else:  # positions/body analyzer drift — degrade to avgdl
            dl = np.full(docs.size, searcher.avgdl)
        n = searcher.n_docs
        for d, t, boost, _toks in pos_lists:
            dfp = d.size
            idf_p = math.log(1.0 + (n - dfp + 0.5) / (dfp + 0.5))
            pos = np.searchsorted(d, docs)
            pos = np.minimum(pos, d.size - 1)
            tf = t[pos]
            out += boost * idf_p * searcher._tfnorm(tf, dl)
        return out

    if groups:
        # the allow-list bounds the candidate space, so asking the
        # boolean engine for ALL of it is exact and cheap relative to
        # the phrase evaluation that produced it
        base = searcher.search_grouped(
            groups, k=int(allow.size), boosts=boosts, exclude=excl_terms,
            exclude_docs=neg_docs, restrict=allow, prune=prune, fast=fast,
        )
        if not base:
            return []
        docs = np.asarray([h[0] for h in base], dtype=np.int64)
        scores = np.asarray([h[1] for h in base], dtype=np.float64)
        order = np.argsort(docs, kind="stable")
        docs, scores = docs[order], scores[order]
        scores = scores + phrase_contrib(docs)
        return searcher._vector_topk(docs, scores, k, after)

    # pure phrase query (possibly with NOT-terms/NOT-phrases)
    cand = allow
    mask = np.ones(cand.size, dtype=bool)
    if excl_terms:
        excl = searcher._excluded_docs(excl_terms)
        if excl is not None:
            mask &= ~searcher._in_sorted(excl, cand)
    if neg_docs is not None:
        mask &= ~searcher._in_sorted(neg_docs, cand)
    cand = cand[mask]
    if cand.size == 0:
        return []
    scores = searcher._boosted(cand, phrase_contrib(cand))
    return searcher._vector_topk(cand, scores, k, after)
