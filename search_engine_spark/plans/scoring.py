"""BM25 scoring plans (SURVEY.md A8, J1-J3, O2).

Canonical BM25 variant (SURVEY.md risk R2 — frozen here until the
reference mount is populated, then swap THIS module only):

    idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))     [always > 0]
    tfnorm    = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score     = sum over query terms of idf * tfnorm
    k1 = 1.2, b = 0.75 (fixed, BASELINE.json)
    candidates: conjunctive AND (posting-list intersection)
    query terms: deduplicated (each unique term contributes once)
    tie-break: score desc, doc_id asc; float64 throughout

``bm25_exhaustive`` scores straight off flat postings (no index) — it
is both the M1 end-to-end slice and the ground-truth the compressed
index + WAND paths must reproduce exactly (equivalence tests).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from search_engine_spark import B, K1
from search_engine_spark.functions.text import analyze


def idf_expr(df_col, n_docs_col):
    """Robertson-plus-one idf as a Column expression."""
    return F.log(
        F.lit(1.0)
        + (n_docs_col - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def tfnorm_expr(tf_col, doclen_col, avgdl_col, k1: float = K1, b: float = B):
    """BM25 tf saturation / length normalization as a Column expression."""
    return (
        tf_col.cast("double") * F.lit(k1 + 1.0)
        / (
            tf_col.cast("double")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * doclen_col.cast("double") / avgdl_col)
        )
    )


def analyze_query(qtext: str, *, stem: bool = True) -> list[str]:
    """Query analysis — the SAME text kernel as documents (SURVEY 3.2),
    deduplicated preserving first-seen order."""
    seen: dict[str, None] = {}
    for t in analyze(qtext, stem=stem):
        seen.setdefault(t, None)
    return list(seen)


def _split_boost(alt: str) -> tuple[str, float]:
    """'term^2.5' -> ('term', 2.5); no suffix -> boost 1.0. A negative
    or malformed boost raises (silently scoring backwards would be
    worse than failing)."""
    if "^" not in alt:
        return alt, 1.0
    body, _, raw = alt.rpartition("^")
    try:
        boost = float(raw)
    except ValueError:
        raise ValueError(f"malformed boost in clause {alt!r}") from None
    if boost < 0:
        raise ValueError(f"negative boost in clause {alt!r}")
    return body, boost


def parse_grouped_query(
    qtext: str, *, stem: bool = True,
) -> tuple[list[list[str]], list[str], dict[str, float]]:
    """Boolean query syntax -> (groups, exclude, boosts).

    Whitespace-separated clauses; 'a|b' inside a clause is an
    OR-group of alternatives, '-term' a NOT-term, 'term^2.5' a
    query-time boost (Lucene syntax; boost multiplies that term's
    BM25 contribution; default 1.0). Semantics (shared by every
    engine path and the bm25_grouped_query / bm25_boosted_query
    oracles): a candidate doc contains >= 1 term of EVERY group; its
    score is sum over ALL DISTINCT matched query terms of
    boost_t * idf_t * tfnorm (a term repeated across groups scores
    once — its FIRST boost wins — but still satisfies each of its
    groups); docs containing any NOT-term are suppressed. Plain AND
    is the special case of singleton groups, OR of a single group.
    Identical repeated groups are collapsed (they impose the same
    constraint); boosts on NOT-terms are ignored."""
    groups: list[list[str]] = []
    exclude: list[str] = []
    boosts: dict[str, float] = {}
    for tok in qtext.split():
        if tok.startswith("-") and len(tok) > 1:
            exclude.extend(analyze_query(_split_boost(tok[1:])[0],
                                         stem=stem))
            continue
        g: list[str] = []
        for alt in tok.split("|"):
            body, boost = _split_boost(alt)
            for t in analyze_query(body, stem=stem):
                if t not in g:
                    g.append(t)
                boosts.setdefault(t, boost)
        # all-punctuation clause vanishes; duplicate groups collapse
        if g and g not in groups:
            groups.append(g)
    boosts = {t: b for t, b in boosts.items()
              if any(t in g for g in groups)}
    return groups, list(dict.fromkeys(exclude)), boosts


def expand_synonyms(
    groups: list[list[str]],
    synonyms: dict[str, list[str]],
    *,
    stem: bool = True,
) -> list[list[str]]:
    """Query-time synonym expansion as a pure rewrite into grouped
    boolean form (the Elasticsearch/Lucene SynonymGraphFilter model,
    expand=true): every OR-group is extended with the synonyms of its
    members, so 'join' with synonyms {join: [merge]} becomes the group
    [join, merge] — a doc satisfies the clause through ANY variant and
    scores by parse_grouped_query's existing semantics (sum over all
    distinct matched terms, each against its own df). No new scoring
    machinery: expansion happens before the engine sees the query, so
    every serving path (LocalSearcher.search_grouped, IndexReader
    .search_grouped, the exhaustive oracle) supports synonyms for
    free. Synonym keys and values run through the SAME analyzer as
    query text (stem flag shared) — a stemmed index expands stemmed
    variants."""
    syn_analyzed: dict[str, list[str]] = {}
    for key, alts in synonyms.items():
        akeys = analyze_query(key, stem=stem)
        if len(akeys) != 1:
            raise ValueError(
                f"synonym key {key!r} must analyze to exactly one term"
            )
        out: list[str] = []
        for alt in alts:
            out.extend(analyze_query(alt, stem=stem))
        syn_analyzed.setdefault(akeys[0], []).extend(out)
    expanded: list[list[str]] = []
    for g in groups:
        ng = list(g)
        for t in g:
            for s in syn_analyzed.get(t, ()):
                if s not in ng:
                    ng.append(s)
        expanded.append(ng)
    return expanded


_FUZZY_RE = re.compile(
    r"(^|\s)(-?)([A-Za-z0-9]+)~(\d?)(\^[\d.]+)?(?=\s|$)"
)


def expand_fuzzy(
    qtext: str,
    suggester,
    *,
    stem: bool = True,
    max_candidates: int = 16,
) -> str:
    """Rewrite Lucene-style fuzzy clauses `term~N` (bare terms only —
    quoted clauses own the `~` suffix for slop) into OR-groups of
    dictionary terms within Damerau-Levenshtein distance N (default 2
    when the digit is omitted, Lucene's default), ranked by the
    SymSpell table's (distance asc, df desc) order and capped at
    `max_candidates` (Lucene's rewrite cap). A PURE TEXT rewrite, like
    expand_synonyms: the result feeds every existing path — local,
    distributed, batch, and the phrase grammar's unquoted remainder —
    with the grouped machinery's scoring (each variant against its own
    df). Semantics pinned here:

    * positive `roam~1` with no dictionary term in range keeps the
      original (absent) term, so the clause is unsatisfiable and the
      query returns [] — dropping it would silently WIDEN the query;
    * `-roam~1` expands to one NOT-term per variant (no matches: the
      clause vanishes — excluding nothing is a no-op);
    * a boost distributes over the variants (`a^2|b^2`);
    * `term~0` and `term~` on a quoted segment are left untouched.

    `suggester` is plans/suggest.Suggester — fuzzy clauses need the
    deletion table (index_admin.py build-suggest), the same dependency
    `--suggest` has."""
    def repl(m: re.Match) -> str:
        lead, neg, raw_term, nd, boost = (
            m.group(1), m.group(2), m.group(3), m.group(4),
            m.group(5) or "",
        )
        d = int(nd) if nd else 2
        if d == 0:
            return f"{lead}{neg}{raw_term}{boost}"
        toks = analyze(raw_term, stem=stem)
        if len(toks) != 1:
            return f"{lead}{neg}{raw_term}{boost}"
        cands = [
            t for t, _df in suggester.suggest(
                toks[0], k=max_candidates, max_distance=d
            )
        ]
        if not cands:
            # keep the (absent) base term -> clause unsatisfiable;
            # strip the ~N so analysis doesn't split off the digit
            return f"{lead}{raw_term}{boost}" if not neg else lead
        if neg:
            return lead + " ".join(f"-{t}" for t in cands)
        return lead + "|".join(f"{t}{boost}" for t in cands)

    return _FUZZY_RE.sub(repl, qtext)


_WILDCARD_RE = re.compile(
    r"(^|\s)(-?)([A-Za-z0-9*]*\*[A-Za-z0-9*]*)(\^[\d.]+)?(?=\s|$)"
)


def wildcard_to_regex(pattern: str) -> str:
    """Translate a Lucene-style wildcard term ('sp*k', '*ark*') into
    an anchored regex for vocab_terms(regex=). Only `*` (zero or more
    chars) is supported — `?` is not, because the no-match fallback
    below relies on the star-stripped literal matching the pattern.
    A pattern of ONLY stars is rejected: match-all is a dictionary
    scan, not a query clause."""
    if not pattern.replace("*", ""):
        raise ValueError(
            f"wildcard clause {pattern!r} matches every term — use a "
            "dictionary scan (--terms-matching / vocab_terms), not a "
            "query clause"
        )
    return "^" + ".*".join(
        re.escape(p) for p in pattern.split("*")
    ) + "$"


def expand_wildcard(
    qtext: str,
    searcher,
    *,
    max_candidates: int = 16,
) -> str:
    """Rewrite Lucene-style wildcard clauses (`sp*k`, `*ark*` — bare
    terms with a `*`) into OR-groups of matching DICTIONARY terms,
    ranked df-desc (Lucene's top-terms rewrite) and capped at
    `max_candidates`. A PURE TEXT rewrite like expand_fuzzy /
    expand_synonyms, so every serving path gets wildcards through the
    existing grouped machinery, each variant scored against its own
    df. Semantics pinned here (mirroring expand_fuzzy):

    * patterns match the STORED vocabulary (analyzer output), so the
      literal parts are casefolded but never stemmed — Lucene also
      skips analysis for wildcard terms;
    * a positive clause with no dictionary match keeps the
      star-stripped literal (which provably also has no match, since
      it matches its own pattern), so the clause is unsatisfiable and
      the query returns [] — dropping it would silently WIDEN the
      query;
    * `-ab*` expands to one NOT-term per match (no matches: the
      clause vanishes — excluding nothing is a no-op);
    * a boost distributes over the variants;
    * an all-star pattern is a ValueError (usage error upstream).

    `searcher` is a plans.wand.LocalSearcher (vocab_terms provides
    the capped df-ranked scan)."""
    def repl(m: re.Match) -> str:
        lead, neg, pattern, boost = (
            m.group(1), m.group(2), m.group(3), m.group(4) or "",
        )
        rx = wildcard_to_regex(pattern.lower())
        cands = [
            t for t, _df in searcher.vocab_terms(
                regex=rx, limit=max_candidates, by_df=True
            )
        ]
        if not cands:
            stripped = pattern.lower().replace("*", "")
            return f"{lead}{stripped}{boost}" if not neg else lead
        if neg:
            return lead + " ".join(f"-{t}" for t in cands)
        return lead + "|".join(f"{t}{boost}" for t in cands)

    return _WILDCARD_RE.sub(repl, qtext)


def bm25_exhaustive_grouped(
    spark: SparkSession,
    postings_flat: DataFrame,
    groups: list[list[str]],
    *,
    k: int = 10,
    exclude=None,
    boosts: dict[str, float] | None = None,
) -> DataFrame:
    """Grouped boolean BM25 off flat postings (parse_grouped_query
    semantics; boosts multiply per-term contributions). Plan shape:
    bm25_exhaustive's scoring side runs over the DISTINCT query terms
    (each matched term contributes exactly once even when it appears
    in several groups); the conjunction is a separate (term, grp)
    broadcast join filtered on count(DISTINCT grp) == n_groups,
    semi-joined back — a group whose terms are all absent from the
    corpus is then naturally unsatisfiable (no special-casing)."""
    n_groups = len(groups)
    empty = spark.createDataFrame([], "doc_id long, score double")
    if n_groups == 0:
        return empty
    qrows = [(t, gi) for gi, g in enumerate(groups) for t in g]
    if not qrows:
        return empty
    boosts = boosts or {}
    terms = list(dict.fromkeys(t for t, _ in qrows))
    tdf = spark.createDataFrame(
        [(t, float(boosts.get(t, 1.0))) for t in terms],
        "term string, boost double",
    )
    cand = postings_flat.join(F.broadcast(tdf), "term")
    dfs = cand.groupBy("term").agg(F.count("*").alias("df"))
    stats = (
        postings_flat.select("doc_id", "doclen")
        .dropDuplicates(["doc_id"])
        .agg(F.count("*").alias("n_docs"), F.avg("doclen").alias("avgdl"))
    )
    scored = (
        cand.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "partial",
            F.col("boost")
            * idf_expr(F.col("df"), F.col("n_docs"))
            * tfnorm_expr(F.col("tf"), F.col("doclen"), F.col("avgdl")),
        )
    )
    qdf = spark.createDataFrame(qrows, "term string, grp int")
    match = (
        postings_flat.join(F.broadcast(qdf), "term")
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("grp")).alias("n_groups_matched"))
        .filter(F.col("n_groups_matched") == n_groups)
        .select("doc_id")
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("partial").alias("score"),
    ).join(match, "doc_id", "left_semi")
    if exclude:
        edf = spark.createDataFrame([(t,) for t in exclude], "term string")
        excluded_docs = (
            postings_flat.join(F.broadcast(edf), "term")
            .select("doc_id").distinct()
        )
        agg = agg.join(excluded_docs, "doc_id", "left_anti")
    return (
        agg.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_exhaustive(
    spark: SparkSession,
    postings_flat: DataFrame,
    qtext_or_terms,
    *,
    k: int = 10,
    stem: bool = True,
    mode: str = "and",
    exclude=None,
    msm: int = 1,
) -> DataFrame:
    """Score a query straight off flat postings (term, doc_id, tf, doclen).

    msm (mode='or' only): minimum-should-match — keep docs matching at
    least `msm` of the present query terms; scores stay the plain OR
    sums (structural filter, not a scoring change).

    exclude: terms (list or raw text, analyzed the same way) whose
    containing docs are REMOVED from the result (NOT semantics) before
    top-k — scoring of surviving docs is unaffected (excluded terms
    never contribute, positively or negatively).

    Plan shape (all JVM-side once postings exist):
      broadcast join with the (tiny) query-term set        [J2 analogue]
      -> broadcast join with per-term df + 1-row stats     [J1]
      -> partial score projection (whole-stage codegen)    [A8]
      -> groupBy(doc_id) sum + distinct-term count         [J3 AND via
         group-filter: n_terms matched == |q|]
      -> TakeOrderedAndProject(k, score desc, doc_id asc)  [O2/O4]

    No Python crosses the scoring path; the only UDF in the lifecycle
    was tokenization upstream.
    """
    if isinstance(qtext_or_terms, str):
        qterms = analyze_query(qtext_or_terms, stem=stem)
    else:
        qterms = list(dict.fromkeys(qtext_or_terms))
    n_terms = len(qterms)
    if n_terms == 0:
        return spark.createDataFrame([], "doc_id long, score double")

    qdf = spark.createDataFrame([(t,) for t in qterms], "term string")
    cand = postings_flat.join(F.broadcast(qdf), "term")

    # per-term df and collection stats computed over the SAME postings
    # (cheap second aggs; at scale these come from the dictionary
    # table). df is aggregated over the QUERY'S terms only — the
    # broadcast stays |q| rows; a vocabulary-wide df agg would build
    # and broadcast a 10^8-row map at web scale.
    dfs = cand.groupBy("term").agg(F.count("*").alias("df"))
    stats = postings_flat.select("doc_id", "doclen").dropDuplicates(["doc_id"]).agg(
        F.count("*").alias("n_docs"), F.avg("doclen").alias("avgdl")
    )

    scored = (
        cand.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "partial",
            idf_expr(F.col("df"), F.col("n_docs"))
            * tfnorm_expr(F.col("tf"), F.col("doclen"), F.col("avgdl")),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("partial").alias("score"),
        F.count("*").alias("n_matched"),  # (term, doc) unique -> count = distinct terms
    )
    msm = int(msm)
    if msm > 1 and mode != "or":
        raise ValueError("msm applies to mode='or' only")
    if mode == "and":
        agg = agg.filter(F.col("n_matched") == n_terms)
    elif msm > 1:
        if msm > n_terms:
            return spark.createDataFrame([], "doc_id long, score double")
        agg = agg.filter(F.col("n_matched") >= msm)
    if exclude:
        if isinstance(exclude, str):
            excl = analyze_query(exclude, stem=stem)
        else:
            excl = list(dict.fromkeys(exclude))
        if excl:
            edf = spark.createDataFrame([(t,) for t in excl], "term string")
            excluded_docs = (
                postings_flat.join(F.broadcast(edf), "term")
                .select("doc_id").distinct()
            )
            # NOT semantics: drop docs containing ANY excluded term
            # (anti-join on doc_id; the excluded set is df-bounded)
            agg = agg.join(excluded_docs, "doc_id", "left_anti")
    return (
        agg.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


LMD_MU = 2000.0


def lmd_exhaustive(
    spark: SparkSession,
    postings_flat: DataFrame,
    qtext_or_terms,
    *,
    k: int = 10,
    stem: bool = True,
    mode: str = "and",
    mu: float = LMD_MU,
) -> DataFrame:
    """Query-likelihood ranking with Dirichlet smoothing (Zhai &
    Lafferty 2001; the Lucene LMDirichletSimilarity family) straight
    off flat postings — the second pluggable similarity next to BM25.
    Semantics pinned here and mirrored by every twin (the SQL oracle,
    LocalSearcher.search_lmd):

        score(d, q) = Σ_{t ∈ q ∩ d} [ ln(1 + tf/(μ·p_t))
                                      + ln(μ/(μ + dl_d)) ]
        p_t = cf_t / total_tokens            (collection LM)

    i.e. the rank-equivalent log form, summed over MATCHED terms only
    (each matched term also carries the document-length component, so
    score = Σ ln(1+tf/(μ·p_t)) + n_matched·ln(μ/(μ+dl))); no
    clipping. μ defaults to 2000 (the canonical ad-hoc value).

    Plan shape matches bm25_exhaustive: broadcast query join →
    broadcast per-term cf + 1-row collection total → codegen partial →
    groupBy(doc_id) → top-k. All JVM-side."""
    if isinstance(qtext_or_terms, str):
        qterms = analyze_query(qtext_or_terms, stem=stem)
    else:
        qterms = list(dict.fromkeys(qtext_or_terms))
    n_terms = len(qterms)
    if n_terms == 0:
        return spark.createDataFrame([], "doc_id long, score double")
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")

    qdf = spark.createDataFrame([(t,) for t in qterms], "term string")
    cand = postings_flat.join(F.broadcast(qdf), "term")
    cfs = cand.groupBy("term").agg(
        F.sum("tf").cast("double").alias("cf")
    )
    total = postings_flat.select("doc_id", "doclen").dropDuplicates(
        ["doc_id"]
    ).agg(F.sum("doclen").cast("double").alias("total_tokens"))

    scored = (
        cand.join(F.broadcast(cfs), "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "partial",
            F.log(
                F.lit(1.0)
                + F.col("tf") / (F.lit(mu) * F.col("cf")
                                 / F.col("total_tokens"))
            )
            + F.log(F.lit(mu) / (F.lit(mu) + F.col("doclen"))),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("partial").alias("score"),
        F.count("*").alias("n_matched"),
    )
    if mode == "and":
        agg = agg.filter(F.col("n_matched") == n_terms)
    return (
        agg.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def collapse_top_hits(
    scored: DataFrame,
    meta: DataFrame,
    *,
    key: str,
    per_key: int = 2,
    k: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Result diversification by field collapse (the search-engine
    'site collapse' feature): keep at most `per_key` hits per `key`
    (e.g. source/host), then the global top-k. `scored` is a full
    (doc_id, score) ranking; `meta` maps doc_id -> key (broadcast if
    small, else an equi-join on the id).

    Collapse only REMOVES docs, so it must see the ranking DEEP
    enough that k survivors exist — callers pass the full match set
    (or k * per-key-cardinality at minimum), not a pre-cut top-k.
    Windows partition by the collapse key — shuffle on `key`, skew
    bounded by the per-key rank cutoff running map-side under AQE."""
    from pyspark.sql import Window as W

    w_key = W.partitionBy(key).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        scored.join(meta.select(id_col, key), id_col)
        .withColumn("_kr", F.row_number().over(w_key))
        .filter(F.col("_kr") <= per_key)
        .select(
            id_col, key, score_col,
            F.col("_kr").cast("long").alias("key_rank"),
        )
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
    )


def collapse_ranked(
    hits: list[tuple[int, float]],
    key_of,
    *,
    per_key: int = 2,
    k: int = 10,
) -> list[tuple[int, float, object]]:
    """Greedy field collapse over an ALREADY-RANKED hit list (the
    serving-side twin of collapse_top_hits): walk hits in rank order,
    keep a doc only while its collapse key (e.g. url host) has been
    seen fewer than per_key times, stop at k. key_of is a mapping or
    callable doc_id -> key. Exact given a deep-enough hit list —
    callers refetch deeper when fewer than k survive and the source
    list was cut (query.py --collapse-host does)."""
    get = key_of if callable(key_of) else key_of.__getitem__
    out: list[tuple[int, float, object]] = []
    seen: dict = {}
    for d, s in hits:
        key = get(d)
        c = seen.get(key, 0)
        if c < per_key:
            seen[key] = c + 1
            out.append((d, s, key))
            if len(out) == k:
                break
    return out
