"""Driver-contract query battery: Spark callables + DuckDB oracle SQL.

One entry per implemented operator family (SURVEY.md section 2 /
section 3.3). Both sides follow the same conventions (see
__spark_entry__.py docstring): whitespace tokenization, identical
aliases, floats rounded to 6, counts as long/BIGINT, exact-decimal
sums for large-magnitude money aggregates (double summation order
differs between engines; decimal sums are order-independent).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from search_engine_spark import B, K1
from search_engine_spark.operators.aggregates import (
    collection_stats,
    doc_lengths,
    document_frequencies,
    postings_from_text,
    split_terms,
    term_frequencies,
)
from search_engine_spark.plans.scoring import (
    bm25_exhaustive,
    idf_expr,
    lmd_exhaustive,
    tfnorm_expr,
)

STOPWORDS = ("the", "a", "of", "to", "and")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-token postings with doclen, oracle-comparable."""
    docs = _t(spark, sf_dir, "documents")
    tf = term_frequencies(split_terms(docs))
    dl = doc_lengths(tf)
    return tf.join(dl, "doc_id").select("term", "doc_id", "tf", "doclen")


# SQL CTE prelude shared by the IR oracles
_TOK_CTE = """
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
tf AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM tok2 GROUP BY term, doc_id),
dl AS (SELECT doc_id, count(*)::BIGINT AS doclen FROM tok2 GROUP BY doc_id)
"""


# ---------------------------------------------------------------------------
# IR core (documents)
# ---------------------------------------------------------------------------

def q_term_frequency(spark, sf_dir):
    return term_frequencies(split_terms(_t(spark, sf_dir, "documents")))


SQL_TERM_FREQUENCY = f"""
WITH {_TOK_CTE}
SELECT term, doc_id, tf FROM tf
"""


def q_document_frequency(spark, sf_dir):
    return document_frequencies(
        term_frequencies(split_terms(_t(spark, sf_dir, "documents")))
    )


SQL_DOCUMENT_FREQUENCY = f"""
WITH {_TOK_CTE}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term
"""


def q_doc_lengths(spark, sf_dir):
    return doc_lengths(term_frequencies(split_terms(_t(spark, sf_dir, "documents"))))


SQL_DOC_LENGTHS = f"""
WITH {_TOK_CTE}
SELECT doc_id, doclen FROM dl
"""


def q_collection_stats(spark, sf_dir):
    st = collection_stats(
        doc_lengths(term_frequencies(split_terms(_t(spark, sf_dir, "documents"))))
    )
    return st.select("n_docs", F.round("avgdl", 6).alias("avgdl"))


SQL_COLLECTION_STATS = f"""
WITH {_TOK_CTE}
SELECT count(*)::BIGINT AS n_docs, round(avg(doclen), 6) AS avgdl FROM dl
"""


def _bm25_sql(terms: list[str], k: int) -> str:
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
q AS (SELECT * FROM (VALUES {vals}) AS t(term)),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf
  JOIN q USING (term)
  JOIN dfs USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored
GROUP BY doc_id
HAVING count(*) = {len(terms)}
ORDER BY sum(partial) DESC, doc_id ASC
LIMIT {k}
"""


def _bm25_spark(spark, sf_dir, qtext: str, k: int) -> DataFrame:
    res = bm25_exhaustive(spark, _postings(spark, sf_dir), qtext, k=k, stem=False)
    return res.select("doc_id", F.round("score", 6).alias("score"))


def q_bm25_topk(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, "spark join", 10)


SQL_BM25_TOPK = _bm25_sql(["spark", "join"], 10)


def q_bm25_single_term(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, "window", 10)


SQL_BM25_SINGLE_TERM = _bm25_sql(["window"], 10)


def q_bm25_not_query(spark, sf_dir):
    """NOT semantics ('spark join -filter'): BM25 AND over the positive
    terms, docs containing ANY excluded term suppressed BEFORE top-k
    (anti-join on the excluded terms' df-bounded doc set); survivors'
    scores are unchanged by the exclusion."""
    res = bm25_exhaustive(
        spark, _postings(spark, sf_dir), "spark join", k=10, stem=False,
        exclude=["filter"],
    )
    return res.select("doc_id", F.round("score", 6).alias("score"))


SQL_BM25_NOT_QUERY = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
q AS (SELECT * FROM (VALUES ('spark'), ('join')) AS t(term)),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf
  JOIN q USING (term)
  JOIN dfs USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored
WHERE doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'filter')
GROUP BY doc_id
HAVING count(*) = 2
ORDER BY sum(partial) DESC, doc_id ASC
LIMIT 10
"""


def q_bm25_facet_counts(spark, sf_dir):
    """Search-analytics facets: ALL docs matching 'spark join' (AND),
    grouped by the documents.source facet — hit count, mean and max
    BM25 score per facet. No top-k: the facet aggregation runs over
    the full match set (group count is facet-cardinality-bounded, tiny
    to collect). Max is order-independent; mean is rounded after an
    order-stable sum of ~1e-1-magnitude partials."""
    tf = term_frequencies(split_terms(_t(spark, sf_dir, "documents")))
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    terms = ["spark", "join"]
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")
    cand = tf.join(F.broadcast(qdf), "term")
    dfs = cand.groupBy("term").agg(F.count("*").alias("df"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doclen"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("doclen").alias("avgdl"))
    from search_engine_spark.plans.scoring import idf_expr, tfnorm_expr

    scored = (
        cand.join(F.broadcast(dfs), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "partial",
            idf_expr(F.col("df"), F.col("n_docs"))
            * tfnorm_expr(F.col("tf"), F.col("doclen"), F.col("avgdl")),
        )
    )
    matched = (
        scored.groupBy("doc_id")
        .agg(F.sum("partial").alias("score"), F.count("*").alias("n"))
        .filter(F.col("n") == len(terms))
    )
    return (
        matched.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.round(F.avg("score"), 6).alias("avg_score"),
            F.round(F.max("score"), 6).alias("max_score"),
        )
    )


SQL_BM25_FACET_COUNTS = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
q AS (SELECT * FROM (VALUES ('spark'), ('join')) AS t(term)),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf
  JOIN q USING (term)
  JOIN dfs USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
),
matched AS (
  SELECT doc_id, sum(partial) AS score
  FROM scored GROUP BY doc_id HAVING count(*) = 2
)
SELECT d.source, count(*)::BIGINT AS n_hits,
       round(avg(m.score), 6) AS avg_score,
       round(max(m.score), 6) AS max_score
FROM matched m JOIN documents d USING (doc_id)
GROUP BY d.source
"""


def q_intersect_and(spark, sf_dir):
    """J3: posting-list intersection — docs containing ALL three terms."""
    terms = ["spark", "join", "filter"]
    tf = term_frequencies(split_terms(_t(spark, sf_dir, "documents")))
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")
    return (
        tf.join(F.broadcast(qdf), "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") == len(terms))
        .select("doc_id")
    )


SQL_INTERSECT_AND = f"""
WITH {_TOK_CTE}
SELECT doc_id FROM tf WHERE term IN ('spark', 'join', 'filter')
GROUP BY doc_id HAVING count(*) = 3
"""


def q_lang_counts(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


SQL_LANG_COUNTS = "SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang"


# ---------------------------------------------------------------------------
# Training-data ops: dedup / quality / similarity
# ---------------------------------------------------------------------------

def q_dedup_exact_text(spark, sf_dir):
    """Exact dedup: hash-groupBy on content, keep lowest doc_id."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


SQL_DEDUP_EXACT_TEXT = """
SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
       count(*)::BIGINT AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_quality_score(spark, sf_dir):
    """Per-doc quality signals: token count + stopword ratio."""
    tok = split_terms(_t(spark, sf_dir, "documents"))
    return tok.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(
            F.sum(F.when(F.col("term").isin(*STOPWORDS), 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("stopword_ratio"),
    )


SQL_QUALITY_SCORE = f"""
WITH {_TOK_CTE}
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       round(sum(CASE WHEN term IN {STOPWORDS} THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS stopword_ratio
FROM tok2 GROUP BY doc_id
"""


def _cosine_cols(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    nb = F.sqrt(F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    return dot / (na * nb)


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 vs vec_id=0 (SURVEY-adjacent ANN
    baseline; the LSH-bucketed scale path is a rows-only query)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(_cosine_cols(F.col("embedding"), F.col("qv")), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )


SQL_ANN_COSINE_TOPK = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], qv)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(qv, qv))), 6) AS cos
FROM embeddings CROSS JOIN q
ORDER BY list_dot_product(embedding::DOUBLE[], qv)
         / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
            * sqrt(list_dot_product(qv, qv))) DESC, vec_id ASC
LIMIT 10
"""


def q_embedding_norms(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    l2 = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    return emb.select("vec_id", F.round(l2, 6).alias("l2_norm"))


SQL_EMBEDDING_NORMS = """
SELECT vec_id,
       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
         AS l2_norm
FROM embeddings
"""


# ---------------------------------------------------------------------------
# Window / dedup-by-recency / relational coverage
# ---------------------------------------------------------------------------

def q_latest_event_per_user(spark, sf_dir):
    """P3 latest-snapshot dedup pattern (row_number over recency)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


SQL_LATEST_EVENT_PER_USER = """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_hourly_event_counts(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


SQL_HOURLY_EVENT_COUNTS = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape; money sums via exact decimal (order-independent)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(dec("l_quantity")).cast("double"), 6).alias("sum_qty"),
        F.round(F.sum(dec("l_extendedprice")).cast("double"), 6).alias("sum_base_price"),
        F.round(
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
                .cast("decimal(18,8)")
            ).cast("double"),
            6,
        ).alias("sum_disc_price"),
        F.count("*").cast("long").alias("count_order"),
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round((sum(l_quantity::DECIMAL(18,4)))::DOUBLE, 6) AS sum_qty,
       round((sum(l_extendedprice::DECIMAL(18,4)))::DOUBLE, 6) AS sum_base_price,
       round((sum((l_extendedprice::DECIMAL(18,4)
                   * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))::DECIMAL(18,8)))::DOUBLE, 6)
         AS sum_disc_price,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark, sf_dir):
    """3-way join: orders x customer x nation (broadcast dims)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"), 6)
            .alias("revenue"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name,
       round((sum(o_totalprice::DECIMAL(18,4)))::DOUBLE, 6) AS revenue,
       count(*)::BIGINT AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_top_customers_per_nation(spark, sf_dir):
    """Top-3 per group via ranking window (O2 batch pattern)."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", F.round("c_acctbal", 6).alias("acctbal"), "rn")
    )


SQL_TOP_CUSTOMERS_PER_NATION = """
SELECT c_nationkey, c_custkey, round(c_acctbal, 6) AS acctbal, rn FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) WHERE rn <= 3
"""


def q_token_stats(spark, sf_dir):
    from search_engine_spark.operators.textstats import token_stats

    return token_stats(_t(spark, sf_dir, "documents"))


def q_bpe_pair_counts(spark, sf_dir):
    """BPE training iteration 0 (operators/bpe.py): distributed
    pretoken word counts → char-level adjacent-pair frequencies, top 50
    by (count desc, pair asc). The corpus-sized half of Sennrich-style
    vocabulary learning; later iterations run over the bounded word
    table and are pinned against an independent reference in
    tests/test_bpe.py."""
    from search_engine_spark.operators.bpe import pair_counts, word_counts

    return (
        pair_counts(word_counts(_t(spark, sf_dir, "documents")))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(50)
    )


_EVAL_TERMS = ("scan", "data", "hash", "join", "filter")


def q_ranking_eval(spark, sf_dir):
    """Offline ranking evaluation (operators/ireval.py): per-query
    nDCG@10 / MRR@10 / recall@10 / AP@10 for a deterministic run file
    (docs ranked per term by tf desc, doc_id asc) against graded
    judgments derived from the same corpus (tf>=3 -> rel 2, tf=2 ->
    rel 1, else 0). The metrics plans are pure joins+windows — the
    eval loop a ranking change ships through at any scale."""
    from pyspark.sql import Window as W

    from search_engine_spark.operators.ireval import eval_run

    tf = term_frequencies(split_terms(_t(spark, sf_dir, "documents")))
    sel = tf.where(F.col("term").isin(*_EVAL_TERMS))
    w = W.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    results = (
        sel.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(F.col("term").alias("query_id"), "doc_id", "rank")
    )
    qrels = sel.select(
        F.col("term").alias("query_id"),
        "doc_id",
        F.when(F.col("tf") >= 3, 2)
        .when(F.col("tf") == 2, 1)
        .otherwise(0)
        .alias("rel"),
    )
    return eval_run(results, qrels, k=10).orderBy("query_id")


SQL_RANKING_EVAL = f"""
WITH {{tok_cte}},
sel AS (
  SELECT term, doc_id, tf FROM tf
  WHERE term IN {tuple(_EVAL_TERMS)!r}
),
res AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term
                            ORDER BY tf DESC, doc_id) AS rank
  FROM sel
),
r10 AS (SELECT * FROM res WHERE rank <= 10),
qr AS (
  SELECT term, doc_id,
         CASE WHEN tf >= 3 THEN 2 WHEN tf = 2 THEN 1 ELSE 0 END AS rel
  FROM sel
),
j AS (
  SELECT r.term, r.doc_id, r.rank, coalesce(q.rel, 0) AS rel
  FROM r10 r LEFT JOIN qr q USING (term, doc_id)
),
dcg AS (
  SELECT term, sum((pow(2, rel) - 1) / log2(rank + 1)) AS dcg
  FROM j GROUP BY term
),
ideal AS (
  SELECT term, rel,
         row_number() OVER (PARTITION BY term
                            ORDER BY rel DESC, doc_id) AS i
  FROM qr WHERE rel > 0
),
idcg AS (
  SELECT term, sum((pow(2, rel) - 1) / log2(i + 1)) AS idcg
  FROM ideal WHERE i <= 10 GROUP BY term
),
nrel AS (SELECT term, count(*) AS n_rel FROM qr WHERE rel > 0 GROUP BY term),
firstrel AS (
  SELECT term, min(rank) AS first_rank FROM j WHERE rel > 0 GROUP BY term
),
hits AS (SELECT term, count(*) AS n_hit FROM j WHERE rel > 0 GROUP BY term),
prec AS (
  SELECT term, rank, rel,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY term ORDER BY rank) AS cum_rel
  FROM j
),
sp AS (
  SELECT term, sum(cum_rel * 1.0 / rank) AS sum_prec
  FROM prec WHERE rel > 0 GROUP BY term
)
SELECT i.term AS query_id,
       round(coalesce(d.dcg, 0) / i.idcg, 6) AS ndcg,
       round(coalesce(1.0 / f.first_rank, 0), 6) AS mrr,
       round(coalesce(h.n_hit, 0) * 1.0 / n.n_rel, 6) AS recall,
       round(coalesce(s.sum_prec, 0) / least(n.n_rel, 10), 6) AS ap
FROM idcg i
JOIN nrel n USING (term)
LEFT JOIN dcg d USING (term)
LEFT JOIN firstrel f USING (term)
LEFT JOIN hits h USING (term)
LEFT JOIN sp s USING (term)
ORDER BY query_id
""".format(tok_cte=_TOK_CTE)


SQL_BPE_PAIR_COUNTS = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(text,
     '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'
  )) AS word FROM documents
), wc AS (
  SELECT word, count(*)::BIGINT AS cnt FROM toks GROUP BY word
), pairs AS (
  SELECT substr(word, i::INT, 2) AS pair, cnt
  FROM wc, unnest(range(1, length(word))) AS t(i)
)
SELECT pair, sum(cnt)::BIGINT AS pair_count FROM pairs GROUP BY pair
ORDER BY pair_count DESC, pair LIMIT 50
"""


SQL_TOKEN_STATS = f"""
WITH {_TOK_CTE},
chars AS (
  SELECT doc_id, length(text)::BIGINT AS n_chars,
         len(regexp_extract_all(text,
             '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{{L}}+| ?\\p{{N}}+| ?[^\\s\\p{{L}}\\p{{N}}]+'
         ))::BIGINT AS n_subtokens
  FROM documents),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
         round(avg(length(term)), 6) AS avg_token_len
  FROM tok2 GROUP BY doc_id
)
SELECT c.doc_id, coalesce(a.n_tokens, 0) AS n_tokens, c.n_subtokens,
       c.n_chars, coalesce(a.avg_token_len, 0.0) AS avg_token_len
FROM chars c LEFT JOIN agg a USING (doc_id)
"""


def q_union_partial_runs(spark, sf_dir):
    """U1: SPIMI-style partial-run union — tf over union of two halves
    must equal tf over the whole corpus."""
    docs = _t(spark, sf_dir, "documents")
    h1 = docs.filter(F.col("doc_id") % 2 == 0)
    h2 = docs.filter(F.col("doc_id") % 2 == 1)
    return term_frequencies(split_terms(h1.unionByName(h2)))


SQL_UNION_PARTIAL_RUNS = """
WITH both_halves AS (
  SELECT * FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT * FROM documents WHERE doc_id % 2 = 1
), tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM both_halves
)
SELECT term, doc_id, count(*)::BIGINT AS tf FROM tok
WHERE term <> '' GROUP BY term, doc_id
"""


def q_except_regression(spark, sf_dir):
    """U2: exceptAll diff of two builds — postings of the withheld doc."""
    docs = _t(spark, sf_dir, "documents")
    full = term_frequencies(split_terms(docs))
    partial = term_frequencies(split_terms(docs.filter(F.col("doc_id") != 0)))
    return full.exceptAll(partial)


SQL_EXCEPT_REGRESSION = f"""
WITH {_TOK_CTE},
tf_partial AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf
  FROM tok2 WHERE doc_id <> 0 GROUP BY term, doc_id
)
SELECT term, doc_id, tf FROM tf
EXCEPT ALL
SELECT term, doc_id, tf FROM tf_partial
"""


def q_bm25_topk_or(spark, sf_dir):
    """Disjunctive (OR) BM25 variant — no intersection filter."""
    res = bm25_exhaustive(
        spark, _postings(spark, sf_dir), "spark zzzz window", k=10,
        stem=False, mode="or",
    )
    return res.select("doc_id", F.round("score", 6).alias("score"))


SQL_BM25_TOPK_OR = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
q AS (SELECT * FROM (VALUES ('spark'), ('zzzz'), ('window')) AS t(term)),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf JOIN q USING (term) JOIN dfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats s
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored GROUP BY doc_id
ORDER BY sum(partial) DESC, doc_id ASC LIMIT 10
"""


def q_sessionization(spark, sf_dir):
    """Session assignment: 30-min inactivity gap splits sessions
    (lag + conditional cumsum over an ordered window)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


SQL_SESSIONIZATION = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value
FROM sess GROUP BY user_id, session_id
"""


def q_avg_price_by_brand(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
        F.round(F.min("p_retailprice"), 6).alias("min_price"),
        F.round(F.max("p_retailprice"), 6).alias("max_price"),
    )


SQL_AVG_PRICE_BY_BRAND = """
SELECT p_brand, count(*)::BIGINT AS n_parts,
       round(avg(p_retailprice), 6) AS avg_price,
       round(min(p_retailprice), 6) AS min_price,
       round(max(p_retailprice), 6) AS max_price
FROM part GROUP BY p_brand
"""


def q_orders_with_late_ship(spark, sf_dir):
    """Left-semi join (EXISTS): orders having a lineitem shipped after
    the order's date + 90 days."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == o.o_orderkey,
    ).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).select("l_orderkey").distinct()
    return o.join(late, o.o_orderkey == late.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderstatus"
    )


SQL_ORDERS_WITH_LATE_SHIP = """
SELECT o_orderkey, o_orderstatus FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
"""


def q_customer_order_counts(spark, sf_dir):
    """Left-outer join + zero-fill: every customer with order count."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cnt = o.groupBy("o_custkey").agg(F.count("*").cast("long").alias("n"))
    return c.join(cnt, c.c_custkey == cnt.o_custkey, "left").select(
        "c_custkey",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
    )


SQL_CUSTOMER_ORDER_COUNTS = """
SELECT c_custkey, coalesce(cnt.n, 0)::BIGINT AS n_orders
FROM customer LEFT JOIN (
  SELECT o_custkey, count(*)::BIGINT AS n FROM orders GROUP BY o_custkey
) cnt ON c_custkey = cnt.o_custkey
"""


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs (the verify step of the
    dedup family, SURVEY-adjacent training-data op). Candidates here
    are all shingle-sharing pairs (exact, oracle-comparable); the
    scale path feeds LSH candidates (minhash_lsh_pairs) instead."""
    from search_engine_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("t") - 3, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("t", i + 1, 3)),
            )
        ).alias("sh"),
    ).distinct()
    cand = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )
    return ngram_jaccard_pairs(docs, cand, shingle_n=3, threshold=0.5)


SQL_NGRAM_JACCARD_PAIRS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS sh
       FROM t, unnest(generate_series(1, greatest(len(w)-2, 1))) AS g(i)),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*)::BIGINT AS n_inter
          FROM sh a JOIN sh b USING (sh) WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT a, b, round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
"""


def q_cosine_pairs_topk(spark, sf_dir):
    """Embedding near-dup: 20 most-similar vector pairs by exact
    cosine (brute force a<b; the LSH-bucketed variant is the scale
    path — lsh_cosine_topk)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("a") < F.col("b"))
    cos = _cosine_cols(F.col("va"), F.col("vb"))
    return (
        pairs.select("a", "b", cos.alias("_c"))
        .orderBy(F.desc("_c"), "a", "b")
        .limit(20)
        .select("a", "b", F.round("_c", 6).alias("cos"))
    )


SQL_COSINE_PAIRS_TOPK = """
WITH c AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
            * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
           AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT a, b, round(cos, 6) AS cos FROM c
ORDER BY cos DESC, a, b LIMIT 20
"""


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join, filtered, revenue top-10."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    dec = lambda col: F.col(col).cast("decimal(18,4)")  # noqa: E731
    rev = F.sum(
        (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
        .cast("decimal(18,8)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(rev.cast("double"), 6).alias("revenue"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey,
       round((sum((l_extendedprice::DECIMAL(18,4)
              * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))::DECIMAL(18,8)))::DOUBLE, 6)
         AS revenue,
       strftime(min(o_orderdate), '%Y-%m-%d') AS orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_event_props_json(spark, sf_dir):
    """JSON scalar extraction over the events stream table."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 6).alias("avg_k"),
        F.count("*").cast("long").alias("n"),
    )


SQL_EVENT_PROPS_JSON = """
SELECT event_type, round(avg(json_extract(props, '$.k')::BIGINT), 6) AS avg_k,
       count(*)::BIGINT AS n
FROM events GROUP BY event_type
"""


def q_orders_rollup(spark, sf_dir):
    """OLAP rollup: order counts + revenue by (year, priority) with
    subtotal and grand-total rows."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate").cast("int")
    )
    return o.rollup("yr", "o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"), 6
        ).alias("revenue"),
    )


SQL_ORDERS_ROLLUP = """
SELECT year(o_orderdate)::INT AS yr, o_orderpriority,
       count(*)::BIGINT AS n_orders,
       round((sum(o_totalprice::DECIMAL(18,4)))::DOUBLE, 6) AS revenue
FROM orders GROUP BY ROLLUP(yr, o_orderpriority)
"""


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join graph (region->nation matched by BOTH
    customer and supplier sides), date-range filter, revenue per
    nation. Exercises Catalyst join ordering over a star+snowflake."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda col: F.col(col).cast("decimal(18,4)")  # noqa: E731
    rev = F.sum(
        (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
        .cast("decimal(18,8)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n),
            (c.c_nationkey == n.n_nationkey) & (s.s_nationkey == n.n_nationkey),
        )
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(rev.cast("double"), 6).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       round((sum((l_extendedprice::DECIMAL(18,4)
              * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))::DECIMAL(18,8)))::DOUBLE, 6)
         AS revenue,
       count(*)::BIGINT AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q_windowed_event_counts(spark, sf_dir):
    """Batch path of the streaming windowed-aggregation operator
    (same function handles a watermarked stream — tests prove
    stream == batch on finite input)."""
    from search_engine_spark.streaming.windows import windowed_event_counts

    return windowed_event_counts(_t(spark, sf_dir, "events"))


SQL_WINDOWED_EVENT_COUNTS = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_doclen_quantiles(spark, sf_dir):
    """Exact interpolated quantiles of document length (Spark
    percentile == DuckDB quantile_cont, verified to the last ulp)."""
    dl = doc_lengths(term_frequencies(split_terms(_t(spark, sf_dir, "documents"))))
    return dl.agg(
        F.round(F.expr("percentile(doclen, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(doclen, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(doclen, 0.75)"), 6).alias("p75"),
        F.round(F.expr("percentile(doclen, 0.9)"), 6).alias("p90"),
    )


SQL_DOCLEN_QUANTILES = f"""
WITH {_TOK_CTE}
SELECT round(quantile_cont(doclen, 0.25), 6) AS p25,
       round(quantile_cont(doclen, 0.5), 6) AS p50,
       round(quantile_cont(doclen, 0.75), 6) AS p75,
       round(quantile_cont(doclen, 0.9), 6) AS p90
FROM dl
"""


def q_top_bigrams(spark, sf_dir):
    """Corpus-wide word-bigram counts, top 20 (collocation mining —
    the n-gram machinery WITH duplicates, unlike the dedup shingles)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    grams = docs.select(
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


SQL_TOP_BIGRAMS = """
WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT array_to_string(w[i:i+1], ' ') AS bigram
  FROM t, unnest(generate_series(1, len(w) - 1)) AS s(i)
  WHERE len(w) >= 2
)
SELECT bigram, count(*)::BIGINT AS n
FROM g GROUP BY bigram
ORDER BY n DESC, bigram ASC LIMIT 20
"""


def q_bigram_pmi(spark, sf_dir):
    """Collocation strength: pointwise mutual information of the 15
    most frequent word bigrams — pmi = ln(n_xy * T1 / (n_x * n_y)),
    with T1 = total unigrams (corpus-probability convention, both
    engines identical). Same n-gram machinery as top_bigrams plus two
    broadcast-sized unigram joins."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    grams = docs.select(
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram")
    )
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("n"))
    )
    t1 = uni.agg(F.sum("n")).collect()[0][0]
    big = (
        grams.groupBy("bigram")
        .agg(F.count("*").cast("long").alias("n_xy"))
        .orderBy(F.desc("n_xy"), F.asc("bigram"))
        .limit(15)
    )
    w1 = F.split(F.col("bigram"), " ")[0]
    w2 = F.split(F.col("bigram"), " ")[1]
    u1 = uni.select(F.col("w").alias("w1"), F.col("n").alias("n_x"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n").alias("n_y"))
    return (
        big.withColumn("w1", w1)
        .withColumn("w2", w2)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select(
            "bigram", "n_xy",
            F.round(
                F.log(F.col("n_xy") * F.lit(float(t1))
                      / (F.col("n_x") * F.col("n_y"))),
                6,
            ).alias("pmi"),
        )
    )


SQL_BIGRAM_PMI = """
WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT array_to_string(w[i:i+1], ' ') AS bigram
  FROM t, unnest(generate_series(1, len(w) - 1)) AS s(i)
  WHERE len(w) >= 2
),
uni AS (
  SELECT u.x AS w, count(*)::BIGINT AS n
  FROM t, unnest(t.w) AS u(x) GROUP BY u.x
),
t1 AS (SELECT sum(n)::DOUBLE AS total FROM uni),
big AS (
  SELECT bigram, count(*)::BIGINT AS n_xy
  FROM g GROUP BY bigram ORDER BY n_xy DESC, bigram ASC LIMIT 15
)
SELECT bigram, n_xy,
       round(ln(n_xy * t1.total / (u1.n * u2.n)), 6) AS pmi
FROM big
CROSS JOIN t1
JOIN uni u1 ON u1.w = string_split(big.bigram, ' ')[1]
JOIN uni u2 ON u2.w = string_split(big.bigram, ' ')[2]
"""


def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 tf-idf terms per document (document keywording):
    tfidf = tf * ln((1 + N) / (1 + df)), ranked by (score desc,
    term asc) via a per-doc window."""
    tf = term_frequencies(split_terms(_t(spark, sf_dir, "documents")))
    dfs = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = tf.select("doc_id").distinct().count()
    scored = tf.join(dfs, "term").withColumn(
        "tfidf",
        F.col("tf")
        * F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df"))),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf"), "rn")
    )


SQL_TFIDF_TOP_TERMS = f"""
WITH {_TOK_CTE},
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((1.0 + nd.n) / (1.0 + dfs.df)) AS tfidf
  FROM tf JOIN dfs USING (term) CROSS JOIN nd
), ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rn
  FROM scored
)
SELECT doc_id, term, round(tfidf, 6) AS tfidf, rn
FROM ranked WHERE rn <= 3
"""


def q_asof_click_before_purchase(spark, sf_dir):
    """As-of join (point-in-time): each purchase event attached to the
    user's LATEST click at-or-before it — one union + per-key window,
    never a theta/cross join (operators/asof.py)."""
    from search_engine_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    j = asof_join(left, right, on="user_id", ts="ts",
                  right_cols=["event_id", "value"], tiebreak="event_id")
    return j.select(
        "event_id", "user_id",
        F.col("event_id_asof").alias("click_event_id"),
        F.round("value_asof", 6).alias("click_value"),
    )


SQL_ASOF_CLICK_BEFORE_PURCHASE = """
SELECT l.event_id, l.user_id,
       r.event_id AS click_event_id,
       round(r.value, 6) AS click_value
FROM (SELECT event_id, ts, user_id FROM events
      WHERE event_type = 'purchase') l
LEFT JOIN (SELECT user_id, ts, event_id, value FROM events
           WHERE event_type = 'click') r
  ON r.user_id = l.user_id AND r.ts <= l.ts
QUALIFY row_number() OVER (PARTITION BY l.event_id
                           ORDER BY r.ts DESC, r.event_id DESC) = 1
"""


def q_media_resize_plan(spark, sf_dir):
    """Multimodal resize PLAN: aspect-preserving fit-in-box target
    dimensions per image — metadata math in pure built-ins (the pixel
    resample is the stubbed decoder's job; see multimodal.py)."""
    from search_engine_spark.operators.multimodal import (
        make_media_table,
        resize_plan,
    )

    return resize_plan(make_media_table(spark, 200), max_dim=256)


# media metadata is i-derived (multimodal.make_media_table): images are
# i % 3 == 0, width = 64 + i%512, height = 64 + (i*3)%512
SQL_MEDIA_RESIZE_PLAN = """
WITH m AS (
  SELECT i AS media_id,
         (64 + i % 512)::INT AS width,
         (64 + (i * 3) % 512)::INT AS height
  FROM generate_series(0, 199) t(i) WHERE i % 3 = 0
), s AS (
  SELECT *, least(1.0, 256.0 / greatest(width, height)) AS sc FROM m
)
SELECT media_id, width, height,
       greatest(floor(width * sc), 1)::INT AS new_w,
       greatest(floor(height * sc), 1)::INT AS new_h
FROM s
"""


def q_prefix_term_stats(spark, sf_dir):
    """Wildcard/prefix query: df + cf for every term starting with
    's' (dictionary range scan; the serving twin is
    LocalSearcher.prefix_terms — row-group-pruned, pytest-checked)."""
    tf = term_frequencies(split_terms(_t(spark, sf_dir, "documents")))
    return (
        tf.filter(F.col("term").startswith("s"))
        .groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
    )


SQL_PREFIX_TERM_STATS = f"""
WITH {_TOK_CTE}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM tf WHERE term LIKE 's%' GROUP BY term
"""


def q_fuzzy_term_match(spark, sf_dir):
    """Did-you-mean: vocabulary terms within edit distance 1 of the
    misspelling 'spak', with df — JVM levenshtein over the distinct
    vocabulary (both engines ship the same builtin). At web scale the
    candidate set would come from a deletion-neighborhood index; the
    ranking/selection semantics are what this entry pins."""
    tf = term_frequencies(split_terms(_t(spark, sf_dir, "documents")))
    vocab = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    return vocab.filter(
        F.levenshtein(F.col("term"), F.lit("spak")) <= 1
    ).select(
        "term", "df",
        F.levenshtein(F.col("term"), F.lit("spak")).cast("long").alias("dist"),
    )


SQL_FUZZY_TERM_MATCH = f"""
WITH {_TOK_CTE},
vocab AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
SELECT term, df, levenshtein(term, 'spak')::BIGINT AS dist
FROM vocab WHERE levenshtein(term, 'spak') <= 1
"""


def q_multifield_bm25(spark, sf_dir):
    """Multi-field ranking (plans/multifield model): score = body
    BM25 + 2.0 * title BM25, each field against its OWN statistics
    (df / n_docs / avgdl of that field), candidates = conjunctive
    body matches, title only re-ranks. The title field here is a
    deterministic surrogate — the first 6 whitespace tokens of text —
    since the documents table has no markup; the pages path indexes
    the real <title> (extract_title) with the same two-index layout
    (tests/test_multifield.py)."""
    qterms = ["spark", "join"]
    qdf = spark.createDataFrame([(t,) for t in qterms], "term string")

    def field_scores(post, alias):
        cand = post.join(F.broadcast(qdf), "term")
        dfs = cand.groupBy("term").agg(F.count("*").alias("df"))
        stats = (
            post.select("doc_id", "doclen").dropDuplicates(["doc_id"])
            .agg(F.count("*").alias("n_docs"), F.avg("doclen").alias("avgdl"))
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
        return scored.groupBy("doc_id").agg(
            F.sum("partial").alias(alias),
            F.count("*").alias("n_matched"),
        )

    body = field_scores(_postings(spark, sf_dir), "body_score").filter(
        F.col("n_matched") == len(qterms)
    ).drop("n_matched")
    docs = _t(spark, sf_dir, "documents")
    ttok = docs.select(
        "doc_id",
        F.explode(F.slice(F.split(F.col("text"), " "), 1, 6)).alias("term"),
    ).filter(F.col("term") != "")
    ttf = ttok.groupBy("term", "doc_id").agg(
        F.count("*").cast("int").alias("tf")
    )
    tdl = ttf.groupBy("doc_id").agg(F.sum("tf").cast("int").alias("doclen"))
    title = field_scores(ttf.join(tdl, "doc_id"), "title_score").drop(
        "n_matched"
    )
    return (
        body.join(title, "doc_id", "left")
        .fillna(0.0, ["title_score"])
        .select(
            "doc_id",
            F.round(
                F.col("body_score") + F.lit(2.0) * F.col("title_score"), 6
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


SQL_MULTIFIELD_BM25 = f"""
WITH {_TOK_CTE},
q(term) AS (VALUES ('spark'), ('join')),
bstats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
bdfs AS (SELECT term, count(*)::BIGINT AS df FROM tf JOIN q USING (term)
         GROUP BY term),
bscored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - bdfs.df + 0.5) / (bdfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf JOIN q USING (term) JOIN bdfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN bstats s
),
body AS (
  SELECT doc_id, sum(partial) AS body_score FROM bscored
  GROUP BY doc_id HAVING count(*) = 2
),
ttok AS (
  SELECT doc_id,
         unnest(list_slice(string_split(text, ' '), 1, 6)) AS term
  FROM documents
),
ttf AS (SELECT term, doc_id, count(*)::INT AS tf FROM ttok
        WHERE term <> '' GROUP BY term, doc_id),
tdlen AS (SELECT doc_id, sum(tf)::INT AS doclen FROM ttf GROUP BY doc_id),
tstats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl
           FROM tdlen),
tdfs AS (SELECT term, count(*)::BIGINT AS df FROM ttf JOIN q USING (term)
         GROUP BY term),
tscored AS (
  SELECT ttf.doc_id,
         ln(1.0 + (s.n_docs - tdfs.df + 0.5) / (tdfs.df + 0.5))
           * (ttf.tf * {K1 + 1.0} / (ttf.tf + {K1} * ({1.0 - B} + {B} * tdlen.doclen / s.avgdl)))
           AS partial
  FROM ttf JOIN q USING (term) JOIN tdfs USING (term)
  JOIN tdlen USING (doc_id) CROSS JOIN tstats s
),
title AS (SELECT doc_id, sum(partial) AS title_score FROM tscored
          GROUP BY doc_id)
SELECT body.doc_id,
       round(body.body_score + 2.0 * coalesce(title.title_score, 0.0), 6)
         AS score
FROM body LEFT JOIN title ON body.doc_id = title.doc_id
ORDER BY score DESC, body.doc_id LIMIT 10
"""


def q_bm25_grouped_query(spark, sf_dir):
    """Grouped boolean query '(spark OR flink) AND join NOT filter'
    (plans/scoring.parse_grouped_query semantics): a doc matches >= 1
    term of every OR-group, scores as the BM25 sum over all distinct
    matched terms, NOT-docs suppressed. 'flink' is absent from the
    corpus — the group stays satisfiable through 'spark' with NO
    special-casing (the (term, grp) join simply yields no flink
    rows), which this entry pins cross-engine. Serving twins:
    LocalSearcher.search_grouped / IndexReader.search_grouped."""
    from search_engine_spark.plans.scoring import bm25_exhaustive_grouped

    res = bm25_exhaustive_grouped(
        spark, _postings(spark, sf_dir),
        [["spark", "flink"], ["join"]], k=10, exclude=["filter"],
    )
    return res.select("doc_id", F.round("score", 6).alias("score"))


SQL_BM25_GROUPED_QUERY = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
q(term, grp) AS (VALUES ('spark', 0), ('flink', 0), ('join', 1)),
qt AS (SELECT DISTINCT term FROM q),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf JOIN qt USING (term) JOIN dfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats s
),
matched AS (
  SELECT doc_id FROM tf JOIN q USING (term)
  GROUP BY doc_id HAVING count(DISTINCT grp) = 2
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored
WHERE doc_id IN (SELECT doc_id FROM matched)
  AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'filter')
GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10
"""


def q_bm25_boosted_query(spark, sf_dir):
    """Query-time term boosts (Lucene 'term^w' syntax): 'spark^2
    join^0.5' — per-term contribution = boost * idf * tfnorm,
    conjunctive candidates. Pins the boost algebra cross-engine;
    serving twins parse the same syntax
    (scoring.parse_grouped_query)."""
    from search_engine_spark.plans.scoring import bm25_exhaustive_grouped

    res = bm25_exhaustive_grouped(
        spark, _postings(spark, sf_dir),
        [["spark"], ["join"]], k=10,
        boosts={"spark": 2.0, "join": 0.5},
    )
    return res.select("doc_id", F.round("score", 6).alias("score"))


SQL_BM25_BOOSTED_QUERY = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
q(term, grp, boost) AS (VALUES ('spark', 0, 2.0), ('join', 1, 0.5)),
scored AS (
  SELECT tf.doc_id, q.grp,
         q.boost * ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf JOIN q USING (term) JOIN dfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats s
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored GROUP BY doc_id
HAVING count(DISTINCT grp) = 2
ORDER BY score DESC, doc_id LIMIT 10
"""


def q_unigram_lm_quality(spark, sf_dir):
    """CCNet-style language-model quality signal, with a corpus
    unigram LM standing in for KenLM (not installable here; the
    Spark-side plumbing — broadcast LM join, per-token log-prob
    aggregation — is what a real LM table would reuse unchanged):
    score(d) = sum_t tf_dt * ln(cf_t / T), emitted in exact integer
    NANO-units (per-term log-prob rounded to 1e-9, then pure BIGINT
    arithmetic): float summation order and double halfway-rounding
    never touch the hashed values (divide by doclen offline for the
    per-token average)."""
    post = _postings(spark, sf_dir)  # term, doc_id, tf, doclen
    cfs = post.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
    tot = post.agg(F.sum("tf").cast("double").alias("total_tokens"))
    lp_nano = F.round(
        F.log(F.col("cf") / F.col("total_tokens")) * F.lit(1e9), 0
    ).cast("long")
    return (
        post.join(cfs, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "doclen")
        .agg(F.sum(lp_nano * F.col("tf")).cast("long").alias("lm_logprob_nano"))
    )


SQL_UNIGRAM_LM_QUALITY = f"""
WITH {_TOK_CTE},
cfs AS (SELECT term, sum(tf)::BIGINT AS cf FROM tf GROUP BY term),
tot AS (SELECT sum(tf)::DOUBLE AS total_tokens FROM tf),
contrib AS (
  SELECT tf.doc_id, dl.doclen,
         round(ln(cfs.cf / t.total_tokens) * 1e9)::BIGINT * tf.tf AS c
  FROM tf JOIN cfs USING (term) JOIN dl USING (doc_id) CROSS JOIN tot t
)
SELECT doc_id, doclen, sum(c)::BIGINT AS lm_logprob_nano
FROM contrib GROUP BY doc_id, doclen
"""


def q_more_like_this(spark, sf_dir):
    """More-like-this (Lucene MLT shape): the source document's top-5
    terms by tf-idf become a disjunctive BM25 query; the source doc is
    excluded from results. tf-idf is rounded to 6 BEFORE ranking
    (cross-engine ln() ulp safety), tie-break term asc; final top-10
    by (rounded score desc, doc_id asc). Fully declarative — term
    selection is a broadcast-joined subplan, no driver collect; at
    scale the source doc's term vector comes from one pruned postings
    read and everything else is the ordinary BM25 OR plan."""
    src_id = 7
    post = _postings(spark, sf_dir)  # term, doc_id, tf, doclen
    dl = post.select("doc_id", "doclen").distinct()
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    )
    dfs = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    src = (
        post.filter(F.col("doc_id") == src_id)
        .join(dfs, "term")
        .crossJoin(F.broadcast(stats))
    )
    tfidf = F.round(
        F.col("tf") * idf_expr(F.col("df"), F.col("n_docs")), 6
    )
    qterms = (
        src.select("term", tfidf.alias("tfidf"))
        .orderBy(F.col("tfidf").desc(), "term")
        .limit(5)
        .select("term")
    )
    cand = (
        post.filter(F.col("doc_id") != src_id)
        .join(F.broadcast(qterms), "term")
        .join(dfs, "term")
        .crossJoin(F.broadcast(stats))
    )
    partial = idf_expr(F.col("df"), F.col("n_docs")) * tfnorm_expr(
        F.col("tf"), F.col("doclen"), F.col("avgdl")
    )
    return (
        cand.groupBy("doc_id")
        .agg(F.round(F.sum(partial), 6).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


SQL_MORE_LIKE_THIS = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
src AS (
  SELECT tf.term,
         round(tf.tf * ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)),
               6) AS tfidf
  FROM tf JOIN dfs USING (term) CROSS JOIN stats s
  WHERE tf.doc_id = 7
),
q AS (SELECT term FROM src ORDER BY tfidf DESC, term LIMIT 5),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf
  JOIN q USING (term)
  JOIN dfs USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  WHERE tf.doc_id <> 7
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 10
"""


# "the term plus its 1-character-deletion variants" as a SQL
# higher-order function — whole-stage codegen, no Python (the same
# expression plans/suggest.py uses at index-build time)
_DELETES_EXPR = (
    "explode(array_distinct(concat(array({c}), "
    "transform(sequence(1, length({c})), "
    "i -> concat(substring({c}, 1, i - 1), "
    "substring({c}, i + 1, length({c}) - i)))))) AS variant"
)


def q_symspell_suggest(spark, sf_dir):
    """Spelling suggestions via a SymSpell symmetric-deletion join —
    the scale path behind fuzzy_term_match (which scans the whole
    vocabulary with levenshtein) and the oracle twin of
    plans/suggest.py: vocabulary terms and probe terms each emit their
    0/1-deletion variants; an equi-join on variant yields the
    candidate set without a vocabulary scan, exact levenshtein <= 1
    confirms, (dist, df desc, term) ranks top-3 per probe. Probes are
    broadcast; the variant table is ~(len+1) x vocab rows."""
    tf = term_frequencies(split_terms(_t(spark, sf_dir, "documents")))
    vocab = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    vd = vocab.selectExpr("term", "df", _DELETES_EXPR.format(c="term"))
    probes = spark.createDataFrame(
        [("serch",), ("spak",), ("qery",)], "probe string"
    )
    pdel = probes.selectExpr("probe", _DELETES_EXPR.format(c="probe"))
    cand = (
        vd.join(F.broadcast(pdel), "variant")
        .select("probe", "term", "df")
        .distinct()
    )
    w = W.partitionBy("probe").orderBy("dist", F.col("df").desc(), "term")
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("probe"), F.col("term")).cast("long")
        )
        .filter(F.col("dist") <= 1)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


_SQL_DELETES = (
    "list_distinct(list_prepend({c}, "
    "[substr({c}, 1, i - 1) || substr({c}, i + 1, length({c}) - i) "
    "for i in range(1, length({c}) + 1)]))"
)

SQL_SYMSPELL_SUGGEST = f"""
WITH {_TOK_CTE},
vocab AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
vd AS (
  SELECT term, df, unnest({_SQL_DELETES.format(c="term")}) AS variant
  FROM vocab
),
probes(probe) AS (VALUES ('serch'), ('spak'), ('qery')),
pdel AS (
  SELECT probe, unnest({_SQL_DELETES.format(c="probe")}) AS variant
  FROM probes
),
cand AS (SELECT DISTINCT probe, term, df FROM pdel JOIN vd USING (variant)),
scored AS (
  SELECT probe, term, df, levenshtein(probe, term)::BIGINT AS dist
  FROM cand WHERE levenshtein(probe, term) <= 1
)
SELECT probe, term, df, dist, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY probe
                               ORDER BY dist, df DESC, term)::BIGINT AS rnk
  FROM scored
) WHERE rnk <= 3
"""


def q_url_canonical_dedup(spark, sf_dir):
    """URL canonicalization as a dedup key (Common-Crawl recrawls of
    one page differ by authority case, default :80 port, utm_*
    tracking params, and fragments — naive url equality
    under-deduplicates). Spark canonicalizes deterministically messy
    synthetic urls with operators.dedup.canonical_url_expr (pure JVM
    regexp chain); the oracle CONSTRUCTS the expected canonical form
    directly, so any canonicalization defect breaks the hash."""
    from search_engine_spark.operators.dedup import canonical_url_expr

    i = F.col("id")
    messy = F.concat(
        F.when(i % 2 == 0, F.lit("HTTP://ExAmple")).otherwise(
            F.lit("http://example")
        ),
        (i % 5).cast("string"),
        F.lit(".com"),
        F.when(i % 3 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p/"),
        (i % 8).cast("string"),
        F.when(
            i % 2 == 0,
            F.concat(F.lit("?utm_source=t&id="), (i % 4).cast("string")),
        ).otherwise(F.concat(F.lit("?id="), (i % 4).cast("string"))),
        F.when(i % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    base = spark.range(240).select(
        i.cast("long").alias("i"), messy.alias("url")
    )
    return (
        base.select("i", canonical_url_expr().alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_snapshots"),
            F.max("i").cast("long").alias("latest_i"),
        )
    )


SQL_URL_CANONICAL_DEDUP = """
WITH base AS (
  SELECT i,
         'http://example' || (i % 5) || '.com/p/' || (i % 8)
           || '?id=' || (i % 4) AS canonical_url
  FROM generate_series(0, 239) t(i)
)
SELECT canonical_url, count(*)::BIGINT AS n_snapshots,
       max(i)::BIGINT AS latest_i
FROM base GROUP BY canonical_url
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling: ~20% of docs per (lang,
    source) stratum, selected by an id-derived md5 bucket — stable
    across runs, engines, and cluster sizes (no Bernoulli RNG), the
    reproducibility a training pipeline needs. Returns per-stratum
    totals and sampled counts plus the sampled-id checksum."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long"),
        F.lit(100),
    )
    flagged = docs.select(
        "lang", "source", "doc_id", (bucket < 20).alias("sampled")
    )
    return flagged.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("sampled").cast("long")).cast("long").alias("n_sampled"),
        F.sum(F.when(F.col("sampled"), F.col("doc_id")).otherwise(0))
        .cast("long").alias("sampled_id_sum"),
    )


SQL_STRATIFIED_SAMPLE = """
WITH f AS (
  SELECT lang, source, doc_id,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100) < 20
           AS sampled
  FROM documents
)
SELECT lang, source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN sampled THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
       sum(CASE WHEN sampled THEN doc_id ELSE 0 END)::BIGINT AS sampled_id_sum
FROM f GROUP BY lang, source
"""


def q_media_frame_sample(spark, sf_dir):
    """Video frame-sampling PLAN: one row per sampled frame timestamp
    (every 1 s, inclusive of 0 and of an exactly-landing end) — the
    Spark-side plumbing for a stubbed frame decoder (sequence +
    explode, pure built-ins)."""
    from search_engine_spark.operators.multimodal import (
        frame_sample_plan,
        make_media_table,
    )

    frames = frame_sample_plan(make_media_table(spark, 200), every_ms=1000)
    return frames.select(
        "media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")
    )


# media metadata is i-derived (multimodal.make_media_table): videos are
# i % 3 == 2, duration_ms = (i * 37) % 60000
SQL_MEDIA_FRAME_SAMPLE = """
WITH v AS (
  SELECT i AS media_id, (i * 37) % 60000 AS duration_ms
  FROM generate_series(0, 199) t(i) WHERE i % 3 = 2
)
SELECT media_id, g::BIGINT AS frame_ts_ms
FROM v, unnest(generate_series(0, duration_ms, 1000)) s(g)
"""


def q_train_split_assignment(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split: the split is a pure
    function of the doc id (md5-derived bucket 0..99), so it is stable
    across runs, cluster sizes, and engines — the property a training
    pipeline needs to never leak validation docs into training."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long"),
        F.lit(100),
    )
    return docs.select(
        "doc_id",
        bucket.cast("long").alias("split_bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


SQL_TRAIN_SPLIT_ASSIGNMENT = """
WITH b AS (
  SELECT doc_id,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100)
           AS split_bucket
  FROM documents
)
SELECT doc_id, split_bucket,
       CASE WHEN split_bucket < 80 THEN 'train'
            WHEN split_bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def q_split_contamination(spark, sf_dir):
    """Benchmark-decontamination check over the deterministic split
    ([[train_split_assignment]]): eval (val/test) docs sharing at least
    one exact 4-gram with ANY train doc, with the count of distinct
    shared 4-grams. The web-scale recipe (13-gram overlap against the
    training set) at test size — the plan is the scale plan: shingles
    exploded in-row, one equi-join keyed on the shingle string (shuffle
    co-partitioned; never a cross join), count-distinct per eval doc.
    At 10^12 docs the train side is hashed to fingerprints first; the
    join shape is identical."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long"),
        F.lit(100),
    )
    with_split = docs.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
        F.split("text", " ").alias("t"),
    )
    sh = with_split.select(
        "doc_id",
        "split",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size("t") - 4, F.lit(0))),
                    lambda i: F.concat_ws(" ", F.slice("t", i + 1, 4)),
                )
            )
        ).alias("sh"),
    )
    train_sh = sh.filter(F.col("split") == "train").select("sh").distinct()
    return (
        sh.filter(F.col("split") != "train")
        .join(train_sh, "sh")
        .groupBy("doc_id", "split")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


SQL_SPLIT_CONTAMINATION = """
WITH b AS (
  SELECT doc_id, text,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100)
           AS sb
  FROM documents
),
d AS (
  SELECT doc_id,
         CASE WHEN sb < 80 THEN 'train'
              WHEN sb < 90 THEN 'val'
              ELSE 'test' END AS split,
         string_split(text, ' ') AS w
  FROM b
),
sh AS (
  SELECT DISTINCT doc_id, split, array_to_string(w[i:i+3], ' ') AS sh
  FROM d, unnest(generate_series(1, greatest(len(w) - 3, 1))) AS g(i)
),
tr AS (SELECT DISTINCT sh FROM sh WHERE split = 'train')
SELECT s.doc_id, s.split, count(*)::BIGINT AS n_shared
FROM sh s JOIN tr USING (sh)
WHERE s.split <> 'train'
GROUP BY 1, 2
"""


def q_embedding_quantization(spark, sf_dir):
    """int8 symmetric quantization audit per embedding: scale =
    max|x| / 127 and the max absolute dequantization error (max is
    order-independent -> engine-comparable)."""
    emb = _t(spark, sf_dir, "embeddings")
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    mx = F.array_max(F.transform(x, lambda v: F.abs(v)))
    scale = mx / F.lit(127.0)
    err = F.array_max(
        F.transform(x, lambda v: F.abs(v - F.round(v / scale) * scale))
    )
    return emb.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.round(err, 6).alias("max_abs_err"),
    )


SQL_EMBEDDING_QUANTIZATION = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
), s AS (
  SELECT vec_id, x,
         list_max(list_transform(x, v -> abs(v))) / 127.0 AS scale
  FROM e
)
SELECT vec_id, round(scale, 6) AS scale,
       round(list_max(list_transform(
           x, v -> abs(v - round(v / scale) * scale))), 6) AS max_abs_err
FROM s
"""


# ---------------------------------------------------------------------------
# Engine-path (full analyzer) — rows-only checks, no SQL equivalent
# ---------------------------------------------------------------------------

def q_bm25_stemmed_topk(spark, sf_dir):
    """Full engine analyzer (Unicode tokenize + Porter stem) BM25.
    Porter stemming is not ANSI-SQL-expressible -> rows-only check;
    rank identity is enforced by the pytest golden suite instead."""
    docs = _t(spark, sf_dir, "documents")
    postings = postings_from_text(docs, stem=True)
    return bm25_exhaustive(spark, postings, "sparking joins", k=10, stem=True)


def q_minhash_lsh_pairs(spark, sf_dir):
    """Near-dup candidates via MinHash+LSH — the JVM-side min-md5
    variant (lexicographic min over md5(h||':'||shingle) IS a minhash;
    fully oracle-checkable). The Arrow-kernel integer minhash is the
    alternative impl, pytest-equivalence-anchored."""
    from search_engine_spark.operators.dedup import minhash_lsh_pairs_jvm

    return minhash_lsh_pairs_jvm(
        _t(spark, sf_dir, "documents"), bands=4, rows_per_band=4, shingle_n=3
    )


# shared CTE text: word shingles -> 16 min-md5 hashes -> 4 bands
_MINHASH_CTES = """
t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
shl AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(0, greatest(len(w) - 3, 0)),
           i -> array_to_string(w[i+1:i+3], ' '))) AS sh
  FROM t
), hs AS (
  SELECT doc_id, h,
         list_aggregate(list_transform(sh, s -> md5(h || ':' || s)), 'min') AS v
  FROM shl, generate_series(0, 15) g(h)
), bands AS (
  SELECT doc_id, h // 4 AS band_id,
         string_agg(v, '|' ORDER BY h) AS band_key
  FROM hs GROUP BY doc_id, h // 4
)"""

SQL_MINHASH_LSH_PAIRS = f"""
WITH {_MINHASH_CTES}
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
FROM bands l JOIN bands r
  ON l.band_id = r.band_id AND l.band_key = r.band_key
 AND l.doc_id < r.doc_id
"""


def q_dedup_clusters(spark, sf_dir):
    """Duplicate-CLUSTER assignment: connected components over the
    minhash-LSH candidate graph (iterative min-label propagation —
    converges in O(component diameter) equi-join rounds); cluster_id =
    min doc_id of the component, singletons keep their own id."""
    from search_engine_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs_jvm,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs_jvm(docs, bands=4, rows_per_band=4, shingle_n=3)
    return connected_components(pairs, docs.select("doc_id"))


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_MINHASH_CTES},
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id
), sym AS (
  SELECT a AS x, b AS y FROM pairs
  UNION ALL
  SELECT b AS x, a AS y FROM pairs
), cc AS (
  SELECT doc_id AS x, doc_id AS label FROM documents
  UNION
  SELECT s.x, cc.label FROM cc JOIN sym s ON cc.x = s.y
)
SELECT x AS doc_id, min(label)::BIGINT AS cluster_id FROM cc GROUP BY x
"""


def q_simhash_fingerprints(spark, sf_dir):
    from search_engine_spark.operators.dedup import simhash60

    return simhash60(_t(spark, sf_dir, "documents"))


SQL_SIMHASH_FINGERPRINTS = f"""
WITH {_TOK_CTE},
hs AS (
  SELECT doc_id, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM tok2
), bits AS (
  SELECT doc_id, b,
         CASE WHEN sum(((h >> b) & 1) * 2 - 1) > 0
              THEN (1::BIGINT << b) ELSE 0 END AS v
  FROM hs, generate_series(0, 59) g(b)
  GROUP BY doc_id, b
), agg AS (
  SELECT doc_id, sum(v)::BIGINT AS simhash FROM bits GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.simhash, 0)::BIGINT AS simhash
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q_lang_id(spark, sf_dir):
    from search_engine_spark.operators.textstats import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


def _lang_id_sql() -> str:
    from search_engine_spark.operators.textstats import lang_profile_rows

    vals = ", ".join(f"('{g}', '{l}', {w})" for g, l, w in lang_profile_rows())
    return f"""
WITH prof(gram, lang, weight) AS (VALUES {vals}),
g1 AS (
  SELECT doc_id, substr(lower(text), i, 2) AS gram
  FROM documents,
       unnest(generate_series(1, length(lower(text)) - 1)) AS g(i)
), counts AS (
  SELECT doc_id, gram, count(*)::BIGINT AS cnt
  FROM g1 WHERE gram IN (SELECT gram FROM prof)
  GROUP BY doc_id, gram
), norms AS (
  SELECT doc_id, sqrt(sum(cnt * cnt)) AS nv FROM counts GROUP BY doc_id
), dots AS (
  SELECT doc_id, lang, sum(cnt * weight)::BIGINT AS dot
  FROM counts JOIN prof USING (gram) GROUP BY doc_id, lang
), best AS (
  SELECT doc_id, lang, dot,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY dot DESC, lang ASC) AS rn
  FROM dots
), scored AS (
  SELECT b.doc_id, b.lang AS lang_pred,
         round(b.dot / (n.nv * sqrt(385.0)), 6) AS lang_conf
  FROM best b JOIN norms n USING (doc_id) WHERE rn = 1
)
SELECT d.doc_id, coalesce(s.lang_pred, 'und') AS lang_pred,
       coalesce(s.lang_conf, 0.0) AS lang_conf
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


SQL_LANG_ID = _lang_id_sql()


def q_content_fingerprints(spark, sf_dir):
    """Portable md5-derived 60-bit fingerprints (oracle-checkable);
    the xxhash64 variant (textstats.fingerprint) is the one-hash
    engine-internal scale path, pinned by pytest instead."""
    from search_engine_spark.operators.textstats import fingerprint_md5

    return fingerprint_md5(_t(spark, sf_dir, "documents"))


SQL_CONTENT_FINGERPRINTS = """
SELECT doc_id,
       ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp_raw,
       ('0x' || substr(md5(array_to_string(
           list_filter(string_split(text, ' '), x -> x <> ''), ' ')),
         1, 15))::BIGINT AS fp_norm
FROM documents
"""


def q_ivf_cosine_topk(spark, sf_dir):
    """ANN scale path #2: IVF coarse quantizer with seeded (sampled
    data point) centroids and a single nearest-cell assignment, probe
    the 3 nearest cells, exact re-rank inside them. The seeded build
    is pure relational algebra (rounded-cosine argmax, id tie-break),
    so DuckDB replays it exactly — value-hash oracle-checked. The
    distributed k-means quantizer (ivf_build) is the production path;
    its nprobe=all == brute-force property is pytest-checked."""
    from search_engine_spark.operators.similarity import (
        ivf_build_seeded, ivf_topk_seeded,
    )

    emb = _t(spark, sf_dir, "embeddings")
    assigned, cents = ivf_build_seeded(emb, n_centroids=8)
    qv = list(emb.filter(F.col("vec_id") == 0).first().embedding)
    return ivf_topk_seeded(assigned, cents, qv, k=10, nprobe=3)


SQL_IVF_COSINE_TOPK = """
WITH cents AS (
  SELECT vec_id::INT AS c, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < 8
),
asg0 AS (
  SELECT e.vec_id, e.embedding, c,
         round(list_dot_product(e.embedding::DOUBLE[], cv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(cv, cv))), 6) AS cs
  FROM embeddings e CROSS JOIN cents
),
assigned AS (
  SELECT vec_id, embedding, c AS centroid
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cs DESC, c ASC) AS rn
        FROM asg0)
  WHERE rn = 1
),
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
probes AS (
  SELECT c FROM cents CROSS JOIN qv
  ORDER BY round(list_dot_product(cv, v)
                 / (sqrt(list_dot_product(cv, cv))
                    * sqrt(list_dot_product(v, v))), 6) DESC, c ASC
  LIMIT 3
)
SELECT a.vec_id,
       round(list_dot_product(a.embedding::DOUBLE[], v)
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(v, v))), 6) AS cos
FROM assigned a JOIN probes ON a.centroid = probes.c CROSS JOIN qv
ORDER BY cos DESC, a.vec_id ASC
LIMIT 10
"""


def q_lsh_cosine_topk(spark, sf_dir):
    """ANN scale path: LSH-bucketed cosine top-k. Uses the
    md5-derived deterministic hyperplanes (det_hyperplanes) so DuckDB
    can rebuild the exact bucket keys -> value-hash oracle-checked;
    recall properties for the Gaussian-plane production variant stay
    pytest-checked."""
    from search_engine_spark.operators.similarity import (
        det_hyperplanes, lsh_bucket_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return lsh_bucket_topk(emb, qs, k=5, planes=det_hyperplanes(64, 6))


SQL_LSH_COSINE_TOPK = """
WITH planes AS (
  SELECT p, d,
         ('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 15))::BIGINT
           / 1152921504606846976.0 * 2 - 1 AS w
  FROM range(6) tp(p) CROSS JOIN range(64) td(d)
),
comps AS (
  SELECT vec_id, d, embedding[d + 1]::DOUBLE AS x
  FROM embeddings CROSS JOIN range(64) td(d)
),
dots AS (
  SELECT c.vec_id, pl.p, sum(pl.w * c.x) AS dot
  FROM comps c JOIN planes pl ON c.d = pl.d
  GROUP BY c.vec_id, pl.p
),
bkt AS (
  SELECT vec_id,
         sum(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
  FROM dots GROUP BY vec_id
),
base AS (
  SELECT e.vec_id, e.embedding, b.bucket
  FROM embeddings e JOIN bkt b USING (vec_id)
),
qs AS (
  SELECT e.vec_id AS query_id, e.embedding AS qv, b.bucket
  FROM embeddings e JOIN bkt b USING (vec_id) WHERE e.vec_id < 4
),
scored AS (
  SELECT q.query_id, base.vec_id,
         list_dot_product(base.embedding::DOUBLE[], q.qv::DOUBLE[])
           / (sqrt(list_dot_product(base.embedding::DOUBLE[], base.embedding::DOUBLE[]))
              * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))) AS cos
  FROM base JOIN qs q ON base.bucket = q.bucket
)
SELECT query_id, vec_id, round(cos, 6) AS cos, rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, vec_id ASC)::BIGINT AS rank
      FROM scored)
WHERE rank <= 5
"""


def q_embedding_near_dup(spark, sf_dir):
    """Dedup family: embedding-cosine near-duplicate pairs, EXACT
    brute-force baseline (threshold on the rounded cosine). The
    LSH-bucketed scale path is near_dup_lsh (rows-only)."""
    from search_engine_spark.operators.similarity import exact_near_dup

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return exact_near_dup(emb, threshold=0.4).orderBy("x", "y")


SQL_EMBEDDING_NEAR_DUP = """
WITH c AS (
  SELECT a.vec_id AS x, b.vec_id AS y,
         round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
            * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
           AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT x, y, cos FROM c WHERE cos >= 0.4 ORDER BY x, y
"""


def q_near_dup_lsh(spark, sf_dir):
    """Dedup family scale path: embedding-cosine near-dup pairs found
    inside LSH buckets (approximate by design -> rows-only; soundness
    [every pair really >= threshold] and planted-dup recall are
    pytest-checked)."""
    from search_engine_spark.operators.similarity import pairwise_near_dup

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return pairwise_near_dup(emb, threshold=0.4, n_planes=4).orderBy("x", "y")


def q_multimodal_features(spark, sf_dir):
    """Binary-payload feature extraction plumbing (decode stubbed —
    no media libs in this container; schema/batching are real).
    Projects driver-comparable SCALAR columns (the raw array<float>
    column is unhashable for the driver's pandas canonicalizer): id,
    exact-integer-derived feature norm, and the leading components."""
    from search_engine_spark.operators.multimodal import (
        extract_features,
        make_media_table,
    )

    feats = extract_features(make_media_table(spark, 200))
    return feats.select(
        "media_id",
        F.round("feat_norm", 6).alias("feat_norm"),
        *[
            F.round(F.element_at("features", j + 1).cast("double"), 6).alias(f"f{j}")
            for j in range(4)
        ],
    )


# The stub feature bytes are md5(payload_hex) || md5(md5(payload_hex)||'x')
# and payload_hex = repeat(md5('media'||i), 4+i%7) — reproducible from
# generate_series with no external data (multimodal.py stub contract).
SQL_MULTIMODAL_FEATURES = """
WITH m AS (
  SELECT i AS media_id, repeat(md5('media' || i), 4 + i % 7) AS ph
  FROM generate_series(0, 199) t(i)
), h AS (
  SELECT media_id, md5(ph) AS h1 FROM m
), hx AS (
  SELECT media_id, h1 || md5(h1 || 'x') AS hex64 FROM h
), b AS (
  SELECT media_id, j,
         ('0x' || substr(hex64, 2 * j + 1, 2))::BIGINT AS byte
  FROM hx, generate_series(0, 31) g(j)
)
SELECT media_id,
       round(sqrt(sum(byte * byte)) / 255.0, 6) AS feat_norm,
       round((max(CASE WHEN j = 0 THEN byte END) / 255.0)::FLOAT::DOUBLE, 6) AS f0,
       round((max(CASE WHEN j = 1 THEN byte END) / 255.0)::FLOAT::DOUBLE, 6) AS f1,
       round((max(CASE WHEN j = 2 THEN byte END) / 255.0)::FLOAT::DOUBLE, 6) AS f2,
       round((max(CASE WHEN j = 3 THEN byte END) / 255.0)::FLOAT::DOUBLE, 6) AS f3
FROM b GROUP BY media_id
"""


# ---------------------------------------------------------------------------
# Phrase queries + n-gram repetition quality (operators/phrases.py)
# ---------------------------------------------------------------------------

PHRASE2 = ["table", "hash"]          # 2-word phrase, multi-occurrence docs
PHRASE3 = ["slow", "hash", "batch"]  # 3-word phrase


def q_phrase_match_counts(spark, sf_dir):
    """Exact consecutive-phrase frequency per doc ("table hash"),
    overlapping windows counted — the scan-path phrase operator
    (sliding-window HOFs, codegen, zero shuffle). The index path
    (positional postings, LocalSearcher.search_phrase) is
    property-tested equal in tests/test_phrases.py."""
    from search_engine_spark.operators.phrases import phrase_counts

    return phrase_counts(_t(spark, sf_dir, "documents"), PHRASE2)


SQL_PHRASE_MATCH_COUNTS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
hits AS (
  SELECT doc_id
  FROM t, unnest(generate_series(1, len(w) - 1)) AS s(i)
  WHERE len(w) >= 2 AND w[i] = 'table' AND w[i + 1] = 'hash'
)
SELECT doc_id, count(*)::BIGINT AS phrase_tf FROM hits GROUP BY doc_id
"""


def q_phrase_topk(spark, sf_dir):
    """Top-10 docs for a 3-word phrase by (phrase_tf desc, doc_id asc)
    with explicit ranks — TakeOrderedAndProject, no full sort."""
    from search_engine_spark.operators.phrases import phrase_topk

    return phrase_topk(_t(spark, sf_dir, "documents"), PHRASE3, 10)


SQL_PHRASE_TOPK = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
hits AS (
  SELECT doc_id
  FROM t, unnest(generate_series(1, len(w) - 2)) AS s(i)
  WHERE len(w) >= 3 AND w[i] = 'slow' AND w[i + 1] = 'hash'
        AND w[i + 2] = 'batch'
), c AS (
  SELECT doc_id, count(*)::BIGINT AS phrase_tf FROM hits GROUP BY doc_id
)
SELECT doc_id, phrase_tf,
       row_number() OVER (ORDER BY phrase_tf DESC, doc_id ASC)::BIGINT AS rank
FROM c ORDER BY phrase_tf DESC, doc_id ASC LIMIT 10
"""


def q_dup_ngram_quality(spark, sf_dir):
    """Gopher-style repetition signals: per-doc duplicate bigram /
    trigram fractions (1 - distinct/total), array built-ins only."""
    from search_engine_spark.operators.phrases import dup_ngram_stats

    return dup_ngram_stats(_t(spark, sf_dir, "documents"))


SQL_DUP_NGRAM_QUALITY = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE len(string_split(text, ' ')) >= 3),
g2 AS (
  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
  FROM t, unnest(generate_series(1, len(w) - 1)) AS s(i)
), g3 AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
  FROM t, unnest(generate_series(1, len(w) - 2)) AS s(i)
), a2 AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
         round(1.0 - count(DISTINCT g)::DOUBLE / count(*), 6) AS dup_bigram_frac
  FROM g2 GROUP BY doc_id
), a3 AS (
  SELECT doc_id, count(*)::BIGINT AS n_trigrams,
         round(1.0 - count(DISTINCT g)::DOUBLE / count(*), 6) AS dup_trigram_frac
  FROM g3 GROUP BY doc_id
)
SELECT a2.doc_id, n_bigrams, dup_bigram_frac, n_trigrams, dup_trigram_frac
FROM a2 JOIN a3 USING (doc_id)
"""


def q_phrase_snippets(spark, sf_dir):
    """Keyword-in-context snippets: for every doc containing the
    phrase, the 1-based offset of the FIRST occurrence and a snippet
    of up to 3 tokens of context either side — the result-page
    highlighting surface, all JVM higher-order functions."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    k = len(PHRASE2)
    target = F.array(*[F.lit(w) for w in PHRASE2])
    # guard: sequence(1, 0) would be DESCENDING in Spark and slice()
    # rejects start 0 — docs shorter than the phrase yield null
    first = F.when(
        F.size(toks) >= k,
        F.try_element_at(
            F.filter(
                F.sequence(F.lit(1), F.size(toks) - k + 1),
                lambda i: F.slice(toks, i, k) == target,
            ),
            F.lit(1),
        ),
    )
    start = F.greatest(first - 3, F.lit(1))
    end = F.least(first + k + 2, F.size(toks))
    return docs.select(
        "doc_id",
        first.cast("long").alias("first_pos"),
        F.array_join(F.slice(toks, start, end - start + 1), " ").alias(
            "snippet"
        ),
    ).filter(F.col("first_pos").isNotNull())


SQL_PHRASE_SNIPPETS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
m AS (
  SELECT doc_id, w,
         list_filter(generate_series(1, greatest(len(w) - 1, 0)),
                     i -> w[i] = 'table' AND w[i + 1] = 'hash')[1] AS first_pos
  FROM t
)
SELECT doc_id, first_pos::BIGINT AS first_pos,
       array_to_string(w[greatest(first_pos - 3, 1) : first_pos + 4], ' ')
         AS snippet
FROM m WHERE first_pos IS NOT NULL
"""


def q_near_query(spark, sf_dir):
    """Proximity query: docs where 'slow' and 'batch' co-occur within
    3 tokens, with the minimal token distance — posexplode + per-doc
    position self-join (only the two terms' rows shuffle). Serving
    twin: PhraseSearcher.near_counts (property-tested equal)."""
    from search_engine_spark.operators.phrases import near_counts

    return near_counts(_t(spark, sf_dir, "documents"), "slow", "batch", 3)


SQL_NEAR_QUERY = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
p AS (
  SELECT doc_id, i, w[i] AS term
  FROM t, unnest(generate_series(1, len(w))) AS s(i)
),
a AS (SELECT doc_id, i AS pa FROM p WHERE term = 'slow'),
b AS (SELECT doc_id, i AS pb FROM p WHERE term = 'batch')
SELECT a.doc_id, min(abs(pa - pb))::BIGINT AS min_dist
FROM a JOIN b ON a.doc_id = b.doc_id
WHERE abs(pa - pb) <= 3
GROUP BY a.doc_id
"""


def q_hybrid_rrf_topk(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical ranking fused with embedding
    cosine ranking by reciprocal rank fusion (Cormack et al. 2009,
    rrf = Σ 1/(60 + rank)). Ranks are computed on 6-rounded scores
    (cross-engine float-stable) with id tie-breaks; candidates are the
    top-20 of each system; fusion is a full outer join (a doc ranked
    by only one system still scores)."""
    lex_scores = bm25_exhaustive(
        spark, _postings(spark, sf_dir), "spark join", k=20, stem=False
    ).select("doc_id", F.round("score", 6).alias("s"))
    w = W.orderBy(F.desc("s"), F.asc("doc_id"))
    lex = lex_scores.select(
        "doc_id", F.row_number().over(w).alias("lex_rank")
    ).filter(F.col("lex_rank") <= 20)

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cos = emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(_cosine_cols(F.col("embedding"), F.col("qv")), 6).alias("c"),
    )
    # Bound FIRST (TakeOrderedAndProject — a distributed per-partition
    # top-k + driver merge of 20-row heads), THEN rank the <=20
    # survivors: a row_number window over the raw cosine table would
    # funnel every embedding through one task at 100x (round-4 verdict
    # item #2). The lexical side is already bounded by
    # bm25_exhaustive(k=20).
    wv = W.orderBy(F.desc("c"), F.asc("doc_id"))
    vec = (
        cos.orderBy(F.desc("c"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", F.row_number().over(wv).alias("vec_rank"))
    )

    fused = (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (60 + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("vec_rank")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(10)
    )
    return fused


SQL_HYBRID_RRF_TOPK = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
q AS (SELECT * FROM (VALUES ('spark'), ('join')) AS t(term)),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf JOIN q USING (term) JOIN dfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats s
),
lex0 AS (
  SELECT doc_id, round(sum(partial), 6) AS s
  FROM scored GROUP BY doc_id HAVING count(*) = 2
),
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS lex_rank
  FROM lex0 QUALIFY lex_rank <= 20
),
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
cosd AS (
  SELECT vec_id AS doc_id,
         round(list_dot_product(embedding::DOUBLE[], v)
               / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                  * sqrt(list_dot_product(v, v))), 6) AS c
  FROM embeddings CROSS JOIN qv
),
vec AS (
  SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id ASC) AS vec_rank
  FROM cosd QUALIFY vec_rank <= 20
)
SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
       round(coalesce(1.0 / (60 + lex_rank), 0)
             + coalesce(1.0 / (60 + vec_rank), 0), 6) AS rrf_score
FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
ORDER BY rrf_score DESC, coalesce(lex.doc_id, vec.doc_id) ASC
LIMIT 10
"""


def q_source_collapsed_topk(spark, sf_dir):
    """Serving-side result diversification: BM25 'the data' ranking
    collapsed to at most 2 hits per `source` (site collapse), global
    top-10 of the survivors (plans/scoring.collapse_top_hits). The
    full match set feeds the collapse — a pre-cut top-k would starve
    sources ranked below the cut."""
    from search_engine_spark.plans.scoring import (
        bm25_exhaustive, collapse_top_hits,
    )

    docs = _t(spark, sf_dir, "documents")
    scored = bm25_exhaustive(
        spark, _postings(spark, sf_dir), "the data", k=1_000_000,
        stem=False,
    )
    out = collapse_top_hits(
        scored, docs, key="source", per_key=2, k=10,
    )
    return out.select(
        "doc_id", "source", F.round("score", 6).alias("score"), "key_rank"
    )


SQL_SOURCE_COLLAPSED_TOPK = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
q AS (SELECT * FROM (VALUES ('the'), ('data')) AS t(term)),
scored0 AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf JOIN q USING (term) JOIN dfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats s
),
scored AS (
  SELECT doc_id, sum(partial) AS score
  FROM scored0 GROUP BY doc_id HAVING count(*) = 2
),
keyed AS (
  SELECT s.doc_id, d.source, s.score,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY s.score DESC, s.doc_id ASC)::BIGINT
           AS key_rank
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT doc_id, source, round(score, 6) AS score, key_rank
FROM keyed WHERE key_rank <= 2
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""


def q_domain_mixture(spark, sf_dir):
    """Training-mixture rebalancing: per (lang, source) doc counts and
    temperature-0.7 sampling weights (w ∝ p^0.7 — flattens the head
    domain the way CCNet/Pile-style mixtures do). One group-by plus a
    broadcast-sized weight normalization."""
    from search_engine_spark.operators.sampling import domain_mixture

    return domain_mixture(_t(spark, sf_dir, "documents"),
                          ("lang", "source"), temperature=0.7)


SQL_DOMAIN_MIXTURE = """
WITH c AS (
  SELECT lang, source, count(*)::BIGINT AS n_docs
  FROM documents GROUP BY lang, source
),
p AS (
  SELECT *, n_docs / (sum(n_docs) OVER ())::DOUBLE AS share,
         pow(n_docs / (sum(n_docs) OVER ())::DOUBLE, 0.7) AS pw
  FROM c
)
SELECT lang, source, n_docs, round(share, 6) AS share,
       round(pw / sum(pw) OVER (), 6) AS weight,
       round(pw / sum(pw) OVER () * 100000, 2) AS per_100k
FROM p
"""


def q_sequence_packing(spark, sf_dir):
    """Pretraining sequence packing: docs concatenated in id order and
    chunked every 512 whitespace tokens; each doc assigned to the pack
    where its first token lands (operators/sampling.sequence_packing —
    one window cumsum, no Python)."""
    from search_engine_spark.operators.sampling import sequence_packing

    return sequence_packing(_t(spark, sf_dir, "documents"), budget=512)


SQL_SEQUENCE_PACKING = """
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
           AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens) AS strt
  FROM t
)
SELECT doc_id, n_tokens, (strt // 512)::BIGINT AS pack_id,
       row_number() OVER (PARTITION BY (strt // 512)
                          ORDER BY doc_id)::BIGINT AS pack_pos
FROM c
"""


def q_filtered_ann_topk(spark, sf_dir):
    """Metadata-filtered vector search: cosine top-10 among embeddings
    with label = 3 only (the filter prunes BEFORE the distance math —
    at scale it partition-prunes a label-partitioned table)."""
    from search_engine_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    qv = list(emb.filter(F.col("vec_id") == 0).first().embedding)
    return cosine_topk(emb.filter(F.col("label") == 3), qv, k=10)


SQL_FILTERED_ANN_TOPK = """
WITH qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], v)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(v, v))), 6) AS cos
FROM embeddings CROSS JOIN qv
WHERE label = 3
ORDER BY cos DESC, vec_id ASC
LIMIT 10
"""


def q_contains_term_stats(spark, sf_dir):
    """Wildcard '*ark*' dictionary scan: df + cf for every vocabulary
    term CONTAINING a substring (complements prefix_term_stats; the
    serving-side analogue walks the same row-group-pruned dictionary
    with a contains predicate)."""
    tf = term_frequencies(split_terms(_t(spark, sf_dir, "documents")))
    return (
        tf.filter(F.col("term").contains("ark"))
        .groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
    )


SQL_CONTAINS_TERM_STATS = f"""
WITH {_TOK_CTE}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM tf WHERE term LIKE '%ark%' GROUP BY term
"""


def q_regex_term_stats(spark, sf_dir):
    """Wildcard '?a*' (regex '^.a') dictionary scan: df + cf for
    every vocabulary term matching an anchored regular expression —
    the double-ended wildcard shape neither the prefix range scan nor
    the contains predicate covers. Serving twins:
    LocalSearcher.vocab_terms(regex=) (vectorized pyarrow
    match_substring_regex over the 2-column dictionary, O(vocabulary)
    by design — Lucene's RegexpQuery walks the term FST the same way)
    and the `query.py --terms-matching 's*k'` CLI; bare `ab*` clauses
    in ranked queries rewrite through the same scan
    (scoring.expand_wildcard, tests/test_wildcard.py)."""
    tf = term_frequencies(split_terms(_t(spark, sf_dir, "documents")))
    return (
        tf.filter(F.col("term").rlike("^.a"))
        .groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
    )


SQL_REGEX_TERM_STATS = f"""
WITH {_TOK_CTE}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM tf WHERE regexp_matches(term, '^.a') GROUP BY term
"""


def q_fielded_topk(spark, sf_dir):
    """Field-scoped clause conjunction (Lucene `title:spark join` —
    plans/multifield.search_fielded semantics): the title clause must
    match IN THE TITLE FIELD and the bare clause in the body; score =
    title-field BM25(spark) + body BM25(join), each against its own
    field statistics; conjunction is an inner join. Title is the
    deterministic first-6-tokens surrogate the multifield_bm25 entry
    established (the pages path indexes the real <title>). Serving
    twins: search_fielded (clause-postings intersection, exhaustive
    across fields by design — cross-field conjunction can't ride one
    field's baked impacts) ≡ search_fielded_distributed (per-clause
    match frames, doc_id equi-join) ≡ pandas, tests/test_fielded.py;
    CLI auto-routes `field:` clauses over built fields."""
    qb = spark.createDataFrame([("join",)], "term string")
    qt = spark.createDataFrame([("spark",)], "term string")

    def field_scores(post, qdf, alias):
        cand = post.join(F.broadcast(qdf), "term")
        dfs = cand.groupBy("term").agg(F.count("*").alias("df"))
        stats = (
            post.select("doc_id", "doclen").dropDuplicates(["doc_id"])
            .agg(F.count("*").alias("n_docs"),
                 F.avg("doclen").alias("avgdl"))
        )
        scored = (
            cand.join(F.broadcast(dfs), "term")
            .crossJoin(F.broadcast(stats))
            .withColumn(
                "partial",
                idf_expr(F.col("df"), F.col("n_docs"))
                * tfnorm_expr(F.col("tf"), F.col("doclen"),
                              F.col("avgdl")),
            )
        )
        return scored.groupBy("doc_id").agg(
            F.sum("partial").alias(alias)
        )

    body = field_scores(_postings(spark, sf_dir), qb, "body_score")
    docs = _t(spark, sf_dir, "documents")
    ttok = docs.select(
        "doc_id",
        F.explode(F.slice(F.split(F.col("text"), " "), 1, 6)).alias("term"),
    ).filter(F.col("term") != "")
    tpost = (
        ttok.groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
        .withColumn(
            "doclen",
            F.sum("tf").over(W.partitionBy("doc_id")).cast("int"),
        )
    )
    title = field_scores(tpost, qt, "title_score")
    return (
        body.join(title, "doc_id")  # conjunction: both clauses match
        .select(
            "doc_id",
            F.round(F.col("body_score") + F.col("title_score"), 6)
            .alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


SQL_FIELDED_TOPK = f"""
WITH {_TOK_CTE},
qb(term) AS (VALUES ('join')),
qt(term) AS (VALUES ('spark')),
bstats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
bdfs AS (SELECT term, count(*)::BIGINT AS df FROM tf JOIN qb USING (term)
         GROUP BY term),
body AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (s.n_docs - bdfs.df + 0.5) / (bdfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl))))
           AS body_score
  FROM tf JOIN qb USING (term) JOIN bdfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN bstats s
  GROUP BY tf.doc_id
),
ttok AS (
  SELECT doc_id,
         unnest(list_slice(string_split(text, ' '), 1, 6)) AS term
  FROM documents
),
ttf AS (SELECT term, doc_id, count(*)::INT AS tf FROM ttok
        WHERE term <> '' GROUP BY term, doc_id),
tdlen AS (SELECT doc_id, sum(tf)::INT AS doclen FROM ttf GROUP BY doc_id),
tstats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl
           FROM tdlen),
tdfs AS (SELECT term, count(*)::BIGINT AS df FROM ttf JOIN qt USING (term)
         GROUP BY term),
title AS (
  SELECT ttf.doc_id,
         sum(ln(1.0 + (s.n_docs - tdfs.df + 0.5) / (tdfs.df + 0.5))
           * (ttf.tf * {K1 + 1.0} / (ttf.tf + {K1} * ({1.0 - B} + {B} * tdlen.doclen / s.avgdl))))
           AS title_score
  FROM ttf JOIN qt USING (term) JOIN tdfs USING (term)
  JOIN tdlen USING (doc_id) CROSS JOIN tstats s
  GROUP BY ttf.doc_id
)
SELECT body.doc_id,
       round(body.body_score + title.title_score, 6) AS score
FROM body JOIN title ON body.doc_id = title.doc_id
ORDER BY score DESC, body.doc_id LIMIT 10
"""


def q_lm_dirichlet_topk(spark, sf_dir):
    """Query-likelihood ranking with Dirichlet smoothing (Zhai &
    Lafferty 2001, μ=2000) — the second pluggable similarity next to
    BM25 (Lucene ships the same pair): score = Σ_matched
    [ln(1+tf/(μ·p_t)) + ln(μ/(μ+dl))], p_t = cf_t/total_tokens.
    Runs scoring.lmd_exhaustive (broadcast query join → per-term cf +
    1-row total → codegen partial → groupBy top-k, all JVM-side);
    serving twin LocalSearcher.search_lmd (vectorized decode +
    np.unique reduction; exhaustive by design — the baked segment
    bounds are BM25 impacts, and Lucene likewise bakes impacts
    per-similarity), CLI `query.py --similarity lmd`; ≡ property in
    tests/test_lmd.py."""
    return lmd_exhaustive(
        spark, _postings(spark, sf_dir), ["spark", "data"],
        k=10, stem=False, mode="or",
    ).select("doc_id", F.round("score", 6).alias("score"))


SQL_LM_DIRICHLET_TOPK = f"""
WITH {_TOK_CTE},
tot AS (SELECT sum(doclen)::DOUBLE AS total FROM dl),
q(term) AS (VALUES ('spark'), ('data')),
cfs AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tf JOIN q USING (term)
        GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + tf.tf / (2000.0 * cfs.cf / t.total))
           + ln(2000.0 / (2000.0 + dl.doclen)) AS partial
  FROM tf JOIN q USING (term) JOIN cfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN tot t
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# Link graph: PageRank + static-score blending (operators/graph.py)
# ---------------------------------------------------------------------------

def q_bigram_postings(spark, sf_dir):
    """The phrase-acceleration bigram table's BUILD aggregation
    (plans/bigrams.py — the nextword index of Williams/Zobel/Bahle
    2004): per-doc adjacency counts for every token pair touching a
    hot term, exactly the rows build_bigrams writes. Runs the REAL
    Arrow-batched kernel with a fixed hot set {'the', 'a'} (the
    documents fixture's stopword head) so DuckDB can replay it:
    unnest token pairs, filter on either endpoint hot, count per
    (pair, doc). The documents table is markup-free lowercase, where
    the engine analyzer equals whitespace split — the same surrogate
    convention the other text entries use."""
    from search_engine_spark.plans.bigrams import (
        BIGRAMS_SCHEMA, _bigrams_kernel,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rows = docs.mapInPandas(
        _bigrams_kernel(False, "text", "doc_id", None, ["the", "a"]),
        BIGRAMS_SCHEMA,
    )
    return rows.select(
        "term", "doc_id", F.col("tf").cast("long").alias("tf")
    )


SQL_BIGRAM_POSTINGS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM t, unnest(generate_series(1, len(w) - 1)) AS s(i)
  WHERE len(w) >= 2
)
SELECT w1 || ' ' || w2 AS term, doc_id, count(*)::BIGINT AS tf
FROM g
WHERE w1 IN ('the', 'a') OR w2 IN ('the', 'a')
GROUP BY term, doc_id
"""


def q_phrase_boolean_topk(spark, sf_dir):
    """Mixed phrase+boolean query scoring (plans/phraseq.py —
    Lucene-style quoted clause inside the boolean grammar):
    '"table hash"^2 the -window' = docs containing the exact phrase
    AND the term 'the', minus docs containing window; score =
    idf(the)*tfnorm(tf_the) + 2*idf_p*tfnorm(phrase_tf) where the
    phrase scores as a virtual term (df_p = docs containing it —
    Lucene PhraseQuery's model). Everything JVM-side: the sliding-
    window phrase tf is operators/phrases.phrase_tf_col (sequence +
    slice + aggregate in codegen), stats and idf are broadcast 1-row
    frames, NOT is an anti-join."""
    from search_engine_spark.operators.phrases import (
        phrase_tf_col,
        tokens_col,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens_col("text")
    ph = docs.select(
        "doc_id",
        phrase_tf_col(toks, ["table", "hash"]).alias("ptf"),
        F.size(toks).cast("long").alias("doclen"),
    ).filter(F.col("ptf") > 0)
    post = _postings(spark, sf_dir)
    stats = (
        post.select("doc_id", "doclen").distinct()
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.avg("doclen").alias("avgdl"))
    )
    dfp = ph.agg(F.count("*").cast("long").alias("dfp"))
    df_spark = (
        post.filter(F.col("term") == "the")
        .agg(F.count("*").cast("long").alias("dfs"))
    )
    spark_tf = post.filter(F.col("term") == "the").select(
        "doc_id", F.col("tf").alias("tfs")
    )
    win = post.filter(F.col("term") == "window").select("doc_id")
    cand = (
        ph.join(spark_tf, "doc_id")
        .join(win, "doc_id", "left_anti")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dfp))
        .crossJoin(F.broadcast(df_spark))
    )

    def _idf(df_col):
        return F.log(
            1.0 + (F.col("n_docs") - df_col + 0.5) / (df_col + 0.5)
        )

    def _tfnorm(tf_col):
        return (tf_col * F.lit(K1 + 1.0)) / (
            tf_col + F.lit(K1) * (F.lit(1.0 - B)
                                  + F.lit(B) * F.col("doclen")
                                  / F.col("avgdl"))
        )

    score = (
        _idf(F.col("dfs")) * _tfnorm(F.col("tfs"))
        + F.lit(2.0) * _idf(F.col("dfp")) * _tfnorm(F.col("ptf"))
    )
    return (
        cand.select("doc_id", F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


SQL_PHRASE_BOOLEAN_TOPK = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
pt AS (
  SELECT doc_id, count(*)::BIGINT AS ptf
  FROM t, unnest(generate_series(1, len(w) - 1)) AS s(i)
  WHERE len(w) >= 2 AND w[i] = 'table' AND w[i + 1] = 'hash'
  GROUP BY doc_id
),
pstats AS (SELECT count(*)::BIGINT AS dfp FROM pt),
dspark AS (SELECT count(*)::BIGINT AS dfs FROM tf WHERE term = 'the'),
cand AS (
  SELECT pt.doc_id, pt.ptf, st.tf AS tfs, dl.doclen
  FROM pt
  JOIN (SELECT doc_id, tf FROM tf WHERE term = 'the') st USING (doc_id)
  JOIN dl USING (doc_id)
  WHERE pt.doc_id NOT IN
    (SELECT doc_id FROM tf WHERE term = 'window')
)
SELECT doc_id, round(
    ln(1.0 + (s.n_docs - d.dfs + 0.5) / (d.dfs + 0.5))
      * (tfs * {K1 + 1.0} / (tfs + {K1} * ({1.0 - B} + {B} * doclen / s.avgdl)))
  + 2.0 * ln(1.0 + (s.n_docs - p.dfp + 0.5) / (p.dfp + 0.5))
      * (ptf * {K1 + 1.0} / (ptf + {K1} * ({1.0 - B} + {B} * doclen / s.avgdl))),
  6) AS score
FROM cand CROSS JOIN stats s CROSS JOIN pstats p CROSS JOIN dspark d
ORDER BY score DESC, doc_id LIMIT 10
"""


def q_anchor_text_agg(spark, sf_dir):
    """Inbound-anchor-text aggregation (operators/graph.
    extract_anchor_texts) — the pipeline behind the fields/anchor
    index (plans/multifield.build_anchor_index): codegen
    regexp_extract_all over html, urlmap equi-join to resolve link
    TARGETS, per-target cap window, deterministic (src_url, slot)
    ordered concat. The documents table has no html, so the entry
    synthesizes a deterministic pages table from it in-plan (each doc
    links to (id+1) % n and (2*id+13) % n with a 2-word arithmetic
    anchor phrase) — the oracle rebuilds the identical html strings
    and replays regex → join → row_number cap → ordered string_agg in
    SQL. cap=2 BINDS for some targets (in-degree reaches 3 when n is
    even), so the window path is value-checked, not just present."""
    from search_engine_spark.operators.graph import extract_anchor_texts

    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    url = F.concat(F.lit("https://ex.com/d/"), F.col("doc_id"))
    anchor = F.concat(F.lit("w"), F.col("doc_id") % 89,
                      F.lit(" w"), F.col("doc_id") % 13)

    def link(dst):
        return F.concat(F.lit('<a href="https://ex.com/d/'),
                        dst.cast("long"), F.lit('">'), anchor,
                        F.lit("</a>"))

    pages = docs.select(
        url.alias("url"),
        F.concat(
            F.lit("<html><body>"),
            link((F.col("doc_id") + 1) % n), F.lit(" "),
            link((F.col("doc_id") * 2 + 13) % n),
            F.lit("</body></html>"),
        ).cast("binary").alias("html"),
    )
    urlmap = docs.select(url.alias("url"), "doc_id")
    return extract_anchor_texts(pages, urlmap, max_anchors_per_doc=2)


SQL_ANCHOR_TEXT_AGG = r"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
um AS (SELECT 'https://ex.com/d/' || doc_id AS url, doc_id
       FROM documents),
pages AS (
  SELECT 'https://ex.com/d/' || doc_id AS src_url,
         '<html><body><a href="https://ex.com/d/'
           || ((doc_id + 1) % (SELECT n FROM nn))
           || '">w' || (doc_id % 89) || ' w' || (doc_id % 13)
           || '</a> <a href="https://ex.com/d/'
           || ((doc_id * 2 + 13) % (SELECT n FROM nn))
           || '">w' || (doc_id % 89) || ' w' || (doc_id % 13)
           || '</a></body></html>' AS html
  FROM documents),
exploded AS (
  SELECT src_url,
         unnest(range(len(regexp_extract_all(
             html, '<a href="([^"]*)"[^>]*>([^<]+)</a>', 1)))) AS slot,
         unnest(regexp_extract_all(
             html, '<a href="([^"]*)"[^>]*>([^<]+)</a>', 1)) AS dst_url,
         trim(unnest(regexp_extract_all(
             html, '<a href="([^"]*)"[^>]*>([^<]+)</a>', 2))) AS anchor
  FROM pages),
resolved AS (
  SELECT um.doc_id, e.src_url, e.slot, e.anchor
  FROM exploded e JOIN um ON um.url = e.dst_url
  WHERE e.anchor <> ''),
capped AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY src_url, slot) AS rn
  FROM resolved)
SELECT doc_id, string_agg(anchor, ' ' ORDER BY src_url, slot) AS text
FROM capped WHERE rn <= 2 GROUP BY doc_id
"""

def q_pagerank_top(spark, sf_dir):
    """Damped PageRank (d=0.85, 5 iterations, dangling-mass
    redistribution) over the deterministic synthetic link graph —
    operators/graph.pagerank; each iteration is two keyed shuffles +
    an eager localCheckpoint (lineage truncation, the GraphX idiom).
    The oracle replays the identical edge derivation and 5 unrolled
    iterations in SQL. Returns EVERY node's rank (no top-k cut — no
    float-boundary risk), rounded to 6."""
    from search_engine_spark.operators.graph import (
        pagerank, synthetic_link_graph,
    )

    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    edges = synthetic_link_graph(docs, n_docs=n)
    pr = pagerank(docs.select("doc_id"), edges, n_docs=n, iters=5)
    return pr.select("doc_id", F.round("rank", 6).alias("rank"))


def _pagerank_cte(iters: int = 5, damping: float = 0.85) -> str:
    """Shared CTE chain computing r{iters} = PageRank after `iters`
    damped iterations (mirrors operators/graph.py constants: edge salt
    7919, offset 13, out-degree 1 + doc_id % 3, self-links dropped,
    dangling mass redistributed)."""
    parts = [f"""
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
e0 AS (
  SELECT d.doc_id AS src,
         (d.doc_id * d.doc_id + j * 7919 + 13) % (SELECT n FROM nn) AS dst
  FROM documents d,
       unnest(generate_series(1, 1 + (d.doc_id % 3))) AS s(j)
),
e AS (SELECT src, dst FROM e0 WHERE dst <> src),
deg AS (SELECT src, count(*)::DOUBLE AS deg FROM e GROUP BY src),
r0 AS (SELECT doc_id, 1.0 / (SELECT n FROM nn) AS rank FROM documents)"""]
    for i in range(iters):
        parts.append(f"""
d{i} AS (SELECT coalesce(sum(rank), 0) AS dang FROM r{i}
         WHERE doc_id NOT IN (SELECT src FROM deg)),
s{i} AS (SELECT e.dst AS doc_id, sum(r.rank / deg.deg) AS insum
         FROM e JOIN deg USING (src) JOIN r{i} r ON r.doc_id = e.src
         GROUP BY e.dst),
r{i + 1} AS (
  SELECT d.doc_id,
         (1.0 - {damping}) / (SELECT n FROM nn)
         + {damping} * (coalesce(s.insum, 0)
                        + (SELECT dang FROM d{i}) / (SELECT n FROM nn))
           AS rank
  FROM documents d LEFT JOIN s{i} s USING (doc_id))""")
    return ",".join(parts)


SQL_PAGERANK_TOP = f"""
WITH {_pagerank_cte(5)}
SELECT doc_id, round(rank, 6) AS rank FROM r5
"""


def q_bm25_pagerank_blend(spark, sf_dir):
    """Static-score ranking: BM25 (conjunctive 'spark merge') plus the
    PageRank prior mapped through operators/graph.pagerank_boosts
    (boost = 2 * ln(1 + n*rank) — the Lucene FeatureField shape).
    This is the oracle twin of the SERVING composition
    `index_admin.py pagerank` -> LocalSearcher/IndexReader static
    boosts (block-max bounds raised by max(boost); property-tested in
    tests/test_boosts.py)."""
    from search_engine_spark.operators.graph import (
        pagerank, pagerank_boosts, synthetic_link_graph,
    )

    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    pr = pagerank(
        docs.select("doc_id"),
        synthetic_link_graph(docs, n_docs=n), n_docs=n, iters=5,
    )
    boosts = pagerank_boosts(pr, n_docs=n, weight=2.0)
    base = bm25_exhaustive(
        spark, _postings(spark, sf_dir), ["spark", "merge"],
        k=1 << 30, stem=False,
    )
    return (
        base.join(boosts, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.col("score") + F.coalesce(F.col("boost"), F.lit(0.0)), 6
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


SQL_BM25_PAGERANK_BLEND = f"""
WITH {_TOK_CTE},
{_pagerank_cte(5)},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
q(term) AS (VALUES ('spark'), ('merge')),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf JOIN q USING (term)
        GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf JOIN q USING (term) JOIN dfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats s
),
base AS (
  SELECT doc_id, sum(partial) AS score FROM scored
  GROUP BY doc_id HAVING count(*) = 2
)
SELECT base.doc_id,
       round(base.score
             + 2.0 * ln(1.0 + (SELECT n FROM nn) * r5.rank), 6) AS score
FROM base LEFT JOIN r5 ON base.doc_id = r5.doc_id
ORDER BY score DESC, base.doc_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# Minimum-should-match, synonym expansion, BM25F
# ---------------------------------------------------------------------------

def q_bm25_msm_topk(spark, sf_dir):
    """Minimum-should-match OR query: docs matching >= 2 of {spark,
    merge, window}, scored as the plain OR sum over matched terms —
    the elastic `minimum_should_match` semantics. Serving twins:
    LocalSearcher.search(mode='or', msm=2) (counts folded into the
    block-max candidate loop; pruning stays exact because msm only
    REMOVES candidates) and IndexReader.search(msm=2); query.py
    --msm. Property-tested against this exhaustive path in
    tests/test_boosts.py."""
    return bm25_exhaustive(
        spark, _postings(spark, sf_dir), ["spark", "merge", "window"],
        k=10, stem=False, mode="or", msm=2,
    ).select("doc_id", F.round("score", 6).alias("score"))


SQL_BM25_MSM_TOPK = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
q(term) AS (VALUES ('spark'), ('merge'), ('window')),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf JOIN q USING (term)
        GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf JOIN q USING (term) JOIN dfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats s
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored GROUP BY doc_id
HAVING count(*) >= 2
ORDER BY score DESC, doc_id LIMIT 10
"""


def q_synonym_expanded_topk(spark, sf_dir):
    """Query-time synonym expansion (scoring.expand_synonyms — the
    Lucene SynonymGraphFilter expand=true model): 'spark join' with
    {join: [merge]} rewrites to (spark) AND (join OR merge), scored
    by the standard grouped semantics (sum over all distinct matched
    terms, each against its OWN df). A pure rewrite — every serving
    path supports synonyms with no new scoring machinery (query.py
    --synonyms)."""
    from search_engine_spark.plans.scoring import (
        bm25_exhaustive_grouped, expand_synonyms,
    )

    groups = expand_synonyms(
        [["spark"], ["join"]], {"join": ["merge"]}, stem=False
    )
    return bm25_exhaustive_grouped(
        spark, _postings(spark, sf_dir), groups, k=10,
    ).select("doc_id", F.round("score", 6).alias("score"))


SQL_SYNONYM_EXPANDED_TOPK = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
q(term, grp) AS (VALUES ('spark', 0), ('join', 1), ('merge', 1)),
qt AS (SELECT DISTINCT term FROM q),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf JOIN qt USING (term) JOIN dfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats s
),
matched AS (
  SELECT doc_id FROM tf JOIN q USING (term)
  GROUP BY doc_id HAVING count(DISTINCT grp) = 2
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored WHERE doc_id IN (SELECT doc_id FROM matched)
GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10
"""


def q_bm25f_topk(spark, sf_dir):
    """True BM25F (Zaragoza et al., TREC-13): per-field length-
    normalized tfs are combined into ONE pseudo-tf BEFORE the k1
    saturation — tf~ = sum_f w_f * tf_f / B_f with
    B_f = (1-b) + b*len_f/avgdl_f — then score = sum_t idf_t *
    tf~/(k1 + tf~), idf over docs containing t in ANY field.
    Distinct from multifield_bm25 ('most_fields': per-field BM25
    SUMMED — double-saturates). Title surrogate: first 6 whitespace
    tokens (same as multifield_bm25). Disjunctive candidates,
    weights body=1, title=2."""
    qterms = ["spark", "join"]
    qdf = spark.createDataFrame([(t,) for t in qterms], "term string")
    docs = _t(spark, sf_dir, "documents")

    body = _postings(spark, sf_dir)
    bavg = body.select("doc_id", "doclen").dropDuplicates(["doc_id"]).agg(
        F.avg("doclen").alias("bavg")
    )
    ttok = docs.select(
        "doc_id",
        F.explode(F.slice(F.split(F.col("text"), " "), 1, 6)).alias("term"),
    ).filter(F.col("term") != "")
    ttf = ttok.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("ttf")
    )
    tdl = ttf.groupBy("doc_id").agg(F.sum("ttf").alias("tdoclen"))
    tavg = tdl.agg(F.avg("tdoclen").alias("tavg"))

    b_pairs = body.join(F.broadcast(qdf), "term").select(
        "term", "doc_id",
        F.col("tf").cast("double").alias("btf"), "doclen",
    )
    t_pairs = (
        ttf.join(F.broadcast(qdf), "term")
        .join(tdl, "doc_id")
        .select("term", "doc_id",
                F.col("ttf").cast("double").alias("ttf"), "tdoclen")
    )
    pairs = (
        b_pairs.join(t_pairs, ["term", "doc_id"], "full_outer")
        .crossJoin(F.broadcast(bavg))
        .crossJoin(F.broadcast(tavg))
        .withColumn(
            "wtf",
            F.coalesce(
                F.lit(1.0) * F.col("btf")
                / (F.lit(1.0 - B)
                   + F.lit(B) * F.col("doclen").cast("double") / F.col("bavg")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(2.0) * F.col("ttf")
                / (F.lit(1.0 - B)
                   + F.lit(B) * F.col("tdoclen").cast("double") / F.col("tavg")),
                F.lit(0.0),
            ),
        )
    )
    n_docs = docs.count()
    dfs = pairs.groupBy("term").agg(F.count("*").alias("df"))
    scored = pairs.join(F.broadcast(dfs), "term").withColumn(
        "partial",
        idf_expr(F.col("df"), F.lit(n_docs))
        * F.col("wtf") / (F.lit(K1) + F.col("wtf")),
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


SQL_BM25F_TOPK = f"""
WITH {_TOK_CTE},
q(term) AS (VALUES ('spark'), ('join')),
bavg AS (SELECT avg(doclen) AS bavg FROM dl),
ttok AS (
  SELECT doc_id,
         unnest(list_slice(string_split(text, ' '), 1, 6)) AS term
  FROM documents
),
ttf AS (SELECT term, doc_id, count(*)::BIGINT AS ttf FROM ttok
        WHERE term <> '' GROUP BY term, doc_id),
tdl AS (SELECT doc_id, sum(ttf) AS tdoclen FROM ttf GROUP BY doc_id),
tavg AS (SELECT avg(tdoclen) AS tavg FROM tdl),
bp AS (SELECT tf.term, tf.doc_id, tf.tf::DOUBLE AS btf, dl.doclen
       FROM tf JOIN q USING (term) JOIN dl USING (doc_id)),
tp AS (SELECT ttf.term, ttf.doc_id, ttf.ttf::DOUBLE AS ttf, tdl.tdoclen
       FROM ttf JOIN q USING (term) JOIN tdl USING (doc_id)),
pairs AS (
  SELECT coalesce(bp.term, tp.term) AS term,
         coalesce(bp.doc_id, tp.doc_id) AS doc_id,
         coalesce(1.0 * bp.btf
                  / ({1.0 - B} + {B} * bp.doclen / (SELECT bavg FROM bavg)),
                  0.0)
         + coalesce(2.0 * tp.ttf
                    / ({1.0 - B} + {B} * tp.tdoclen / (SELECT tavg FROM tavg)),
                    0.0) AS wtf
  FROM bp FULL OUTER JOIN tp
    ON bp.term = tp.term AND bp.doc_id = tp.doc_id
),
nn2 AS (SELECT count(*)::BIGINT AS n FROM documents),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM pairs GROUP BY term)
SELECT doc_id,
       round(sum(
         ln(1.0 + ((SELECT n FROM nn2) - dfs.df + 0.5) / (dfs.df + 0.5))
         * pairs.wtf / ({K1} + pairs.wtf)
       ), 6) AS score
FROM pairs JOIN dfs USING (term)
GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10
"""


def q_recency_boosted_topk(spark, sf_dir):
    """Time-decay ranking (elastic function_score exp-decay):
    score = bm25 * (0.5 + exp(-ln2 * age_days / halflife)), 30-day
    half-life — a MULTIPLICATIVE query-independent prior, the second
    blend shape next to the additive static boost (O10). The corpus
    has no timestamps, so age is derived deterministically from
    doc_id ((id*37 + 11) % 365) on BOTH engines; a pages-shaped input
    uses warc_ts and otherwise identical plumbing. A recency prior
    can also be baked additively via index_admin.py set-boosts."""
    base = bm25_exhaustive(
        spark, _postings(spark, sf_dir), ["spark", "scan"],
        k=1 << 30, stem=False,
    )
    age = (F.col("doc_id") * 37 + 11) % 365
    decay = F.exp(-age.cast("double") / F.lit(30.0)
                  * F.lit(0.6931471805599453))
    return (
        base.select(
            "doc_id",
            F.round(F.col("score") * (F.lit(0.5) + decay), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


SQL_RECENCY_BOOSTED_TOPK = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
q(term) AS (VALUES ('spark'), ('scan')),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf JOIN q USING (term)
        GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf JOIN q USING (term) JOIN dfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats s
),
base AS (
  SELECT doc_id, sum(partial) AS score FROM scored
  GROUP BY doc_id HAVING count(*) = 2
)
SELECT doc_id,
       round(score * (0.5 + exp(-(((doc_id * 37 + 11) % 365)::DOUBLE)
                                / 30.0 * 0.6931471805599453)), 6) AS score
FROM base ORDER BY score DESC, doc_id LIMIT 10
"""


def q_top_ngram_mass(spark, sf_dir):
    """Gopher repetition rule #2 family: per-doc mass of the single
    most frequent bigram (top_count / n_bigrams) — catches the
    'same phrase looped' page that the distinct-ratio signal
    (dup_ngram_quality) under-weights. Pure JVM higher-order
    functions + two aggregations."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    per = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.max("c").cast("long").alias("top_count"),
            F.round(
                F.max("c").cast("double") / F.sum("c").cast("double"), 6
            ).alias("top_bigram_mass"),
        )
    )


SQL_TOP_NGRAM_MASS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
g2 AS (
  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
  FROM t, unnest(generate_series(1, len(w) - 1)) AS s(i)
),
per AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g)
SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c)::BIGINT AS top_count,
       round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_mass
FROM per GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# PII redaction, dup-cluster representative selection, site: scoping
# (round 4, session 2)
# ---------------------------------------------------------------------------

def q_pii_redaction(spark, sf_dir):
    """Training-corpus PII scrubbing (operators/pii.redact_pii): the
    synthetic corpus has no real PII, so deterministic email / IPv4 /
    phone spans are seeded per doc_id (3 independent residue classes
    -> per-type counts vary 0/1) and the pure-JVM regexp chain scrubs
    them. The oracle replays the seeding AND the exact sequential
    replacement in DuckDB (both regex engines see only shared-syntax
    patterns — operators/pii.py module docstring), and the value hash
    covers the md5 of every full redacted string."""
    from search_engine_spark.operators.pii import redact_pii

    d = F.col("doc_id")
    seeded = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 3 != 0,
                F.concat(F.lit(" contact user"), d.cast("string"),
                         F.lit("@mail.example.org")),
            ).otherwise(F.lit("")),
            F.when(
                d % 5 == 0,
                F.concat(F.lit(" from 10.0."), (d % 256).cast("string"),
                         F.lit("."), ((d * 7) % 256).cast("string")),
            ).otherwise(F.lit("")),
            F.when(
                d % 2 == 0,
                F.concat(F.lit(" tel 555-"),
                         F.lpad((d % 10000).cast("string"), 4, "0")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(seeded).select(
        "doc_id", "n_email", "n_ipv4", "n_phone",
        F.md5(F.col("redacted")).alias("redacted_md5"),
    )


SQL_PII_REDACTION = r"""
WITH seeded AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 <> 0
                 THEN ' contact user' || doc_id || '@mail.example.org'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' from 10.0.' || (doc_id % 256) || '.'
                      || ((doc_id * 7) % 256)
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN ' tel 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                 ELSE '' END AS text
  FROM documents
), s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(
             text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'
         ))::BIGINT AS n_email,
         regexp_replace(
             text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g') AS t
  FROM seeded
), s2 AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(
             t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ipv4,
         regexp_replace(
             t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
             '<IP>', 'g') AS t
  FROM s1
), s3 AS (
  SELECT doc_id, n_email, n_ipv4,
         len(regexp_extract_all(
             t, '(\(\d{3}\)[ ]?)?\b(\d{3}-)?\d{3}-\d{4}\b'))::BIGINT AS n_phone,
         regexp_replace(
             t, '(\(\d{3}\)[ ]?)?\b(\d{3}-)?\d{3}-\d{4}\b',
             '<PHONE>', 'g') AS t
  FROM s2
)
SELECT doc_id, n_email, n_ipv4, n_phone, md5(t) AS redacted_md5 FROM s3
"""


def q_dup_cluster_representatives(spark, sf_dir):
    """Dedup KEEP-policy: after connected_components assigns duplicate
    clusters, keep the best copy per cluster (CCNet keeps the highest
    LM score, C4 the longest) — here weight = token count, ties broken
    doc_id asc. operators/dedup.cluster_representatives is one groupBy
    argmax (max over (weight, -doc_id) structs), NOT a ranking window
    — a single co-partitioned shuffle at 10^12 docs. Oracle: the
    dedup_clusters recursive CTE + the same argmax as a window."""
    from search_engine_spark.operators.dedup import (
        cluster_representatives,
        connected_components,
        minhash_lsh_pairs_jvm,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs_jvm(docs, bands=4, rows_per_band=4,
                                  shingle_n=3)
    clusters = connected_components(pairs, docs.select("doc_id"))
    weights = split_terms(docs).groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens")
    )
    return cluster_representatives(clusters, weights,
                                   weight_col="n_tokens")


SQL_DUP_CLUSTER_REPRESENTATIVES = f"""
WITH RECURSIVE {_MINHASH_CTES},
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id
), sym AS (
  SELECT a AS x, b AS y FROM pairs
  UNION ALL
  SELECT b AS x, a AS y FROM pairs
), cc AS (
  SELECT doc_id AS x, doc_id AS label FROM documents
  UNION
  SELECT s.x, cc.label FROM cc JOIN sym s ON cc.x = s.y
), clus AS (
  SELECT x AS doc_id, min(label)::BIGINT AS cluster_id FROM cc GROUP BY x
), tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), w AS (
  SELECT doc_id, count(*)::DOUBLE AS w FROM tok WHERE term <> ''
  GROUP BY doc_id
), sel AS (
  SELECT c.cluster_id, c.doc_id,
         row_number() OVER (
           PARTITION BY c.cluster_id
           ORDER BY coalesce(w.w, 0) DESC, c.doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
  FROM clus c LEFT JOIN w USING (doc_id)
)
SELECT cluster_id, doc_id AS rep_doc_id, cluster_size::BIGINT AS cluster_size
FROM sel WHERE rn = 1
"""


def q_bm25_site_topk(spark, sf_dir):
    """site:-scoped ranking — the filter-clause semantics every web
    engine serves (Lucene filter clause / elastic bool.filter): only
    docs from one source are ELIGIBLE, but df/avgdl stay corpus-wide
    and survivor scores are unchanged. Serving twins (property-tested
    in tests/test_site_filter.py): LocalSearcher.search(restrict=)
    — candidate-generation pre-filter on every path, block-max exact
    — and IndexReader.search(restrict=) — semi-join below the
    shuffle; CLI `query.py --site HOST`."""
    docs = _t(spark, sf_dir, "documents")
    base = bm25_exhaustive(
        spark, _postings(spark, sf_dir), ["spark", "merge", "index"],
        k=1 << 30, stem=False, mode="or",
    )
    allowed = docs.filter(F.col("source") == "src3").select("doc_id")
    return (
        base.join(allowed, "doc_id", "left_semi")
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


SQL_BM25_SITE_TOPK = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
q(term) AS (VALUES ('spark'), ('merge'), ('index')),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf JOIN q USING (term)
        GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf JOIN q USING (term) JOIN dfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats s
)
SELECT sc.doc_id, round(sum(partial), 6) AS score
FROM scored sc JOIN documents d ON sc.doc_id = d.doc_id
WHERE d.source = 'src3'
GROUP BY sc.doc_id
ORDER BY score DESC, sc.doc_id ASC LIMIT 10
"""


def q_bm25_ts_window_topk(spark, sf_dir):
    """Crawl-timestamp window ranking (Lucene [a TO b] range filter /
    elastic bool.filter range): only docs whose crawl day falls inside
    an inclusive window are ELIGIBLE; df/avgdl stay corpus-wide and
    survivor scores are unchanged — the freshness filter every
    Common-Crawl-style engine serves. The test corpus has no
    timestamps, so the crawl day derives deterministically from doc_id
    ((id*37 + 11) % 365, the recency entry's convention) on BOTH
    engines; a pages-shaped input uses urlmap.warc_ts with identical
    plumbing. Serving twins: query.py --after-ts/--before-ts -> ONE
    urlmap scan (bounds pushed into the parquet read) -> the same
    restrict= candidate-generation pre-filter the site: clause rides
    (removal-only, block-max stays exact) on the local path, and the
    urlmap-filter semi-join below the shuffle on the distributed
    path (tests/test_ts_filter.py)."""
    base = bm25_exhaustive(
        spark, _postings(spark, sf_dir), ["scan", "table"],
        k=1 << 30, stem=False, mode="or",
    )
    day = (F.col("doc_id") * 37 + 11) % 365
    return (
        base.filter((day >= 60) & (day <= 240))
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


SQL_BM25_TS_WINDOW_TOPK = f"""
WITH {_TOK_CTE},
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM dl),
q(term) AS (VALUES ('scan'), ('table')),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf JOIN q USING (term)
        GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * {K1 + 1.0} / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / s.avgdl)))
           AS partial
  FROM tf JOIN q USING (term) JOIN dfs USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats s
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored
WHERE ((doc_id * 37 + 11) % 365) BETWEEN 60 AND 240
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# QUERIES ordering is part of the deliverable: the driver's correctness
# harness checks only the FIRST 50 entries (insertion order), so every
# entry that has never earned a green CORRECTNESS row MUST sit inside
# that window, and the window ROTATES each round so no entry's newest
# green row goes more than ~two rounds stale.
# tests/test_entry_order.py enforces the never-checked invariant.
# Round-4 layout: anchors -> re-check entries whose implementation
# changed this round -> rows-only entries -> round-4 NEW entries
# (pagerank/static-boost/msm/synonyms/BM25F — never checked, must be
# in-window) -> the 26 veterans whose last green row is r01/r02 ->
# round-3 value oracles (the five displaced past 50 — bigram_pmi,
# unigram_lm_quality, hybrid_rrf_topk, symspell_suggest,
# fuzzy_term_match — are all driver-r3 green) -> r03-green tail.
# ---------------------------------------------------------------------------
QUERIES = {
    # -- round-5 window (first 50 = what the driver checks):
    # anchors + the entries whose newest driver-green row is
    # r03 or older (the <=2-rounds-stale rotation policy) --
    "bm25_topk": q_bm25_topk,
    "lm_dirichlet_topk": q_lm_dirichlet_topk,
    "fielded_topk": q_fielded_topk,
    "bm25f_topk": q_bm25f_topk,
    "phrase_boolean_topk": q_phrase_boolean_topk,
    "content_fingerprints": q_content_fingerprints,
    "lang_id": q_lang_id,
    "ann_cosine_topk": q_ann_cosine_topk,
    "bigram_pmi": q_bigram_pmi,
    "bm25_boosted_query": q_bm25_boosted_query,
    "bm25_facet_counts": q_bm25_facet_counts,
    "bm25_grouped_query": q_bm25_grouped_query,
    "bm25_not_query": q_bm25_not_query,
    "bm25_single_term": q_bm25_single_term,
    "contains_term_stats": q_contains_term_stats,
    "dedup_exact_text": q_dedup_exact_text,
    "doc_lengths": q_doc_lengths,
    "document_frequency": q_document_frequency,
    "domain_mixture": q_domain_mixture,
    "dup_ngram_quality": q_dup_ngram_quality,
    "embedding_near_dup": q_embedding_near_dup,
    "embedding_norms": q_embedding_norms,
    "filtered_ann_topk": q_filtered_ann_topk,
    "fuzzy_term_match": q_fuzzy_term_match,
    "hourly_event_counts": q_hourly_event_counts,
    "hybrid_rrf_topk": q_hybrid_rrf_topk,
    "ivf_cosine_topk": q_ivf_cosine_topk,
    "lang_counts": q_lang_counts,
    "latest_event_per_user": q_latest_event_per_user,
    "lsh_cosine_topk": q_lsh_cosine_topk,
    "media_frame_sample": q_media_frame_sample,
    "more_like_this": q_more_like_this,
    "multifield_bm25": q_multifield_bm25,
    "multimodal_features": q_multimodal_features,
    "near_query": q_near_query,
    "phrase_match_counts": q_phrase_match_counts,
    "phrase_snippets": q_phrase_snippets,
    "phrase_topk": q_phrase_topk,
    "prefix_term_stats": q_prefix_term_stats,
    "pricing_summary": q_pricing_summary,
    "quality_score": q_quality_score,
    "revenue_by_nation": q_revenue_by_nation,
    "source_collapsed_topk": q_source_collapsed_topk,
    "stratified_sample": q_stratified_sample,
    "symspell_suggest": q_symspell_suggest,
    "token_stats": q_token_stats,
    "top_customers_per_nation": q_top_customers_per_nation,
    "unigram_lm_quality": q_unigram_lm_quality,
    "union_partial_runs": q_union_partial_runs,
    "url_canonical_dedup": q_url_canonical_dedup,
    # -- rotated out this round: every entry below has an
    # r04 driver-green row (see CORRECTNESS_r04.json) --
    "term_frequency": q_term_frequency,
    "collection_stats": q_collection_stats,
    "intersect_and": q_intersect_and,
    "sequence_packing": q_sequence_packing,
    "near_dup_lsh": q_near_dup_lsh,
    "bm25_stemmed_topk": q_bm25_stemmed_topk,
    "pagerank_top": q_pagerank_top,
    "bm25_pagerank_blend": q_bm25_pagerank_blend,
    "bm25_msm_topk": q_bm25_msm_topk,
    "synonym_expanded_topk": q_synonym_expanded_topk,
    "recency_boosted_topk": q_recency_boosted_topk,
    "top_ngram_mass": q_top_ngram_mass,
    "pii_redaction": q_pii_redaction,
    "dup_cluster_representatives": q_dup_cluster_representatives,
    "bm25_site_topk": q_bm25_site_topk,
    "anchor_text_agg": q_anchor_text_agg,
    "bigram_postings": q_bigram_postings,
    "bm25_ts_window_topk": q_bm25_ts_window_topk,
    "regex_term_stats": q_regex_term_stats,
    "bpe_pair_counts": q_bpe_pair_counts,
    "ranking_eval": q_ranking_eval,
    "except_regression": q_except_regression,
    "bm25_topk_or": q_bm25_topk_or,
    "sessionization": q_sessionization,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "cosine_pairs_topk": q_cosine_pairs_topk,
    "shipping_priority": q_shipping_priority,
    "event_props_json": q_event_props_json,
    "orders_rollup": q_orders_rollup,
    "windowed_event_counts": q_windowed_event_counts,
    "doclen_quantiles": q_doclen_quantiles,
    "top_bigrams": q_top_bigrams,
    "tfidf_top_terms": q_tfidf_top_terms,
    "dedup_clusters": q_dedup_clusters,
    "asof_click_before_purchase": q_asof_click_before_purchase,
    "train_split_assignment": q_train_split_assignment,
    "split_contamination": q_split_contamination,
    "media_resize_plan": q_media_resize_plan,
    "embedding_quantization": q_embedding_quantization,
    "local_supplier_volume": q_local_supplier_volume,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash_fingerprints": q_simhash_fingerprints,
    "avg_price_by_brand": q_avg_price_by_brand,
    "orders_with_late_ship": q_orders_with_late_ship,
    "customer_order_counts": q_customer_order_counts,
}

ORACLES = {
    "pii_redaction": SQL_PII_REDACTION,
    "dup_cluster_representatives": SQL_DUP_CLUSTER_REPRESENTATIVES,
    "bm25_site_topk": SQL_BM25_SITE_TOPK,
    "bm25_ts_window_topk": SQL_BM25_TS_WINDOW_TOPK,
    "regex_term_stats": SQL_REGEX_TERM_STATS,
    "lm_dirichlet_topk": SQL_LM_DIRICHLET_TOPK,
    "fielded_topk": SQL_FIELDED_TOPK,
    "anchor_text_agg": SQL_ANCHOR_TEXT_AGG,
    "bigram_postings": SQL_BIGRAM_POSTINGS,
    "phrase_boolean_topk": SQL_PHRASE_BOOLEAN_TOPK,
    "pagerank_top": SQL_PAGERANK_TOP,
    "bm25_pagerank_blend": SQL_BM25_PAGERANK_BLEND,
    "bm25_msm_topk": SQL_BM25_MSM_TOPK,
    "synonym_expanded_topk": SQL_SYNONYM_EXPANDED_TOPK,
    "bm25f_topk": SQL_BM25F_TOPK,
    "recency_boosted_topk": SQL_RECENCY_BOOSTED_TOPK,
    "top_ngram_mass": SQL_TOP_NGRAM_MASS,
    "term_frequency": SQL_TERM_FREQUENCY,
    "document_frequency": SQL_DOCUMENT_FREQUENCY,
    "doc_lengths": SQL_DOC_LENGTHS,
    "collection_stats": SQL_COLLECTION_STATS,
    "bm25_topk": SQL_BM25_TOPK,
    "bm25_single_term": SQL_BM25_SINGLE_TERM,
    "bm25_not_query": SQL_BM25_NOT_QUERY,
    "bm25_facet_counts": SQL_BM25_FACET_COUNTS,
    "intersect_and": SQL_INTERSECT_AND,
    "lang_counts": SQL_LANG_COUNTS,
    "dedup_exact_text": SQL_DEDUP_EXACT_TEXT,
    "quality_score": SQL_QUALITY_SCORE,
    "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
    "embedding_norms": SQL_EMBEDDING_NORMS,
    "latest_event_per_user": SQL_LATEST_EVENT_PER_USER,
    "hourly_event_counts": SQL_HOURLY_EVENT_COUNTS,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "top_customers_per_nation": SQL_TOP_CUSTOMERS_PER_NATION,
    "token_stats": SQL_TOKEN_STATS,
    "bpe_pair_counts": SQL_BPE_PAIR_COUNTS,
    "ranking_eval": SQL_RANKING_EVAL,
    "union_partial_runs": SQL_UNION_PARTIAL_RUNS,
    "except_regression": SQL_EXCEPT_REGRESSION,
    "bm25_topk_or": SQL_BM25_TOPK_OR,
    "sessionization": SQL_SESSIONIZATION,
    "avg_price_by_brand": SQL_AVG_PRICE_BY_BRAND,
    "orders_with_late_ship": SQL_ORDERS_WITH_LATE_SHIP,
    "customer_order_counts": SQL_CUSTOMER_ORDER_COUNTS,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "cosine_pairs_topk": SQL_COSINE_PAIRS_TOPK,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "event_props_json": SQL_EVENT_PROPS_JSON,
    "orders_rollup": SQL_ORDERS_ROLLUP,
    "windowed_event_counts": SQL_WINDOWED_EVENT_COUNTS,
    "doclen_quantiles": SQL_DOCLEN_QUANTILES,
    "top_bigrams": SQL_TOP_BIGRAMS,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "asof_click_before_purchase": SQL_ASOF_CLICK_BEFORE_PURCHASE,
    "train_split_assignment": SQL_TRAIN_SPLIT_ASSIGNMENT,
    "split_contamination": SQL_SPLIT_CONTAMINATION,
    "media_resize_plan": SQL_MEDIA_RESIZE_PLAN,
    "embedding_quantization": SQL_EMBEDDING_QUANTIZATION,
    "local_supplier_volume": SQL_LOCAL_SUPPLIER_VOLUME,
    "embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "minhash_lsh_pairs": SQL_MINHASH_LSH_PAIRS,
    "simhash_fingerprints": SQL_SIMHASH_FINGERPRINTS,
    "lang_id": SQL_LANG_ID,
    "content_fingerprints": SQL_CONTENT_FINGERPRINTS,
    "phrase_match_counts": SQL_PHRASE_MATCH_COUNTS,
    "phrase_topk": SQL_PHRASE_TOPK,
    "dup_ngram_quality": SQL_DUP_NGRAM_QUALITY,
    "hybrid_rrf_topk": SQL_HYBRID_RRF_TOPK,
    "phrase_snippets": SQL_PHRASE_SNIPPETS,
    "near_query": SQL_NEAR_QUERY,
    "media_frame_sample": SQL_MEDIA_FRAME_SAMPLE,
    "prefix_term_stats": SQL_PREFIX_TERM_STATS,
    "fuzzy_term_match": SQL_FUZZY_TERM_MATCH,
    "symspell_suggest": SQL_SYMSPELL_SUGGEST,
    "bm25_grouped_query": SQL_BM25_GROUPED_QUERY,
    "bm25_boosted_query": SQL_BM25_BOOSTED_QUERY,
    "multifield_bm25": SQL_MULTIFIELD_BM25,
    "more_like_this": SQL_MORE_LIKE_THIS,
    "unigram_lm_quality": SQL_UNIGRAM_LM_QUALITY,
    "url_canonical_dedup": SQL_URL_CANONICAL_DEDUP,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "bigram_pmi": SQL_BIGRAM_PMI,
    "lsh_cosine_topk": SQL_LSH_COSINE_TOPK,
    "ivf_cosine_topk": SQL_IVF_COSINE_TOPK,
    "source_collapsed_topk": SQL_SOURCE_COLLAPSED_TOPK,
    "domain_mixture": SQL_DOMAIN_MIXTURE,
    "sequence_packing": SQL_SEQUENCE_PACKING,
    "filtered_ann_topk": SQL_FILTERED_ANN_TOPK,
    "contains_term_stats": SQL_CONTAINS_TERM_STATS,
    # intentionally rows-only (non-SQL-expressible), with their pytest
    # exactness anchors:
    # bm25_stemmed_topk — Porter 1980 stemmer is not ANSI-SQL; rank
    #   identity pinned by tests/test_text.py goldens + tests/test_bm25.py
    # near_dup_lsh — approximate by design (Gaussian-plane buckets);
    #   soundness (every pair truly >= threshold) + planted-dup recall
    #   pytest-checked
}
