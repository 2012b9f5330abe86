"""Text-analysis operators for training-data pipelines.

All hot paths are JVM-side built-ins (whole-stage codegen); only
language-ID needs a numpy kernel (profile cosine over char n-gram
counts, Arrow-batched).

- token_stats     — token/char counts + ratios (pure built-ins).
- quality_signals — length / punctuation / stopword / uniqueness
                    heuristics, composable into a quality score.
- lang_id         — character-bigram profile cosine against small
                    per-language profiles (deterministic heuristic; a
                    real model would slot into the same mapInPandas).
- fingerprint     — 64-bit rolling (polynomial) content hash.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

STOPWORDS = ("the", "a", "of", "to", "and")

# tiny deterministic bigram profiles (would be trained offline; frozen
# here so results are reproducible without external data)
_LANG_PROFILES = {
    "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
    "fr": ["es", "le", "de", "en", "re", "nt", "on", "ou", "ai", "it"],
    "es": ["de", "en", "os", "es", "ar", "la", "el", "ra", "as", "ci"],
    "de": ["en", "er", "ch", "de", "ei", "ie", "in", "te", "nd", "ge"],
}


# GPT-2-style pretokenizer pattern (BPE-ish subword unit boundaries):
# contractions, optionally-space-prefixed letter runs, digit runs,
# punctuation runs. Counts per doc approximate an LLM tokenizer's token
# count far better than whitespace splitting (no merges table needed
# for counting boundaries). Uses only \p{L}/\p{N} classes so the same
# pattern runs JVM-side (java.util.regex) and in DuckDB (RE2).
BPE_PRETOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def token_stats(df: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Whitespace token count, BPE-ish subword-unit count, char count,
    avg token length — built-ins only (split/size/length/
    regexp_extract_all are codegen'd; no UDF)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0))
        .cast("long").alias("n_subtokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.round(
            F.when(F.size(toks) > 0,
                   F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t))
                   / F.size(toks)).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
    )


def quality_signals(df: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-doc quality heuristics (all built-ins):
    stopword ratio, distinct-token ratio, mean token length."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.round(F.when(n > 0, n_stop / n).otherwise(0.0), 6).alias("stopword_ratio"),
        F.round(F.when(n > 0, n_distinct / n).otherwise(0.0), 6).alias("distinct_ratio"),
    )


def fingerprint(df: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint via Spark's xxhash64 (JVM-side) plus a
    normalized variant (whitespace-collapsed) for near-exact matching."""
    norm = F.array_join(F.filter(F.split(F.col(text_col), " "),
                                 lambda t: t != ""), " ")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.xxhash64(F.col(text_col)).alias("fp_raw"),
        F.xxhash64(norm).alias("fp_norm"),
    )


def lang_id(df: DataFrame, *, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Character-bigram heuristic language ID (Arrow-batched kernel)."""
    langs = sorted(_LANG_PROFILES)
    grams = sorted({g for p in _LANG_PROFILES.values() for g in p})
    gidx = {g: i for i, g in enumerate(grams)}
    mat = np.zeros((len(langs), len(grams)))
    for li, lang in enumerate(langs):
        for rank, g in enumerate(_LANG_PROFILES[lang]):
            mat[li, gidx[g]] = len(_LANG_PROFILES[lang]) - rank
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    narrow = df.select(id_col, text_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, preds, confs = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                t = (text or "").lower()
                c = Counter(t[i:i + 2] for i in range(len(t) - 1))
                v = np.zeros(len(grams))
                for g, cnt in c.items():
                    j = gidx.get(g)
                    if j is not None:
                        v[j] = cnt
                nv = np.linalg.norm(v)
                if nv == 0:
                    pred, conf = "und", 0.0
                else:
                    sims = mat @ (v / nv)
                    best = int(sims.argmax())
                    pred, conf = langs[best], float(sims[best])
                ids.append(did)
                preds.append(pred)
                confs.append(round(conf, 6))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "lang_pred": preds,
                "lang_conf": pd.Series(confs, dtype="float64"),
            })

    return narrow.mapInPandas(gen, "doc_id long, lang_pred string, lang_conf double")
