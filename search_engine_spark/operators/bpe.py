"""Distributed BPE vocabulary learning + encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

The canonical LLM-training-data tokenizer op, decomposed the way it
actually scales on Spark:

1. ``word_counts`` — the ONLY step that touches the corpus. GPT-2-style
   pretokenization (``regexp_extract_all``, whole-stage codegen) →
   explode → hash-aggregate to a (word, count) table. 100 TB of text
   collapses to a vocabulary-sized frame here; everything after is
   O(distinct pretokens), not O(corpus).
2. ``pair_counts`` — adjacent-symbol pair frequencies over that table,
   pure built-ins (``sequence``/``transform``/``substring``/explode →
   sum). Iteration 0 of the merge loop, and the oracle-checkable
   surface (char-level pairs are ANSI-SQL-expressible; later
   iterations operate on learned multi-char symbols and are pinned by
   pytest against an independent reference instead).
3. ``learn_bpe`` — the merge loop over the BOUNDED aggregated table:
   top ``max_words`` words by (count desc, word asc) are collected and
   merged driver-side with incremental pair-count maintenance. This is
   the same bounded-collect pattern as the IVF centroid table
   (similarity.py): the collect is over a capped, pre-aggregated frame
   (≤ max_words rows), never the corpus — SentencePiece/HF apply the
   same frequency-threshold pruning before their in-memory loop.
   Deterministic throughout: ties break (count desc, pair lexicographic
   asc); no RNG, no Date.now.
4. ``apply_bpe`` — encode the corpus with the learned merge ranks via
   an Arrow-batched ``mapInPandas`` kernel (per-word greedy
   lowest-rank merging is inherently imperative; the kernel memoizes
   word → token-count per batch, so Zipf-distributed text pays the
   Python loop only once per DISTINCT word per batch).

No reference file can be cited (the /root/reference mount is empty —
SURVEY.md §0); semantics follow the published algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from search_engine_spark.operators.textstats import BPE_PRETOKEN_RE


def word_counts(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(word, count) over GPT-2-style pretokens. Pure JVM: the regex
    extraction and the hash aggregate both stay inside codegen; this is
    the only corpus-sized stage of BPE training."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col),
                                     F.lit(BPE_PRETOKEN_RE), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """Char-level adjacent-pair frequencies weighted by word count —
    BPE iteration 0 as a declarative plan (sequence → transform →
    explode → sum; no Python)."""
    pairs = F.expr(
        "transform(sequence(1, length(word) - 1),"
        " i -> substring(word, i, 2))"
    )
    return (
        words.where(F.length("word") >= 2)
        .select(F.explode(pairs).alias("pair"), "count")
        .groupBy("pair")
        .agg(F.sum("count").cast("long").alias("pair_count"))
    )


def learn_bpe(
    df: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    max_words: int = 65536,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Distributed word
    counting; the merge loop runs driver-side over the top
    ``max_words`` (count desc, word asc) rows — a bounded collect of a
    pre-aggregated frame, NOT the corpus."""
    rows = (
        word_counts(df, text_col=text_col)
        .where(F.col("count") >= min_count)
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    vocab = [( [c for c in r["word"]], int(r["count"]) ) for r in rows]
    return _merge_loop(vocab, n_merges)


def _merge_loop(
    vocab: list[tuple[list[str], int]], n_merges: int
) -> list[tuple[str, str]]:
    """Incremental-update BPE merge loop (counts maintained per merge,
    pair → word-id index so each merge touches only affected words).
    Tie-break: count desc, then pair lexicographic asc."""
    pair_cnt: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wid, (syms, cnt) in enumerate(vocab):
        for a, b in zip(syms, syms[1:]):
            pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + cnt
            where.setdefault((a, b), set()).add(wid)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        for p, c in pair_cnt.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        for wid in list(where.get(pair, ())):
            syms, cnt = vocab[wid]
            # remove this word's current pair contributions
            for a, b in zip(syms, syms[1:]):
                pair_cnt[(a, b)] -= cnt
                s = where.get((a, b))
                if s is not None:
                    s.discard(wid)
            # apply the merge left-to-right
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[wid] = (out, cnt)
            # re-add the rewritten word's pairs
            for a, b in zip(out, out[1:]):
                pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + cnt
                where.setdefault((a, b), set()).add(wid)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank BPE encode of one pretoken (the standard
    inference algorithm: repeatedly merge the present pair with the
    smallest merge rank)."""
    syms = [c for c in word]
    while len(syms) >= 2:
        best_i, best_r = -1, None
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc BPE token count with the learned merges. Arrow-batched
    ``mapInPandas``; the kernel memoizes word → token count so each
    DISTINCT pretoken pays the Python merge loop once per batch (Zipf
    text ⇒ the memo hit-rate is the win). Output: (doc_id,
    n_bpe_tokens) — schema-stable, payload columns dropped before the
    exchange."""
    import re

    ranks = {p: i for i, p in enumerate(merges)}
    # Python-re rendering of BPE_PRETOKEN_RE (stdlib re lacks \p{L}):
    # [^\W\d_] ≈ \p{L}, \d ≈ \p{N} (decimal subset), (?:[^\w\s]|_) ≈
    # [^\s\p{L}\p{N}]. Exact on ASCII + common Unicode letters; the
    # parity property is pinned in tests/test_bpe.py.
    pat = re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?(?:[^\w\s]|_)+"
    )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    schema = "doc_id long, n_bpe_tokens long"

    def kernel(batches):
        memo: dict[str, int] = {}

        def ntoks(w: str) -> int:
            n = memo.get(w)
            if n is None:
                n = len(encode_word(w, ranks))
                memo[w] = n
            return n

        import pandas as pd

        for pdf in batches:
            counts = [
                sum(ntoks(w) for w in pat.findall(t or ""))
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_bpe_tokens": counts}
            )

    return src.mapInPandas(kernel, schema=schema)
