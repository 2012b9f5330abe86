"""Deterministic synthetic `pages` corpus (FIXTURES.md section 1).

Generates the authoritative input shape from BASELINE.json input_hint:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

entirely inside Spark (spark.range -> mapInPandas), seed-stable and
independent of partitioning: every row is a pure function of its index
``i``. Zipf-distributed text over a 5000-word vocabulary (s ~= 1.07,
so stopword skew is real at every scale); html wraps the same text with
tags/entities/script/comments so ``extract_text(html) == text`` is
itself a fixture; ~1% duplicate urls with older warc_ts (dedup
fixture); ~0.5% empty bodies (empty-doc fixture).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.07
LANGS = ["en", "en", "en", "en", "fr", "es", "zh", "de"]  # weighted to en
_EPOCH = dt.datetime(2026, 1, 1)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _vocab() -> list[str]:
    rng = np.random.default_rng(SEED)
    base = [
        "the", "a", "of", "to", "and", "spark", "join", "filter", "window",
        "query", "stream", "data", "table", "index", "search", "merge",
        "sort", "hash", "scan", "group",
    ]
    syll = ["ba", "ce", "di", "fo", "gu", "ka", "le", "mi", "no", "pu",
            "ra", "se", "ti", "vo", "wu", "za"]
    words = set(base)
    out = list(base)
    while len(out) < VOCAB_SIZE:
        n = int(rng.integers(2, 5))
        w = "".join(rng.choice(syll, size=n))
        if w not in words:
            words.add(w)
            out.append(w)
    return out


_ZIPF_CDF = None


def _zipf_cdf() -> np.ndarray:
    global _ZIPF_CDF
    if _ZIPF_CDF is None:
        ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
        p = ranks ** (-ZIPF_S)
        _ZIPF_CDF = np.cumsum(p / p.sum())
    return _ZIPF_CDF


def _row(i: int, vocab: list[str], cdf: np.ndarray) -> tuple:
    rng = np.random.default_rng(SEED * 1_000_003 + i)
    if rng.random() < 0.005:
        text = ""
    else:
        n_words = int(rng.integers(20, 200))
        u = rng.random(n_words)
        idx = np.searchsorted(cdf, u)
        text = " ".join(vocab[j] for j in idx)
    # ~1% of rows are older recrawls of the previous url (dedup fixture)
    dup = i > 0 and rng.random() < 0.01
    key = i - 1 if dup else i
    url = f"https://src{key % 20}.example.com/p/{key}"
    day_off = int(key % 365) - (180 if dup else 0)
    ts = _EPOCH + dt.timedelta(days=day_off, seconds=int(key % 86400))
    # title: 4 Zipf-drawn words from an independent stream (f(i) only);
    # empty-body docs keep an empty title (empty-doc fixture intact).
    # The title IS part of the extracted text (html.parser emits
    # <title> data in document order, before the body), so `expected`
    # prepends it — the extract_text(html) == text invariant holds
    # with a real second field for multi-field ranking.
    if text:
        rng_t = np.random.default_rng(SEED * 1_000_003 + i + 777)
        t_idx = np.searchsorted(cdf, rng_t.random(4))
        title = " ".join(vocab[j] for j in t_idx)
    else:
        title = ""
    # deterministic out-links (the web-graph fixture): page `key`
    # links to keys key+1, key//2, 2*key+1 — in-degree then varies
    # 1..4 across nodes and some targets fall past any finite corpus
    # (realistic dangling hrefs, dropped at urlmap resolution). Each
    # anchor carries 2 words of display text drawn from a TARGET-keyed
    # stream — every page linking to target t shows the same anchor
    # text f(t), the anchor-agreement property real crawls exhibit and
    # the anchor-field fixture tests rely on. Anchor text is part of
    # the linking page's extracted body (literal whitespace separates
    # adjacent anchors), so `expected` appends it below and the frozen
    # extract_text(html) == text invariant holds; empty-body pages
    # link nowhere (empty-doc fixture intact).
    if text:
        targets = sorted({key + 1, key // 2, 2 * key + 1} - {key})
        atexts = []
        for t in targets:
            rng_a = np.random.default_rng(SEED * 1_000_003 + t + 3333)
            a_idx = np.searchsorted(cdf, rng_a.random(2))
            atexts.append(f"{vocab[a_idx[0]]} {vocab[a_idx[1]]}")
        links = "\n" + " ".join(
            f'<a href="https://src{t % 20}.example.com/p/{t}">{at}</a>'
            for t, at in zip(targets, atexts)
        )
    else:
        links = ""
        atexts = []
    # the literal newline between </head> and <p> matters: the frozen
    # extractor joins data chunks verbatim (no implicit block
    # separators), so the title needs real whitespace before the body
    html = (
        f"<html><head><title>{title}</title><script>var x=1;</script>"
        f"<style>p{{color:red}}</style></head><body>\n<p>"
        + text.replace("and", "and &amp; x", 1)
          .replace(" the ", " the <b>bold</b> ", 1)
        + "</p><!-- comment -->" + links + "</body></html>"
    )
    # undo the marker words in expected text too: extraction of the html
    # above yields text with the injected tokens (and the trailing
    # anchor display words), so recompute expected
    expected = " ".join(
        (title + " "
         + text.replace("and", "and & x", 1)
               .replace(" the ", " the bold ", 1)
         + " " + " ".join(atexts)).split()
    )
    return url, ts, html.encode("utf-8"), expected, LANGS[key % len(LANGS)]


def generate_pages(spark: SparkSession, n: int, *, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generator: row i is f(i) only."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab = _vocab()
        cdf = _zipf_cdf()
        for pdf in batches:
            rows = [_row(int(i), vocab, cdf) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return base.mapInPandas(gen, PAGES_SCHEMA)
