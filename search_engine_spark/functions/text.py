"""Text kernel: HTML extraction, Unicode tokenization, Porter stemming.

These pure-Python functions are the single source of truth for BOTH the
index build and the query path (SURVEY.md section 7.1 M0) — rank
identity vs the reference hinges on byte-identical text handling
(BASELINE.json input_hint: "byte-identical extracted text per url").

The reference's exact extractor/tokenizer/stemmer are unavailable
(empty reference mount, SURVEY.md section 0); the canonical semantics
below are frozen by tests/goldens and isolated here so a one-function
swap restores the invariant once the reference can be inspected:

- extract_text: strip tags, drop <script>/<style> subtrees and
  comments, decode HTML entities, collapse all Unicode whitespace runs
  to single spaces (SURVEY.md T1, FIXTURES.md section 4).
- tokenize: NFKC-normalize, casefold, then maximal runs of word
  characters excluding underscore (SURVEY.md T2/T3, risk R3).
- porter_stem: Porter 1980 steps 1a-5b exactly as published
  (SURVEY.md T4, risk R3). Implemented from the paper; no nltk.

Vectorization contract: all three are exposed in batch form
(*_batch) operating on pandas Series / numpy arrays so the Spark layer
only ever calls them through Arrow-batched UDFs — no per-row Python at
the Spark boundary (BASELINE.json input_hint).
"""

from __future__ import annotations

import re
import unicodedata
from html.parser import HTMLParser

# ---------------------------------------------------------------------------
# T1 — HTML text extraction
# ---------------------------------------------------------------------------

_SKIP_TAGS = frozenset({"script", "style"})


class _TextExtractor(HTMLParser):
    """Tolerant HTML -> text: skips script/style content and comments.

    html.parser is tolerant of malformed/unclosed tags, which matches
    the golden fixtures (FIXTURES.md section 4). convert_charrefs=True
    decodes entities (&amp; &#39; &nbsp; ...) for free.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._chunks: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self._chunks.append(data)

    def text(self) -> str:
        # Collapse every run of Unicode whitespace (incl. NBSP from
        # &nbsp;) to a single space; strip ends.
        return " ".join("".join(self._chunks).split())


def extract_text(html: bytes | str | None) -> str:
    """Extract plain text from raw page bytes.

    Bytes are decoded as UTF-8 with a latin-1 fallback (never raises on
    arbitrary byte content — Common-Crawl pages are dirty).
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        b = bytes(html)
        try:
            s = b.decode("utf-8")
        except UnicodeDecodeError:
            s = b.decode("latin-1")
    else:
        s = html
    p = _TextExtractor()
    try:
        p.feed(s)
        p.close()
    except Exception:
        # html.parser almost never raises; belt-and-braces for hostile
        # input — fall back to a regex tag strip.
        s2 = re.sub(r"(?is)<(script|style)\b.*?</\1\s*>", " ", s)
        s2 = re.sub(r"(?s)<!--.*?-->", " ", s2)
        s2 = re.sub(r"<[^>]*>", " ", s2)
        return " ".join(s2.split())
    return p.text()


class _TitleExtractor(HTMLParser):
    """Collects text inside the FIRST <title> element only."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._in_title = False
        self._done = False
        self._chunks: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag == "title" and not self._done:
            self._in_title = True

    def handle_endtag(self, tag: str) -> None:
        if tag == "title" and self._in_title:
            self._in_title = False
            self._done = True

    def handle_data(self, data: str) -> None:
        if self._in_title and data:
            self._chunks.append(data)

    def text(self) -> str:
        return " ".join("".join(self._chunks).split())


def extract_title(html: bytes | str | None) -> str:
    """The page's <title> text (first title element, entity-decoded,
    whitespace-collapsed; '' when absent) — the second indexed field
    for multi-field ranking (plans/multifield.py). Same byte-decode
    tolerance as extract_text."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        b = bytes(html)
        try:
            s = b.decode("utf-8")
        except UnicodeDecodeError:
            s = b.decode("latin-1")
    else:
        s = html
    p = _TitleExtractor()
    try:
        p.feed(s)
        p.close()
    except Exception:
        m = re.search(r"(?is)<title[^>]*>(.*?)</title", s)
        if not m:
            return ""
        return " ".join(re.sub(r"<[^>]*>", " ", m.group(1)).split())
    return p.text()


# ---------------------------------------------------------------------------
# T2/T3 — Unicode tokenization
# ---------------------------------------------------------------------------

# \w minus underscore, on NFKC-casefolded text (SURVEY.md risk R3).
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def tokenize(text: str | None) -> list[str]:
    """NFKC-normalize + casefold, then split into word-character runs."""
    if not text:
        return []
    norm = unicodedata.normalize("NFKC", text).casefold()
    return _TOKEN_RE.findall(norm)


# ---------------------------------------------------------------------------
# T4 — Porter stemmer (Porter 1980, steps 1a-5b)
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V] — count of VC transitions."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_vowel and not v:
            m += 1
        prev_vowel = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(stem: str) -> bool:
    return (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and _is_cons(stem, len(stem) - 1)
    )


def _ends_cvc(stem: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(stem) < 3:
        return False
    return (
        _is_cons(stem, len(stem) - 3)
        and not _is_cons(stem, len(stem) - 2)
        and _is_cons(stem, len(stem) - 1)
        and stem[-1] not in "wxy"
    )


# (suffix, replacement, min_m) rule tables — longest match wins inside
# a step, and only the matched rule's m-condition is tested.
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def porter_stem(word: str) -> str:
    """Porter 1980 algorithm, steps 1a-5b, exactly as published.

    Lowercase ASCII expected (tokenize() guarantees casefold); words of
    length <= 2 are returned unchanged per the paper's convention.
    """
    w = word
    if len(w) <= 2:
        return w

    # ---- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b
    fired = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            fired = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            fired = True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # ---- step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- step 2 (longest-suffix match, then m>0 on the stem)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # ---- step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # ---- step 4 (m>1; 'ion' additionally requires *S or *T)
    for suf in sorted(_STEP4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1 and (
                suf != "ion" or (stem and stem[-1] in "st")
            ):
                w = stem
            break

    # ---- step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # ---- step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


# ---------------------------------------------------------------------------
# Batch (vectorized) forms — the only entry points the Spark layer uses
# ---------------------------------------------------------------------------


def stem_tokens(tokens: list[str], memo: dict[str, str] | None = None) -> list[str]:
    """Stem a token list with memoization (vocab per batch is small)."""
    if memo is None:
        memo = {}
    # C-level: set difference finds the unmemoized tokens, map does the
    # lookup loop — ~2x the throughput of a per-token Python loop
    for t in set(tokens).difference(memo):
        memo[t] = porter_stem(t)
    return list(map(memo.__getitem__, tokens))


def analyze(text: str | None, *, stem: bool = True,
            memo: dict[str, str] | None = None) -> list[str]:
    """Full analyzer: tokenize (+ optionally stem). Used identically on
    documents (index build) and query strings (SURVEY.md section 3.2)."""
    toks = tokenize(text)
    if stem:
        return stem_tokens(toks, memo)
    return toks


def term_counts(
    text: str | None, *, stem: bool = True,
    memo: dict[str, str] | None = None,
) -> tuple[int, dict[str, int]]:
    """(doclen, {term: tf}) for one document — the index-build hot path.

    Counts RAW tokens first (C-level Counter), then stems only the
    document's distinct tokens and merges counts. Identical result to
    Counter(analyze(text)) — two stems mapping to one term sum their
    tfs — but does per-token Python work on |distinct| items instead
    of |tokens| (~35% fewer iterations on Zipf text, no intermediate
    stemmed list). doclen is the raw token count (stemming is 1:1)."""
    from collections import Counter

    toks = tokenize(text)
    dl = len(toks)
    raw = Counter(toks)
    if not stem:
        return dl, raw
    if memo is None:
        memo = {}
    get = memo.get
    agg: dict[str, int] = {}
    for tok, c in raw.items():
        s = get(tok)
        if s is None:
            s = porter_stem(tok)
            memo[tok] = s
        if s in agg:
            agg[s] += c
        else:
            agg[s] = c
    return dl, agg


def extract_batch(htmls, out_list=None):
    """Vectorized extract for an iterable of bytes/None -> list[str]."""
    return [extract_text(h) for h in htmls]


def analyze_batch(texts, *, stem: bool = True) -> list[list[str]]:
    """Analyze a batch of texts with one shared stem memo (amortizes
    Porter to O(distinct tokens) per Arrow batch — SURVEY.md T4)."""
    memo: dict[str, str] = {}
    return [analyze(t, stem=stem, memo=memo) for t in texts]
