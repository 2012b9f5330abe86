"""PII redaction: scrub emails / IPv4 addresses / phone numbers out of
document text before it enters a training corpus.

Every serious LLM-data pipeline carries this pass (CCNet/C4/Gopher all
describe PII or boilerplate scrubbing stages); the operator here is the
Spark-native shape of it:

  * pure JVM ``regexp_replace`` / ``regexp_count`` chains — whole-stage
    codegen end to end, NO Python on the per-row path (plan-gated in
    tests/test_pii.py), so at 100 TB the pass is scan-bound;
  * patterns are deliberately restricted to syntax RE2 and Java regex
    interpret identically (character classes, bounded repetition, word
    boundaries — no lookaround, no backreferences) so the DuckDB oracle
    replays the exact transformation (`pii_redaction` entry);
  * replacement order is fixed (email -> ipv4 -> phone): an earlier
    rule's placeholder can never be re-matched by a later rule because
    placeholders contain no digits or '@'.

The redaction is detection-grade, not adversarial: like C4's scrubbing
it targets well-formed PII in natural text, not obfuscated forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (name, pattern, placeholder) in application order. Patterns use only
# RE2-and-Java-common syntax; \b is supported by both engines.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    (
        # NANP-style 555-0123 / 415-555-0123 / (415) 555-0123. The \b
        # sits AFTER the optional paren group (a boundary can't precede
        # a literal '(' — space and '(' are both non-word) and keeps
        # the rule from firing inside longer digit runs like 1234-5678
        "phone",
        r"(\(\d{3}\)[ ]?)?\b(\d{3}-)?\d{3}-\d{4}\b",
        "<PHONE>",
    ),
)


def redact_expr(col: Column) -> Column:
    """The redacted text as one nested JVM expression (codegen)."""
    out = col
    for _, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "redacted",
    counts: bool = True,
) -> DataFrame:
    """Append ``out_col`` (scrubbed text) and, when ``counts``, one
    ``n_<rule>`` long column per rule (how many spans were redacted —
    the audit signal a pipeline logs per shard).

    Counts are taken against the PREVIOUS rule's output, matching the
    sequential replacement exactly: an email's host part can contain a
    dotted quad, and counting every rule against the raw text would
    double-count it.
    """
    cur = F.col(text_col)
    out = df
    for name, pat, repl in PII_RULES:
        if counts:
            out = out.withColumn(
                f"n_{name}", F.regexp_count(cur, F.lit(pat)).cast("long")
            )
        cur = F.regexp_replace(cur, pat, repl)
    return out.withColumn(out_col, cur)
