"""PII redaction (operators/pii): pattern behavior on handcrafted
strings, sequential-count semantics, pure-JVM plan, and the
cluster-representative keep-policy operator."""

import pytest

from search_engine_spark.operators.pii import PII_RULES, redact_pii


def _one(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return redact_pii(df).collect()[0]


CASES = [
    # (input, redacted, n_email, n_ipv4, n_phone)
    ("write to alice@example.com today",
     "write to <EMAIL> today", 1, 0, 0),
    ("Bob.Smith+tag@sub.domain.org and carol@x.io",
     "<EMAIL> and <EMAIL>", 2, 0, 0),
    ("server at 192.168.0.1 then 10.0.0.255",
     "server at <IP> then <IP>", 0, 2, 0),
    ("call 555-0123 or (415) 555-0123",
     "call <PHONE> or <PHONE>", 0, 0, 2),
    ("call 415-555-0123 now",
     "call <PHONE> now", 0, 0, 1),
    # mixed: the email host is NOT double-counted as an IP (counts are
    # sequential — the ipv4 count runs on post-email-redaction text)
    ("mail 1.2.3.4@5.6.7.8.com from 1.2.3.4 tel 555-1234",
     "mail <EMAIL> from <IP> tel <PHONE>", 1, 1, 1),
    # no PII -> untouched
    ("plain words only", "plain words only", 0, 0, 0),
    # version strings: 1.2.3 (three octets) is not an IP
    ("upgrade to 1.2.3 now", "upgrade to 1.2.3 now", 0, 0, 0),
    ("", "", 0, 0, 0),
]


@pytest.mark.parametrize("text,want,ne,ni,np", CASES)
def test_redaction_cases(spark, text, want, ne, ni, np):
    r = _one(spark, text)
    assert r.redacted == want
    assert (r.n_email, r.n_ipv4, r.n_phone) == (ne, ni, np)


def test_rules_shared_syntax():
    """Patterns must stay inside the RE2 ∩ Java-regex dialect the
    oracle depends on: no lookaround, no backreferences."""
    for _, pat, _ in PII_RULES:
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat
        assert "\\1" not in pat and "\\2" not in pat


def test_plan_is_pure_jvm(spark):
    df = spark.createDataFrame([(0, "a@b.co")], "doc_id long, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no ArrowEval/BatchEvalPython nodes


def test_no_counts_mode(spark):
    df = spark.createDataFrame([(0, "a@b.co")], "doc_id long, text string")
    out = redact_pii(df, counts=False)
    assert out.columns == ["doc_id", "text", "redacted"]


def test_cluster_representatives(spark):
    """Keep-policy argmax: highest weight wins, ties -> doc_id asc,
    docs without a weight row score 0, singletons survive."""
    from search_engine_spark.operators.dedup import cluster_representatives

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1),   # cluster 1: weights 5, 9, 9 -> rep 2
         (4, 4), (5, 4),           # cluster 4: no weights at all -> rep 4
         (6, 6)],                  # singleton
        "doc_id long, cluster_id long",
    )
    weights = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (6, 1.0)],
        "doc_id long, weight double",
    )
    got = {
        r.cluster_id: (r.rep_doc_id, r.cluster_size)
        for r in cluster_representatives(clusters, weights).collect()
    }
    assert got == {1: (2, 3), 4: (4, 2), 6: (6, 1)}
