"""URL canonicalization (operators/dedup.canonical_url_expr): the JVM
regexp chain must agree with an independent urllib-based reference
canonicalizer over a combinatorial battery of messy URLs (authority
case, default/explicit ports, tracking params in every position,
fragments, empty paths).
"""

import itertools

import pytest

from search_engine_spark.operators.dedup import (
    TRACKING_PARAMS,  # noqa: F401 - imported to pin the public name
    canonical_url_expr,
    latest_snapshot,
)


def ref_canonical(u: str) -> str:
    """Independent reference: urllib parsing, no regexps shared with
    the engine."""
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    sp = urlsplit(u)
    scheme = sp.scheme.lower()
    netloc = sp.netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[: -len(":80")]
    if scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[: -len(":443")]
    keep = [
        (k, v)
        for k, v in parse_qsl(sp.query, keep_blank_values=True)
        if not (k.startswith("utm_") or k in ("fbclid", "gclid"))
    ]
    return urlunsplit(
        (scheme, netloc, sp.path or "/", urlencode(keep), "")
    )


def _battery():
    schemes = ["http://", "HTTP://", "https://", "HtTpS://"]
    hosts = ["example.com", "ExAmple.COM", "sub.Example.org"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/p/q/r"]
    queries = [
        "",
        "?id=3",
        "?utm_source=f",
        "?utm_source=f&id=3",
        "?id=3&utm_medium=m",
        "?a=1&utm_a=x&b=2&gclid=g",
        "?fbclid=z&utm_b=y",
        "?Case=Mixed&id=0",
        # adversarial: params whose names merely CONTAIN a tracking
        # name must survive intact (round-3 ADVICE regression — the
        # unanchored strip turned 'butm_x=1&id=2' into 'bid=2')
        "?butm_x=1&id=2",
        "?xgclid=1&id=2",
        "?id=1&afbclid=2",
        # runs of consecutive tracking params in the middle
        "?utm_a=1&utm_b=2&id=3",
        "?id=0&utm_a=1&gclid=2&fbclid=3&z=9",
    ]
    frags = ["", "#sec"]
    for parts in itertools.product(schemes, hosts, ports, paths, queries,
                                   frags):
        yield "".join(parts)


def test_matches_urllib_reference(spark):
    urls = list(_battery())
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.url: r.c
        for r in df.select("url", canonical_url_expr().alias("c")).collect()
    }
    bad = [(u, got[u], ref_canonical(u)) for u in urls
           if got[u] != ref_canonical(u)]
    assert not bad, bad[:5]


def test_canonical_latest_snapshot(spark):
    """The intended composition: canonicalize, then recency-dedup on
    the canonical key — recrawls that differ only in noise collapse."""
    rows = [
        ("HTTP://A.com:80/x?utm_source=1", 1),
        ("http://a.com/x", 2),
        ("http://a.com/x#frag", 3),
        ("http://b.com/y", 4),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts long")
    dd = latest_snapshot(
        df.withColumn("url", canonical_url_expr()), ts="warc_ts"
    ).collect()
    got = {r.url: r.warc_ts for r in dd}
    assert got == {"http://a.com/x": 3, "http://b.com/y": 4}


@pytest.mark.parametrize("u,want", [
    ("http://example.com", "http://example.com/"),
    ("http://example.com?utm_a=1&utm_b=2", "http://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://h.com/a#x?notquery=1", "http://h.com/a"),
])
def test_spot_cases(spark, u, want):
    df = spark.createDataFrame([(u,)], "url string")
    assert df.select(canonical_url_expr().alias("c")).head().c == want
