"""URL canonicalization semantics: normalization idempotence, domain
extraction with two-level suffixes, dedup equivalence of messy variants."""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.functions.url import (
    normalize_url,
    registered_domain,
    url_host,
)

CASES = [
    # (raw, norm, domain)
    ("http://WWW.Ex.CO.UK/p/1/?utm=x#top", "ex.co.uk/p/1", "ex.co.uk"),
    ("https://a.b.example.com/x", "a.b.example.com/x", "example.com"),
    ("https://news.site.co.jp/", "news.site.co.jp", "site.co.jp"),
    ("example.org/page", "example.org/page", "example.org"),
    ("https://www.example.org", "example.org", "example.org"),
    ("HTTPS://HOST.COM/A#frag", "host.com/a", "host.com"),
    ("http://wwwx.com/q?a=1&b=2", "wwwx.com/q", "wwwx.com"),
    ("https://co.uk/odd", "co.uk/odd", "co.uk"),  # bare suffix: 2 labels
]


def _frame(spark):
    return spark.createDataFrame(
        [(i, raw, want_n, want_d) for i, (raw, want_n, want_d) in enumerate(CASES)],
        "i LONG, raw STRING, want_norm STRING, want_dom STRING",
    )


def test_normalize_and_domain(spark):
    df = _frame(spark).select(
        "i",
        "want_norm",
        "want_dom",
        normalize_url(F.col("raw")).alias("norm"),
    )
    df = df.withColumn("dom", registered_domain(url_host(F.col("norm"))))
    for r in df.collect():
        assert r.norm == r.want_norm, f"case {r.i}: {r.norm!r}"
        assert r.dom == r.want_dom, f"case {r.i}: {r.dom!r}"


def test_normalize_idempotent(spark):
    df = _frame(spark).select(normalize_url(F.col("raw")).alias("n1"))
    df = df.select("n1", normalize_url(F.col("n1")).alias("n2"))
    assert df.where(F.col("n1") != F.col("n2")).count() == 0


def test_messy_variants_collapse_for_dedup(spark):
    variants = [
        "https://www.shop.example.com/item/9",
        "HTTP://shop.example.com/item/9/",
        "shop.example.com/item/9?ref=x",
        "https://shop.example.com/item/9#reviews",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "u STRING")
    n = df.select(normalize_url(F.col("u")).alias("n")).distinct().count()
    assert n == 1


def test_registered_domain_single_label_host(spark):
    """Review finding: dotless hosts (localhost, intranet names) must
    return themselves, not '' (which collapsed unrelated hosts into one
    cap bucket and diverged from the oracle's [-2:] slice)."""
    from merkonvectordb_spark.functions.url import registered_domain

    rows = spark.createDataFrame(
        [("localhost",), ("intranet",), ("a.example.com",)], "h STRING"
    ).select(registered_domain(F.col("h")).alias("d")).collect()
    assert [r.d for r in rows] == ["localhost", "intranet", "example.com"]


def test_port_and_userinfo_strip(spark):
    """example.com:8080 and user@example.com are the SAME host as
    example.com — ports/userinfo must not create phantom domains that
    bypass per-domain caps and blocklists."""
    from merkonvectordb_spark.functions.url import (
        normalize_url,
        registered_domain,
        url_host,
    )

    df = spark.createDataFrame(
        [
            ("https://example.com:8080/p/1",),
            ("http://user@example.com/p/2",),
            ("https://example.com/p/3",),
        ],
        "url STRING",
    )
    doms = {
        r[0]
        for r in df.select(
            registered_domain(url_host(normalize_url(F.col("url"))))
        ).collect()
    }
    assert doms == {"example.com"}
