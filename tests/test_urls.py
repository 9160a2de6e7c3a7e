"""URL/domain curation ops (llm.urls): canonicalization edges the
q227-q229 oracles' synthesized corpus doesn't reach, quota
determinism, and blocklist shape equivalence."""

from pyspark.sql import functions as F

from hadron_spark.llm.urls import (
    blocklist_filter,
    domain_quota_sample,
    normalize_url,
    registered_domain,
    url_parts,
)


def test_normalize_url_edges(spark):
    cases = [
        # (input, expected canonical)
        ("HTTP://A.B:80/", "http://a.b"),
        ("https://a.b:443/x/", "https://a.b/x"),
        ("https://a.b:8443/x", "https://a.b:8443/x"),
        ("http://a.b/?utm_source=x&utm_medium=y", "http://a.b"),
        ("http://a.b/p?z=1&a=2&FBCLID=t", "http://a.b/p?a=2&z=1"),
        ("ftp://Files.Example.org/pub/", "ftp://files.example.org/pub"),
        ("no-scheme.example.com/path", None),  # malformed -> NULL
        ("http://a.b/p?", "http://a.b/p"),  # empty query
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_url("url").alias("n")).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_registered_domain_edges(spark):
    cases = [
        ("www.example.com", "example.com"),
        ("a.b.c.news.co.uk", "news.co.uk"),
        ("co.uk", "co.uk"),  # bare public suffix: nothing to register
        ("localhost", "localhost"),
        ("EXAMPLE.COM", "example.com"),
        ("deep.sub.tree.example.org", "example.org"),
    ]
    df = spark.createDataFrame(cases, "host string, want string")
    bad = df.filter(registered_domain("host") != F.col("want")).count()
    assert bad == 0


def test_domain_quota_deterministic_and_capped(spark):
    rows = [(i, f"d{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    a = sorted(
        r["doc_id"] for r in domain_quota_sample(df, "dom", 5).collect()
    )
    assert len(a) == 15  # 3 domains x cap 5
    b = sorted(
        r["doc_id"]
        for r in domain_quota_sample(df.repartition(7), "dom", 5).collect()
    )
    assert a == b  # identical keeps under any partitioning
    import pytest

    with pytest.raises(ValueError, match="max_docs_per_domain"):
        domain_quota_sample(df, "dom", 0)


def test_blocklist_shapes_agree(spark):
    hosts = [
        (1, "ok.example.com"),
        (2, "bad.org"),
        (3, "sub.bad.org"),
        (4, "notbad.org"),  # suffix of the name, NOT a subdomain
        (5, "deep.a.bad.org"),
    ]
    df = spark.createDataFrame(hosts, "doc_id long, host string")
    small = sorted(
        r["doc_id"]
        for r in blocklist_filter(df, "host", ["bad.org"]).collect()
    )
    assert small == [1, 4]
    bl = spark.createDataFrame([("bad.org",)], "domain string")
    big = sorted(
        r["doc_id"] for r in blocklist_filter(df, "host", bl).collect()
    )
    assert big == small


def test_url_parts_no_port_no_query(spark):
    df = spark.createDataFrame([("https://x.y/p",)], "url string")
    r = df.select(url_parts("url").alias("p")).collect()[0]["p"]
    assert (r["scheme"], r["host"], r["port"], r["path"], r["query"]) == (
        "https",
        "x.y",
        "",
        "/p",
        None,
    ) or (r["scheme"], r["host"], r["port"], r["path"], r["query"]) == (
        "https",
        "x.y",
        "",
        "/p",
        "",
    )
