"""URL canonicalization (functions/url.py): hand-built edge cases for the
generic canonicalizer (the synth path is pinned end-to-end by the
url_canonical_dedup gate oracle) plus the one-Exchange dedup plan pin."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from html_parser_spark.functions import url as U


def _canon(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id bigint, url string"
    )
    return [r.url_canon for r in U.canonicalize_urls(df).orderBy("doc_id").collect()]


def test_canonicalize_edge_cases(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Example.COM:80/a/b/?utm_source=x#frag",
            "https://example.com:443/",
            "https://example.com:8443/x",       # non-default port kept
            "http://example.com:8080/x?b=2&a=1",  # params sorted
            "http://example.com/x?utm_a=1&utm_b=2",  # all-utm query dropped
            "http://www.www-site.com/x",        # only the PREFIX www. strips
            "http://example.com",               # no path at all
            "http://example.com/?",             # empty query dropped
        ],
    )
    assert got == [
        "http://example.com/a/b",
        "https://example.com",
        "https://example.com:8443/x",
        "http://example.com:8080/x?a=1&b=2",
        "http://example.com/x",
        "http://www-site.com/x",
        "http://example.com",
        "http://example.com",
    ]


def test_canonical_dedup_groups_and_plan(spark):
    urls = [
        "http://www.A.com/p?utm_source=t&k=1",
        "HTTP://a.COM:80/p/?k=1#top",
        "http://a.com/p?k=1",
        "https://a.com/p?k=1",  # scheme differs -> different canon
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id bigint, url string"
    )
    out = U.canonical_dedup(df)
    # plan BEFORE execution: post-run AQE explain prints Final + Initial
    # plans and double-counts every node
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
    rows = {r.doc_id: r for r in out.collect()}
    assert [rows[i].n_same for i in range(4)] == [3, 3, 3, 1]
    assert [rows[i].rep_doc_id for i in range(4)] == [0, 0, 0, 3]


def test_canonicalize_is_idempotent_property(spark):
    """canon(canon(u)) == canon(u) over a generated URL space (case x www
    x port x path-slash x utm/order x fragment). Idempotence is the
    property that makes the canonical key safe to re-apply anywhere in a
    pipeline (e.g. on already-normalized lake data)."""
    import itertools

    urls = []
    for scheme, host, port, slash, query, frag in itertools.product(
        ["http", "HTTPS"],
        ["www.Site7.COM", "site7.com", "WWW.a-b.org"],
        ["", ":80", ":443", ":8080"],
        ["/x/y", "/x/y/", "/", ""],
        ["", "?utm_a=1", "?b=2&a=1&utm_s=x", "?a=1"],
        ["", "#frag"],
    ):
        urls.append(f"{scheme}://{host}{port}{slash}{query}{frag}")
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id bigint, url string"
    )
    once = U.canonicalize_urls(df).select(
        "doc_id", F.col("url_canon").alias("url")
    )
    twice = U.canonicalize_urls(once).select("doc_id", "url_canon")
    diff = (
        once.withColumnRenamed("url", "c1")
        .join(twice, "doc_id")
        .where("c1 <> url_canon")
        .count()
    )
    assert diff == 0
