"""Robots REP evaluation (functions/robots.py): hand-built RFC 9309
semantics cases for the generic matcher (the synth path is pinned
end-to-end by the web_robots_decisions gate oracle) plus the
broadcast/zero-URL-side-Exchange plan pin."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from html_parser_spark.functions.robots import _rx_expr, robots_decisions


def _robots(spark, host, rules, crawl_delay=None):
    """Hand-built robots table: rules as (path, allow) pairs; rx/l derived
    by the SAME generic translator the synthesizer uses."""
    df = spark.createDataFrame(
        [(host, crawl_delay, rules)],
        "host string, crawl_delay int, "
        "prules array<struct<path: string, allow: int>>",
    )
    return df.select(
        "host",
        "crawl_delay",
        F.expr(
            "transform(prules, x -> struct(x.path as path, x.allow as allow, "
            + _rx_expr("x.path")
            + " as rx, length(x.path) as l))"
        ).alias("rules"),
    )


def _decide(spark, robots, paths):
    urls = spark.createDataFrame(
        [(str(i), f"http://h.com{p}") for i, p in enumerate(paths)],
        "doc_id string, url string",
    )
    out = robots_decisions(urls, robots)
    return {
        r.doc_id: (r.matched_path, r.allowed, r.crawl_delay)
        for r in out.collect()
    }


def test_rfc9309_longest_match_semantics(spark):
    robots = _robots(
        spark,
        "h.com",
        [
            ("/p", 0),        # short deny prefix
            ("/page$", 1),    # exact allow, longest (l=6)
            ("/page", 0),     # deny prefix (l=5)
            ("/", 1),         # root allow (l=1)
            ("/q*z", 0),      # mid-string wildcard deny (l=4)
        ],
        crawl_delay=3,
    )
    got = _decide(
        spark, robots, ["/page", "/pages", "/x", "/qabcz", "/qabc"]
    )
    # exact '$' rule outranks the deny prefix on the exact path only
    assert got["0"] == ("/page$", 1, 3)
    # '$' no longer matches '/pages'; '/page' (l=5) deny wins over '/p'
    assert got["1"] == ("/page", 0, 3)
    # nothing but root matches
    assert got["2"] == ("/", 1, 3)
    # '*' spans the middle run; deny
    assert got["3"] == ("/q*z", 0, 3)
    # '^/q.*z' needs the trailing 'z' -> only root matches
    assert got["4"] == ("/", 1, 3)


def test_specificity_tie_resolves_to_allow(spark):
    robots = _robots(spark, "h.com", [("/ab", 0), ("/a*", 1)])
    got = _decide(spark, robots, ["/ab"])
    # both rules have l=3 and match; RFC least-restrictive: ALLOW wins
    assert got["0"] == ("/a*", 1, None)


def test_unknown_host_and_no_match_default_allow(spark):
    robots = _robots(spark, "other.org", [("/", 0)])
    got = _decide(spark, robots, ["/anything"])
    # h.com has no robots row at all -> allowed, no delay
    assert got["0"] == (None, 1, None)

    robots2 = _robots(spark, "h.com", [("/only$", 0)])
    got2 = _decide(spark, robots2, ["/other"])
    # a robots row exists but no rule matches -> allowed
    assert got2["0"] == (None, 1, None)


def test_crawl_schedule_fifo_and_delay_spacing(spark):
    """The composed frontier query (q_web_crawl_schedule semantics): per
    host, allowed URLs are sequenced FIFO by doc_id and eta steps by the
    host's crawl_delay (default 1 s when robots.txt sets none)."""
    from pyspark.sql import Window

    robots = _robots(spark, "h.com", [("/deny", 0), ("/", 1)], crawl_delay=5)
    urls = spark.createDataFrame(
        [
            ("a", "http://h.com/x"),
            ("b", "http://h.com/deny/sub"),   # disallowed -> excluded
            ("c", "http://h.com/y"),
            ("d", "http://nodelay.org/z"),    # no robots row -> delay 1
        ],
        "doc_id string, url string",
    )
    dec = robots_decisions(urls, robots)
    w = Window.partitionBy("host_canon").orderBy("doc_id")
    out = (
        dec.where("allowed = 1")
        .withColumn("fetch_seq", F.row_number().over(w).cast("int"))
        .withColumn(
            "eta_sec",
            F.expr("cast((fetch_seq - 1) * coalesce(crawl_delay, 1) as bigint)"),
        )
    )
    rows = {r.doc_id: (r.fetch_seq, r.eta_sec) for r in out.collect()}
    assert set(rows) == {"a", "c", "d"}
    assert rows["a"] == (1, 0)
    assert rows["c"] == (2, 5)   # second fetch waits one crawl_delay
    assert rows["d"] == (1, 0)


def test_plan_broadcast_and_zero_url_side_exchange(spark):
    robots = _robots(spark, "h.com", [("/a", 0)])
    urls = spark.createDataFrame(
        [("0", "http://h.com/a")], "doc_id string, url string"
    )
    out = robots_decisions(urls, robots)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # rule table broadcasts; the URL corpus never shuffles
    assert "BroadcastExchange" in plan
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 0
