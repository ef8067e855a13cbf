"""Robots Exclusion Protocol (RFC 9309) rule evaluation — the crawl-
governance step of a web corpus pipeline: before a page's content enters
the corpus, the crawler's robots.txt decision for its URL must be
reproducible (compliance audits re-ask "was this URL allowed when
fetched?" at corpus scale).

Semantics implemented (the RFC 9309 core):
  * a rule matches when its path pattern prefix-matches the URL path;
    `*` matches any character run, a trailing `$` anchors the match to
    the whole path,
  * among matching allow/disallow rules the MOST SPECIFIC wins — longest
    rule string in octets (the RFC's measure, so `*`/`$` count),
  * specificity ties resolve to ALLOW (least-restrictive, per RFC),
  * no matching rule means allowed.
Single `*` user-agent group per host (the UA dimension is orthogonal to
the dataflow and would just add a group-selection join).

Scale shape: rules live as ONE array row per host — a robots.txt is a
few KB, hosts are ~1e7-1e8 even at crawl scale vs 1e12 URLs, so the
rules table broadcasts and the decision is a ROW-LOCAL filter +
array_max over the rule array inside the scan stage: the URL corpus
never shuffles. Pattern matching runs the generic regex translation
(escape, `*` -> `.*`, anchor) — the gate oracle pins it CLOSED-FORM from
the synthesizer's known rule shapes (the constructor-pins-parser pattern
of functions/url.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one regexp_replace escapes every regex metacharacter in a literal robots
# path span (the synth space is [a-z0-9/] but the translator is generic —
# real robots paths carry dots, dashes, '~', '%'-escapes). '*' stays out of
# the class: it is the REP wildcard, translated to '.*' afterwards.
# (SQL-literal backslash doubling: the Java regex is ([.^$+?()\[\]{}|\\])
# and the replacement is \$1 — "prepend one backslash to the match".)
_META_CLASS = "'([.^$+?()\\\\[\\\\]{}|\\\\\\\\])'"
_META_REPL = "'\\\\\\\\$1'"


def _rx_expr(path: str) -> str:
    """SQL expr: the rule path string -> an anchored-prefix regex
    ('^' + escaped literal, '*' -> '.*', trailing '$' kept as the end
    anchor). The emitted patterns use only '^', '.*', '$' and escaped
    literals — a dialect subset identical in Java regex and RE2."""
    body = (
        f"if(endswith({path}, '$'), "
        f"substring({path}, 1, length({path}) - 1), {path})"
    )
    esc = f"regexp_replace({body}, {_META_CLASS}, {_META_REPL})"
    esc = f"replace({esc}, '*', '.*')"
    return f"concat('^', {esc}, if(endswith({path}, '$'), '$', ''))"


def synth_robots(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """(host, crawl_delay int?, rules array<struct<path, allow int, rx,
    l int>>): a deterministic robots.txt per host from the fresh stream
    r = md5(host||'robots'):
      crawl_delay = nullif(r1 % 5, 0); n_rules = 1 + r0 % 4;
      rule i (bytes r[2+3i], r[3+3i], r[4+3i]):
        allow_i = 1 iff r[2+3i] % 3 = 2 (else disallow);
        d_i = r[3+3i] % 4; shape s_i = r[4+3i] % 4:
          0 -> '/p<d>' (prefix)        l=3
          1 -> '/p<d>$' (exact)        l=4
          2 -> '/p*' (star wildcard)   l=3
          3 -> '/' (root, matches all) l=1
    Every field has these closed forms for the oracle; rx/l are derived
    from the path string by the GENERIC translator so the synthesizer
    pins the parser."""
    b = [
        f"cast(conv(substr(hr, {2 * j + 1}, 2), 16, 10) as int)"
        for j in range(14)
    ]
    rules = []
    for i in range(4):
        a, d, s = b[2 + 3 * i], b[3 + 3 * i], b[4 + 3 * i]
        path = (
            f"case {s} % 4 "
            f"when 0 then concat('/p', {d} % 4) "
            f"when 1 then concat('/p', {d} % 4, '$') "
            "when 2 then '/p*' else '/' end"
        )
        rules.append(
            f"struct({path} as path, "
            f"if({a} % 3 = 2, 1, 0) as allow, "
            + _rx_expr(path)
            + " as rx, length(" + path + ") as l)"
        )
    return hosts.withColumn(
        "hr", F.expr(f"md5(concat({host_col}, 'robots'))")
    ).select(
        F.col(host_col).alias("host"),
        F.expr(f"nullif({b[1]} % 5, 0)").alias("crawl_delay"),
        F.expr(
            f"slice(array({', '.join(rules)}), 1, 1 + {b[0]} % 4)"
        ).alias("rules"),
    )


def robots_decisions(
    urls: DataFrame, robots: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per URL: (doc_id, url, host_canon, cpath, matched_path,
    allowed int, crawl_delay int?). The decision joins the BROADCAST
    per-host rule arrays and evaluates RFC 9309 longest-match row-locally:
    filter the rules whose pattern matches the canonical path, take
    array_max over struct(l, allow, path) — lexicographic struct order IS
    (longest, then allow-wins, then a deterministic path tie-break) — and
    default to allowed when nothing matches. Zero URL-side shuffles."""
    from .url import canonicalize_urls

    path0 = f"regexp_extract({url_col}, '^[a-zA-Z]+://[^/?#]*([^?#]*)', 1)"
    cpath = (
        f"if({path0} in ('', '/'), '/', "
        f"if(endswith({path0}, '/'), substring({path0}, 1, "
        f"length({path0}) - 1), {path0}))"
    )
    with_host = canonicalize_urls(urls, url_col).withColumn(
        "cpath", F.expr(cpath)
    )
    joined = with_host.join(
        F.broadcast(robots), with_host.host_canon == robots.host, "left"
    )
    best = (
        "array_max(transform("
        "filter(coalesce(rules, array()), r -> cpath rlike r.rx), "
        "m -> struct(m.l as l, m.allow as allow, m.path as path)))"
    )
    return joined.select(
        "doc_id",
        F.col(url_col).alias("url"),
        "host_canon",
        "cpath",
        F.expr(f"{best}.path").alias("matched_path"),
        F.expr(f"coalesce({best}.allow, 1)").cast("int").alias("allowed"),
        "crawl_delay",
    )
