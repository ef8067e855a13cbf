"""parse_one (operators/parse.py) must equal the oracle tree flattened in
document order (ascending id), for every fixture."""

from __future__ import annotations

from html_parser_spark.core import oracle
from html_parser_spark.operators.parse import parse_one
from html_parser_spark.sources.fixtures import FIXTURES


def _flatten(node, out):
    for c in node.get("children") or ():
        row = {
            "id": c["id"],
            "pid": c["pid"],
            "kind": c["type"],
            "tag": c.get("tagName"),
            "unary": c.get("unary") if c["type"] == oracle.ELEMENT else None,
        }
        if c["type"] == oracle.ELEMENT:
            row["content"] = None
            row["inner"] = None
            row["attrs"] = [{"name": a["name"], "value": a["value"]} for a in c["attrs"]]
        else:
            content = c["content"]
            inner = None
            if c["type"] == oracle.INTERPOLATION:
                content, inner = content  # reference's [raw, inner] pair
            row["content"] = content
            row["inner"] = inner
            row["attrs"] = None
        out.append(row)
        if c["type"] == oracle.ELEMENT and not c.get("unary"):
            _flatten(c, out)
    return out


def test_parse_one_matches_oracle_flat():
    import sys

    sys.setrecursionlimit(100_000)
    for fid, _cat, html, expected_status in FIXTURES:
        nodes, status, error = parse_one(html)
        assert status == expected_status, (fid, status, error)
        if expected_status != "ok":
            assert nodes is None
            continue
        want = sorted(_flatten(oracle.parse_html(html), []), key=lambda r: r["id"])
        got = sorted(nodes, key=lambda r: r["id"])
        # our rows carry unary=False for non-self-closed elements; oracle
        # promoted opens also have unary False — normalize bool-vs-None only
        # for TAG_NAME rows (both True there)
        assert got == want, fid


def test_parse_one_flat_equals_dict_form():
    """The columnar kernel (parse_one_flat, the mapInArrow crossing) must
    produce exactly the dict form's rows — same statuses, same truncation-on-
    error rollback — for every fixture."""
    from html_parser_spark.operators.parse import parse_one_flat

    for fid, _cat, html, _exp in FIXTURES:
        want_nodes, want_status, want_error = parse_one(html)
        cols = [[] for _ in range(10)]
        n_nodes, status, error = parse_one_flat(html, *cols)
        (ids, pids, kinds, tags, contents, inners, unaries,
         attr_names, attr_values, attr_lens) = cols
        assert (status, error) == (want_status, want_error), fid
        if want_nodes is None:
            assert n_nodes == -1 and not ids and not attr_names, fid
            continue
        assert n_nodes == len(want_nodes), fid
        ai = 0
        for j, w in enumerate(want_nodes):
            attrs = None
            if attr_lens[j] >= 0:
                attrs = [
                    {"name": attr_names[ai + k], "value": attr_values[ai + k]}
                    for k in range(attr_lens[j])
                ]
                ai += attr_lens[j]
            got = {
                "id": ids[j], "pid": pids[j], "kind": kinds[j], "tag": tags[j],
                "content": contents[j], "inner": inners[j], "attrs": attrs,
                "unary": unaries[j],
            }
            assert got == w, (fid, j)
        assert ai == len(attr_names), fid


def test_document_order_is_ascending_id():
    nodes, status, _ = parse_one("<div><p>a</p><img src='x'/>b</div>")
    assert status == "ok"
    assert [n["id"] for n in nodes] == sorted(n["id"] for n in nodes)
    kinds = [(n["kind"], n["tag"]) for n in nodes]
    assert kinds == [
        ("Element", "div"),
        ("Element", "p"),
        ("Text", None),
        ("Element", "img"),
        ("Text", None),
    ]
