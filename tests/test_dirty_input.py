"""Dirty-input resilience: at corpus scale, null doc_ids / spans / struct
fields WILL occur — the kernel must classify, never crash a task."""

from __future__ import annotations

from html_parser_spark.operators.extract import INPUT_SCHEMA, extract_spans

ROWS = [
    (None, [{"kind": "text", "text": "<p>x</p>", "media_ref": None, "offset": 0}]),
    ("d1", None),
    ("d2", [{"kind": None, "text": None, "media_ref": None, "offset": None}]),
    ("d3", [{"kind": "media", "text": None, "media_ref": None, "offset": 0}]),
]


def test_nulls_never_crash_and_classify_sanely(spark):
    df = spark.createDataFrame(ROWS, schema=INPUT_SCHEMA)
    got = {r["doc_id"]: r for r in extract_spans(df).collect()}
    assert len(got) == 4
    # null doc_id row still extracts (lineage bucket 0)
    assert got[None]["status"] == "ok" and got[None]["n_spans"] == 1
    assert got[None]["partition_id"] == 0
    # null spans array -> empty ok
    assert got["d1"]["status"] == "ok" and got["d1"]["spans"] == []
    # null struct fields -> treated as empty text payload
    assert got["d2"]["status"] == "ok" and got["d2"]["n_spans"] == 0
    # media without a ref passes through with null media_ref
    assert [
        (s["kind"], s["media_ref"]) for s in got["d3"]["spans"]
    ] == [("media", None)]
