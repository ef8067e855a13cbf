"""In-suite version of the driver's correctness gate: every
__spark_entry__.queries() entry vs its oracle_sql() via DuckDB at sf0.001 —
row count, column names, order-insensitive exact values (doubles by repr,
i.e. bit-exact). Keeps `python -m pytest -x -q` self-contained as the full
correctness gate between driver rounds."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata unavailable"
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


def _norm(v):
    if v is None:
        return "\0N"
    if isinstance(v, float):
        return repr(v)
    return repr(v)


def _multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\1".join(_norm(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, con, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    rows = [tuple(r) for r in df.collect()]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(rows) > 0  # rows-only contract
        return
    res = con.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(df.columns) == sorted(ocols)
    assert len(rows) == len(orows)
    assert _multiset(df.columns, rows) == _multiset(ocols, orows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "status", "kind", "text", "media_ref", "span_order",
    ]
