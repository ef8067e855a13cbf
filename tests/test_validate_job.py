"""jobs/validate_corpus.py: the clean testdata passes every check; a
corpus with planted violations (orphans, dup keys, bad ranges) counts each
one and fails the gate flag."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))

import validate_corpus  # noqa: E402


def test_clean_corpus_passes(spark, capsys):
    rc = validate_corpus.main(
        ["--tables", "/root/testdata/sf0.001", "--fail-on-violation"],
        spark=spark,
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] == 1
    assert all(v == 0 for k, v in out.items() if k != "ok")


def test_planted_violations_counted(spark, tmp_path):
    d = str(tmp_path)
    spark.createDataFrame(
        [(1, "a", 1, 0.0, "BUILDING"), (1, "dup", 1, 0.0, "BUILDING")],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(10, 1, "O", 5.0, "2024-01-01", "P"), (11, 99, "O", 5.0, "2024-01-01", "P")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "cast(o_orderdate as timestamp) as o_orderdate", "o_orderpriority",
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [
            (10, 1, 7, 1, 99.0, 10.0, 0.05, 0.0, "N", "O", "2024-01-02"),
            (777, 1, 7, 1, 2.0, -1.0, 0.5, 0.0, "N", "O", "2024-01-02"),
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "cast(l_shipdate as timestamp) as l_shipdate",
    ).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        [(7, "s", 1, 0.0)],
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    ).write.parquet(f"{d}/supplier.parquet")
    spark.createDataFrame(
        [(1, "1970-01-01 00:00:00", None, "click", 1.0, "{}")],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "cast(ts as timestamp) as ts", "user_id", "event_type",
        "value", "props",
    ).write.parquet(f"{d}/events.parquet")

    checks = validate_corpus.run_checks(spark, d)
    assert checks["customer_dup_custkey"] == 1
    assert checks["orders_orphan_custkey"] == 1  # o_custkey 99
    assert checks["lineitem_orphan_orderkey"] == 1  # l_orderkey 777
    # the bad lineitem row trips quantity (l_quantity=99 row is fine;
    # the second row has qty 2 ok, price -1, discount 0.5)
    assert checks["lineitem_bad_quantity"] == 1  # qty 99 > 50
    assert checks["lineitem_bad_discount"] == 1  # 0.5
    assert checks["lineitem_negative_price"] == 1  # -1.0
    assert checks["events_null_user"] == 1
    assert checks["events_stale_ts"] == 1  # 1970
    assert checks["ok"] == 0
