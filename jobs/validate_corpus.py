"""spark-submit entry point for declarative data-quality validation.

    spark-submit --master <cluster> --py-files engine.zip \
        jobs/validate_corpus.py --tables <dir with *.parquet> [--fail-on-violation]

Runs the constraint suite a warehouse load would gate on, each check a
single aggregate or anti-join (map-side combinable; the referential
checks broadcast the key side when small, AQE decides otherwise):

  not-null        key columns carry no nulls
  uniqueness      primary keys are distinct
  range           quantities/prices/discounts inside domain bounds
  referential     orders.o_custkey -> customer, lineitem.l_orderkey ->
                  orders, lineitem.l_suppkey -> supplier (anti-join counts)
  freshness       event timestamps inside a sane window

Prints ONE JSON line {check: violation_count, ...} plus an "ok" flag;
--fail-on-violation exits 1 when any count is non-zero, so a scheduler
can gate downstream jobs on data quality.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def run_checks(spark, tables_dir: str) -> dict:
    from pyspark.sql import functions as F

    def t(name):
        return spark.read.parquet(os.path.join(tables_dir, f"{name}.parquet"))

    customer, orders, lineitem = t("customer"), t("orders"), t("lineitem")
    supplier, events = t("supplier"), t("events")

    def count(df):
        return df.count()

    checks = {
        "orders_null_custkey": count(orders.where("o_custkey is null")),
        "orders_dup_orderkey": count(
            orders.groupBy("o_orderkey").count().where("count > 1")
        ),
        "customer_dup_custkey": count(
            customer.groupBy("c_custkey").count().where("count > 1")
        ),
        "lineitem_bad_quantity": count(
            lineitem.where("l_quantity < 1 or l_quantity > 50")
        ),
        "lineitem_bad_discount": count(
            lineitem.where("l_discount < 0 or l_discount > 0.1e0")
        ),
        "lineitem_negative_price": count(
            lineitem.where("l_extendedprice <= 0")
        ),
        "orders_orphan_custkey": count(
            orders.join(
                F.broadcast(customer.select("c_custkey")),
                orders.o_custkey == customer.c_custkey,
                "left_anti",
            )
        ),
        "lineitem_orphan_orderkey": count(
            lineitem.join(
                orders.select("o_orderkey"),
                lineitem.l_orderkey == orders.o_orderkey,
                "left_anti",
            )
        ),
        "lineitem_orphan_suppkey": count(
            lineitem.join(
                F.broadcast(supplier.select("s_suppkey")),
                lineitem.l_suppkey == supplier.s_suppkey,
                "left_anti",
            )
        ),
        "events_null_user": count(events.where("user_id is null")),
        "events_stale_ts": count(
            events.where(
                "ts < timestamp'2000-01-01' or ts > timestamp'2100-01-01'"
            )
        ),
    }
    checks["ok"] = int(all(v == 0 for v in checks.values()))
    return checks


def main(argv=None, spark=None) -> int:
    """CLI entry. Tests may inject an existing `spark` session — the job
    then neither builds nor stops one."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", required=True, help="dir holding <table>.parquet")
    ap.add_argument("--fail-on-violation", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from html_parser_spark.session import apply_scale_confs

    owns_session = spark is None
    if owns_session:
        spark = apply_scale_confs(
            SparkSession.builder.appName("validate-corpus")
        ).getOrCreate()
        spark.sparkContext.setLogLevel("WARN")

    checks = run_checks(spark, args.tables)
    print(json.dumps(checks))
    if owns_session:
        spark.stop()
    return 1 if (args.fail_on_violation and not checks["ok"]) else 0


if __name__ == "__main__":
    sys.exit(main())
