"""Local emulation of the driver's correctness gate: run every
__spark_entry__.queries() entry at a given sf and diff it against the
matching oracle_sql() via DuckDB — row count, column names, and
order-insensitive exact value comparison (doubles compared by repr, i.e.
bit-exact).

Usage: PYTHONPATH=/root/repo python tools/gate_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return repr(int(v))
    return repr(v)


def rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\1".join(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    from html_parser_spark.session import apply_scale_confs

    spark = (
        apply_scale_confs(
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
            )
            .appName("gate-check")
            .config("spark.sql.shuffle.partitions", "16")
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(rows)} rows, {time.time()-t0:.1f}s)")
            if len(rows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"columns {sorted(cols)} != {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} != {len(orows)}")
        if not problems:
            a = rows_to_multiset(cols, rows)
            b = rows_to_multiset(ocols, orows)
            if a != b:
                diff_a = [x for x in a if x not in set(b)][:3]
                diff_b = [x for x in b if x not in set(a)][:3]
                problems.append(f"values differ; spark-only={diff_a} oracle-only={diff_b}")
        if problems:
            failures += 1
            print(f"FAIL {name}: " + " | ".join(problems))
        else:
            print(f"PASS {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
    spark.stop()
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
