"""Local emulation of the driver's correctness gate: run every
__spark_entry__.queries() entry at a given sf and diff it against the
matching oracle_sql() via DuckDB — row count, column names,
order-insensitive exact value comparison (doubles compared by repr, i.e.
bit-exact), AND oracle column-type drift (the driver hashes TYPED pandas
frames, so a DuckDB HUGEINT surfacing as float64 fails the driver even
when every value matches — the text_tfidf bug class; DESCRIBE catches it
here without re-running the query).

Usage: PYTHONPATH=/root/repo python tools/gate_check.py [sf_dir] [query ...]
With no arguments, runs BOTH sf0.01 and sf0.1 (type drift and int64
headroom bugs only show up under typed hashing or bigger data).
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

# spark simpleString dtype -> acceptable DuckDB DESCRIBE column_type values.
# The driver compares pandas dtypes after conversion; these pairs map to the
# same pandas dtype on both sides. Complex/nested types are skipped.
_TYPE_OK = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp_ntz": {"TIMESTAMP"},
    "timestamp": {"TIMESTAMP WITH TIME ZONE"},
    "binary": {"BLOB"},
}


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


def type_drift(spark_df, con, sql) -> list[str]:
    """Column-type mismatches between the Spark schema and the oracle's
    DESCRIBE output (planning only — the query is not executed)."""
    try:
        desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    except Exception:
        return []  # DESCRIBE unsupported for this statement: skip the check
    otypes = {r[0]: r[1] for r in desc}
    out = []
    for f in spark_df.schema.fields:
        want = _TYPE_OK.get(f.dataType.simpleString())
        got = otypes.get(f.name)
        if want is not None and got is not None and got not in want:
            out.append(f"{f.name}: spark {f.dataType.simpleString()} vs oracle {got}")
    return out


def run_gate(spark, sf_dir: str, only: set[str]) -> int:
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
        problems += [f"type drift: {d}" for d in type_drift(df, con, oracles[name])]
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
    return failures


def main():
    if len(sys.argv) > 1:
        sf_dirs = [sys.argv[1]]
        only = set(sys.argv[2:])
    else:
        sf_dirs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
        only = set()

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

    failures = 0
    for sf_dir in sf_dirs:
        if len(sf_dirs) > 1:
            print(f"== {sf_dir} ==")
        failures += run_gate(spark, sf_dir, only)
    spark.stop()
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
