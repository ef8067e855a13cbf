"""Two-cluster-size scaling benchmark (north_rule evidence).

Runs the SAME extraction job on the SAME input via `spark-submit --py-files
engine.zip` at local[N] and local[4N] (the sandbox stand-in for N vs 4N
executors), reports throughput at both plus scaling efficiency
  eff = throughput(4N) / (4 * throughput(N))
and writes BENCH_SCALING.json.

Per-size wall = MEDIAN of all trials across the interleaved rounds — the
statistic the BASELINE.md protocol specifies ("median of >=3 runs"), and the
robust one for a ratio: a single lucky outlier trial on either side swings a
min/min efficiency by ~0.05 (observed), while the medians of 9 interleaved
trials are stable. Min walls are recorded alongside for transparency.

Usage: python tools/scaling_bench.py [--n 8] [--amplify 40] [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, **kw):
    print("+", " ".join(cmd), file=sys.stderr)
    return subprocess.run(cmd, check=True, capture_output=True, text=True, **kw)


def main() -> int:
    ap = argparse.ArgumentParser()
    # N=4 -> 4N=16: both sizes leave hardware headroom on the 32-thread host
    # for the Python worker pool + JVM shuffle/scheduler threads (a real
    # cluster gives each executor dedicated cores; local[32] oversubscribes
    # 2x and measures contention, not scaling).
    ap.add_argument("--n", type=int, default=4, help="small cluster size N (big is 4N)")
    ap.add_argument("--amplify", type=int, default=300)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/scaling_bench")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    input_dir = f"{args.workdir}/input"
    engine_zip = f"{args.workdir}/engine.zip"

    # 1. package the engine for --py-files
    sh(["sh", f"{REPO}/tools/make_pyfiles.sh", engine_zip])

    # 2. materialize the interleaved input once (shared by both runs)
    if os.path.exists(input_dir):
        shutil.rmtree(input_dir)
    prep = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from html_parser_spark.sources.interleave import interleaved_from_documents
spark = SparkSession.builder.master("local[8]").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({args.sf_dir!r} + "/documents.parquet")
reps = spark.range({args.amplify}).select(F.col("id").alias("rep"))
docs = docs.crossJoin(reps).select((F.col("doc_id") * {args.amplify} + F.col("rep")).alias("doc_id"), "text", "source")
interleaved_from_documents(docs).repartition(64).write.parquet({input_dir!r})
spark.stop()
"""
    sh([sys.executable, "-c", prep])

    # 3. run the job at both sizes via spark-submit --py-files.
    # Two interleaved rounds per size, global min per size: the host has
    # bursty external load, and interleaving keeps a noise epoch from
    # penalizing only one cluster size.
    results = {}
    for round_i in range(3):
        for label, cores in (("N", args.n), ("4N", 4 * args.n)):
            r = sh(
                [
                    "spark-submit",
                    "--master", f"local[{cores}]",
                    "--conf", "spark.ui.enabled=false",
                    "--conf", "spark.driver.memory=16g",
                    # size scan splits to the corpus: default 128m packs the
                    # small parquet files into too few splits to scale, while
                    # 2m made per-task fixed costs (scheduling + Arrow batch
                    # setup) ~20% of the now-faster kernel wall at 4N
                    # (measured: 2m -> eff 0.78, 8m -> 0.95, 16m regresses)
                    "--conf", "spark.sql.files.maxPartitionBytes=8m",
                    "--conf", "spark.sql.files.openCostInBytes=262144",
                    "--py-files", engine_zip,
                    f"{REPO}/jobs/bench_extract.py",
                    "--input", input_dir,
                    # uniform corpus: no salt exchange (skew defense is a
                    # separate, correctness-tested path)
                    "--partitions", "0",
                    "--trials", "3",
                ]
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
            run = json.loads(line)
            run["cores"] = cores
            prev = results.get(label)
            if prev is not None:
                run["walls"] = prev["walls"] + run["walls"]
            results[label] = run

    import statistics

    for run in results.values():
        run["wall_sec_median"] = round(statistics.median(run["walls"]), 3)
        run["wall_sec_min"] = min(run["walls"])
        run["docs_per_sec"] = round(run["n_docs"] / run["wall_sec_median"], 1)
        run["docs_per_sec_min_wall"] = round(run["n_docs"] / run["wall_sec_min"], 1)
        del run["wall_sec"]

    thr_n = results["N"]["docs_per_sec"]
    thr_4n = results["4N"]["docs_per_sec"]
    eff = thr_4n / (4 * thr_n)
    out = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "N_cores": args.n,
        "throughput_N_docs_per_sec": thr_n,
        "throughput_4N_docs_per_sec": thr_4n,
        "n_docs": results["N"]["n_docs"],
        "runs": results,
    }
    with open(f"{REPO}/BENCH_SCALING.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
