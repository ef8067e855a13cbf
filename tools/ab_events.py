"""Adjudicate the two BENCH_r04-vs-r03 events regressions (VERDICT r04 #4):
events_rolling_value 0.41 -> 0.73 s (1.78x) and events_error_burst
0.47 -> 0.62 s (1.31x). Plans were unchanged and plan-audit-pinned between
the rounds, so the hypothesis is host noise — but per the +-40% epoch rule
only a careful same-epoch measurement can adjudicate. Protocol (CLAUDE.md):
warm-up twice per query, then N interleaved rounds over [suspect A,
suspect B, sentinel], MEDIAN-of-N per query. The sentinel (events_hourly:
r03 0.366 s / r04 0.398 s — stable across rounds) calibrates this epoch
against the two record epochs. Verdict per suspect: NOISE if the
epoch-normalized median is < 1.2x its r03 record, else REGRESSION."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 7

# committed driver artifacts: BENCH_r03.json / BENCH_r04.json per-query cells
RECORDS = {
    "events_rolling_value": {"r03": 0.41, "r04": 0.73},
    "events_error_burst": {"r03": 0.47, "r04": 0.62},
    "events_hourly": {"r03": 0.366, "r04": 0.398},  # sentinel
}


def main() -> None:
    from pyspark.sql import SparkSession

    from html_parser_spark.session import apply_scale_confs
    import __spark_entry__ as entrymod

    spark = (
        apply_scale_confs(
            SparkSession.builder.master("local[32]")
            .appName("ab-events")
            .config("spark.sql.shuffle.partitions", "32")
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    qs = entrymod.queries()
    names = list(RECORDS)
    walls: dict[str, list[float]] = {n: [] for n in names}
    for n in names:  # warm 3x: codegen + worker spawn + cache steady state
        # (a first adjudication run with 2 warm-ups recorded monotonically
        # DECLINING walls through all 5 rounds — this query class is still
        # warming at pass 3, so under-warmed medians read as regressions)
        for _ in range(3):
            noop(qs[n](spark, SF_DIR))
    for _r in range(ROUNDS):
        for n in names:  # interleaved: a burst epoch penalizes all three
            t0 = time.time()
            noop(qs[n](spark, SF_DIR))
            walls[n].append(time.time() - t0)
    spark.stop()

    sentinel_med = statistics.median(walls["events_hourly"])
    # epoch factor: CONTEXT ONLY — how this epoch runs the stable sentinel
    # vs its r03-epoch record. Do NOT divide suspects by it: different query
    # classes respond differently to host contention (the groupBy sentinel
    # speeds up more on an idle host than the join-heavy suspects), so a
    # single cross-query ratio over-corrects — the round-4 cross-epoch-ratio
    # trap. The verdict compares the RAW same-epoch median to 1.2x the r03
    # record: meeting the record outright is noise by definition; missing it
    # on a fast epoch (factor < 1) would be a real regression.
    epoch = sentinel_med / RECORDS["events_hourly"]["r03"]
    out = {"rounds": ROUNDS, "sf_dir": SF_DIR, "epoch_factor": round(epoch, 3)}
    for n in names:
        med = statistics.median(walls[n])
        rec = RECORDS[n]["r03"]
        out[n] = {
            "walls": [round(w, 3) for w in walls[n]],
            "median": round(med, 3),
            "r03_record": rec,
            "r04_record": RECORDS[n]["r04"],
            "verdict": (
                "sentinel"
                if n == "events_hourly"
                else ("NOISE" if med < 1.2 * rec else "REGRESSION")
            ),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
