"""Small-file compaction (sources/compact.py): content preservation,
big-file pass-through byte identity, and file-count reduction."""

from __future__ import annotations

import os

from html_parser_spark.sources.compact import compact_parquet


def test_compaction_preserves_rows_and_passes_big_files(spark, tmp_path):
    src = str(tmp_path / "src")
    # 40 tiny files
    spark.range(0, 4000).selectExpr(
        "id", "repeat('x', 50) as pad"
    ).repartition(40).write.parquet(src)
    # one big file (relative to the tiny target below)
    big_df = spark.range(10_000, 30_000).selectExpr(
        "id", "repeat('y', 200) as pad"
    ).coalesce(1)
    big_tmp = str(tmp_path / "big")
    big_df.write.parquet(big_tmp)
    [big_file] = [f for f in os.listdir(big_tmp) if f.endswith(".parquet")]
    os.rename(
        os.path.join(big_tmp, big_file), os.path.join(src, "zz-" + big_file)
    )
    big_bytes = open(os.path.join(src, "zz-" + big_file), "rb").read()

    out = str(tmp_path / "out")
    target = len(big_bytes) - 1  # the big file passes, every small merges
    stats = compact_parquet(spark, src, out, target_bytes=target)

    assert stats["files_kept"] == 1
    assert stats["files_rewritten"] == 40
    assert stats["files_out"] < stats["files_in"]
    out_files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(out_files) == stats["files_out"]

    # pass-through is byte-identical
    assert open(os.path.join(out, "zz-" + big_file), "rb").read() == big_bytes

    before = spark.read.parquet(src).selectExpr("sum(id)", "count(*)").first()
    after = spark.read.parquet(out).selectExpr("sum(id)", "count(*)").first()
    assert tuple(before) == tuple(after)


def test_compaction_all_small_single_output(spark, tmp_path):
    src, out = str(tmp_path / "s2"), str(tmp_path / "o2")
    spark.range(0, 100).repartition(10).write.parquet(src)
    stats = compact_parquet(spark, src, out, target_bytes=1 << 30)
    assert stats["files_kept"] == 0 and stats["files_out"] == 1
    assert spark.read.parquet(out).count() == 100
