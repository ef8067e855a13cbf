"""Right-to-be-forgotten rewrite (sources/forget.py): subject rows gone,
everything else byte-for-value intact, audit record correct."""

from __future__ import annotations

from html_parser_spark.sources.forget import forget_keys


def test_forget_removes_only_subjects(spark, tmp_path):
    src, out = str(tmp_path / "ev"), str(tmp_path / "ev_clean")
    spark.createDataFrame(
        [(i, i % 5, f"p{i}") for i in range(100)],
        "event_id bigint, user_id bigint, payload string",
    ).write.parquet(src)

    audit = forget_keys(spark, src, out, "user_id", [1, 3])
    assert audit["rows_before"] == 100
    assert audit["rows_removed"] == 40  # users 1 and 3: 20 rows each
    assert audit["rows_after"] == 60

    kept = spark.read.parquet(out)
    assert kept.where("user_id in (1, 3)").count() == 0
    # non-subject rows are untouched, payloads included
    left = {(r.event_id, r.payload) for r in kept.collect()}
    expect = {(i, f"p{i}") for i in range(100) if i % 5 not in (1, 3)}
    assert left == expect


def test_forget_no_match_is_identity(spark, tmp_path):
    src, out = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(0, 50).selectExpr("id as user_id", "id * 2 as v").write.parquet(src)
    audit = forget_keys(spark, src, out, "user_id", [999])
    assert audit["rows_removed"] == 0
    assert spark.read.parquet(out).count() == 50
