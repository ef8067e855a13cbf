"""minhash_lsh_pairs coverage accounting: `max_bucket` drops degenerate LSH
buckets (quadratic-junk protection), and a production run must be able to SEE
that loss — the optional Observation records dropped_buckets and
dropped_doc_slots when the candidate set materializes."""

from __future__ import annotations

from pyspark.sql import Observation

from html_parser_spark.functions import dedup as DD


def _corpus(spark, n_degenerate: int, n_normal_pairs: int):
    # n_degenerate docs share ONE text -> identical signatures -> one bucket
    # per band of size n_degenerate; normal pairs are 2-doc buckets
    rows = [(i, "alpha beta gamma delta epsilon", "s") for i in range(n_degenerate)]
    for j in range(n_normal_pairs):
        text = f"uniq{j} omega psi chi phi tau w{j}"
        rows.append((1000 + 2 * j, text, "s"))
        rows.append((1001 + 2 * j, text, "s"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dropped_bucket_metrics(spark):
    corpus = _corpus(spark, n_degenerate=12, n_normal_pairs=3)
    obs = Observation("lsh-drops")
    pairs = DD.minhash_lsh_pairs(corpus, max_bucket=10, observation=obs)
    out = pairs.collect()
    got = obs.get
    # 4 bands, each with one 12-doc bucket over the cap
    assert got["dropped_buckets"] == 4
    assert got["dropped_doc_slots"] == 48
    # degenerate docs contribute NO pairs; the 3 normal pairs survive
    ids = {d for r in out for d in (r.doc_a, r.doc_b)}
    assert all(i >= 1000 for i in ids)
    assert len(out) == 3


def test_metrics_zero_when_cap_does_not_bite(spark):
    corpus = _corpus(spark, n_degenerate=3, n_normal_pairs=2)
    obs = Observation("lsh-no-drops")
    pairs = DD.minhash_lsh_pairs(corpus, max_bucket=10, observation=obs)
    n = pairs.count()
    got = obs.get
    assert got["dropped_buckets"] == 0
    assert got["dropped_doc_slots"] == 0
    # 3 identical docs -> 3 pairs; plus the 2 planted pairs
    assert n == 5
