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


def test_fuzzy_join_cross_table_only(spark):
    from html_parser_spark.functions.dedup import fuzzy_join

    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    left = spark.createDataFrame(
        [
            (1, t),
            (2, t + " extra"),  # near-dup of 1 WITHIN left: must not pair
            (3, "completely different words here nothing shared at all ok"),
        ],
        "doc_id long, text string",
    )
    right = spark.createDataFrame(
        [
            (101, t),                      # exact copy of 1 -> 1000 permille
            (102, t.replace(" kappa", "")), # near copy of 1
            (103, "unrelated corpus text with zero overlapping trigrams yes"),
        ],
        "doc_id long, text string",
    )
    got = {(r.left_id, r.right_id): r for r in fuzzy_join(left, right).collect()}
    assert (1, 101) in got and got[(1, 101)].jacc_permille == 1000
    assert (1, 102) in got and 600 <= got[(1, 102)].jacc_permille < 1000
    # no within-table pairs, no unrelated pairs
    assert all(l < 100 and r >= 100 for l, r in got)
    assert not any(3 == l or r == 103 for l, r in got)


def test_broadcast_verify_switch_identical_output(spark):
    """broadcast_verify=False (the 10^12-doc verify shape: co-partitioned
    shuffle joins, no driver-side candidate collect) returns exactly the
    pairs the default broadcast form returns, and strips every broadcast
    hint from the plan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = DD.plant_dups(docs)

    def pairs(bv):
        df = DD.minhash_lsh_pairs(corpus, broadcast_verify=bv)
        rows = {tuple(r) for r in df.collect()}
        hints = df._jdf.queryExecution().analyzed().toString().count("broadcast")
        return rows, hints

    with_b, hints_b = pairs(True)
    without_b, hints_n = pairs(False)
    assert with_b == without_b and len(with_b) > 0
    assert hints_b > 0 and hints_n == 0


def test_auto_verify_path_switches_on_threshold(spark):
    """broadcast_verify=None sizes the candidate tables against the session's
    autoBroadcastJoinThreshold: the default 10MB threshold picks the broadcast
    plan at fixture scale; a 1-byte threshold forces the shuffle-join twin.
    Both return identical pairs."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = DD.plant_dups(docs)

    def pairs_auto():
        df = DD.minhash_lsh_pairs(corpus, broadcast_verify=None)  # auto
        rows = {tuple(r) for r in df.collect()}
        hints = df._jdf.queryExecution().analyzed().toString().count("broadcast")
        return rows, hints

    thr_key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(thr_key)
    rows_big, hints_big = pairs_auto()
    try:
        spark.conf.set(thr_key, "1b")
        rows_tiny, hints_tiny = pairs_auto()
    finally:
        spark.conf.set(thr_key, old)
    assert rows_big == rows_tiny and len(rows_big) > 0
    assert hints_big > 0 and hints_tiny == 0


def test_broadcast_threshold_parse():
    class _FakeConf:
        def __init__(self, v):
            self.v = v

        def get(self, key, default=None):
            return self.v

    class _FakeSpark:
        def __init__(self, v):
            self.conf = _FakeConf(v)

    f = DD._broadcast_threshold_bytes
    assert f(_FakeSpark("10485760b")) == 10 * 1024**2
    assert f(_FakeSpark("10MB")) == 10 * 1024**2
    assert f(_FakeSpark("512k")) == 512 * 1024
    assert f(_FakeSpark("1g")) == 1024**3
    assert f(_FakeSpark("1048576")) == 1024**2
    assert f(_FakeSpark("-1")) == 0  # broadcast disabled -> never broadcast


def test_default_construction_is_lazy(spark):
    """The library default (broadcast_verify=False) must not run ANY Spark
    jobs at plan-construction time — auto's sizing actions are opt-in at
    pipeline-terminal call sites only (ADVICE r04: eager construction leaks
    persisted intermediates for plan-only callers)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = DD.plant_dups(docs)
    dag = spark.sparkContext._jsc.sc().dagScheduler()
    before = dag.nextJobId()
    df = DD.minhash_lsh_pairs(corpus)
    df.explain()  # plan-only caller: build + explain, never execute
    assert dag.nextJobId() == before
