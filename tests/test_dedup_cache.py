"""Long-session cache hygiene: the pair functions persist their shingle
table for the duration of one computation, and the cache entry must be
RELEASED when the returned DataFrame goes out of scope (weakref finalizer in
functions/dedup._unpersist_with) — a driver loop calling jaccard_pairs /
minhash_lsh_pairs per input slice must not accumulate cached tables."""

from __future__ import annotations

import gc

from html_parser_spark.functions import dedup as DD


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _corpus(spark):
    rows = [(i, f"alpha beta gamma delta epsilon w{i} zeta eta", "s") for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_jaccard_cache_released_on_gc(spark):
    spark.catalog.clearCache()
    corpus = _corpus(spark)
    pairs = DD.jaccard_pairs(corpus, threshold_permille=500)
    pairs.count()
    assert not _cache_empty(spark), "shingle table should be cached during use"
    del pairs
    gc.collect()
    assert _cache_empty(spark), "cache entry must be dropped when result is GC'd"


def test_shared_plan_cache_refcounted(spark):
    """Spark's CacheManager keys entries by ANALYZED PLAN: two pipelines
    over the same input persist ONE shared entry (the second .persist() is
    a no-op). GC of the first result must NOT uncache the still-live
    second — the _CACHE_REFS refcount releases only with the last owner
    (the bug showed as extract_links re-running its parse kernel 3x after
    a sibling query's result died)."""
    spark.catalog.clearCache()
    corpus = _corpus(spark)
    a = DD.jaccard_pairs(corpus, threshold_permille=500)
    b = DD.jaccard_pairs(corpus, threshold_permille=500)  # same plan
    b.count()
    del a
    gc.collect()
    assert not _cache_empty(spark), "sibling GC must not uncache the live twin"
    del b
    gc.collect()
    assert _cache_empty(spark), "last owner's GC must release the entry"


def test_minhash_lsh_cache_released_in_loop(spark):
    spark.catalog.clearCache()
    corpus = _corpus(spark)
    for _ in range(3):  # driver-loop shape: each iteration drops the previous
        pairs = DD.minhash_lsh_pairs(corpus, threshold_permille=500)
        pairs.count()
        del pairs
    gc.collect()
    assert _cache_empty(spark), "repeated calls must not accumulate cached tables"
