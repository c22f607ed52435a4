"""Physical-plan regression audit: every catalog query's executed plan is
checked for 100 TB red flags. Catching a CartesianProduct or a stray
broadcast at sf0.001 is how a scale bug is found BEFORE a cluster run.

Checks:
- no CartesianProduct anywhere;
- BroadcastNestedLoopJoin only where it is the deliberate design
  (broadcast interval join, brute-force small-query-set cosine);
- parquet scans of filtered TPC-H queries actually push their filters
  (PushedFilters non-empty) -- i.e. Catalyst sees through the plan.
"""

from __future__ import annotations

import pytest

from cassandra_sstable_to_protocolbuf_spark.plans.catalog import CATALOG
from tests.conftest import SF_SMOKE

# Queries whose BroadcastNestedLoopJoin is the intended physical design:
# a bounded broadcast side (interval table / small query set / LSH plane
# constants), documented in PARITY.md's plan audit.
BNLJ_ALLOWED = {
    "range_join_price_bands",   # broadcast interval join
    "emb_cosine_topk",          # brute-force baseline: broadcast query set
    "emb_mips_topk",            # brute-force baseline: broadcast query set
    "emb_cosine_dup_pairs",     # bounded bucket-stats side
    "emb_ann_lsh",              # LSH OR-construction candidate union
    "emb_ivf_topk",             # bounded centroid table
    "emb_semdedup",             # same bounded centroid table as ivf_topk
    "emb_kmeans",               # bounded codebook broadcast per iteration
    "emb_pq_codes",             # two bounded sub-codebook broadcasts
    "tpch_q11_important_parts",  # ONE-ROW global-total broadcast, non-equi
                                 # HAVING compare (decorrelated scalar subq)
    "customer_rfm_segments",     # ONE-ROW global as-of-date broadcast
    "lineitem_market_basket",    # ONE-ROW global order-count broadcast
    "part_pareto_curve",         # ONE-ROW global revenue-total broadcast
    "docs_bpe_merges",           # ONE-ROW winning-merge-pair broadcast
    "emb_matryoshka_audit",      # two broadcast query-set brute forces
    "orders_negative_samples",   # ONE-ROW item-domain-size broadcast
    "orders_benford_audit",      # ONE-ROW global digit-total broadcast
    "docs_bpe_encode",           # ONE-ROW winning-merge-pair broadcasts
    "events_bootstrap_ci",       # ONE-ROW point-estimate x CI broadcast
    "stream_bootstrap_ci",       # same ONE-ROW broadcast, streamed moments
    "emb_maxsim_topk",           # broadcast ~4% query-set brute force
                                 # (exact MaxSim baseline, cosine_topk's
                                 # contract; re-rank path is bounded)
    "emb_pca_power",             # ONE-ROW max-|w| norm broadcast per
                                 # power iteration
}

# Streaming entries need a running query; iterative ones (label
# propagation) materialize mid-plan. Both are audited by their own tests.
SKIP = {"stream_events_hourly", "stream_events_sessionize",
        "stream_click_attribution", "stream_incremental_merge",
        "stream_static_enrich", "stream_mv_join_refresh",
        "docs_dup_clusters"}

AUDIT_QUERIES = sorted(set(CATALOG) - SKIP)


def _plan(spark, name: str) -> str:
    df = CATALOG[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


@pytest.mark.parametrize("name", AUDIT_QUERIES)
def test_no_cartesian_product(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans an un-whitelisted BroadcastNestedLoopJoin")


@pytest.mark.parametrize("name", ["tpch_q3_top_orders", "tpch_q6_revenue",
                                  "docs_stratified_sample"])
def test_filters_reach_the_scan(spark, name):
    plan = _plan(spark, name)
    pushed = [ln for ln in plan.splitlines()
              if "PushedFilters" in ln and "PushedFilters: []" not in ln]
    assert pushed, f"{name}: no filter reached a parquet scan\n{plan}"


@pytest.mark.parametrize("name", ["orders_partitioned_pruning",
                                  "sst_landed_parquet"])
def test_partitioned_read_prunes_partitions(spark, name):
    """Partitioned-layout scans must carry a PartitionFilters entry on
    the partition-column predicate -- i.e. non-matching partition
    directories are skipped at planning, not filtered row-by-row.
    Covers both the hive-partitioned orders layout and the to-parquet
    landed-sstable layout."""
    plan = _plan(spark, name)
    pruned = [ln for ln in plan.splitlines()
              if "PartitionFilters" in ln and "PartitionFilters: []" not in ln]
    assert pruned, f"{name}: no partition pruning in plan\n{plan}"


def test_merge_hint_yields_sort_merge_join(spark):
    plan = _plan(spark, "smj_orders_lineitem")
    assert "SortMergeJoin" in plan, f"merge hint ignored\n{plan}"


def test_bucketed_join_has_no_exchange_below_join(spark):
    """The bucketed orders/lineitem join must read bucket-aligned files:
    SortMergeJoin present, and the ONLY Exchange in the plan is the one
    above the join for the final aggregation -- a shuffle below the
    join would mean the bucket layout was not picked up."""
    import re
    plan = _plan(spark, "bucketed_join_revenue")
    assert "SortMergeJoin" in plan, f"bucketed join not SMJ\n{plan}"
    joins = plan.count("SortMergeJoin")
    # count plan NODES (the "(n) Exchange" detail headers), not tree-view
    # echoes of the same operator
    exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert joins >= 1 and exchanges <= 1, (
        f"bucketed join plans {exchanges} exchanges (expected <=1, the "
        f"post-join agg)\n{plan}")
    assert "Bucketed: true" in plan, f"scan did not use buckets\n{plan}"


def test_dpp_join_prunes_partitions_at_runtime(spark):
    """The year-partitioned fact join must carry a dynamicpruning
    subquery in its PartitionFilters -- i.e. Catalyst prunes fact
    partitions from the filtered dim at RUN time, not row-by-row."""
    plan = _plan(spark, "orders_dpp_join")
    assert "dynamicpruning" in plan.lower(), (
        f"no runtime partition pruning in plan\n{plan}")


def test_bloom_filter_injected_in_join(spark):
    """Inside the threshold scope, the selective orders filter must
    inject a runtime bloom filter (might_contain) into the lineitem
    side of the shuffle join -- the semi-join reduction that keeps
    non-joinable fact rows out of the exchange."""
    from cassandra_sstable_to_protocolbuf_spark.plans.relational import (
        _bloom_join_df, _bloom_thresholds)
    with _bloom_thresholds(spark):
        df = _bloom_join_df(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan, f"no runtime bloom filter\n{plan}"


def test_skyline_sweep_equals_brute_force_dominance(spark):
    """The presort-sweep skyline and the O(n^2) dominance definition
    must agree -- guards the sweep's tie handling, which a mirrored
    oracle (same sweep in SQL) could not catch."""
    import duckdb

    from cassandra_sstable_to_protocolbuf_spark.plans.relational import (
        part_skyline)

    got = sorted(r.p_partkey for r in
                 part_skyline(spark, SF_SMOKE).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM "
                f"read_parquet('{SF_SMOKE}/part.parquet')")
    want = sorted(r[0] for r in con.execute("""
      WITH d AS (SELECT p_partkey,
                        CAST(ROUND(p_retailprice*100) AS BIGINT) AS c,
                        p_size AS s FROM part)
      SELECT p_partkey FROM d a WHERE NOT EXISTS (
        SELECT 1 FROM d b
        WHERE b.c <= a.c AND b.s >= a.s AND (b.c < a.c OR b.s > a.s))
    """).fetchall())
    assert got == want and got


@pytest.mark.parametrize("name,table,allowed", [
    ("events_pattern_match", "events",
     {"event_id", "ts", "user_id", "event_type"}),
    ("docs_tfidf_topk", "documents", {"doc_id", "text"}),
    ("docs_bpe_merges", "documents", {"text"}),
    ("part_skyline", "part",
     {"p_partkey", "p_brand", "p_size", "p_retailprice"}),
    ("customer_k_anonymity", "customer",
     {"c_nationkey", "c_mktsegment", "c_acctbal"}),
])
def test_scans_prune_columns(spark, name, table, allowed):
    """Column pruning must reach the parquet scan: a query touching a
    few columns of a wide table must not read the rest -- at 100 TB the
    difference IS the scan cost. Pins every ReadSchema of the query's
    scans of `table` to the declared column set."""
    import re

    plan = _plan(spark, name)
    schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schemas, f"{name}: no ReadSchema in plan"
    for ln in schemas:
        cols = set(re.findall(r"[<,](\w+):", ln))
        assert cols and cols <= allowed, (
            f"{name} reads unpruned columns {sorted(cols - allowed)}\n{ln}")
