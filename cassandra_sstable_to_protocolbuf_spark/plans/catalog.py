"""The engine's query catalog: every implemented operator surfaced as a
named query, with a DuckDB oracle where the semantics are SQL-expressible
(driver correctness gate) and rows-only otherwise.

Keys map to SURVEY.md §2 operators:
  sst_*       -- the reference's own pipeline surface (S/F/P/M ops)
  tpch_* etc. -- relational operator coverage (§2.1 categories)
  docs_*      -- text analysis + dedup extension ops
  emb_*       -- similarity-search extension ops

Cache contract: a few queries pin small intermediate frames via
session.pin() (LSH/SimHash signatures, the trigram explode, the
PERMISSIVE CSV parse) because ReuseExchange does not fire across
broadcast boundaries and the frames feed multiple consumers. The
frames are returned lazily, so the operator cannot know when the
caller's final action has run; instead every catalog query SWEEPS the
previous query's pins at entry (_sweep_on_entry), so a long-lived
session running the whole catalog sequentially -- the driver's sweep,
the bench -- holds at most one query's pins at a time. bench.py
additionally clearCache()s between timed runs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from cassandra_sstable_to_protocolbuf_spark.plans import cells_queries as C
from cassandra_sstable_to_protocolbuf_spark.plans import relational as R
from cassandra_sstable_to_protocolbuf_spark.plans import textops as TX
from cassandra_sstable_to_protocolbuf_spark.plans import vectorops as V
from cassandra_sstable_to_protocolbuf_spark.streaming import pipeline as ST

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, None => rows-only check
    doc: str


CATALOG: dict[str, QueryDef] = {
    # --- reference pipeline surface (SURVEY §2 S1-S7, F1-F2, P1-P2, M1) ---
    "sst_cells_scan": QueryDef(C.sst_cells_scan, C.SST_CELLS_SCAN_SQL,
                               "S1-S7: full scan of the wide-row cell model"),
    "sst_live_filter": QueryDef(C.sst_live_filter, C.SST_LIVE_FILTER_SQL,
                                "F1+F2+P1: tombstone/TTL/counter filters + projection"),
    "sst_row_group": QueryDef(C.sst_row_group, C.SST_ROW_GROUP_SQL,
                              "P2: group cells into per-partition rows"),
    "sst_lww_dedup": QueryDef(C.sst_lww_dedup, C.SST_LWW_DEDUP_SQL,
                              "extension: last-write-wins across sstables"),
    "sst_file_metrics": QueryDef(C.sst_file_metrics, C.SST_FILE_METRICS_SQL,
                                 "M1: per-file job metrics"),
    "sst_pb_roundtrip": QueryDef(C.sst_pb_roundtrip, C.SST_PB_ROUNDTRIP_SQL,
                                 "K1+K2: protobuf+zstd sink/source round-trip"),
    "sst_optimize_plan": QueryDef(C.sst_optimize_plan, C.SST_OPTIMIZE_PLAN_SQL,
                                  "compaction planning: exact size algebra "
                                  "+ sorted-greedy bin packing per shard"),
    "sst_optimize_execute": QueryDef(C.sst_optimize_execute,
                                     C.SST_OPTIMIZE_EXECUTE_SQL,
                                     "OPTIMIZE plan->execute: size-tiered "
                                     "bins run through compact, merged "
                                     "inputs removed, stragglers untouched"),
    "stream_pb_roundtrip": QueryDef(ST.stream_pb_roundtrip, C.SST_PB_ROUNDTRIP_SQL,
                                    "K1+K2 THROUGH streaming (foreachBatch sink)"),
    "sst_native_roundtrip": QueryDef(C.sst_native_roundtrip, C.SST_NATIVE_ROUNDTRIP_SQL,
                                     "S1-S7: binary SSTable write+parse round-trip"),
    "sst_native_scan": QueryDef(C.sst_native_scan, C.SST_NATIVE_ROUNDTRIP_SQL,
                                "S4/S6/S7: scan of pre-built binary SSTables"),
    "sst_point_lookup": QueryDef(C.sst_point_lookup, C.SST_POINT_LOOKUP_SQL,
                                 "S5: pushed key predicate -> Index.db seek"),
    "sst_manifest_scan": QueryDef(C.sst_manifest_scan,
                                  C.SST_NATIVE_ROUNDTRIP_SQL,
                                  "manifest-backed discovery: one GET "
                                  "replaces the per-plan directory walk"),
    "sst_landed_parquet": QueryDef(C.sst_landed_parquet, C.SST_LANDED_PARQUET_SQL,
                                   "to-parquet CLI pipeline: landed LWW layout + partition pruning"),
    "sst_continue_on_error": QueryDef(C.sst_continue_on_error,
                                      C.SST_CONTINUE_ON_ERROR_SQL,
                                      "E1: per-file error isolation over a corrupt-file fixture"),
    "sst_permissive_scan": QueryDef(C.sst_permissive_scan,
                                    C.SST_PERMISSIVE_SCAN_SQL,
                                    "E1 at scale: one PERMISSIVE job over a corrupt-file fixture"),
    "sst_digest_drill": QueryDef(C.sst_digest_drill, C.SST_DIGEST_DRILL_SQL,
                                 "Digest.sha1 on the read path: tampered "
                                 "uncompressed file -> ERROR row, no data"),
    "sst_schema_evolution": QueryDef(C.sst_schema_evolution,
                                     C.SST_SCHEMA_EVOLUTION_SQL,
                                     "mergeSchema read across landed generations "
                                     "with an evolved column + LWW reconcile"),
    "sst_table_info": QueryDef(C.sst_table_info, C.SST_TABLE_INFO_SQL,
                               "sstablemetadata-style DESCRIBE: binary "
                               "metadata components only, no data bytes"),
    "sst_repair_diff": QueryDef(C.sst_repair_diff, C.SST_REPAIR_DIFF_SQL,
                                "anti-entropy repair: Merkle-leaf digest "
                                "diff + drill of out-of-sync rows"),
    "sst_compact_roundtrip": QueryDef(C.sst_compact_roundtrip,
                                      C.SST_COMPACT_ROUNDTRIP_SQL,
                                      "compaction: LWW merge -> token-sharded binary sstables -> re-read"),
    "sst_token_range_scan": QueryDef(C.sst_token_range_scan,
                                     C.SST_TOKEN_RANGE_SQL,
                                     "token-range sharded scan (parallel-export interval)"),
    "sst_single_file_scan": QueryDef(C.sst_single_file_scan,
                                     C.SST_SINGLE_FILE_SCAN_SQL,
                                     "one giant sstable scanned via "
                                     "byte-range splits (intra-file "
                                     "parallelism)"),
    "sst_clustering_seek": QueryDef(C.sst_clustering_seek,
                                    C.SST_CLUSTERING_SEEK_SQL,
                                    "promoted-index clustering slice "
                                    "inside wide partitions (blocks "
                                    "outside the band never read)"),
    "sst_sliced_shard_scan": QueryDef(C.sst_sliced_shard_scan,
                                      C.SST_SLICED_SHARD_SQL,
                                      "clustering band x token interval "
                                      "composed: both prunings before a "
                                      "data byte moves"),
    "sst_foreign_ka_scan": QueryDef(C.sst_foreign_ka_scan,
                                    C.SST_FOREIGN_KA_SCAN_SQL,
                                    "all-foreign ka components (no engine "
                                    "stamps): scan + bloom-gated point "
                                    "lookup + promoted clustering slice "
                                    "composed"),
    "sst_incremental_merge": QueryDef(C.sst_incremental_merge,
                                      C.SST_INCREMENTAL_MERGE_SQL,
                                      "copy-on-write LWW delta merge into sharded landed table"),
    "stream_incremental_merge": QueryDef(ST.stream_incremental_merge,
                                         C.SST_INCREMENTAL_MERGE_SQL,
                                         "micro-batched delta merge THROUGH streaming (foreachBatch)"),
    "sst_shard_delete": QueryDef(C.sst_shard_delete, C.SST_SHARD_DELETE_SQL,
                                 "copy-on-write key deletion (right-to-be-forgotten)"),
    "sst_time_travel": QueryDef(C.sst_time_travel, C.SST_TIME_TRAVEL_SQL,
                                "manifest-versioned merge: both snapshots read via time travel"),
    "sst_merge_into": QueryDef(C.sst_merge_into, C.SST_MERGE_INTO_SQL,
                               "MERGE INTO: upserts + deletes in ONE "
                               "atomic versioned commit"),
    "sst_version_changes": QueryDef(C.sst_version_changes,
                                    C.SST_VERSION_CHANGES_SQL,
                                    "snapshot-to-snapshot CDC feed "
                                    "(touched-shard diff, O(commit))"),
    "sst_index_lookup": QueryDef(C.sst_index_lookup, C.SST_INDEX_LOOKUP_SQL,
                                 "secondary-index point lookup -> partition fetch (2i analog)"),
    "sst_mor_merge": QueryDef(C.sst_mor_merge, C.SST_MOR_MERGE_SQL,
                              "merge-on-read commit: O(delta) append + read-time LWW"),
    "sst_reshard_evolution": QueryDef(C.sst_reshard_evolution,
                                      C.SST_RESHARD_EVOLUTION_SQL,
                                      "partition-spec evolution: metadata-only "
                                      "reshard + cross-spec read-time LWW"),
    "sst_compacted_merge": QueryDef(C.sst_compacted_merge,
                                    C.SST_COMPACTED_MERGE_SQL,
                                    "MoR append -> compaction -> raw read == from-scratch LWW"),
    "stream_versioned_merge": QueryDef(ST.stream_versioned_merge,
                                       C.SST_INCREMENTAL_MERGE_SQL,
                                       "micro-batched MoR commits THROUGH streaming, one snapshot per batch"),
    # --- relational coverage (SURVEY §2.1) --------------------------------
    "tpch_q1_pricing": QueryDef(R.q1_pricing_summary, R.Q1_SQL,
                                "hash aggregate w/ decimal arithmetic"),
    "tpch_q3_top_orders": QueryDef(R.q3_top_orders, R.Q3_SQL,
                                   "3-way broadcast join + agg + top-N"),
    "tpch_q5_supplier_volume": QueryDef(R.q5_supplier_volume, R.Q5_SQL,
                                        "5-way join, broadcast dims"),
    "tpch_q6_revenue": QueryDef(R.q6_revenue, R.Q6_SQL,
                                "filter+agg, full scan pushdown"),
    "tpch_q7_nation_volume": QueryDef(R.q7_nation_volume, R.Q7_SQL,
                                     "Q7 shape: disjunctive two-nation pair volume"),
    "tpch_q8_market_share": QueryDef(R.q8_market_share, R.Q8_SQL,
                                     "Q8 shape: nation market share per year"),
    "tpch_q9_profit": QueryDef(R.q9_profit_proxy, R.Q9_SQL,
                               "Q9 shape: nation/year profit over 5-way join"),
    "null_safe_join": QueryDef(R.null_safe_join, R.NULL_SAFE_JOIN_SQL,
                               "null-safe equality join (<=>)"),
    "tpch_q14_promo_revenue": QueryDef(R.q14_promo_revenue, R.Q14_SQL,
                                       "Q14 shape: promo share of monthly revenue"),
    "tpch_q15_top_supplier": QueryDef(R.q15_top_supplier, R.Q15_SQL,
                                      "Q15 shape: argmax supplier via decorrelated view"),
    "tpch_q17_small_quantity": QueryDef(R.q17_small_quantity_revenue, R.Q17_SQL,
                                        "Q17 shape: below-avg-quantity revenue"),
    "tpch_q21_multi_supplier": QueryDef(R.q21_multi_supplier_orders, R.Q21_SQL,
                                        "Q21 shape: shared-order supplier ranking"),
    "tpch_q18_large_orders": QueryDef(R.q18_large_orders, R.Q18_SQL,
                                      "Q18 shape: agg-before-join + top-100"),
    "tpch_q19_disjunctive": QueryDef(R.q19_disjunctive, R.Q19_SQL,
                                     "Q19 shape: OR-of-conjunctions revenue"),
    "tpch_q22_idle_customers": QueryDef(R.q22_idle_customers, R.Q22_SQL,
                                        "Q22 shape: anti join + segment-avg subquery"),
    "tpch_q2_min_cost_supplier": QueryDef(R.q2_min_cost_supplier, R.Q2_SQL,
                                          "Q2 shape: decorrelated per-part min + top-100"),
    "tpch_q11_important_parts": QueryDef(R.q11_important_parts, R.Q11_SQL,
                                         "Q11 shape: grouped agg vs global scalar HAVING"),
    "tpch_q4_order_priority": QueryDef(R.q4_order_priority, R.Q4_SQL,
                                       "Q4: EXISTS decorrelated to a "
                                       "left-semi join + priority counts"),
    "tpch_q10_returned_revenue": QueryDef(R.q10_returned_item_revenue,
                                          R.Q10_SQL,
                                          "Q10: returned-item revenue "
                                          "top-20 customers"),
    "tpch_q13_order_distribution": QueryDef(
        R.q13_customer_order_distribution, R.Q13_SQL,
        "Q13: zero-preserving left-join order-count distribution"),
    "tpch_q12_ship_priority": QueryDef(R.q12_ship_class_priority, R.Q12_SQL,
                                       "Q12 shape: big-big join + two-bucket CASE agg"),
    "tpch_q16_supplier_counts": QueryDef(R.q16_supplier_part_counts, R.Q16_SQL,
                                         "Q16 shape: distinct pairs + anti join + COUNT DISTINCT"),
    "tpch_q20_excess_suppliers": QueryDef(R.q20_excess_suppliers, R.Q20_SQL,
                                          "Q20 shape: decorrelated nested-IN semi-join chain"),
    "window_top_customers": QueryDef(R.top_customers_per_nation, R.TOP_CUSTOMERS_SQL,
                                     "row_number window top-k per group"),
    "window_running_total": QueryDef(R.customer_running_total, R.RUNNING_TOTAL_SQL,
                                     "running sum + lag window"),
    "window_ranks": QueryDef(R.window_ranks, R.WINDOW_RANKS_SQL,
                             "rank/dense_rank/percent_rank/cume_dist/ntile"),
    "window_frames": QueryDef(R.window_frames, R.WINDOW_FRAMES_SQL,
                              "explicit ROWS + RANGE window frames"),
    "rollup_sales": QueryDef(R.rollup_sales, R.ROLLUP_SQL, "ROLLUP grouping sets"),
    "grouping_sets_sales": QueryDef(R.grouping_sets_sales, R.GROUPING_SETS_SQL,
                                    "explicit GROUPING SETS + grouping id"),
    "setop_intersect": QueryDef(R.setop_active_rich_customers, R.SETOP_INTERSECT_SQL,
                                "INTERSECT set op"),
    "setop_except": QueryDef(R.setop_customers_without_orders, R.SETOP_EXCEPT_SQL,
                             "EXCEPT ALL set op"),
    "semi_join_big_spenders": QueryDef(R.semi_join_big_spenders, R.SEMI_JOIN_SQL,
                                       "left-semi join / EXISTS"),
    "order_priority_count": QueryDef(R.order_priority_count, R.ORDER_PRIORITY_SQL,
                                     "Q4 shape: date-range EXISTS count"),
    "returned_item_top": QueryDef(R.returned_item_top_customers, R.RETURNED_ITEM_SQL,
                                  "Q10 shape: return-revenue top-20"),
    "anti_join_unsold_parts": QueryDef(R.anti_join_never_ordered_parts, R.ANTI_JOIN_SQL,
                                       "left-anti join / NOT EXISTS"),
    "scalar_functions": QueryDef(R.scalar_functions_part, R.SCALAR_FUNCS_SQL,
                                 "string/math/conditional scalar library"),
    "orders_orc_roundtrip": QueryDef(R.orders_orc_roundtrip,
                                     R.ORDERS_ORC_ROUNDTRIP_SQL,
                                     "ORC sink+source round-trip"),
    "orders_partitioned_pruning": QueryDef(R.orders_partitioned_pruning,
                                           R.ORDERS_PARTITIONED_PRUNING_SQL,
                                           "partitionBy layout + partition pruning"),
    "orders_dpp_join": QueryDef(R.orders_dpp_join, R.ORDERS_DPP_JOIN_SQL,
                                "runtime dynamic partition pruning via dim join"),
    "lineitem_bloom_join": QueryDef(R.lineitem_bloom_join,
                                    R.LINEITEM_BLOOM_JOIN_SQL,
                                    "runtime bloom-filter semi-join reduction"),
    "events_sorted_layout": QueryDef(R.events_sorted_layout,
                                     R.EVENTS_SORTED_LAYOUT_SQL,
                                     "range-sorted time layout + stats skipping"),
    "events_zorder_layout": QueryDef(R.events_zorder_layout,
                                     R.EVENTS_ZORDER_LAYOUT_SQL,
                                     "2-D z-order layout: skipping on user AND time"),
    "smj_orders_lineitem": QueryDef(R.smj_orders_lineitem,
                                    R.SMJ_ORDERS_LINEITEM_SQL,
                                    "explicit big-big sort-merge join (merge hint)"),
    "bucketed_join_revenue": QueryDef(R.bucketed_join_revenue,
                                      R.BUCKETED_JOIN_SQL,
                                      "bucketed co-located join (zero-exchange SMJ)"),
    "file_metadata_counts": QueryDef(R.file_metadata_counts,
                                     R.FILE_METADATA_COUNTS_SQL,
                                     "hidden _metadata file columns"),
    "synthetic_range_agg": QueryDef(R.synthetic_range_agg,
                                    R.SYNTHETIC_RANGE_AGG_SQL,
                                    "spark.range generated source + exact agg"),
    "lineitem_csv_roundtrip": QueryDef(R.lineitem_csv_roundtrip,
                                       R.LINEITEM_CSV_ROUNDTRIP_SQL,
                                       "CSV sink+source round-trip (schema-on-read)"),
    "customer_xml_roundtrip": QueryDef(R.customer_xml_roundtrip,
                                       R.CUSTOMER_XML_ROUNDTRIP_SQL,
                                       "XML sink+source round-trip (Spark 4 built-in)"),
    "csv_permissive_corrupt": QueryDef(R.csv_permissive_corrupt,
                                       R.CSV_PERMISSIVE_CORRUPT_SQL,
                                       "PERMISSIVE corrupt-record channel"),
    "array_functions": QueryDef(R.array_functions, R.ARRAY_FUNCTIONS_SQL,
                                "array construction + higher-order functions"),
    "map_functions": QueryDef(R.map_functions, R.MAP_FUNCTIONS_SQL,
                              "MapType construction + element_at/map_keys"),
    "explode_outer_semantics": QueryDef(R.explode_outer_semantics,
                                        R.EXPLODE_OUTER_SQL,
                                        "explode_outer keeps empty groups as NULL rows"),
    "events_jsonl_roundtrip": QueryDef(R.events_jsonl_roundtrip,
                                       R.EVENTS_JSONL_ROUNDTRIP_SQL,
                                       "JSON-lines sink+source round-trip"),
    "string_functions_fuzzy": QueryDef(R.string_functions_fuzzy,
                                       R.STRING_FUNCS_FUZZY_SQL,
                                       "levenshtein/translate/regexp string library"),
    "date_functions": QueryDef(R.date_functions_orders, R.DATE_FUNCS_SQL,
                               "date part extraction + agg"),
    "events_hourly": QueryDef(R.events_hourly, R.EVENTS_HOURLY_SQL,
                              "time-bucketed agg (batch form of streaming op)"),
    "events_udaf_second_max": QueryDef(R.events_udaf_second_max,
                                       R.EVENTS_UDAF_SECOND_MAX_SQL,
                                       "Arrow GROUPED_AGG pandas UDAF over a "
                                       "pre-reduced distinct set (exact gate)"),
    "events_countmin_freq": QueryDef(R.events_countmin_freq,
                                     R.EVENTS_COUNTMIN_SQL,
                                     "Count-Min sketch frequency "
                                     "estimation: deterministic literal "
                                     "hashes, FULLY hash-gated sketch"),
    "stream_countmin_freq": QueryDef(ST.stream_countmin_freq,
                                     R.EVENTS_COUNTMIN_SQL,
                                     "the Count-Min sketch accumulated "
                                     "THROUGH streaming (bounded monoid "
                                     "state), scored batch-side"),
    "events_approx_distinct": QueryDef(R.events_approx_distinct, None,
                                       "HLL approx distinct (builtin, "
                                       "sketch-specific rows-only)"),
    "lineitem_kmv_setops": QueryDef(R.lineitem_kmv_setops,
                                    R.LINEITEM_KMV_SQL,
                                    "KMV bottom-k sketch: union AND "
                                    "intersection cardinalities, FULLY "
                                    "hash-gated"),
    "stream_kmv_setops": QueryDef(ST.stream_kmv_setops,
                                  R.LINEITEM_KMV_SQL,
                                  "the KMV sketch merged THROUGH "
                                  "streaming per micro-batch (bounded "
                                  "monoid state), scored batch-side"),
    "lineitem_hll_distinct": QueryDef(R.lineitem_hll_distinct,
                                      R.LINEITEM_HLL_SQL,
                                      "HyperLogLog with deterministic "
                                      "integer hashing: FULLY hash-gated "
                                      "cardinality sketch"),
    "stream_hll_distinct": QueryDef(ST.stream_hll_distinct,
                                    R.LINEITEM_HLL_SQL,
                                    "the HLL register max-monoid "
                                    "accumulated THROUGH streaming, "
                                    "scored batch-side"),
    "lineitem_approx_percentiles": QueryDef(R.lineitem_approx_percentiles, None,
                                            "GK approx percentile sketch "
                                            "(builtin, order-dependent "
                                            "merge: rows-only)"),
    "lineitem_loghist_percentiles": QueryDef(R.lineitem_loghist_percentiles,
                                             R.LINEITEM_LOGHIST_SQL,
                                             "log-linear histogram quantile "
                                             "sketch (DDSketch family): "
                                             "FULLY value-gated, float-free"),
    "stream_loghist_percentiles": QueryDef(ST.stream_loghist_percentiles,
                                           R.LINEITEM_LOGHIST_SQL,
                                           "the quantile histogram "
                                           "count-monoid accumulated "
                                           "THROUGH streaming, scored "
                                           "batch-side"),
    "lineitem_exact_percentiles": QueryDef(R.lineitem_exact_percentiles,
                                           R.LINEITEM_EXACT_PERCENTILES_SQL,
                                           "exact discrete percentiles "
                                           "(order statistics, hash-gated)"),
    "docs_quality_lr": QueryDef(TX.docs_quality_lr, None,
                                "MLlib quality classifier (accuracy-pinned)"),
    "stream_events_hourly": QueryDef(ST.stream_events_hourly,
                                     ST.STREAM_EVENTS_HOURLY_SQL,
                                     "hourly agg THROUGH the streaming engine"),
    "events_sessionize": QueryDef(R.events_sessionize_batch, R.EVENTS_SESSIONIZE_SQL,
                                  "gap-based sessionization (gaps-and-islands)"),
    "events_peak_concurrency": QueryDef(R.events_peak_concurrency,
                                        R.EVENTS_PEAK_CONCURRENCY_SQL,
                                        "peak concurrent sessions per day via a "
                                        "day-partitioned sweep line (no interval self-join)"),
    "stream_events_sessionize": QueryDef(ST.stream_events_sessionize,
                                         ST.STREAM_EVENTS_SESSIONIZE_SQL,
                                         "session_window THROUGH the streaming engine"),
    "stream_click_attribution": QueryDef(ST.stream_click_attribution,
                                         ST.STREAM_CLICK_ATTRIBUTION_SQL,
                                         "watermarked stream-stream interval join"),
    "stream_events_dedup": QueryDef(ST.stream_events_dedup,
                                    ST.STREAM_EVENTS_DEDUP_SQL,
                                    "at-least-once replay dedup (id-keyed state)"),
    "stream_user_event_counts": QueryDef(ST.stream_user_event_counts,
                                         ST.STREAM_USER_EVENT_COUNTS_SQL,
                                         "applyInPandasWithState custom state"),
    "stream_static_enrich": QueryDef(ST.stream_static_enrich,
                                     ST.STREAM_STATIC_ENRICH_SQL,
                                     "stream-static dim enrichment join"),
    "stream_ewma": QueryDef(ST.stream_ewma, R.EVENTS_EWMA_SQL,
                            "order-sensitive EWMA through event-time-ordered "
                            "streaming replay with per-batch state"),
    "stream_cusum": QueryDef(ST.stream_cusum, R.EVENTS_CUSUM_SQL,
                             "CUSUM through streaming with cross-batch "
                             "calibration warmup and retroactive emit"),
    "stream_bootstrap_ci": QueryDef(ST.stream_bootstrap_ci,
                                    R.EVENTS_BOOTSTRAP_CI_SQL,
                                    "Poisson-bootstrap moments accumulated "
                                    "THROUGH streaming (complete mode)"),
    "stream_holt_trend": QueryDef(ST.stream_holt_trend,
                                  R.EVENTS_HOLT_TREND_SQL,
                                  "Holt recurrence through ordered streaming "
                                  "replay, two-integer JSON state per type"),
    "events_funnel": QueryDef(R.events_funnel, R.EVENTS_FUNNEL_SQL,
                              "ordered view->click->purchase funnel stages"),
    "events_resample_ffill": QueryDef(R.events_resample_ffill,
                                      R.EVENTS_RESAMPLE_FFILL_SQL,
                                      "hourly grid resample + forward fill (LOCF)"),
    "events_scd2": QueryDef(R.events_scd2, R.EVENTS_SCD2_SQL,
                            "SCD type-2 temporal versioning (CDC -> validity intervals)"),
    "events_pit_enrich": QueryDef(R.events_pit_enrich, R.EVENTS_PIT_ENRICH_SQL,
                                  "feature-store point-in-time join: leakage-free "
                                  "label enrichment via strict-before as-of binding"),
    "events_anomaly_zscore": QueryDef(R.events_anomaly_zscore,
                                      R.EVENTS_ANOMALY_ZSCORE_SQL,
                                      "3-sigma outlier counts via exact cross-multiplied moments"),
    "events_value_histogram": QueryDef(R.events_value_histogram,
                                       R.EVENTS_VALUE_HISTOGRAM_SQL,
                                       "fixed-width value histogram, penny-exact bins"),
    "events_rollup_refresh": QueryDef(R.events_rollup_refresh,
                                      R.EVENTS_ROLLUP_REFRESH_SQL,
                                      "incremental continuous-aggregate refresh (day partitions)"),
    "stream_ab_test": QueryDef(ST.stream_ab_test, R.EVENTS_AB_TEST_SQL,
                               "A/B moment accumulation THROUGH streaming "
                               "(monoid state), scored batch-side"),
    "dq_audit": QueryDef(R.dq_audit, R.DQ_AUDIT_SQL,
                         "data-quality audit: named constraint checks "
                         "(FK, uniqueness, ranges, nulls) with counts"),
    "events_pattern_match": QueryDef(R.events_pattern_match,
                                     R.EVENTS_PATTERN_MATCH_SQL,
                                     "CEP sequence-pattern match "
                                     "(view->purchase, no error between)"),
    "stream_mv_join_refresh": QueryDef(ST.stream_mv_join_refresh,
                                       R.ORDERS_MV_JOIN_REFRESH_SQL,
                                       "join-MV maintained THROUGH streaming "
                                       "(exactly-once foreachBatch merges)"),
    "part_skyline": QueryDef(R.part_skyline, R.PART_SKYLINE_SQL,
                             "skyline / Pareto-dominance preference query "
                             "(presort sweep, no all-pairs)"),
    "orders_mv_join_refresh": QueryDef(R.orders_mv_join_refresh,
                                       R.ORDERS_MV_JOIN_REFRESH_SQL,
                                       "incremental JOIN-MV maintenance "
                                       "(delta-rule refresh, month-partitioned)"),
    "customer_k_anonymity": QueryDef(R.customer_k_anonymity,
                                     R.CUSTOMER_K_ANONYMITY_SQL,
                                     "k-anonymity / l-diversity release audit "
                                     "over quasi-identifier classes"),
    "events_ab_test": QueryDef(R.events_ab_test, R.EVENTS_AB_TEST_SQL,
                               "two-sample z-test per event type, exact "
                               "integer moments (hash-gated float z)"),
    "events_retention_cohorts": QueryDef(R.events_retention_cohorts,
                                         R.EVENTS_RETENTION_SQL,
                                         "cohort retention matrix (first-seen day x offset)"),
    "customer_rfm_segments": QueryDef(R.customer_rfm_segments,
                                      R.CUSTOMER_RFM_SQL,
                                      "RFM quartile segmentation over customer-grain aggregates"),
    "events_seasonality": QueryDef(R.events_seasonality,
                                   R.EVENTS_SEASONALITY_SQL,
                                   "timezone-free (dow, hour) activity "
                                   "heatmap with per-type shares"),
    "events_markov_transitions": QueryDef(R.events_markov_transitions,
                                          R.EVENTS_MARKOV_SQL,
                                          "first-order Markov transition "
                                          "matrix over user journeys"),
    "part_pareto_curve": QueryDef(R.part_pareto_curve, R.PART_PARETO_SQL,
                                  "revenue-concentration (80/20) curve, "
                                  "decimated to O(100) rows"),
    "lineitem_market_basket": QueryDef(R.lineitem_market_basket,
                                       R.LINEITEM_MARKET_BASKET_SQL,
                                       "item-affinity mining: co-bought part "
                                       "pairs with support and lift"),
    "part_pagerank": QueryDef(R.part_pagerank, R.PART_PAGERANK_SQL,
                              "fixed-point PageRank over the co-purchase "
                              "graph (hash-gateable graph analytics)"),
    "events_drift_bins": QueryDef(R.events_drift_bins, R.EVENTS_DRIFT_BINS_SQL,
                                  "PSI-style drift report: current window "
                                  "binned on reference-decile edges"),
    "events_winsorize": QueryDef(R.events_winsorize, R.EVENTS_WINSORIZE_SQL,
                                 "percentile clipping (winsorized robust "
                                 "normalization), broadcast bounds"),
    "events_ewma": QueryDef(R.events_ewma, R.EVENTS_EWMA_SQL,
                            "fixed-point EWMA recurrence via applyInPandas "
                            "(per-key sequential state, hash-gated)"),
    "lineitem_equidepth_bins": QueryDef(R.lineitem_equidepth_bins,
                                        R.LINEITEM_EQUIDEPTH_BINS_SQL,
                                        "NTILE equal-frequency decile binning "
                                        "with per-bin exact stats"),
    "orders_negative_samples": QueryDef(R.orders_negative_samples,
                                        R.ORDERS_NEGATIVE_SAMPLES_SQL,
                                        "deterministic negative sampling for "
                                        "contrastive training (LCG + anti-join)"),
    "part_bfs_hops": QueryDef(R.part_bfs_hops, R.PART_BFS_HOPS_SQL,
                              "BFS hop distance via Pregel-style frontier "
                              "expansion (vs recursive-CTE oracle)"),
    "part_triangles": QueryDef(R.part_triangles, R.PART_TRIANGLES_SQL,
                               "triangle counting + clustering coefficient "
                               "(ordered-edge three-way self-join)"),
    "part_sssp_weighted": QueryDef(R.part_sssp_weighted,
                                   R.PART_SSSP_WEIGHTED_SQL,
                                   "weighted shortest path: Bellman-Ford "
                                   "relaxation rounds vs unrolled-CTE oracle"),
    "part_item_cf": QueryDef(R.part_item_cf, R.PART_ITEM_CF_SQL,
                             "item-item CF top-3 neighbors by co-purchase "
                             "cosine (integer-keyed rank, WindowGroupLimit)"),
    "part_name_linkage": QueryDef(R.part_name_linkage,
                                  R.PART_NAME_LINKAGE_SQL,
                                  "blocked edit-distance record linkage, "
                                  "provably == brute-force argmin"),
    "events_rolling_distinct": QueryDef(R.events_rolling_distinct,
                                        R.EVENTS_ROLLING_DISTINCT_SQL,
                                        "exact 7-day rolling distinct users "
                                        "via bounded fan-out, no range join"),
    "events_acf": QueryDef(R.events_acf, R.EVENTS_ACF_SQL,
                           "autocorrelation of the daily series at lags "
                           "1..7, integer-exact moments"),
    "events_incident_overlap": QueryDef(R.events_incident_overlap,
                                        R.EVENTS_INCIDENT_OVERLAP_SQL,
                                        "interval-overlap join via day-grid "
                                        "bucketing (equi-join, no inequality "
                                        "join)"),
    "events_holt_trend": QueryDef(R.events_holt_trend,
                                  R.EVENTS_HOLT_TREND_SQL,
                                  "Holt level+trend smoothing, fixed-point "
                                  "coupled recurrence vs recursive CTE"),
    "events_cusum": QueryDef(R.events_cusum, R.EVENTS_CUSUM_SQL,
                             "one-sided CUSUM change detection with "
                             "calibrated reference, exact fixed point"),
    "orders_benford_audit": QueryDef(R.orders_benford_audit,
                                     R.ORDERS_BENFORD_AUDIT_SQL,
                                     "Benford first-digit forensics audit, "
                                     "lexical digit + shared literal shares"),
    "sql_recursive_hierarchy": QueryDef(R.sql_recursive_hierarchy,
                                        R.SQL_RECURSIVE_HIERARCHY,
                                        "WITH RECURSIVE on Spark's own SQL "
                                        "surface; oracle runs the IDENTICAL "
                                        "SQL text"),
    "sql_recursive_subtree": QueryDef(R.sql_recursive_subtree,
                                      R.SQL_RECURSIVE_SUBTREE,
                                      "WITH RECURSIVE subtree/BOM rollup, "
                                      "identical SQL text in both engines"),
    "events_bootstrap_ci": QueryDef(R.events_bootstrap_ci,
                                    R.EVENTS_BOOTSTRAP_CI_SQL,
                                    "Poisson-bootstrap 95% CI: per-row "
                                    "deterministic replica weights, exact "
                                    "integer moments"),
    "orders_cohort_ltv": QueryDef(R.orders_cohort_ltv,
                                  R.ORDERS_COHORT_LTV_SQL,
                                  "acquisition-cohort LTV curves, integer "
                                  "cents + month-index age"),
    "events_slo_burn": QueryDef(R.events_slo_burn, R.EVENTS_SLO_BURN_SQL,
                                "SLO error-budget burn, integer "
                                "cross-multiplied rates + cumulative window"),
    "events_seasonal_decompose": QueryDef(
        R.events_seasonal_decompose, R.EVENTS_SEASONAL_DECOMPOSE_SQL,
        "additive trend/seasonal/residual decomposition, exact sevenths"),
    "events_burstiness": QueryDef(R.events_burstiness,
                                  R.EVENTS_BURSTINESS_SQL,
                                  "per-user inter-arrival burstiness "
                                  "(Goh-Barabasi B), integer gap moments"),
    "skew_salted_join": QueryDef(R.skew_salted_join, R.SKEW_SALTED_JOIN_SQL,
                                 "explicit skew-salted big-big join"),
    "events_asof_orders": QueryDef(R.events_asof_orders, R.EVENTS_ASOF_SQL,
                                   "backward as-of join (custom operator)"),
    "events_asof_next_order": QueryDef(R.events_asof_next_order,
                                       R.EVENTS_ASOF_NEXT_SQL,
                                       "forward as-of join (negated-time reuse)"),
    "range_join_price_bands": QueryDef(R.range_join_price_bands, R.RANGE_JOIN_SQL,
                                       "interval join via broadcast nested loop"),
    "events_json_stats": QueryDef(R.events_json_stats, R.EVENTS_JSON_SQL,
                                  "JSON scalar extraction + aggregation"),
    "variant_json_stats": QueryDef(R.variant_json_stats, R.VARIANT_JSON_STATS_SQL,
                                   "VARIANT semi-structured type (parse_json/variant_get)"),
    "lineitem_percentiles": QueryDef(R.lineitem_percentiles, R.PERCENTILES_SQL,
                                     "exact interpolated percentiles"),
    "orders_priority_pivot": QueryDef(R.orders_priority_pivot, R.ORDERS_PIVOT_SQL,
                                      "pivot via conditional aggregation"),
    "orders_pivot_builtin": QueryDef(R.orders_pivot_builtin, R.ORDERS_PIVOT_BUILTIN_SQL,
                                     "built-in groupBy().pivot() with static values"),
    "lineitem_unpivot": QueryDef(R.lineitem_unpivot, R.LINEITEM_UNPIVOT_SQL,
                                 "unpivot/melt measures into rows"),
    "cube_sales": QueryDef(R.cube_sales, R.CUBE_SALES_SQL,
                           "CUBE grouping sets + grouping id"),
    "orders_time_rollup": QueryDef(R.orders_time_rollup, R.TIME_ROLLUP_SQL,
                                   "multi-granularity time rollup"),
    "outer_join_order_counts": QueryDef(R.outer_join_order_counts, R.OUTER_JOIN_SQL,
                                        "left outer join + count-of-counts"),
    "correlated_subquery_avg": QueryDef(R.correlated_subquery_avg, R.CORRELATED_SUBQ_SQL,
                                        "correlated scalar subquery (decorrelated)"),
    "sql_api_national_revenue": QueryDef(R.sql_api_national_revenue,
                                         R.SQL_API_NATIONAL_REVENUE_SQL,
                                         "spark.sql string interface over temp views"),
    "distinct_agg": QueryDef(R.distinct_agg_suppliers, R.DISTINCT_AGG_SQL,
                             "multi-column grouped distinct aggregation"),
    "mm_audio_features": QueryDef(R.mm_audio_features, R.MM_AUDIO_FEATURES_SQL,
                                  "audio waveform features (Arrow codec seam)"),
    "mm_image_features": QueryDef(R.mm_image_features, R.MM_IMAGE_FEATURES_SQL,
                                  "binary media column -> Arrow-batch features"),
    "mm_frame_sample": QueryDef(R.mm_frame_sample, R.MM_FRAME_SAMPLE_SQL,
                                "every-Nth byte-frame sampling (explode, no shuffle)"),
    "mm_frame_dedup": QueryDef(R.mm_frame_dedup, R.MM_FRAME_DEDUP_SQL,
                               "consecutive-duplicate frame removal (video dedup shape)"),
    "mm_wav_decode": QueryDef(R.mm_wav_decode, R.MM_WAV_DECODE_SQL,
                              "REAL WAV container encode->decode round-trip "
                              "(stdlib wave parser behind the codec seam)"),
    "mm_bmp_decode": QueryDef(R.mm_bmp_decode, R.MM_BMP_DECODE_SQL,
                              "REAL 8-bit BMP container round-trip (struct "
                              "parser: header, bottom-up rows, stride pad)"),
    "mm_mp4_demux": QueryDef(R.mm_mp4_demux, R.MM_MP4_DEMUX_SQL,
                             "REAL ISO-BMFF demux: box walk + "
                             "stsz/stco/stsc sample reassembly, "
                             "byte-exact"),
    "mm_jpeg_decode": QueryDef(R.mm_jpeg_decode, R.MM_JPEG_DECODE_SQL,
                               "REAL entropy-coded codec: grayscale "
                               "baseline JPEG, exact geometry + pinned "
                               "fidelity bound"),
    "mm_mp1_decode": QueryDef(R.mm_mp1_decode, R.MM_MP1_DECODE_SQL,
                              "REAL MPEG-1 Layer I audio codec: "
                              "polyphase filterbank + spec frames, "
                              "exact geometry + pinned fidelity"),
    "mm_png_decode": QueryDef(R.mm_png_decode, R.MM_PNG_DECODE_SQL,
                              "REAL PNG round-trip (zlib IDAT + CRC walk + "
                              "Paeth/None scanline unfilter, stdlib only)"),
    "mm_gif_decode": QueryDef(R.mm_gif_decode, R.MM_GIF_DECODE_SQL,
                              "REAL GIF87a round-trip (variable-width LZW, "
                              "sub-block reassembly, table resets, stdlib only)"),
    "mm_qoi_decode": QueryDef(R.mm_qoi_decode, R.MM_QOI_DECODE_SQL,
                              "REAL QOI round-trip (run/index/diff/luma/rgb "
                              "chunk ops, stdlib only)"),
    "mm_scene_cuts": QueryDef(R.mm_scene_cuts, R.MM_SCENE_CUTS_SQL,
                              "video scene-cut detection: frame-difference "
                              "threshold over the sampled frame stream"),
    "mm_resize": QueryDef(R.mm_resize, R.MM_RESIZE_SQL,
                          "nearest-neighbor payload resize (Arrow codec seam)"),
    # --- text analysis + dedup (north-star extensions) --------------------
    "docs_text_stats": QueryDef(TX.docs_text_stats, TX.DOCS_TEXT_STATS_SQL,
                                "token/char statistics"),
    "docs_token_budget": QueryDef(TX.docs_token_budget, TX.DOCS_TOKEN_BUDGET_SQL,
                                  "token counting: whitespace + BPE-ish regex"),
    "docs_quality": QueryDef(TX.docs_quality, TX.DOCS_QUALITY_SQL,
                             "quality scoring + keep flag"),
    "docs_langid": QueryDef(TX.docs_langid, TX.DOCS_LANGID_SQL,
                            "stopword-marker language ID"),
    "docs_fingerprint": QueryDef(TX.docs_fingerprint, TX.DOCS_FINGERPRINT_SQL,
                                 "content fingerprint + shard"),
    "docs_exact_dedup": QueryDef(TX.docs_exact_dedup, TX.DOCS_EXACT_DEDUP_SQL,
                                 "exact dedup on fingerprint"),
    "docs_incremental_dedup": QueryDef(TX.docs_incremental_dedup,
                                       TX.DOCS_INCREMENTAL_DEDUP_SQL,
                                       "delta-batch dedup against the corpus "
                                       "fingerprint index (O(delta) ingest)"),
    "docs_fuzzy_dedup": QueryDef(TX.docs_fuzzy_dedup, TX.DOCS_FUZZY_DEDUP_SQL,
                                 "MinHash candidates confirmed by "
                                 "edit-distance similarity"),
    "docs_dup_spans": QueryDef(TX.docs_dup_spans, TX.DOCS_DUP_SPANS_SQL,
                               "span-level exact-substring duplication audit "
                               "(tokens covered by cross-doc 8-token windows)"),
    "stream_corpus_profile": QueryDef(ST.stream_corpus_profile,
                                      ST.STREAM_CORPUS_PROFILE_SQL,
                                      "the corpus profile THROUGH the "
                                      "streaming engine (live ingest view)"),
    "docs_corpus_profile": QueryDef(TX.docs_corpus_profile,
                                    TX.DOCS_CORPUS_PROFILE_SQL,
                                    "per-(source, lang) corpus report: "
                                    "volume, quality keep rate, dup counts"),
    "docs_token_shards": QueryDef(TX.docs_token_shards,
                                  TX.DOCS_TOKEN_SHARDS_SQL,
                                  "memmap training-shard export (.bin/.idx "
                                  "uint32) written, read back, hash-gated"),
    "docs_leakage_safe_split": QueryDef(TX.docs_leakage_safe_split,
                                        TX.DOCS_LEAKAGE_SPLIT_SQL,
                                        "dedup-aware train/val/test split "
                                        "(near-dup clusters stay together)"),
    "docs_chunk_windows": QueryDef(TX.docs_chunk_windows,
                                   TX.DOCS_CHUNK_WINDOWS_SQL,
                                   "context-window chunking: 64-token chunks "
                                   "on a 48-token stride, per-chunk ledger"),
    "docs_span_scrub": QueryDef(TX.docs_span_scrub, TX.DOCS_SPAN_SCRUB_SQL,
                                "span dedup applied: duplicated windows "
                                "removed, cleaned-text fingerprint emitted"),
    "docs_ngram_jaccard": QueryDef(TX.docs_ngram_jaccard, TX.DOCS_NGRAM_JACCARD_SQL,
                                   "exact near-dup pairs (shingle inverted index)"),
    "docs_containment_pairs": QueryDef(TX.docs_containment_pairs,
                                       TX.DOCS_CONTAINMENT_SQL,
                                       "directional containment near-dups (subset/quote dedup)"),
    "docs_simhash_pairs": QueryDef(TX.docs_simhash_pairs, TX.DOCS_SIMHASH_SQL,
                                   "SimHash near-dup pairs (banded equi-join)"),
    "docs_minhash_lsh": QueryDef(TX.docs_minhash_lsh, TX.DOCS_MINHASH_SQL,
                                 "banded MinHash near-dups (bucketed + exact verify)"),
    "docs_dup_clusters": QueryDef(TX.docs_dup_clusters, TX.DOCS_DUP_CLUSTERS_SQL,
                                  "pair list -> connected components -> keep-one clusters"),
    "docs_stratified_sample": QueryDef(TX.docs_stratified_sample,
                                       TX.DOCS_STRATIFIED_SAMPLE_SQL,
                                       "deterministic hash-stratified sampling"),
    "docs_weighted_sample": QueryDef(TX.docs_weighted_sample,
                                     TX.DOCS_WEIGHTED_SAMPLE_SQL,
                                     "deterministic weight-proportional priority sampling"),
    "docs_prefix_filter_pairs": QueryDef(TX.docs_prefix_filter_pairs,
                                         TX.DOCS_PREFIX_FILTER_SQL,
                                         "exact similarity join via PPJoin "
                                         "prefix filtering (vs brute-force oracle)"),
    "docs_quality_auc": QueryDef(TX.docs_quality_auc, TX.DOCS_QUALITY_AUC_SQL,
                                 "exact tie-aware ROC AUC via integer "
                                 "rank-sum over the bounded score table"),
    "docs_sample_per_class": QueryDef(TX.docs_sample_per_class,
                                      TX.DOCS_SAMPLE_PER_CLASS_SQL,
                                      "fixed-k-per-class hash-ranked sample "
                                      "(WindowGroupLimit top-k, no global sort)"),
    "docs_pack_sequences": QueryDef(TX.docs_pack_sequences,
                                    TX.DOCS_PACK_SEQUENCES_SQL,
                                    "greedy context-window packing (sharded windows)"),
    "docs_heavy_hitters": QueryDef(TX.docs_heavy_hitters,
                                   TX.DOCS_HEAVY_HITTERS_SQL,
                                   "top-k token doc-frequency (vocab head audit)"),
    "docs_tfidf_keywords": QueryDef(TX.docs_tfidf_keywords, TX.DOCS_TFIDF_SQL,
                                    "per-doc keyword extraction (rational tf-idf)"),
    "docs_bm25_topk": QueryDef(TX.docs_bm25_topk, TX.DOCS_BM25_TOPK_SQL,
                               "Okapi BM25 retrieval top-k: saturating "
                               "length-normalized scoring as exact "
                               "integer rationals, inverted-index join"),
    "emb_maxsim_topk": QueryDef(V.emb_maxsim_topk, V.EMB_MAXSIM_TOPK_SQL,
                                "ColBERT-style late-interaction MaxSim "
                                "top-k over 4x16-dim token vectors, "
                                "integer-exact"),
    "emb_maxsim_rerank": QueryDef(V.emb_maxsim_rerank,
                                  V.EMB_MAXSIM_RERANK_SQL,
                                  "two-stage retrieval: LSH multi-probe "
                                  "candidates re-ranked by MaxSim over "
                                  "the bounded set"),
    "emb_pca_power": QueryDef(V.emb_pca_power, V.EMB_PCA_POWER_SQL,
                              "top principal direction: fixed-point "
                              "power iteration over the exact integer "
                              "Gram (partial-sum distributed build)"),
    "docs_tfidf_topk": QueryDef(TX.docs_tfidf_topk, TX.DOCS_TFIDF_TOPK_SQL,
                                "sparse lexical top-k similarity "
                                "(inverted-index join, df-capped)"),
    "docs_bpe_merges": QueryDef(TX.docs_bpe_merges, TX.DOCS_BPE_SQL,
                                "BPE vocabulary induction "
                                "(2 unrolled merge iterations on word-freqs)"),
    "docs_novelty": QueryDef(TX.docs_novelty, TX.DOCS_NOVELTY_SQL,
                             "corpus-order trigram novelty scoring "
                             "(first-bearer aggregation, no pairwise join)"),
    "docs_bpe_encode": QueryDef(TX.docs_bpe_encode, TX.DOCS_BPE_ENCODE_SQL,
                                "BPE tokenizer APPLY: 4 learned merges "
                                "encoded via anchored whole-symbol replaces, "
                                "vocab-only rewrites"),
    "docs_bpe_train16": QueryDef(TX.docs_bpe_train16, TX.DOCS_BPE_TRAIN16_SQL,
                                 "BPE training harness: 16 sequential "
                                 "merges, flat per-round cost via "
                                 "localCheckpoint lineage truncation"),
    "docs_decontaminate": QueryDef(TX.docs_decontaminate,
                                   TX.DOCS_DECONTAMINATE_SQL,
                                   "benchmark decontamination (broadcast shingle join)"),
    "docs_pii_scan": QueryDef(TX.docs_pii_scan, TX.DOCS_PII_SCAN_SQL,
                              "PII detect + redaction fingerprint"),
    "docs_repetition_filter": QueryDef(TX.docs_repetition_filter,
                                       TX.DOCS_REPETITION_SQL,
                                       "Gopher/C4 repetition quality gate"),
    "docs_trigram_coverage": QueryDef(TX.docs_trigram_coverage,
                                      TX.DOCS_TRIGRAM_COVERAGE_SQL,
                                      "char-trigram coverage quality score"),
    "docs_bigram_lm": QueryDef(TX.docs_bigram_lm, TX.DOCS_BIGRAM_LM_SQL,
                               "corpus-trained bigram-LM familiarity score"),
    "docs_sentences_udtf": QueryDef(TX.docs_sentences_udtf,
                                    TX.DOCS_SENTENCES_UDTF_SQL,
                                    "Python UDTF surface (LATERAL table function)"),
    "docs_pipeline_yield": QueryDef(TX.docs_pipeline_yield,
                                    TX.DOCS_PIPELINE_YIELD_SQL,
                                    "composed lang->quality->rep->dedup yield funnel"),
    "docs_domain_mix": QueryDef(TX.docs_domain_mix, TX.DOCS_DOMAIN_MIX_SQL,
                                "data-derived domain-mix resampling"),
    # --- similarity search -------------------------------------------------
    "emb_cosine_topk": QueryDef(V.emb_cosine_topk, V.EMB_COSINE_TOPK_SQL,
                                "exact brute-force cosine top-k"),
    "emb_kmeans": QueryDef(V.emb_kmeans, V.EMB_KMEANS_SQL,
                           "hash-gateable fixed-point k-means "
                           "(2 Lloyd iterations, integer arithmetic)"),
    "emb_pq_codes": QueryDef(V.emb_pq_codes, V.EMB_PQ_SQL,
                             "product-quantization codes from two 32-dim "
                             "sub-codebooks + exact reconstruction error"),
    "emb_mips_topk": QueryDef(V.emb_mips_topk, V.EMB_MIPS_TOPK_SQL,
                              "exact max-inner-product top-k "
                              "(norm-augmentation LSH is the scale path)"),
    "emb_quantize_int8": QueryDef(V.emb_quantize_int8, V.EMB_QUANTIZE_INT8_SQL,
                                  "symmetric int8 quantization audit"),
    "emb_covariance": QueryDef(V.emb_covariance, V.EMB_COVARIANCE_SQL,
                               "exact 64x64 covariance via distributed "
                               "partial Gram sums (numpy rank-k updates)"),
    "emb_centroid_per_label": QueryDef(V.emb_centroid_per_label, V.EMB_CENTROID_SQL,
                                       "per-label vector aggregation"),
    "emb_ann_lsh": QueryDef(V.emb_ann_lsh_topk, V.EMB_ANN_LSH_SQL,
                            "sign-LSH approximate top-k (bucketed + rescored)"),
    "emb_ivf_topk": QueryDef(V.emb_ivf_topk, V.EMB_IVF_SQL,
                             "IVF coarse-quantized top-k (nprobe cells rescored)"),
    "emb_cosine_dup_pairs": QueryDef(V.emb_cosine_dup_pairs, V.EMB_COSINE_DUP_SQL,
                                     "embedding near-dup pairs (LSH-bucketed + exact verify)"),
    "emb_dup_clusters": QueryDef(V.emb_dup_clusters, V.EMB_DUP_CLUSTERS_SQL,
                                 "embedding pair list -> connected components"),
    "emb_semdedup": QueryDef(V.emb_semdedup, V.EMB_SEMDEDUP_SQL,
                             "SemDeDup: within-coarse-cluster semantic "
                             "dedup, keep-one ledger per vector"),
    "emb_matryoshka_audit": QueryDef(V.emb_matryoshka_audit,
                                     V.EMB_MATRYOSHKA_SQL,
                                     "truncated-embedding retrieval audit "
                                     "(full vs 16-dim prefix overlap@5)"),
    # --- tail appends ONLY below this line ---------------------------------
    # The driver's oracle gate verifies the FIRST 50 CATALOG entries by
    # dict order; an insertion above displaces a verified query out of the
    # window (round 10's regression). New queries are APPENDED here, never
    # inserted mid-dict.
    "sst_foreign_ka_composite": QueryDef(C.sst_foreign_ka_composite,
                                         C.SST_FOREIGN_KA_COMPOSITE_SQL,
                                         "CQL3 CompositeType clustering "
                                         "on all-foreign ka files: "
                                         "component-wise slice + point, "
                                         "per-component stats "
                                         "elimination"),
    "stream_native_ingest": QueryDef(ST.stream_native_ingest,
                                     C.SST_INCREMENTAL_MERGE_SQL,
                                     "arrival-driven native-sstable "
                                     "ingestion: three micro-batch "
                                     "waves, listing-diff discovery, "
                                     "exactly-once LWW merge into the "
                                     "landed table"),
}


def _sweep_on_entry(fn: QueryFn) -> QueryFn:
    """Unpersist the PREVIOUS query's pinned caches when a new catalog
    query starts. Catalog consumers (driver, bench, tests) run queries
    sequentially, so by the time query N+1 is invoked, query N's
    consuming action has finished and its pins are dead weight; sweeping
    at entry bounds a long-lived session's executor storage to one
    query's pins. Early unpersist is safe regardless -- pin() only wraps
    .cache() frames whose lineage is intact."""
    import functools

    from cassandra_sstable_to_protocolbuf_spark.session import sweep_pinned

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        sweep_pinned()
        return fn(spark, sf_dir)

    return wrapped


CATALOG = {name: QueryDef(_sweep_on_entry(qd.fn), qd.oracle, qd.doc)
           for name, qd in CATALOG.items()}


def queries() -> dict[str, QueryFn]:
    return {name: qd.fn for name, qd in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in CATALOG.items() if qd.oracle is not None}
