"""Query registry: name → (Spark plan, DuckDB oracle SQL).

One entry per implemented operator/capability from SURVEY.md §2. The
driver compares each Spark result against the oracle SQL on the same
parquet tables (row count + schema + order-insensitive value hash), so
every computed column is aliased identically on both sides and every
float aggregate uses the decimal-exact discipline of functions.exact.

Entries with ``oracle=None`` are genuinely non-SQL-expressible (or
metadata-level) and get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bow_hunter_pipeline_spark import oracles_f, oracles_h, oracles_tpch
from bow_hunter_pipeline_spark.plans import (
    analytics,
    ingest_demo,
    approx,
    dedup,
    events,
    funcfamilies,
    graph,
    multimodal,
    normalize_demo,
    pandas_udfs,
    parsing_demo,
    pipeline,
    relational,
    sampling,
    simsearch,
    textanalysis,
    tpch,
    traindata,
)
from bow_hunter_pipeline_spark.sources import python_sink
from bow_hunter_pipeline_spark.streaming import structured

QueryFn = Callable[[SparkSession, str], DataFrame]

# Current build round. tools/plan_fingerprints.py stamps every query
# whose transitive plan source changed with this round, and
# tests/test_plan_fingerprints.py forces those queries into the
# driver-checked prefix — the mechanical form of the rotation rule
# "changed plan ⇒ re-proof" (VERDICT r09, What's-missing #1).
ROUND = 15

# --- oracle SQL fragments (DuckDB dialect = ANSI here) -----------------

_DEC_SUM = "CAST(round(SUM(CAST({c} AS DECIMAL(14,2))), 4) AS DOUBLE)"
_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(7,4))"
)

_PRICING_SUMMARY_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {_DEC_SUM.format(c='l_quantity')} AS sum_qty,
  {_DEC_SUM.format(c='l_extendedprice')} AS sum_base_price,
  CAST(round(SUM({_REVENUE}), 4) AS DOUBLE) AS sum_disc_price,
  CAST(round(SUM({_REVENUE} * CAST(1 + l_tax AS DECIMAL(7,4))), 4) AS DOUBLE) AS sum_charge,
  {_DEC_SUM.format(c='l_quantity')} / COUNT(l_quantity) AS avg_qty,
  {_DEC_SUM.format(c='l_extendedprice')} / COUNT(l_extendedprice) AS avg_price,
  CAST(round(SUM(CAST(l_discount AS DECIMAL(7,4))), 4) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

_SUCCESS_RATE_SQL = f"""
SELECT
  l_returnflag,
  {_DEC_SUM.format(c='l_quantity')} AS sum_qty,
  {_DEC_SUM.format(c='l_extendedprice')} AS sum_price,
  COUNT(*) AS n_rows,
  {_DEC_SUM.format(c='l_quantity')} / COUNT(*) AS qty_per_row
FROM lineitem
GROUP BY l_returnflag
"""

_REVENUE_BY_NATION_SQL = f"""
SELECT
  n_name,
  CAST(round(SUM({_REVENUE}), 4) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

_TOP_K_SQL = f"""
WITH per_part AS (
  SELECT p_brand, p_partkey, CAST(round(SUM({_REVENUE}), 4) AS DOUBLE) AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
)
SELECT p_brand, p_partkey, revenue, rnk FROM (
  SELECT *, CAST(RANK() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS INT) AS rnk
  FROM per_part
) WHERE rnk <= 3
"""

_YEARLY_TREND_SQL = f"""
WITH yearly AS (
  SELECT
    o_orderpriority AS priority,
    CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
    {_DEC_SUM.format(c='o_totalprice')} AS total_price,
    COUNT(*) AS n_orders
  FROM orders
  GROUP BY 1, 2
)
SELECT priority, order_year, total_price, n_orders,
       total_price - LAG(total_price) OVER (PARTITION BY priority ORDER BY order_year) AS yoy_delta
FROM yearly
"""

_MARKET_SHARE_SQL = f"""
WITH per_nation AS (
  SELECT n_name, SUM({_REVENUE}) AS rev_dec
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name,
       CAST(round(rev_dec, 4) AS DOUBLE) AS revenue,
       CAST(round(rev_dec, 4) AS DOUBLE) / CAST(round(SUM(rev_dec) OVER (), 4) AS DOUBLE) AS revenue_share
FROM per_nation
"""

_POPULATION_EXPLODE_SQL = """
WITH stage AS (
  SELECT c_nationkey, string_agg(c_custkey, ',' ORDER BY c_custkey) AS gmu_list
  FROM customer GROUP BY c_nationkey
  UNION ALL
  SELECT * FROM (VALUES (-1, 'see map'), (-2, '3,4a'), (-3, '')) t(c_nationkey, gmu_list)
),
exploded AS (
  SELECT c_nationkey, UNNEST(CAST(str_split(gmu_list, ',') AS BIGINT[])) AS unit
  FROM stage WHERE regexp_matches(trim(gmu_list), '^[0-9 ,]+$')
)
SELECT e.c_nationkey AS nationkey,
       COUNT(*) AS n_units,
       CAST(round(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 4) AS DOUBLE) AS total_acctbal
FROM exploded e
JOIN customer c ON e.unit = c.c_custkey AND e.c_nationkey = c.c_nationkey
GROUP BY e.c_nationkey
"""

_FLAGSHIP_SQL = f"""
WITH per_nation AS ({_POPULATION_EXPLODE_SQL})
SELECT nationkey, n_units, total_acctbal, rnk FROM (
  SELECT *, CAST(RANK() OVER (ORDER BY total_acctbal DESC, nationkey) AS INT) AS rnk
  FROM per_nation
) WHERE rnk <= 10
"""

_ORDERS_UPSERT_SQL = """
WITH e AS (
  SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderpriority
  FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'
),
u AS (
  SELECT o_orderkey, 'XX' AS o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(7,4)) AS DOUBLE) AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderdate >= TIMESTAMP '1994-01-01'
)
SELECT
  COALESCE(e.o_orderkey, u.o_orderkey) AS o_orderkey,
  CASE WHEN e.o_orderkey IS NOT NULL THEN e.o_orderstatus ELSE u.o_orderstatus END AS o_orderstatus,
  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice ELSE e.o_totalprice END AS o_totalprice,
  CASE WHEN e.o_orderkey IS NOT NULL THEN e.o_orderpriority ELSE u.o_orderpriority END AS o_orderpriority
FROM e FULL OUTER JOIN u ON e.o_orderkey = u.o_orderkey
"""

_DUPLICATE_KEYS_SQL = """
WITH dup AS (
  SELECT * FROM orders
  UNION ALL
  SELECT * FROM orders WHERE o_orderkey % 7 = 0
)
SELECT o_orderkey, COUNT(*) AS n_rows
FROM dup GROUP BY o_orderkey HAVING COUNT(*) > 1
"""

# G5: synthesized weather dimension (temp = f(nationkey, month))
# joined onto monthly activity; exact integer co-moment sums
_WEATHER_CORR_SQL = """
WITH monthly AS (
  SELECT c_nationkey AS nationkey,
         CAST(month(o_orderdate) AS INT) AS month,
         COUNT(*) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
weather AS (
  SELECT n_nationkey AS nationkey, CAST(m AS INT) AS month,
         CAST((n_nationkey * 7 + m * 13) % 40 - 10 AS BIGINT) AS temp_c
  FROM nation, unnest(generate_series(1, 12)) AS t(m)
),
j AS (
  SELECT monthly.nationkey, monthly.month, n_orders, temp_c
  FROM monthly JOIN weather
    ON monthly.nationkey = weather.nationkey
   AND monthly.month = weather.month
),
sums AS (
  SELECT nationkey,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(temp_c) AS DOUBLE) AS sx,
         CAST(SUM(n_orders) AS DOUBLE) AS sy,
         CAST(SUM(temp_c * n_orders) AS DOUBLE) AS sxy,
         CAST(SUM(temp_c * temp_c) AS DOUBLE) AS sxx,
         CAST(SUM(n_orders * n_orders) AS DOUBLE) AS syy
  FROM j GROUP BY nationkey
)
SELECT nationkey, n, sx, sy,
       (n * sxy - sx * sy)
         / nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0)
         AS corr_temp_orders
FROM sums
"""

# G5 spatial leg: nearest-sensor assignment on a deterministic
# integer grid — ROW_NUMBER over (d2, sensor_id) = Spark's
# lexicographic struct-min, bit-for-bit
_SENSOR_JOIN_SQL = """
WITH sensors AS (
  SELECT n_nationkey AS sensor_id,
         CAST((n_nationkey * 37) % 100 AS BIGINT) AS sx,
         CAST((n_nationkey * 61) % 100 AS BIGINT) AS sy
  FROM nation
),
pts AS (
  SELECT c_custkey, c_acctbal,
         CAST((c_custkey * 13) % 100 AS BIGINT) AS px,
         CAST((c_custkey * 29) % 100 AS BIGINT) AS py
  FROM customer
),
scored AS (
  SELECT c_custkey, c_acctbal, sensor_id,
         (px - sx) * (px - sx) + (py - sy) * (py - sy) AS d2,
         ROW_NUMBER() OVER (
           PARTITION BY c_custkey
           ORDER BY (px - sx) * (px - sx) + (py - sy) * (py - sy), sensor_id
         ) AS rn
  FROM pts CROSS JOIN sensors
)
SELECT sensor_id,
       COUNT(*) AS n_customers,
       CAST(round(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 4) AS DOUBLE)
         AS total_acctbal,
       MIN(d2) AS min_d2,
       MAX(d2) AS max_d2
FROM scored WHERE rn = 1
GROUP BY sensor_id
"""

# E2+: commit-log transactional MERGE — both versions rolled up.
# Scale-6 decimal cast: merged prices carry 6 decimal digits and
# rounding a double to 2 places diverges between engines near .xx5.
_TX_MERGE_SQL = """
WITH e AS (
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'
),
u AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(7,4))
              AS DOUBLE) AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderdate >= TIMESTAMP '1994-01-01'
),
merged AS (
  SELECT COALESCE(e.o_orderkey, u.o_orderkey) AS o_orderkey,
         CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
              ELSE e.o_totalprice END AS o_totalprice,
         CASE WHEN e.o_orderkey IS NOT NULL THEN e.o_orderpriority
              ELSE u.o_orderpriority END AS o_orderpriority
  FROM e FULL OUTER JOIN u ON e.o_orderkey = u.o_orderkey
),
v0 AS (
  SELECT o_orderpriority, COUNT(*) AS n_orders,
         CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 4) AS DOUBLE)
           AS total_price,
         0 AS version
  FROM e GROUP BY o_orderpriority
),
v1 AS (
  SELECT o_orderpriority, COUNT(*) AS n_orders,
         CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 4) AS DOUBLE)
           AS total_price,
         1 AS version
  FROM merged GROUP BY o_orderpriority
)
SELECT * FROM v0 UNION ALL SELECT * FROM v1
"""

_TX_QUARANTINE_SQL = """
WITH e AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderpriority
  FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'
),
u AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 89 = 0 THEN 'ZZ' ELSE 'XX' END
           AS o_orderstatus,
         CASE WHEN o_orderkey % 97 = 0 THEN -1e0 ELSE 1e0 END
           * CAST(CAST(o_totalprice AS DECIMAL(12,2))
                  * CAST(1.1 AS DECIMAL(7,4)) AS DOUBLE)
           AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderdate >= TIMESTAMP '1994-01-01'
),
valid AS (
  SELECT * FROM u
  WHERE o_totalprice > 0 AND o_orderstatus IN ('O', 'F', 'P', 'XX')
),
merged AS (
  SELECT COALESCE(e.o_orderkey, v.o_orderkey) AS o_orderkey,
         CASE WHEN v.o_orderkey IS NOT NULL THEN v.o_totalprice
              ELSE e.o_totalprice END AS o_totalprice,
         CASE WHEN e.o_orderkey IS NOT NULL THEN e.o_orderpriority
              ELSE v.o_orderpriority END AS o_orderpriority
  FROM e FULL OUTER JOIN valid v ON e.o_orderkey = v.o_orderkey
)
SELECT 'final' AS kind, o_orderpriority AS "key", COUNT(*) AS n_rows,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 4) AS DOUBLE)
         AS total_price
FROM merged GROUP BY o_orderpriority
UNION ALL
SELECT 'quarantine' AS kind, 'positive_price' AS "key",
       COUNT(*) AS n_rows,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 4) AS DOUBLE)
         AS total_price
FROM u WHERE NOT (o_totalprice > 0)
UNION ALL
SELECT 'quarantine' AS kind, 'known_status' AS "key",
       COUNT(*) AS n_rows,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 4) AS DOUBLE)
         AS total_price
FROM u WHERE NOT (o_orderstatus IN ('O', 'F', 'P', 'XX'))
"""

# --- registry ----------------------------------------------------------

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {
    # Group G analytics
    "g1_pricing_summary": (analytics.pricing_summary, _PRICING_SUMMARY_SQL),
    "g1_success_rate": (analytics.success_rate_by_group, _SUCCESS_RATE_SQL),
    "g2_revenue_by_nation": (analytics.revenue_by_nation, _REVENUE_BY_NATION_SQL),
    "g3_top_k_per_group": (analytics.top_k_per_group, _TOP_K_SQL),
    "g4_yearly_trend": (analytics.yearly_trend, _YEARLY_TREND_SQL),
    "g3_market_share_window": (analytics.market_share_window, _MARKET_SHARE_SQL),
    # Reference pipeline composites (B3/D1/D2/E2/E3)
    "b3_d1_d2_population_explode": (
        pipeline.population_explode_pipeline,
        _POPULATION_EXPLODE_SQL,
    ),
    "ep3_flagship_pipeline": (pipeline.flagship_pipeline, _FLAGSHIP_SQL),
    "e2_orders_upsert": (pipeline.orders_upsert, _ORDERS_UPSERT_SQL),
    "e3_duplicate_keys": (pipeline.orders_duplicate_keys, _DUPLICATE_KEYS_SQL),
    # C2/C3 parse semantics
    "c2_parse_long": (parsing_demo.parse_long_demo, oracles_h.PARSE_LONG_DEMO),
    "c3_parse_unit": (parsing_demo.parse_unit_demo, oracles_h.PARSE_UNIT_DEMO),
    # H4 event-time windows
    "h4_hourly_event_agg": (events.hourly_event_agg, oracles_h.HOURLY_EVENT_AGG),
    "h4_rolling_hour_counts": (
        events.rolling_hour_counts,
        oracles_h.ROLLING_HOUR_COUNTS,
    ),
    "h4_sessionize": (events.sessionize, oracles_h.SESSIONIZE),
    "h4_json_props_agg": (events.json_props_agg, oracles_h.JSON_PROPS_AGG),
    "h4_json_map_explode": (
        events.json_map_explode,
        oracles_h.JSON_MAP_EXPLODE,
    ),
    # H3 text analysis
    "h3_doc_stats": (textanalysis.doc_stats, oracles_h.DOC_STATS),
    "h3_token_top_k": (textanalysis.token_top_k, oracles_h.TOKEN_TOP_K),
    "h3_quality_score": (textanalysis.quality_score, oracles_h.QUALITY_SCORE),
    "h3_language_profile": (
        textanalysis.language_profile,
        oracles_h.LANGUAGE_PROFILE,
    ),
    "h3_language_id": (textanalysis.language_id, oracles_h.LANGUAGE_ID),
    "h3_fingerprint_docs": (
        textanalysis.fingerprint_docs,
        oracles_h.FINGERPRINT_DOCS,
    ),
    "h3_regex_token_stats": (
        textanalysis.regex_token_stats,
        oracles_h.REGEX_TOKEN_STATS,
    ),
    "h3_rolling_fingerprint": (
        textanalysis.rolling_fingerprint,
        oracles_h.ROLLING_FINGERPRINT,
    ),
    # H1 dedup
    "h1_exact_dup_groups": (dedup.exact_dup_groups, oracles_h.EXACT_DUP_GROUPS),
    "h1_minhash_lsh_pairs": (
        dedup.minhash_lsh_pairs,
        oracles_h.MINHASH_LSH_PAIRS,
    ),
    "h1_simhash_signatures": (
        dedup.simhash_signatures,
        oracles_h.SIMHASH_SIGNATURES,
    ),
    "h1_jaccard_pairs": (dedup.jaccard_pairs, oracles_h.JACCARD_PAIRS),
    "h1_edit_distance_pairs": (
        dedup.edit_distance_pairs,
        oracles_h.EDIT_DISTANCE_PAIRS,
    ),
    "h1_dedup_clusters": (dedup.dedup_clusters, oracles_h.DEDUP_CLUSTERS),
    # H1 incremental: cluster labels updated from a new arrival's
    # pairs + the old components' star contraction — never re-walking
    # old edges; must equal from-scratch CC (same oracle)
    "h1_incremental_dedup_clusters": (
        dedup.incremental_dedup_clusters,
        oracles_h.DEDUP_CLUSTERS,
    ),
    # H6 deterministic sampling
    "h6_stratified_sample": (
        sampling.stratified_sample,
        oracles_h.STRATIFIED_SAMPLE,
    ),
    # H2 similarity search
    "h2_cosine_topk": (simsearch.cosine_topk, oracles_h.COSINE_TOPK),
    "h2_ann_bucketed_topk": (
        simsearch.ann_bucketed_topk,
        oracles_h.ANN_BUCKETED_TOPK,
    ),
    "h1_embedding_near_dup": (
        simsearch.embedding_near_dup,
        oracles_h.EMBEDDING_NEAR_DUP,
    ),
    # Normalize composite — the reference's ingest soul in one plan
    "c1_c8_normalize_harvest": (
        normalize_demo.normalize_harvest_pipeline,
        oracles_f.NORMALIZE_HARVEST,
    ),
    # H1 simhash near-dup (banded candidates + exact hamming verify)
    "h1_simhash_near_dup": (
        dedup.simhash_near_dup,
        oracles_h.SIMHASH_NEAR_DUP,
    ),
    # Group F relational completion
    "f_rollup_order_totals": (
        relational.rollup_order_totals,
        oracles_f.ROLLUP_ORDER_TOTALS,
    ),
    "f_cube_flag_status": (
        relational.cube_flag_status,
        oracles_f.CUBE_FLAG_STATUS,
    ),
    "f_grouping_sets_orders": (
        relational.grouping_sets_orders,
        oracles_f.GROUPING_SETS_ORDERS,
    ),
    "f_window_functions": (
        relational.window_function_showcase,
        oracles_f.WINDOW_FUNCTION_SHOWCASE,
    ),
    # F: fact-fact join off co-bucketed tables — exchange-free join
    "f_smb_colocated_join": (
        relational.smb_colocated_join,
        oracles_f.SMB_COLOCATED_JOIN,
    ),
    "f_set_ops_repeat_buyers": (
        relational.set_ops_repeat_buyers,
        oracles_f.SET_OPS_REPEAT_BUYERS,
    ),
    "f_semi_join_big_spenders": (
        relational.semi_join_big_spenders,
        oracles_f.SEMI_JOIN_BIG_SPENDERS,
    ),
    "f_anti_join_inactive_customers": (
        relational.anti_join_inactive_customers,
        oracles_f.ANTI_JOIN_INACTIVE_CUSTOMERS,
    ),
    "f_asof_join_error_context": (
        relational.asof_join_error_context,
        oracles_f.ASOF_JOIN_ERROR_CONTEXT,
    ),
    "f_range_join_value_bands": (
        relational.range_join_value_bands,
        oracles_f.RANGE_JOIN_VALUE_BANDS,
    ),
    "f_date_parts_monthly": (
        relational.date_parts_monthly,
        oracles_f.DATE_PARTS_MONTHLY,
    ),
    "f_pivot_event_counts": (
        relational.pivot_event_counts,
        oracles_f.PIVOT_EVENT_COUNTS,
    ),
    "f_stats_moments": (
        relational.stats_moments,
        oracles_f.STATS_MOMENTS,
    ),
    "f_date_spine_monthly": (
        relational.date_spine_monthly,
        oracles_f.DATE_SPINE_MONTHLY,
    ),
    "f_sql_text_interface": (
        relational.sql_text_interface,
        oracles_f.SQL_TEXT_INTERFACE,
    ),
    "f_q3_shipping_priority": (
        relational.q3_shipping_priority,
        oracles_f.Q3_SHIPPING_PRIORITY,
    ),
    "f_above_avg_orders": (
        relational.above_avg_orders,
        oracles_f.ABOVE_AVG_ORDERS,
    ),
    # H5 sketch / approximate aggregation
    "h5_exact_distinct_quantiles": (
        approx.exact_distinct_quantiles,
        oracles_f.EXACT_DISTINCT_QUANTILES,
    ),
    # value-level oracle via claim booleans (r11 upgrade from
    # rows-only — see approx_aggs docstring)
    "h5_approx_aggs": (approx.approx_aggs, oracles_h.APPROX_AGGS),
    # Multimodal binary-column pipelines (mapInPandas plumbing)
    "mm_decode_meta": (multimodal.decode_meta, oracles_f.MM_DECODE_META),
    "mm_frame_sample": (multimodal.frame_sample, oracles_f.MM_FRAME_SAMPLE),
    # H4 true Structured Streaming (deterministic on the bounded fixture)
    "h4_streaming_hourly_agg": (
        structured.streaming_hourly_agg,
        oracles_f.STREAMING_HOURLY_AGG,
    ),
    "h4_streaming_sessionize": (
        structured.streaming_sessionize,
        oracles_h.SESSIONIZE,
    ),
    # H4: sessions emitted exactly once, on EventTimeTimeout close
    "h4_streaming_session_timeout": (
        structured.streaming_session_timeout,
        oracles_h.SESSIONIZE,
    ),
    # Group F third wave — outer-join distribution, EXISTS, dual-role
    # dimension, argmin join-back, multi-distinct
    "f_q13_customer_distribution": (
        relational.q13_customer_distribution,
        oracles_f.Q13_CUSTOMER_DISTRIBUTION,
    ),
    "f_q4_priority_exists": (
        relational.q4_priority_exists,
        oracles_f.Q4_PRIORITY_EXISTS,
    ),
    "f_q7_volume_shipping": (
        relational.q7_volume_shipping,
        oracles_f.Q7_VOLUME_SHIPPING,
    ),
    "f_argmin_cheapest_per_brand": (
        relational.argmin_cheapest_per_brand,
        oracles_f.ARGMIN_CHEAPEST_PER_BRAND,
    ),
    "f_multi_distinct_monthly": (
        relational.multi_distinct_monthly,
        oracles_f.MULTI_DISTINCT_MONTHLY,
    ),
    # H2 IVF with computed coarse quantizer
    "h2_ivf_topk": (simsearch.ivf_topk, oracles_h.IVF_TOPK),
    "f_q5_local_supplier_volume": (
        relational.q5_local_supplier_volume,
        oracles_f.Q5_LOCAL_SUPPLIER_VOLUME,
    ),
    "f_histogram_order_values": (
        relational.histogram_order_values,
        oracles_f.HISTOGRAM_ORDER_VALUES,
    ),
    # H4 stream-static dimension enrich
    "h4_stream_static_join": (
        structured.streaming_enriched_counts,
        oracles_f.STREAM_STATIC_ENRICHED,
    ),
    # E2 SCD2 history, F unpivot, H4 stream-stream join
    "e2_scd2_history": (
        pipeline.scd2_priority_history,
        oracles_f.SCD2_PRIORITY_HISTORY,
    ),
    "f_unpivot_metrics": (
        relational.unpivot_flag_metrics,
        oracles_f.UNPIVOT_FLAG_METRICS,
    ),
    "h4_stream_stream_join": (
        structured.streaming_click_attribution,
        oracles_f.STREAM_CLICK_ATTRIBUTION,
    ),
    # H3 corpus statistics wave
    "h3_tfidf_top_terms": (
        textanalysis.tfidf_top_terms,
        oracles_h.TFIDF_TOP_TERMS,
    ),
    "h3_type_token_ratio": (
        textanalysis.type_token_ratio,
        oracles_h.TYPE_TOKEN_RATIO,
    ),
    "h3_bigram_counts": (
        textanalysis.bigram_counts,
        oracles_h.BIGRAM_COUNTS,
    ),
    # G4 window frames, A5 glob scan, scale-path salted join
    "g4_moving_avg": (
        analytics.moving_avg_revenue,
        oracles_f.MOVING_AVG_REVENUE,
    ),
    "a5_glob_scan": (
        pipeline.glob_scan_summary,
        oracles_f.GLOB_SCAN_SUMMARY,
    ),
    "f_salted_skew_join": (
        relational.salted_skew_join,
        oracles_f.SALTED_SKEW_JOIN,
    ),
    # F: disjunctive predicates, null-safe equality, arg-extrema
    "f_disjunctive_join": (
        relational.disjunctive_join,
        oracles_f.DISJUNCTIVE_JOIN,
    ),
    "f_null_safe_join": (
        relational.null_safe_join,
        oracles_f.NULL_SAFE_JOIN,
    ),
    "f_argminmax_per_customer": (
        relational.argminmax_per_customer,
        oracles_f.ARGMINMAX_PER_CUSTOMER,
    ),
    # H4 streaming dedup under watermark
    "h4_streaming_dedup": (
        structured.streaming_dedup_counts,
        oracles_f.STREAMING_DEDUP_COUNTS,
    ),
    # F: conditional aggregation, pagination; D2 ordinal explode
    "f_conditional_agg": (
        relational.conditional_agg_by_priority,
        oracles_f.CONDITIONAL_AGG_BY_PRIORITY,
    ),
    "f_paginated_top_orders": (
        relational.paginated_top_orders,
        oracles_f.PAGINATED_TOP_ORDERS,
    ),
    # F: keyset (seek) pagination — same page, O(page) at any depth
    "f_keyset_pagination": (
        relational.keyset_paginated_orders,
        oracles_f.KEYSET_PAGINATED_ORDERS,
    ),
    "d2_posexplode_tokens": (
        textanalysis.posexplode_leading_tokens,
        oracles_f.POSEXPLODE_LEADING_TOKENS,
    ),
    # E4 drift audit — value-level oracle from catalog metadata
    # (information_schema replays the mergeSchema discovery; r11
    # upgrade from rows-only, VERDICT r10 ask #4)
    "e4_drift_audit": (pipeline.drift_audit_query, oracles_f.DRIFT_AUDIT),
    # A4 partitioned sink + partition-pruned read, oracle-matched
    "a4_partition_roundtrip": (
        pipeline.partition_roundtrip,
        oracles_f.PARTITION_ROUNDTRIP,
    ),
    # A7/E5 incremental skip: anti-join work list, oracle-matched
    "a7_pending_work": (
        pipeline.pending_work_summary,
        oracles_f.PENDING_WORK,
    ),
    # H1 asymmetric containment, F exact corr + collection aggregates
    "h1_containment_pairs": (
        dedup.containment_pairs,
        oracles_h.CONTAINMENT_PAIRS,
    ),
    "f_corr_qty_price": (
        relational.corr_qty_price,
        oracles_f.CORR_QTY_PRICE,
    ),
    "f_array_agg_years": (
        relational.array_agg_active_years,
        oracles_f.ARRAY_AGG_ACTIVE_YEARS,
    ),
    # TPC-H completion wave (plans.tpch) — the query shapes not yet
    # covered by relational/analytics, on the slimmer driver fixtures
    "f_q6_forecast_revenue": (
        tpch.q6_forecast_revenue,
        oracles_tpch.Q6_FORECAST_REVENUE,
    ),
    "f_q10_returned_items": (
        tpch.q10_returned_items,
        oracles_tpch.Q10_RETURNED_ITEMS,
    ),
    "f_q12_late_shipment": (
        tpch.q12_late_shipment_priority,
        oracles_tpch.Q12_LATE_SHIPMENT,
    ),
    "f_q14_promo_revenue": (
        tpch.q14_promo_revenue,
        oracles_tpch.Q14_PROMO_REVENUE,
    ),
    "f_q15_top_supplier": (
        tpch.q15_top_supplier,
        oracles_tpch.Q15_TOP_SUPPLIER,
    ),
    "f_q17_small_quantity": (
        tpch.q17_small_quantity_revenue,
        oracles_tpch.Q17_SMALL_QUANTITY,
    ),
    "f_q18_large_volume": (
        tpch.q18_large_volume_customers,
        oracles_tpch.Q18_LARGE_VOLUME,
    ),
    "f_q8_market_share": (
        tpch.q8_market_share,
        oracles_tpch.Q8_MARKET_SHARE,
    ),
    "f_q9_product_profit": (
        tpch.q9_product_profit,
        oracles_tpch.Q9_PRODUCT_PROFIT,
    ),
    "f_q11_important_stock": (
        tpch.q11_important_stock,
        oracles_tpch.Q11_IMPORTANT_STOCK,
    ),
    "f_q16_supplier_part_counts": (
        tpch.q16_supplier_part_counts,
        oracles_tpch.Q16_SUPPLIER_PART_COUNTS,
    ),
    "f_q2_min_cost_supplier": (
        tpch.q2_min_cost_supplier,
        oracles_tpch.Q2_MIN_COST_SUPPLIER,
    ),
    "f_q20_majority_shippers": (
        tpch.q20_majority_shippers,
        oracles_tpch.Q20_MAJORITY_SHIPPERS,
    ),
    "f_q21_waiting_suppliers": (
        tpch.q21_waiting_suppliers,
        oracles_tpch.Q21_WAITING_SUPPLIERS,
    ),
    "f_q22_sales_opportunity": (
        tpch.q22_sales_opportunity,
        oracles_tpch.Q22_SALES_OPPORTUNITY,
    ),
    # EP1 ingestion chain: A2 mapInPandas extraction + A3 grid pivot
    # with cross-page offsets + C1/B1/C2/C3 normalize, end-to-end
    "a2_a3_pdf_ingest": (
        ingest_demo.pdf_ingest_pipeline,
        oracles_tpch.PDF_INGEST_PIPELINE,
    ),
    # Python UDF family: all four Arrow-vectorized shapes
    "udf_scalar_token_stats": (
        pandas_udfs.udf_scalar_token_stats,
        oracles_tpch.UDF_SCALAR_TOKEN_STATS,
    ),
    "udf_grouped_agg_floorsum": (
        pandas_udfs.udf_grouped_agg_floorsum,
        oracles_tpch.UDF_GROUPED_AGG_FLOORSUM,
    ),
    "udf_grouped_map_neighbors": (
        pandas_udfs.udf_grouped_map_neighbors,
        oracles_tpch.UDF_GROUPED_MAP_NEIGHBORS,
    ),
    "udf_cogrouped_order_profile": (
        pandas_udfs.udf_cogrouped_order_profile,
        oracles_tpch.UDF_COGROUPED_ORDER_PROFILE,
    ),
    # Window distribution functions + higher-order array functions
    "f_window_distribution": (
        relational.window_distribution_functions,
        oracles_tpch.WINDOW_DISTRIBUTION_FUNCTIONS,
    ),
    "f_higher_order_arrays": (
        relational.higher_order_array_functions,
        oracles_tpch.HIGHER_ORDER_ARRAY_FUNCTIONS,
    ),
    # Scalar/collection function families (plans.funcfamilies)
    "f_array_set_ops": (funcfamilies.array_set_ops, oracles_f.ARRAY_SET_OPS),
    "f_string_functions": (
        funcfamilies.string_function_suite,
        oracles_f.STRING_FUNCTION_SUITE,
    ),
    "f_date_arithmetic": (
        funcfamilies.date_arithmetic,
        oracles_f.DATE_ARITHMETIC,
    ),
    "f_map_functions": (funcfamilies.map_functions, oracles_f.MAP_FUNCTIONS),
    "mm_resize_media": (multimodal.resize_media, oracles_f.MM_RESIZE_MEDIA),
    "f_nested_struct_roundtrip": (
        funcfamilies.nested_struct_roundtrip,
        oracles_f.NESTED_STRUCT_ROUNDTRIP,
    ),
    # Streaming CDC upsert: foreachBatch applying the E2 merge operator
    "h4_streaming_upsert": (
        structured.streaming_upsert,
        oracles_f.STREAMING_UPSERT,
    ),
    "f_try_arithmetic": (
        funcfamilies.try_arithmetic,
        oracles_f.TRY_ARITHMETIC,
    ),
    "f_bitwise_ops": (funcfamilies.bitwise_ops, oracles_f.BITWISE_OPS),
    "f_conditional_scalars": (
        funcfamilies.conditional_scalars,
        oracles_f.CONDITIONAL_SCALARS,
    ),
    "udf_table_function": (
        funcfamilies.udf_table_function,
        oracles_f.UDF_TABLE_FUNCTION,
    ),
    "a8_sql_ddl_roundtrip": (
        funcfamilies.sql_ddl_roundtrip,
        oracles_f.SQL_DDL_ROUNDTRIP,
    ),
    # Text-format sources (CSV/JSON) + native session windows
    "a5_csv_roundtrip": (pipeline.csv_roundtrip, oracles_f.CSV_ROUNDTRIP),
    "a5_json_roundtrip": (pipeline.json_roundtrip, oracles_f.JSON_ROUNDTRIP),
    "h4_session_window_builtin": (
        events.session_window_builtin,
        oracles_f.SESSION_WINDOW_BUILTIN,
    ),
    # H4: per-event dynamic gap — the session-policy surface
    "h4_session_window_dynamic_gap": (
        events.session_window_dynamic_gap,
        oracles_h.SESSION_WINDOW_DYNAMIC_GAP,
    ),
    "e1_stage_full_refresh": (
        pipeline.stage_full_refresh,
        oracles_f.STAGE_FULL_REFRESH,
    ),
    "udf_grouped_map_arrow": (
        pandas_udfs.udf_grouped_map_arrow,
        oracles_f.UDF_GROUPED_MAP_ARROW,
    ),
    "mm_audio_windows": (multimodal.audio_windows, oracles_f.MM_AUDIO_WINDOWS),
    # Multimodal: VAD-style segmentation — decode seam feeds pure
    # relational gaps-and-islands (integer energy gate)
    "mm_audio_energy_segments": (
        multimodal.audio_energy_segments,
        oracles_f.MM_AUDIO_SEGMENTS,
    ),
    # Multimodal -> retrieval handoff: patchify (mapInPandas) ->
    # pooled integer embedding -> exact top-3, one oracle-checked plan
    "mm_patch_embed_search": (
        multimodal.patch_embed_search,
        oracles_f.MM_PATCH_EMBED_SEARCH,
    ),
    "h2_pq_topk": (simsearch.pq_topk, oracles_h.PQ_TOPK),
    # H6 training-data pipeline operators (plans.traindata)
    "h6_sequence_packing": (
        traindata.sequence_packing,
        oracles_h.SEQUENCE_PACKING,
    ),
    # H6: true next-fit packing (stateful grouped-map; recursive-CTE
    # oracle replays the same fold)
    "h6_greedy_packing": (
        traindata.greedy_packing,
        oracles_h.GREEDY_PACKING,
    ),
    "h6_contamination_check": (
        traindata.contamination_check,
        oracles_h.CONTAMINATION_CHECK,
    ),
    "h6_repetition_filter": (
        traindata.repetition_filter,
        oracles_h.REPETITION_FILTER,
    ),
    "h6_dedup_apply": (traindata.dedup_apply, oracles_h.DEDUP_APPLY),
    "h6_domain_upsample": (
        traindata.domain_upsample,
        oracles_h.DOMAIN_UPSAMPLE,
    ),
    "h3_bpe_token_count": (
        textanalysis.bpe_token_count,
        oracles_h.BPE_TOKEN_COUNT,
    ),
    # H6 corpus-shaping wave 2: PII, quality gates, boilerplate, mixing
    "h6_pii_redaction": (traindata.pii_redaction, oracles_h.PII_REDACTION),
    "h6_quality_rules": (traindata.quality_rules, oracles_h.QUALITY_RULES),
    "h6_url_strip": (traindata.url_strip, oracles_h.URL_STRIP),
    "h6_mixture_weights": (
        traindata.mixture_weights,
        oracles_h.MIXTURE_WEIGHTS,
    ),
    # H4 funnel + H2 quantization / diversified re-rank
    "h4_funnel_stages": (events.funnel_stages, oracles_h.FUNNEL_STAGES),
    "h2_int8_quantize": (simsearch.int8_quantize, oracles_h.INT8_QUANTIZE),
    # greedy argmax chain — not one-statement SQL; rows-only check
    "h2_mmr_rerank": (simsearch.mmr_rerank, oracles_h.MMR_RERANK),
    # SemDeDup: fixed-point k-means + within-cluster cosine dedup
    "h1_semdedup_kmeans": (
        simsearch.semdedup_kmeans,
        oracles_h.SEMDEDUP_KMEANS,
    ),
    # CCNet-style LM quality surrogate + tokenizer-vocab OOV audit
    "h6_rare_token_score": (
        traindata.rare_token_score,
        oracles_h.RARE_TOKEN_SCORE,
    ),
    "h6_tokenizer_vocab": (
        traindata.tokenizer_vocab,
        oracles_h.TOKENIZER_VOCAB,
    ),
    # H6: BPE merge training — per-round pair-count shuffle, broadcast
    # top-1 winner, order-pinned greedy merge fold; collect-free
    "h6_bpe_train_merges": (
        traindata.bpe_train_merges,
        oracles_h.BPE_TRAIN_MERGES,
    ),
    # H6: apply the learned merges — encode once per DISTINCT word
    # (vocabulary-sized), join back; per-source compression trajectory
    "h6_bpe_apply_compression": (
        traindata.bpe_apply_compression,
        oracles_h.BPE_APPLY_COMPRESSION,
    ),
    # H6: the release composite — curate -> split -> pack accounting
    "h6_corpus_release_pipeline": (
        traindata.corpus_release_pipeline,
        oracles_h.CORPUS_RELEASE_PIPELINE,
    ),
    # Z-order (Morton) clustered layout — multi-dim pruning stats
    "a4_zorder_layout": (pipeline.zorder_layout, oracles_f.ZORDER_LAYOUT),
    # End-to-end curation funnel (quality → exact dedup → LSH drop)
    "h6_curation_pipeline": (
        traindata.curation_pipeline,
        oracles_h.CURATION_PIPELINE,
    ),
    # Fixed-point PageRank over the synthesized link graph
    "h6_pagerank_weights": (
        graph.pagerank_weights,
        oracles_h.PAGERANK_WEIGHTS,
    ),
    # Spark 4 WITH RECURSIVE — hierarchy chain-length distribution
    "f_recursive_hierarchy": (
        relational.recursive_hierarchy,
        oracles_f.RECURSIVE_HIERARCHY,
    ),
    # Deterministic hash-bucket train/val/test split
    "h6_train_val_test_split": (
        traindata.train_val_test_split,
        oracles_h.TRAIN_VAL_TEST_SPLIT,
    ),
    # E5+: merge snapshot+delta partial aggregates == full recompute
    "e5_incremental_rollup": (
        pipeline.incremental_rollup,
        oracles_f.INCREMENTAL_ROLLUP,
    ),
    # Spark 4 VARIANT-typed semi-structured extraction
    "h4_variant_props": (events.variant_props, oracles_h.VARIANT_PROPS),
    # DataSketches HLL partition-merge (rows-only: binary sketches are
    # engine-specific; mergeability proven in tests/test_extensions.py)
    "h5_hll_partition_merge": (
        approx.hll_partition_merge,
        oracles_h.HLL_PARTITION_MERGE,
    ),
    # Spark 4 Python DataSource API — custom partition-parallel source
    "a1_python_datasource": (
        ingest_demo.python_datasource_feed,
        oracles_f.PYTHON_DATASOURCE_FEED,
    ),
    # Write-side twin: Python DataSource SINK with two-phase manifest
    # commit — staged task files, driver-side publish, orphan-proof
    "a1_python_datasource_writer": (
        python_sink.python_datasource_writer,
        oracles_f.PYTHON_DATASOURCE_WRITER,
    ),
    # Scalar arrow_udf — Arrow arrays in/out, no pandas conversion
    "udf_arrow_scalar": (
        pandas_udfs.udf_arrow_scalar,
        oracles_f.UDF_ARROW_SCALAR,
    ),
    # The eighth Arrow shape: free-form RecordBatch map, no pandas
    "udf_map_in_arrow": (
        pandas_udfs.udf_map_in_arrow,
        oracles_f.UDF_MAP_IN_ARROW,
    ),
    # Spark 4 SQL UDFs (scalar + correlated LATERAL table function)
    "a8_sql_udf_roundtrip": (
        funcfamilies.sql_udf_roundtrip,
        oracles_f.SQL_UDF_ROUNDTRIP,
    ),
    # Native XML source (Spark 4) — land, read back, aggregate
    "a5_xml_roundtrip": (pipeline.xml_roundtrip, oracles_f.XML_ROUNDTRIP),
    # Flesch reading-ease corpus quality signal
    "h3_readability_score": (
        textanalysis.readability_score,
        oracles_h.READABILITY_SCORE,
    ),
    # One-row corpus dataset card
    "h6_dataset_card": (traindata.dataset_card, oracles_h.DATASET_CARD),
    # Stateful streaming funnel — same oracle as the batch funnel
    "h4_streaming_funnel": (
        structured.streaming_funnel,
        oracles_h.FUNNEL_STAGES,
    ),
    # ANN recall@k audit: bucketed ANN vs exact ground truth
    "h2_ann_recall_audit": (
        simsearch.ann_recall_audit,
        oracles_h.ANN_RECALL_AUDIT,
    ),
    # PPJoin-style prefix-filtering similarity join (exact, no FN)
    "h1_prefix_filter_join": (
        dedup.prefix_filter_join,
        oracles_h.PREFIX_FILTER_JOIN,
    ),
    # C4-style sub-document (segment) dedup accounting
    "h1_line_dedup_stats": (
        dedup.line_dedup_stats,
        oracles_h.LINE_DEDUP_STATS,
    ),
    # Watermark lateness audit (streaming-ops observability, batch replay)
    "h4_lateness_audit": (
        events.watermark_lateness_audit,
        oracles_h.WATERMARK_LATENESS_AUDIT,
    ),
    # Additive schema evolution via mergeSchema scan
    "a6_schema_merge_scan": (
        pipeline.schema_merge_scan,
        oracles_f.SCHEMA_MERGE_SCAN,
    ),
    # G5: weather-dimension correlation join (synthesized weather)
    "g5_weather_correlation": (
        analytics.weather_correlation,
        _WEATHER_CORR_SQL,
    ),
    # E2+: transactional MERGE + time travel (commit-log table)
    "e2_tx_merge_timetravel": (
        pipeline.tx_merge_timetravel,
        _TX_MERGE_SQL,
    ),
    # E2+: file-pruned MERGE (footer-stat data skipping) — same oracle
    "e2_tx_merge_pruned": (pipeline.tx_merge_pruned, _TX_MERGE_SQL),
    # E2+: order-aware MERGE (guarded update — WHEN MATCHED AND
    # s.guard > t.guard): newer/stale/tie/insert buckets in one batch
    "e2_tx_guarded_merge": (
        pipeline.tx_guarded_merge,
        oracles_f.TX_GUARDED_MERGE,
    ),
    # E2+: row-level DELETE (copy-on-write, file-pruned) + RESTORE
    # (metadata-only rollback) through the commit-log table
    "e2_tx_delete_restore": (
        pipeline.tx_delete_restore,
        oracles_f.TX_DELETE_RESTORE,
    ),
    # E2+: row-level UPDATE + change data feed between versions
    "e2_tx_update_change_feed": (
        pipeline.tx_update_change_feed,
        oracles_f.TX_UPDATE_CHANGE_FEED,
    ),
    # H4 × E2+: streaming source tailing the commit-log table (one
    # commit per micro-batch; insert-only contract enforced)
    "h4_streaming_tx_source": (
        structured.streaming_tx_source,
        oracles_f.TX_STREAM_SOURCE,
    ),
    # E2+: merge-on-read DELETE (deletion vectors: positions in the
    # commit, zero data movement; reads anti-join the vector)
    "e2_tx_dv_delete": (
        pipeline.tx_dv_delete,
        oracles_f.TX_DV_DELETE,
    ),
    # E2+/A4+: Z-order clustering + stats-pruned keyed delete (the
    # in-plan assertion proves files were skipped via log stats)
    "e2_tx_zorder_pruned_delete": (
        pipeline.tx_zorder_pruned_delete,
        oracles_f.TX_ZORDER_PRUNED_DELETE,
    ),
    # E2+/A6: schema-enforced append + additive evolution in the log
    "e2_tx_append_evolution": (
        pipeline.tx_append_evolution,
        oracles_f.TX_APPEND_EVOLUTION,
    ),
    # Symlink-manifest export: frozen v1 view for log-unaware engines
    "e2_tx_manifest_export": (
        pipeline.tx_manifest_export,
        oracles_f.TX_MANIFEST_EXPORT,
    ),
    # Bloom file-skip index: point lookups open O(probes) files
    # E2+: parquet bloom sidecar, candidates via broadcast-probe join,
    # DV-deleted probe key still pruned (never unpruned-fallback)
    "e2_tx_bloom_table_lookup": (
        pipeline.tx_bloom_table_lookup,
        oracles_f.TX_BLOOM_TABLE_LOOKUP,
    ),
    # E2+: TIMESTAMP AS OF time travel — commit-clock resolution,
    # between-commit reads serve the earlier commit (asserted in-plan)
    "e2_tx_timetravel_asof": (
        pipeline.tx_timetravel_asof,
        oracles_f.TX_TIMETRAVEL_ASOF,
    ),
    # E2+: Iceberg-style partition specs with evolution — hidden
    # partitioning, metadata-only spec changes, per-era transform-
    # aware pruning from SOURCE-column predicates
    "e2_tx_partition_evolution": (
        pipeline.tx_partition_evolution,
        oracles_f.TX_PARTITION_EVOLUTION,
    ),
    # E2+: VACUUM under a retention window — dry-run law, exact
    # reclaim count, in-window reads unchanged, below-window time
    # travel fails loudly (all asserted in-plan)
    "e2_tx_vacuum_retention": (
        pipeline.tx_vacuum_retention,
        oracles_f.TX_VACUUM_RETENTION,
    ),
    # E2+: write-time bloom maintenance — appends arrive pre-indexed
    # (O(new) refresh), incremental index == full build bit-equal,
    # DV-deleted probe returns nothing (all asserted in-plan)
    "e2_tx_incremental_bloom_index": (
        pipeline.tx_incremental_bloom_index,
        oracles_f.TX_INCREMENTAL_BLOOM_INDEX,
    ),
    # E2+: composite-key find phase — per-column stats intersection
    # AND a composite-key bloom probe; strictly fewer files rewrite
    # than stats alone (asserted in-query)
    "e2_tx_composite_pruned_merge": (
        pipeline.tx_composite_pruned_merge,
        oracles_f.TX_COMPOSITE_PRUNED_MERGE,
    ),
    # E2+: the find phase AS A DATAFRAME over a parquet actions
    # checkpoint — planner equivalence with the driver-loop find
    # asserted set-for-set in-plan (the 10⁷-file posture)
    # E2+ (NEW r11): declared bronze->silver->gold DAG with
    # expectations - runner owns topo order, warehouse_tx commits,
    # quarantine routing; gold rollup + per-expectation counts both
    # hash-checked
    "e2_tx_declarative_pipeline": (
        pipeline.tx_declarative_pipeline,
        oracles_f.TX_DECLARATIVE_PIPELINE,
    ),
    # E2+ (NEW r12): cross-table atomic commit for the declarative
    # DAG — unpublished per-table versions + one manifest swap; the
    # mid-pipeline reader proof is in-query (all-or-none visibility)
    "e2_tx_atomic_pipeline": (
        pipeline.tx_atomic_pipeline,
        oracles_f.TX_ATOMIC_PIPELINE,
    ),
    # E2+ (NEW r12): append-mode declarative tables — inputs arrive
    # as manifest-cursor deltas, outputs append exactly-once per
    # publish; the incremental law is asserted in-plan
    "e2_tx_incremental_pipeline": (
        pipeline.tx_incremental_pipeline,
        oracles_f.TX_INCREMENTAL_PIPELINE,
    ),
    # E2+ (NEW r13): pipeline-level multi-writer OCC — two run_atomic
    # updates race the manifest; the loser CAS-aborts, the winner's
    # publish survives, the retry lands (VERDICT r12 task 8)
    "e2_tx_concurrent_pipeline_occ": (
        pipeline.tx_concurrent_pipeline_occ,
        oracles_f.TX_CONCURRENT_PIPELINE_OCC,
    ),
    # E2+ (NEW r14): catalog vacuum under a concurrent reader — a
    # retained historical pipeline version resolved mid-collection
    # stays exact; below-window history/data/claims really go
    # (VERDICT r13 task 7)
    "e2_tx_pipeline_vacuum_readers": (
        pipeline.tx_pipeline_vacuum_readers,
        oracles_f.TX_PIPELINE_VACUUM_READERS,
    ),
    # E2+ (NEW r11): tri-clause MERGE (matched update / not-matched
    # insert / not-matched-by-source delete scoped to a region)
    "e2_tx_merge_sync": (pipeline.tx_merge_sync, oracles_f.TX_MERGE_SYNC),
    # E2+ (NEW r11): metadata-only DROP COLUMN with permanent name
    # retirement (resurrect guards on append evolution and rename)
    "e2_tx_drop_column": (
        pipeline.tx_drop_column,
        oracles_f.TX_DROP_COLUMN,
    ),
    # E2+ (NEW r11): deletion-vector purge - rewrite only the files
    # carrying vectors; answers, untouched files, and the emptied
    # vector state all asserted in-plan
    "e2_tx_dv_purge": (pipeline.tx_dv_purge, oracles_f.TX_DV_PURGE),
    "e2_tx_df_planned_merge": (
        pipeline.tx_df_planned_merge,
        oracles_f.TX_DF_PLANNED_MERGE,
    ),
    # E2+: replaceWhere — predicate region atomically deleted and
    # re-inserted in ONE commit, insert rows contract-checked
    "e2_tx_replace_where": (
        pipeline.tx_replace_where,
        oracles_f.TX_REPLACE_WHERE,
    ),
    # E2+: GENERATED ALWAYS AS — omitted columns computed, provided
    # values enforced (poisoned write refused, asserted in-query)
    "e2_tx_generated_columns": (
        pipeline.tx_generated_columns,
        oracles_f.TX_GENERATED_COLUMNS,
    ),
    # E2+: column-mapping RENAME — metadata-only commit (live file set
    # unchanged, asserted), append+merge under the new name, time
    # travel below the rename serves the old name
    "e2_tx_column_rename": (
        pipeline.tx_column_rename,
        oracles_f.TX_COLUMN_RENAME,
    ),
    # H4 × H5: Count-Min maintained as streaming state keyed on the
    # hash row — linear sketch, so the drained state equals the batch
    # build bit-for-bit; SAME oracle as h5_countmin_heavy_hitters
    "h4_streaming_countmin": (
        structured.streaming_countmin,
        oracles_h.COUNTMIN_HEAVY_HITTERS,
    ),
    # H4: 2σ anomaly stats (n, Σx, Σx²) as streaming state — linear
    # integer moments, drained state == batch aggregate; SAME oracle
    "h4_streaming_anomaly": (
        structured.streaming_anomaly,
        oracles_h.ANOMALY_OUTLIERS,
    ),
    "e2_tx_bloom_pruned_lookup": (
        pipeline.tx_bloom_pruned_lookup,
        oracles_f.TX_BLOOM_PRUNED_LOOKUP,
    ),
    # F: Spark 4 SQL scripting — session variables, EXECUTE IMMEDIATE
    # with USING binding, parameterized sql(args=...), GROUP BY ALL
    "f_sql_variables": (
        relational.sql_variables_interface,
        oracles_f.SQL_VARIABLES_INTERFACE,
    ),
    # E2+: APPLY CHANGES INTO — op-coded CDC feed collapsed to state
    "e2_cdc_apply_changes": (
        pipeline.cdc_apply_changes,
        oracles_f.CDC_APPLY_CHANGES,
    ),
    # H4 × E2+: the complete CDC loop — CDF-mode stream out of the
    # table, APPLY CHANGES collapse downstream, equals the snapshot
    "h4_streaming_cdf_apply": (
        structured.streaming_cdf_apply,
        oracles_f.STREAMING_CDF_APPLY,
    ),
    # H4 × E2+: APPLY CHANGES as a stateful streaming operator —
    # per-key state across the three CDF batches; same oracle as the
    # batch collapse (any cross-batch state loss breaks the hash)
    "h4_streaming_cdc_stateful": (
        structured.streaming_cdc_stateful_apply,
        oracles_f.STREAMING_CDF_APPLY,
    ),
    # H4 × E2+: APPLY CHANGES under OUT-OF-ORDER delivery — a late
    # micro-batch carries lower sequences than state already applied;
    # the sequence guard must reject (and count) the stale images
    "h4_streaming_cdc_late_arrivals": (
        structured.streaming_cdc_late_arrivals,
        oracles_f.STREAMING_CDC_LATE_ARRIVALS,
    ),
    # H4 × E2+: CDF over WRITER-SIDE change files — the merge commits
    # its change images at write time (_cdc/) and the stream reads
    # them partition-per-file; same oracle as the read-time-diff twin
    "h4_streaming_cdf_change_files": (
        structured.streaming_cdf_change_files,
        oracles_f.STREAMING_CDF_APPLY,
    ),
    # H4 x E5: incremental view maintenance off the CDF stream — the
    # rollup is maintained by signed change deltas, never rescanning
    "h4_streaming_cdf_ivm": (
        structured.streaming_cdf_ivm,
        oracles_f.STREAMING_CDF_IVM,
    ),
    # H4: stream-stream LEFT OUTER with watermark-proven null matches
    "h4_streaming_outer_attribution": (
        structured.streaming_outer_attribution,
        oracles_f.STREAMING_OUTER_ATTRIBUTION,
    ),
    # H4 x G4: per-key numeric state across micro-batches — the EWMA
    # fold replays the batch recurrence bit-for-bit (same oracle)
    "h4_streaming_ewma": (
        structured.streaming_ewma,
        oracles_f.EWMA_TREND,
    ),
    # F: TPC-H Q19 — disjunctive OR-of-conjuncts join predicate
    "f_q19_discounted_parts": (
        tpch.q19_discounted_parts,
        oracles_tpch.Q19_DISCOUNTED_PARTS,
    ),
    # C6 as a dedicated row: year regexed from the FILE PATH drives the
    # rollup; the oracle recomputes from o_orderdate (path==data proof)
    "c6_year_from_path": (
        pipeline.year_from_path_rollup,
        oracles_f.C6_YEAR_FROM_PATH,
    ),
    # H1: MinHash estimate vs exact Jaccard error audit (sketch QA)
    "h1_minhash_error_audit": (
        dedup.minhash_error_audit,
        oracles_h.MINHASH_ERROR_AUDIT,
    ),
    # G5 spatial leg: nearest-sensor argmin grid join
    "g5_nearest_sensor_join": (
        analytics.nearest_sensor_join,
        _SENSOR_JOIN_SQL,
    ),
    # A5 format matrix completion: ORC and line-text roundtrips
    "a5_orc_roundtrip": (pipeline.orc_roundtrip, oracles_f.ORC_ROUNDTRIP),
    "a5_text_roundtrip": (pipeline.text_roundtrip, oracles_f.TEXT_ROUNDTRIP),
    # H4: day-cohort retention (d1/d7 return rates)
    "h4_retention_cohorts": (
        events.retention_cohorts,
        oracles_h.RETENTION_COHORTS,
    ),
    # H2: IVF-PQ composition — cell-pruned candidates, ADC scoring
    "h2_ivf_pq_topk": (simsearch.ivf_pq_topk, oracles_h.IVF_PQ_TOPK),
    # A1+ streaming: Python DataSource stream reader, same oracle as
    # the batch connector (loss/duplication across batches breaks it)
    "a1_python_stream_datasource": (
        ingest_demo.python_stream_datasource_feed,
        oracles_f.PYTHON_DATASOURCE_FEED,
    ),
    # H6: DSIR-style importance weighting (target-domain familiarity)
    "h6_dsir_proxy": (traindata.dsir_proxy, oracles_h.DSIR_PROXY),
    # H1 at rest: bucketed LSH self-join (exchange-free candidate
    # mining; same oracle as the shuffle-path minhash_lsh_pairs)
    "h1_bucketed_lsh_pairs": (
        dedup.bucketed_lsh_pairs,
        oracles_h.MINHASH_LSH_PAIRS,
    ),
    # H1 incremental: LSH index MAINTENANCE — batches hash only their
    # own docs and join against the accumulated bucket store; the
    # union of per-batch candidates equals the one-shot self-join
    "h1_incremental_lsh_index": (
        dedup.incremental_lsh_index,
        oracles_h.MINHASH_LSH_PAIRS,
    ),
    # H1 incremental + OPTIMIZE: the index tables bin-packed through
    # the tx log (txn stamps survive compaction — poison replays of
    # every batch id asserted in-query); same oracle
    "h1_lsh_compacted_index": (
        dedup.lsh_compacted_index,
        oracles_h.MINHASH_LSH_PAIRS,
    ),
    # H2: two-stage retrieval cascade — int8-cosine coarse top-C,
    # exact-cosine refine of only the survivors (the FAISS/ScaNN
    # serving shape); the oracle replays both stages
    "h2_ann_cascade_topk": (
        simsearch.ann_cascade_topk,
        oracles_h.ANN_CASCADE_TOPK,
    ),
    # H3: self-trained unigram-LM perplexity-proxy quality gate
    # (CCNet's filter shape) — decimal-exact log-sum discipline
    "h3_unigram_lm_quality": (
        textanalysis.unigram_lm_quality,
        oracles_h.UNIGRAM_LM_QUALITY,
    ),
    # H3: Jelinek-Mercer interpolated bigram LM quality gate
    "h3_bigram_lm_quality": (
        textanalysis.bigram_lm_quality,
        oracles_h.BIGRAM_LM_QUALITY,
    ),
    # F: relational PIVOT (pinned values -> one-pass conditional agg)
    "f_pivot_priority_matrix": (
        relational.pivot_priority_matrix,
        oracles_f.PIVOT_PRIORITY_MATRIX,
    ),
    # F: correlated LATERAL subquery, decorrelated to WindowGroupLimit
    "f_lateral_topn_per_customer": (
        relational.lateral_topn_per_customer,
        oracles_f.LATERAL_TOPN_PER_CUSTOMER,
    ),
    # H5: mergeable equi-width histogram quantiles (t-digest's role);
    # the ALL row merges per-group bin vectors, oracle recomputes it
    "h5_histogram_quantile_sketch": (
        approx.histogram_quantile_sketch,
        oracles_h.HISTOGRAM_QUANTILE_SKETCH,
    ),
    # H2 at rest: IVF store partitionBy(cell) with incremental
    # appends; search reads only probed cells' directories (partition
    # pruning); same oracle as the in-memory ivf_topk
    "h2_ivf_index_at_rest": (
        simsearch.ivf_index_at_rest,
        oracles_h.IVF_TOPK,
    ),
    # H2 at rest, full serving loop: build (incremental arrivals) →
    # per-cell small-file BINPACK compaction → partition-pruned
    # search; answers bit-identical to the uncompacted store
    "h2_ivf_compacted_search": (
        simsearch.ivf_compacted_search,
        oracles_h.IVF_TOPK,
    ),
    # H2 × H4: the store maintained BY A STREAM — per-batch dynamic
    # partition overwrite (cell_id, arrival) = exactly-once landing
    # without a txn log; cell pruning untouched; same oracle
    "h2_ivf_streaming_maintenance": (
        simsearch.ivf_streaming_maintenance,
        oracles_h.IVF_TOPK,
    ),
    # H2: re-clustering with minimal movement — retrain exact
    # fixed-point centroids, move ONLY changed vectors (untouched
    # cells keep file identity, asserted), serve under new centroids
    "h2_ivf_recluster_moves": (
        simsearch.ivf_recluster_moves,
        oracles_h.IVF_RECLUSTER_MOVES,
    ),
    # H2 × H4 (NEW r11): the nightly cycle COMPOSED — stream-maintain
    # → compact (high-water mark) → recluster moved cells (into the
    # packed sub-partition) → search; replayed arrival batches
    # injected after BOTH compaction and recluster must be no-ops
    # (file-listing asserts), one-row-per-vector integrity gate; the
    # recluster oracle replays the answers (layout may never change
    # them)
    "h2_ivf_nightly_maintenance": (
        simsearch.ivf_nightly_maintenance,
        oracles_h.IVF_RECLUSTER_MOVES,
    ),
    # H2 × H4: the streaming store's loop CLOSED — stream-maintain →
    # two-level binpack committed with a compacted-through high-water
    # mark → post-compaction replay (guard-skipped, asserted in-query)
    # → pruned search; same oracle
    "h2_ivf_stream_compacted_search": (
        simsearch.ivf_stream_compacted_search,
        oracles_h.IVF_TOPK,
    ),
    # H2: PQ codebook TRAINING — one exact fixed-point Lloyd round
    # per subspace with a distortion/movement audit
    "h2_pq_trained_codebook": (
        simsearch.pq_trained_codebook,
        oracles_h.PQ_TRAINED_CODEBOOK,
    ),
    # H4: exact-integer 2-sigma outlier gate per event type
    "h4_anomaly_outliers": (
        events.anomaly_outliers,
        oracles_h.ANOMALY_OUTLIERS,
    ),
    # H4: hourly gap-fill with linear interpolation (time-series repair)
    "h4_gap_fill_interpolate": (
        events.gap_fill_interpolate,
        oracles_h.GAP_FILL_INTERPOLATE,
    ),
    # H6: bounded-hop BFS seed-distance over the link graph
    "h6_link_bfs_reach": (graph.link_bfs_reach, oracles_h.LINK_BFS_REACH),
    # H6: LSH eval-set decontamination (fuzzy twin of the exact check)
    "h6_minhash_decontaminate": (
        traindata.minhash_decontaminate,
        oracles_h.MINHASH_DECONTAMINATE,
    ),
    # F: full-outer source-vs-target reconciliation (the data-diff)
    "f_full_outer_reconciliation": (
        relational.full_outer_reconciliation,
        oracles_f.FULL_OUTER_RECONCILIATION,
    ),
    # F: unionByName(allowMissingColumns) schema-evolution union
    "f_union_schema_evolution": (
        funcfamilies.union_schema_evolution,
        oracles_f.UNION_SCHEMA_EVOLUTION,
    ),
    # H4: weekday x hour activity heatmap grid
    "h4_dow_hour_heatmap": (events.dow_hour_heatmap, oracles_h.DOW_HOUR_HEATMAP),
    # H6: RAG context chunking (overlapping token windows + fingerprint)
    "h6_context_chunking": (
        traindata.context_chunking,
        oracles_h.CONTEXT_CHUNKING,
    ),
    # H1/H2: k-means convergence drift report (exact fixed-point)
    "h1_kmeans_convergence_audit": (
        simsearch.kmeans_convergence_audit,
        oracles_h.KMEANS_CONVERGENCE_AUDIT,
    ),
    # H3: RAKE keyword extraction (order-pinned phrase-score folds)
    "h3_rake_keywords": (
        textanalysis.rake_keywords,
        oracles_h.RAKE_KEYWORDS,
    ),
    # E5++: delta-join identity == full recompute (MV join maintenance)
    "e5_incremental_join_maintenance": (
        pipeline.incremental_join_maintenance,
        oracles_f.INCREMENTAL_JOIN_MAINTENANCE,
    ),
    # H4: per-user sweep-line interval concurrency
    "h4_session_concurrency": (
        events.session_concurrency,
        oracles_h.SESSION_CONCURRENCY,
    ),
    # H2: hybrid lexical+vector retrieval with reciprocal-rank fusion
    "h2_hybrid_rrf": (
        simsearch.hybrid_rrf_search,
        oracles_h.HYBRID_RRF_SEARCH,
    ),
    # G4: monthly seasonality index per priority class
    "g4_seasonality_index": (
        analytics.seasonality_index,
        oracles_f.SEASONALITY_INDEX,
    ),
    # G4+: EWMA smoothing as an order-pinned IEEE fold (exact alphas)
    "g4_ewma_trend": (analytics.ewma_trend, oracles_f.EWMA_TREND),
    # G4+: Holt double-exponential — coupled level/trend struct fold
    "g4_holt_linear_trend": (
        analytics.holt_linear_trend,
        oracles_f.HOLT_LINEAR_TREND,
    ),
    # G5: radius search as a grid-cell bucket join — bounded candidates
    "g5_radius_grid_join": (
        analytics.radius_grid_join,
        oracles_f.RADIUS_GRID_JOIN,
    ),
    # G5: exact two-phase grid kNN — ring-1 resolve (kth d2 <= S²
    # proves nothing outside can displace), brute-force remainder
    "g5_knn_grid_join": (
        analytics.knn_grid_join,
        oracles_f.KNN_GRID_JOIN,
    ),
    # H3: sliding-window RAG/pretraining chunker — W=64 tokens at
    # stride 48, md5 chunk fingerprints, pure JVM array arithmetic
    "h3_sliding_window_chunks": (
        textanalysis.sliding_window_chunks,
        oracles_h.SLIDING_WINDOW_CHUNKS,
    ),
    # G4: CUSUM changepoint via its closed two-window form — exact
    # integer cents, no fold, codegen end to end
    "g4_cusum_changepoint": (
        analytics.cusum_changepoint,
        oracles_f.CUSUM_CHANGEPOINT,
    ),
    # H6: hashing-trick linear quality classifier applied in one pass
    # (fastText filter shape, deterministic stand-in weights)
    "h6_hashed_linear_classifier": (
        traindata.hashed_linear_classifier,
        oracles_h.HASHED_LINEAR_CLASSIFIER,
    ),
    # F: Spark 4 SQL pipe syntax (|>) — same Catalyst plan as the
    # standard form; the oracle IS the standard form
    "f_sql_pipe_syntax": (
        relational.sql_pipe_syntax,
        oracles_f.SQL_PIPE_SYNTAX,
    ),
    # MM: shot-boundary detection — per-payload frame features and
    # cut flags inside one mapInPandas batch, byte-deterministic fake
    "mm_frame_shot_boundaries": (
        multimodal.frame_shot_boundaries,
        oracles_h.FRAME_SHOT_BOUNDARIES,
    ),
    # MM x H1 (NEW r11): cross-video keyframe dedup — one keyframe
    # per shot, md5 window fingerprints, corpus-duplicate flags via
    # collision-sized fingerprint groupBy
    "mm_keyframe_dedup": (
        multimodal.keyframe_dedup,
        oracles_h.KEYFRAME_DEDUP,
    ),
    # H4 (NEW r11): MATCH_RECOGNIZE-lite - regex row-pattern matching
    # over per-user ordered event-symbol strings; sequence md5,
    # non-overlapping funnel + error-recovery counts, first-match pos
    "h4_event_pattern_match": (
        events.event_pattern_match,
        oracles_h.EVENT_PATTERN_MATCH,
    ),
    # G4 (NEW r11): classical seasonal decomposition - 2x12 centered
    # MA trend + order-pinned per-calendar-month seasonal indices
    "g4_stl_decomposition": (
        analytics.stl_decomposition,
        oracles_h.STL_DECOMPOSITION,
    ),
    # F: equi-depth (quantile) histogram via keyed ntile
    "f_equi_depth_histogram": (
        relational.equi_depth_histogram,
        oracles_f.EQUI_DEPTH_HISTOGRAM,
    ),
    # H3: classifier-eval confusion matrix over the lang-ID heuristic
    "h3_langid_confusion": (
        textanalysis.langid_confusion_matrix,
        oracles_h.LANGID_CONFUSION,
    ),
    # H5: first-principles Bloom membership — portable md5 hash family
    # + integer bit words, so even the false positives hash-match
    "h5_bloom_membership": (
        approx.bloom_membership_audit,
        oracles_h.BLOOM_MEMBERSHIP,
    ),
    # E2/F: point-in-time lookup against the SCD2 history
    "e2_scd2_point_in_time": (
        pipeline.scd2_point_in_time_join,
        oracles_f.SCD2_POINT_IN_TIME,
    ),
    # H4/G1: A/B guardrail with hash-exact Wilson intervals
    "h4_ab_test_guardrail": (
        events.ab_test_guardrail,
        oracles_h.AB_TEST_GUARDRAIL,
    ),
    # A4/E1+: dynamic partition overwrite (backfill one partition)
    "a4_dynamic_partition_backfill": (
        pipeline.dynamic_partition_backfill,
        oracles_f.DYNAMIC_PARTITION_BACKFILL,
    ),
    # H2: Matryoshka truncated-dimension recall audit
    "h2_matryoshka_recall": (
        simsearch.matryoshka_recall_audit,
        oracles_h.MATRYOSHKA_RECALL_AUDIT,
    ),
    # H6: greedy token-budget source admission (curriculum cut)
    "h6_token_budget_curriculum": (
        traindata.token_budget_curriculum,
        oracles_h.TOKEN_BUDGET_CURRICULUM,
    ),
    # A4/F: dynamic partition pruning on the partitioned scratch lake
    "a4_dpp_pruned_join": (
        pipeline.dpp_pruned_join,
        oracles_f.DPP_PRUNED_JOIN,
    ),
    # E2+/A6: schema-evolving MERGE (updates introduce a column)
    "e2_tx_schema_evolution": (
        pipeline.tx_merge_schema_evolution,
        oracles_f.TX_SCHEMA_EVOLUTION,
    ),
    # A4: zstd codec roundtrip (lossless; size win unit-tested)
    "a4_zstd_roundtrip": (
        pipeline.zstd_compression_roundtrip,
        oracles_f.ZSTD_COMPRESSION_ROUNDTRIP,
    ),
    # H1: LSH banding parameter sweep (cost vs planted-pair recall)
    "h1_lsh_param_sweep": (
        dedup.lsh_param_sweep,
        oracles_h.LSH_PARAM_SWEEP,
    ),
    # F: FORWARD as-of join (time-to-recovery twin of the backward one)
    "f_asof_forward_recovery": (
        relational.asof_forward_recovery,
        oracles_f.ASOF_FORWARD_RECOVERY,
    ),
    # H4: gaps-and-islands — consecutive-error streaks per user
    "h4_error_streaks": (events.error_streaks, oracles_h.ERROR_STREAKS),
    # H3/H6: Zipf coverage curve for tokenizer vocabulary sizing
    "h3_vocab_coverage_curve": (
        textanalysis.vocab_coverage_curve,
        oracles_h.VOCAB_COVERAGE_CURVE,
    ),
    # H2: metadata-filtered vector search (pre-filter ANN)
    "h2_filtered_vector_search": (
        simsearch.filtered_vector_search,
        oracles_h.FILTERED_VECTOR_SEARCH,
    ),
    # E3+: FK orphan audit across every star-schema edge
    "e3_referential_integrity": (
        pipeline.referential_integrity_audit,
        oracles_f.REFERENTIAL_INTEGRITY_AUDIT,
    ),
    # H3/H6: exact total-variation drift per source vs the corpus
    "h3_source_divergence": (
        textanalysis.source_divergence,
        oracles_h.SOURCE_DIVERGENCE,
    ),
    # F: EXCEPT ALL / INTERSECT ALL (bag semantics with multiplicity)
    "f_multiset_ops": (relational.multiset_ops, oracles_f.MULTISET_OPS),
    # G1+: exact Gini revenue concentration per nation
    "g1_gini_concentration": (
        analytics.gini_concentration,
        oracles_f.GINI_CONCENTRATION,
    ),
    # H2: oracle-matched k=1 degenerate twin of the MMR grouped-map
    "h2_mmr_rerank_k1": (simsearch.mmr_rerank_k1, oracles_h.MMR_RERANK_K1),
    # H2: metadata filter composed INTO the IVF index (filtered ANN)
    "h2_filtered_ivf_topk": (
        simsearch.filtered_ivf_topk,
        oracles_h.FILTERED_IVF_TOPK,
    ),
    # H5: quantitative error-envelope check for the HLL merge path
    "h5_hll_error_bound": (approx.hll_error_bound, oracles_h.HLL_ERROR_BOUND),
    # H5: KMV sketch — deterministic, so the ESTIMATE is hash-checked
    "h5_kmv_distinct_sketch": (
        approx.kmv_distinct_sketch,
        oracles_h.KMV_DISTINCT_SKETCH,
    ),
    # H2: multi-probe IVF (nprobe=2 recall knob)
    "h2_ivf_nprobe_topk": (
        simsearch.ivf_nprobe_topk,
        oracles_h.IVF_NPROBE_TOPK,
    ),
    # H5: count-min sketch — deterministic, every estimate hash-checked
    "h5_countmin_heavy_hitters": (
        approx.countmin_heavy_hitters,
        oracles_h.COUNTMIN_HEAVY_HITTERS,
    ),
    # H5: KMV/theta-sketch SET OPERATIONS — union by sketch merge,
    # intersection by the merged sketch's Jaccard fraction
    "h5_kmv_set_ops": (approx.kmv_set_ops, oracles_h.KMV_SET_OPS),
    # E2+: CHECK-constraint merge with quarantine (DLT expectations)
    "e2_tx_constraint_quarantine": (
        pipeline.tx_constraint_quarantine,
        _TX_QUARANTINE_SQL,
    ),
    # H4: first/last-touch attribution over a 7-day lookback band join
    "h4_attribution_first_last": (
        events.attribution_first_last,
        oracles_h.ATTRIBUTION_FIRST_LAST,
    ),
    # H: Horvitz-Thompson estimation from the deterministic sample
    "h5_sample_estimate_audit": (
        sampling.sample_estimate_audit,
        oracles_h.SAMPLE_ESTIMATE_AUDIT,
    ),
    # H6/H1: cluster-keyed split — near-dups never straddle train/test
    "h6_leakage_safe_split": (
        dedup.leakage_safe_split,
        oracles_h.LEAKAGE_SAFE_SPLIT,
    ),
    # H3: inverted-index boolean retrieval (posting intersection)
    "h3_inverted_index_search": (
        textanalysis.inverted_index_search,
        oracles_h.INVERTED_INDEX_SEARCH,
    ),
    # F: partitioned ntile — the scale-safe equi-depth form
    "f_ntile_customer_tiers": (
        relational.ntile_customer_tiers,
        oracles_f.NTILE_CUSTOMER_TIERS,
    ),
    # H4 × E2+: exactly-once streaming sink on the tx table (txn ids)
    "h4_streaming_tx_merge": (
        structured.streaming_tx_merge,
        oracles_f.STREAMING_UPSERT,
    ),
    # G4+: seasonal-naive forecast scorecard (gap-safe seasonal join)
    "g4_seasonal_naive_forecast": (
        analytics.seasonal_naive_forecast,
        oracles_f.SEASONAL_NAIVE_FORECAST,
    ),
    # H2: compressed-domain int8 search with recall@10 audit
    "h2_int8_search_audit": (
        simsearch.int8_search_audit,
        oracles_h.INT8_SEARCH_AUDIT,
    ),
    # E5+: retraction-aware (delete/update) rollup maintenance
    "e5_retractable_rollup": (
        pipeline.retractable_rollup,
        oracles_f.RETRACTABLE_ROLLUP,
    ),
    # A5+: PERMISSIVE JSON with corrupt-record quarantine
    "a5_json_corrupt_records": (
        pipeline.json_corrupt_records,
        oracles_f.JSON_CORRUPT_RECORDS,
    ),
    # H2: 1-bit binary quantization + popcount Hamming search audit
    "h2_binary_hamming_search": (
        simsearch.binary_hamming_search,
        oracles_h.BINARY_HAMMING_SEARCH,
    ),
    # F-win: trailing-30-day INTERVAL RANGE frame (uneven spacing)
    "f_interval_range_frame": (
        funcfamilies.interval_range_frame,
        oracles_f.INTERVAL_RANGE_FRAME,
    ),
    # E2+: zero-copy shallow clone, merge into the clone, both read back
    "e2_tx_shallow_clone": (pipeline.tx_shallow_clone, _TX_MERGE_SQL),
    # H3/H1: exact substring-span dedup signal — rolling w=8 spans,
    # corpus-duplicated iff >= 2 distinct docs share the fingerprint
    "h3_dup_span_flags": (
        textanalysis.dup_span_flags,
        oracles_h.DUP_SPAN_FLAGS,
    ),
    # H3: Gopher-style repetition gates (repeated-token fraction,
    # top-bigram share) — integer cross-multiplied thresholds
    "h3_repetition_filter": (
        textanalysis.repetition_quality_filter,
        oracles_h.REPETITION_QUALITY_FILTER,
    ),
    # H4 x H5: first-principles HLL as streaming state — max-semiring
    # registers keyed per (priority, register); drained state AND the
    # harmonic estimate hash-equal the batch replay
    "h4_streaming_hll": (
        structured.streaming_hll,
        oracles_h.STREAMING_HLL,
    ),
    # G5: DBSCAN — eps-neighborhood as the 3x3 grid-cell join, core/
    # border/noise roles, min-label clusters, deterministic ties
    "g5_dbscan_clusters": (
        analytics.dbscan_clusters,
        oracles_h.DBSCAN_CLUSTERS,
    ),
    # H2: radius (range) search — triangle-inequality cell pruning
    # over rep+covering-radius cells; oracle is the full scan
    "h2_ivf_radius_search": (
        simsearch.ivf_radius_search,
        oracles_h.IVF_RADIUS_SEARCH,
    ),
    # H1: MinHash-vs-SimHash pair-set agreement audit
    "h1_method_agreement": (
        dedup.dedup_method_agreement,
        oracles_h.DEDUP_METHOD_AGREEMENT,
    ),
    # H1 (NEW r11): connected components via alternating large-star/
    # small-star rounds (Kiveris et al. SoCC'14) - the O(log^2 n)
    # scale path; same recursive-closure oracle as h1_dedup_clusters,
    # so two independently-derived algorithms must hash-match
    "h1_cc_alternating_star": (
        dedup.cc_alternating_star,
        oracles_h.DEDUP_CLUSTERS,
    ),
    # H6 (NEW r11): Efraimidis-Spirakis weighted sampling without
    # replacement per stratum - integer-exact via the max-of-w-tickets
    # duality (no float pow/ln in the ordering)
    "h6_weighted_sample": (
        traindata.weighted_sample,
        oracles_h.WEIGHTED_SAMPLE,
    ),
    # F (NEW r11): skyline / Pareto frontier - month-grain prefilter
    # + exact survivor windows (the 2-D skyline as running-max records)
    "f_pareto_frontier": (
        relational.pareto_frontier,
        oracles_f.PARETO_FRONTIER,
    ),
}


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoke-check plan: scan → gate/split/explode → join → agg →
    top-k rank (the reference's whole EP3 shape + the G3 ranking leg,
    SURVEY §7 Phase 0, in one Catalyst-planned query)."""
    return pipeline.flagship_pipeline(spark, sf_dir)


# The external driver checks a fixed-size prefix of queries() (the
# first 50 of the export order). Rotate which entries lead so its
# coverage reaches the whole registry over rounds. Rounds 1-5 proved
# 187 distinct queries green (r01: original prefix; r03: UDF/
# streaming/multimodal/H6/sink families; r04: wave-2 H6/H1/H2 +
# TPC-H slice + funcfamilies; r05: staged queue — 47/50 green, 3
# oracle-type mismatches fixed and re-queued below). Everything not
# listed follows in registry order — nothing is ever dropped, only
# reordered.
_DRIVER_ROTATION = [
    # --- round-15 prefix (second optimization round). EVERY
    # r15-stamped changed plan, grouped by the change that drifted it:
    # the CC-loop rework (Observation convergence + pointer jumping in
    # _min_label_propagate — drifts every cluster builder), the
    # MinHash expression-tree memo (plans/dedup._MINHASH_EXPRS —
    # drifts every LSH/signature consumer), and the input-skew spread
    # guards (g3 keyed, b3 stage spread, h3 bigram / h6 curation
    # round-robin). Remaining slots carry the r05/r06 age re-check
    # queue deferred from r14. Nothing is ever dropped, only
    # reordered.
    # --- CC-loop rework (dedup._min_label_propagate) ---
    "g5_dbscan_clusters",
    "h1_dedup_clusters",
    "h1_incremental_dedup_clusters",
    "h6_leakage_safe_split",
    # --- MinHash/LSH expression memo (plans/dedup) ---
    "h1_minhash_lsh_pairs",
    "h1_minhash_error_audit",
    "h1_bucketed_lsh_pairs",
    "h1_lsh_param_sweep",
    "h1_method_agreement",
    "h1_incremental_lsh_index",
    "h1_lsh_compacted_index",
    "h1_cc_alternating_star",
    "h1_edit_distance_pairs",
    "h6_corpus_release_pipeline",
    "h6_dedup_apply",
    "h6_minhash_decontaminate",
    # --- IVF rework: _ivf_assign unified onto the map-side
    # _ivf_cell_assign form; nprobe probe side map-side; the
    # _cell_id_expr split + per-batch lander expression cache ---
    "h2_ivf_topk",
    "h2_ivf_pq_topk",
    "h2_filtered_ivf_topk",
    "h2_ivf_nprobe_topk",
    "h2_ivf_index_at_rest",
    "h2_ivf_compacted_search",
    "h2_ivf_nightly_maintenance",
    "h2_ivf_recluster_moves",
    "h2_ivf_stream_compacted_search",
    "h2_ivf_streaming_maintenance",
    # --- delete_where_dv find-scan fold (one localCheckpoint pass;
    # drifts every dv consumer incl. the h4_streaming_cdf family) ---
    "e2_tx_dv_delete",
    "e2_tx_dv_purge",
    "e2_tx_incremental_bloom_index",
    "e2_tx_bloom_table_lookup",
    "h4_streaming_cdc_stateful",
    "h4_streaming_cdf_apply",
    "h4_streaming_cdf_change_files",
    "h4_streaming_cdf_ivm",
    # --- input-skew spread guards (guide §2.5) ---
    "g3_top_k_per_group",
    "h3_bigram_counts",
    "h6_curation_pipeline",
    "b3_d1_d2_population_explode",
    "ep3_flagship_pipeline",
    # --- r05/r06 age re-check queue (deferred from r14): changed
    # plans outrank age re-checks; these take the remaining slots ---
    "f_q4_priority_exists",
    "f_q5_local_supplier_volume",
    "f_q6_forecast_revenue",
]


# Queries registered AFTER the round-9 prefix froze — no driver row
# yet; they MUST lead the round-10 rotation prefix. The prefix test
# pins that nothing else falls outside the checked set.
PENDING_DRIVER_QUEUE = [
]

# Rows with no green driver proof yet, given first-proof slots at the
# HEAD of the current prefix (each pre-verified green with
# tools/verify_driver.py and tools/audit_oracle_types.py before taking
# a slot; prefix membership of every changed plan is enforced by
# tests/test_plan_fingerprints.py). Reset each round.
NEW_IN_PREFIX = [
    # r15 adds no queries (optimization round)
]


def _ordered_names() -> list[str]:
    rotated = [n for n in _DRIVER_ROTATION if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in set(rotated)]
    return rotated + rest


def _pin_session(fn: QueryFn) -> QueryFn:
    """Session normalization applied to every exported query.

    ``session.get_spark`` already pins UTC, but the external driver
    builds its OWN SparkSession; two of its confs are load-bearing for
    value identity with the DuckDB oracles:

    - ``spark.sql.session.timeZone=UTC`` — the fixtures store date-like
      columns as ``timestamp[us] isAdjustedToUTC=false`` at midnight;
      any plan that reads one under LTZ inference in a non-UTC session
      shifts EVERY row's date by up to a day (exactly the hash-only,
      rows/schema-green failure class of r11's `f_pareto_frontier`).
    - ``spark.sql.parquet.inferTimestampNTZ.enabled=true`` — keeps
      those columns TIMESTAMP_NTZ (wall-clock), so `to_date`/`year`/
      `datediff` are session-zone-independent to begin with.

    This is ENVIRONMENT pinning, not plan logic: it sets the confs the
    repo's own session builder always sets, so plan fingerprints
    (which hash plan semantics) are deliberately unaffected. Applied
    here — the single seam every driver-invoked query passes through —
    rather than inside ``io.readers.read_table``, whose transitive
    fingerprint reaches all 321 queries.
    """

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__qualname__ = getattr(fn, "__qualname__", wrapped.__name__)
    wrapped.__wrapped__ = fn
    return wrapped


def queries() -> dict[str, QueryFn]:
    return {name: _pin_session(_REGISTRY[name][0]) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: _REGISTRY[name][1].strip()
        for name in _ordered_names()
        if _REGISTRY[name][1] is not None
    }
