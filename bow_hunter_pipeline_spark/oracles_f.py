"""DuckDB oracle SQL for the group-F relational plans, H5 sketches,
multimodal pipelines, and streaming twins.

Same dialect discipline as oracles_h (e-notation doubles, decimal-
exact float reductions, explicit INT casts where DuckDB widens to
BIGINT). Timestamp keys follow the truncation rule pinned there: the
oracle engine narrows parquet nanos to µs, so cross-engine time keys
are epoch µs (``ts_ns div 1000`` ↔ ``epoch_us(ts)``) or coarser.
"""

from __future__ import annotations

from bow_hunter_pipeline_spark.plans.multimodal import N_FRAME_MOD
from bow_hunter_pipeline_spark.plans.relational import BAND_WIDTH

_DSUM = "CAST(round(SUM(CAST({c} AS DECIMAL(14,2))), 4) AS DOUBLE)"

# --- group F -----------------------------------------------------------

ROLLUP_ORDER_TOTALS = f"""
SELECT o_orderpriority AS priority,
       CAST(year(o_orderdate) AS INT) AS order_year,
       COUNT(*) AS n_orders,
       {_DSUM.format(c='o_totalprice')} AS total_price
FROM orders
GROUP BY ROLLUP(priority, order_year)
"""

CUBE_FLAG_STATUS = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       {_DSUM.format(c='l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""

SET_OPS_REPEAT_BUYERS = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""

SEMI_JOIN_BIG_SPENDERS = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
"""

ANTI_JOIN_INACTIVE_CUSTOMERS = """
SELECT c_custkey, c_name, c_nationkey
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995
)
"""

ASOF_JOIN_ERROR_CONTEXT = """
WITH l AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us
  FROM events WHERE event_type = 'error'
),
r AS (
  SELECT user_id, epoch_us(ts) AS r_ts_us, event_type AS r_type
  FROM events WHERE event_type <> 'error'
)
SELECT l.event_id, l.user_id, l.t_us,
       r.r_ts_us AS prev_ts_us, r.r_type AS prev_type,
       l.t_us - r.r_ts_us AS gap_us
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.t_us >= r.r_ts_us
"""

RANGE_JOIN_VALUE_BANDS = f"""
WITH bands AS (
  SELECT n_name AS band_name, n_nationkey * {BAND_WIDTH}e0 AS band_lo
  FROM nation
)
SELECT band_name, band_lo,
       COUNT(*) AS n_events,
       {_DSUM.format(c='value')} AS sum_value
FROM events e
JOIN bands b ON e.value >= b.band_lo AND e.value < b.band_lo + {BAND_WIDTH}e0
GROUP BY band_name, band_lo
"""

DATE_SPINE_MONTHLY = """
WITH bounds AS (
  SELECT min(date_trunc('month', o_orderdate)) AS lo,
         max(date_trunc('month', o_orderdate)) AS hi
  FROM orders
),
spine AS (
  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                     CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 MONTH)) AS TIMESTAMP)
           AS month_start
  FROM bounds
),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
         COUNT(*) AS n
  FROM orders GROUP BY 1
)
SELECT s.month_start, COALESCE(m.n, 0) AS n_orders
FROM spine s LEFT JOIN monthly m ON s.month_start = m.month_start
"""

SQL_TEXT_INTERFACE = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       {_DSUM.format(c='o_totalprice')} AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(7,4))"
)

Q3_SHIPPING_PRIORITY = f"""
SELECT l_orderkey,
       o_orderdate,
       o_orderpriority,
       CAST(round(SUM({_REV}), 4) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01'
  AND l_shipdate > TIMESTAMP '1998-07-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

ABOVE_AVG_ORDERS = """
WITH cavg AS (
  SELECT o_custkey,
         CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4) AS DOUBLE)
           / COUNT(o_totalprice) AS cust_avg
  FROM orders GROUP BY o_custkey
)
SELECT o_orderkey, o.o_custkey, o_totalprice, cust_avg
FROM orders o JOIN cavg ON o.o_custkey = cavg.o_custkey
WHERE o_totalprice > 1.5e0 * cust_avg
"""

PIVOT_EVENT_COUNTS = """
SELECT user_id % 10 AS cohort,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events GROUP BY 1
"""

STATS_MOMENTS = """
WITH g AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(round(SUM(CAST(l_quantity AS DECIMAL(14,2))), 4) AS DOUBLE) AS s1,
         CAST(round(SUM(CAST(CAST(l_quantity AS DECIMAL(14,2))
                            * CAST(l_quantity AS DECIMAL(14,2)) AS DECIMAL(24,4))), 4)
              AS DOUBLE) AS s2
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       s1 / n AS mean_qty,
       (s2 - s1 * s1 / n) / (n - 1) AS var_qty
FROM g
"""

DATE_PARTS_MONTHLY = f"""
WITH m AS (
  -- DuckDB's date_trunc('month', ts) narrows to DATE; Spark keeps
  -- timestamp — re-widen for bit-equal comparison
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
         COUNT(*) AS n_orders,
         {_DSUM.format(c='o_totalprice')} AS total_price
  FROM orders GROUP BY 1
)
SELECT month_start,
       CAST(quarter(month_start) AS INT) AS qtr,
       CAST(dayofweek(month_start) AS INT) AS first_dow,
       n_orders, total_price
FROM m
"""

GROUPING_SETS_ORDERS = f"""
SELECT o_orderpriority AS priority, o_orderstatus AS status,
       COUNT(*) AS n_orders,
       {_DSUM.format(c='o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((priority, status), (priority), ())
"""

WINDOW_FUNCTION_SHOWCASE = """
SELECT c_custkey, c_nationkey, c_acctbal,
       CAST(dense_rank() OVER w AS INT) AS bal_rank,
       CAST(ntile(4) OVER w AS INT) AS bal_quartile,
       lead(c_custkey, 1) OVER w AS next_custkey,
       lag(c_custkey, 1) OVER w AS prev_custkey,
       CAST(round(SUM(CAST(c_acctbal AS DECIMAL(12,2))) OVER (
         PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
         AS running_total,
       MAX(c_acctbal) OVER f AS nation_max_bal,
       MIN(c_acctbal) OVER f AS nation_min_bal
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
       f AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

# --- H5 ----------------------------------------------------------------

EXACT_DISTINCT_QUANTILES = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       quantile_cont(l_quantity, 0.25) AS p25_qty,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.75) AS p75_qty
FROM lineitem GROUP BY l_returnflag
"""

# --- multimodal --------------------------------------------------------

# Multimodal patchify -> pooled integer embedding -> exact top-3
# retrieval, replayed from raw text (ASCII fixture: chars == bytes).
MM_PATCH_EMBED_SEARCH = """
WITH pb AS (
  SELECT doc_id, octet_length(encode(text)) AS n,
         octet_length(encode(text)) // 4 AS stride, text
  FROM documents
),
patches AS (
  SELECT doc_id,
         list_transform(generate_series(1, 4), p ->
           list_sum(list_transform(
             string_split(substring(text,
               (p-1)*stride + 1,
               CASE WHEN p < 4 THEN stride ELSE n - 3*stride END), ''),
             ch -> ascii(ch)))) AS patch_sums
  FROM pb
),
emb AS (
  SELECT doc_id,
         list_transform(generate_series(1, 8), d ->
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(patch_sums, s -> (s * d) % 9973)),
             (acc, x) -> acc + x)) AS emb
  FROM patches
),
scored AS (
  SELECT q.doc_id AS q_doc, c.doc_id AS n_doc,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(generate_series(1, 8),
             d -> q.emb[d] * c.emb[d])),
           (acc, x) -> acc + x) AS BIGINT) AS dot
  FROM emb q JOIN emb c ON q.doc_id < 5 AND q.doc_id <> c.doc_id
),
ranked AS (
  SELECT q_doc, n_doc, dot,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_doc
                                 ORDER BY dot DESC, n_doc) AS INT)
           AS rank
  FROM scored
)
SELECT q_doc, n_doc, dot, rank FROM ranked WHERE rank <= 3
"""

MM_DECODE_META = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       sha256(text) AS sha256_hex,
       CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS fake_width,
       CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS fake_height
FROM documents
"""

MM_FRAME_SAMPLE = f"""
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) AS nb,
         octet_length(encode(text)) % {N_FRAME_MOD} + 1 AS n_frames
  FROM documents
)
SELECT doc_id,
       CAST(unnest(range(n_frames)) AS INT) AS frame_idx,
       CAST(unnest(list_transform(range(n_frames), f -> f * (nb // n_frames))) AS INT)
         AS frame_off
FROM d
"""

# --- normalize composite (C1/C8/B1/B2/C2/C3/C6/C7/B5) ------------------

NORMALIZE_HARVEST = """
WITH messy AS (
  SELECT
    CASE WHEN o_orderkey % 10 = 0 THEN 'Total'
         WHEN o_orderkey % 13 = 0 THEN 'see map'
         WHEN o_orderkey % 7 = 0 THEN '00' || CAST(o_custkey % 500 AS VARCHAR)
         ELSE CAST(o_custkey % 500 AS VARCHAR) END AS unit_raw,
    CASE WHEN o_orderkey % 5 = 0
         THEN CAST((o_orderkey % 9000 + 1000) // 1000 AS VARCHAR) || ',' ||
              lpad(CAST((o_orderkey % 9000 + 1000) % 1000 AS VARCHAR), 3, '0')
         ELSE CAST(o_orderkey % 800 AS VARCHAR) END AS bulls_raw,
    CAST(o_custkey % 300 AS VARCHAR) AS cows_raw,
    'co_elk_harvest_' || CAST(year(o_orderdate) AS VARCHAR) || '.pdf' AS raw_file
  FROM orders
),
kept AS (  -- B1 footer drop
  SELECT * FROM messy WHERE lower(trim(unit_raw)) <> 'total'
),
parsed AS (
  SELECT
    'co' AS state, 'elk' AS species,
    TRY_CAST(regexp_extract(raw_file, '([0-9]{4})', 1) AS INT) AS year,  -- C6
    CASE WHEN regexp_matches(trim(unit_raw), '^[0-9]+$')
         THEN CAST(trim(unit_raw) AS INT) END AS unit,                   -- C3
    TRY_CAST(replace(trim(bulls_raw), ',', '') AS BIGINT) AS adult_male, -- C2
    TRY_CAST(replace(trim(cows_raw), ',', '') AS BIGINT) AS adult_female,
    CAST(0 AS BIGINT) AS young                                           -- C7
  FROM kept
)
SELECT state, species, year, unit, adult_male, adult_female, young
FROM parsed WHERE unit IS NOT NULL  -- B2
"""

# --- streaming twins ---------------------------------------------------

STREAMING_HOURLY_AGG = f"""
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n_events,
       {_DSUM.format(c='value')} AS sum_value
FROM events GROUP BY 1, 2
"""

# --- group F second wave ----------------------------------------------

Q13_CUSTOMER_DISTRIBUTION = """
WITH per_customer AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist FROM per_customer GROUP BY c_count
"""

Q4_PRIORITY_EXISTS = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""

Q7_VOLUME_SHIPPING = f"""
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
  CAST(round(SUM({_REV}), 4) AS DOUBLE) AS volume
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""

ARGMIN_CHEAPEST_PER_BRAND = """
SELECT p_brand, p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice = (
  SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = part.p_brand
)
"""

MULTI_DISTINCT_MONTHLY = f"""
SELECT
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(DISTINCT o_orderpriority) AS n_priorities,
  COUNT(*) AS n_orders,
  {_DSUM.format(c='o_totalprice')} AS total_price
FROM orders
GROUP BY 1
"""

Q5_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name, CAST(round(SUM({_REV}), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""

HISTOGRAM_ORDER_VALUES = f"""
SELECT
  CAST(floor(o_totalprice / 25000.0e0) AS BIGINT) AS bin_id,
  CAST(floor(o_totalprice / 25000.0e0) AS BIGINT) * 25000.0e0 AS bin_lo,
  COUNT(*) AS n_orders,
  {_DSUM.format(c='o_totalprice')} AS total_price
FROM orders
GROUP BY 1, 2
"""

STREAM_STATIC_ENRICHED = f"""
SELECT c_mktsegment, event_type,
       COUNT(*) AS n_events,
       {_DSUM.format(c='value')} AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""

SCD2_PRIORITY_HISTORY = """
SELECT o_custkey,
       o_orderpriority AS priority,
       o_orderdate AS valid_from,
       LEAD(o_orderdate) OVER w AS valid_to,
       CAST(ROW_NUMBER() OVER w AS INT) AS version,
       (LEAD(o_orderdate) OVER w IS NULL) AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

UNPIVOT_FLAG_METRICS = f"""
WITH a AS (
  SELECT l_returnflag,
         {_DSUM.format(c='l_quantity')} AS sum_qty,
         {_DSUM.format(c='l_extendedprice')} AS sum_price,
         {_DSUM.format(c='l_tax')} AS sum_tax
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS metric_value FROM a
UNION ALL
SELECT l_returnflag, 'sum_price' AS metric, sum_price AS metric_value FROM a
UNION ALL
SELECT l_returnflag, 'sum_tax' AS metric, sum_tax AS metric_value FROM a
"""

STREAM_CLICK_ATTRIBUTION = """
WITH e AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events
)
SELECT p.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       (p.us - c.us) // 1000000 AS gap_s
FROM e c JOIN e p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND c.us <= p.us
 AND p.us - c.us <= CAST(3600 AS BIGINT) * 1000000
"""

# H4 stream-stream LEFT OUTER: same band, purchases preserved;
# NULL click = no preceding click within the hour.
STREAMING_OUTER_ATTRIBUTION = """
WITH e AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events
)
SELECT p.user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       (p.us - c.us) // 1000000 AS gap_s
FROM (SELECT * FROM e WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.us <= p.us
 AND p.us - c.us <= CAST(3600 AS BIGINT) * 1000000
"""

# G5: grid pruning never changes the result set (two points within
# R differ by <=1 cell per axis) — the oracle is brute force.
RADIUS_GRID_JOIN = """
WITH pts AS (
  SELECT c_custkey, c_acctbal,
         (c_custkey * 13) % 100 AS px, (c_custkey * 29) % 100 AS py
  FROM customer
),
q AS (
  SELECT s_suppkey,
         (s_suppkey * 17) % 100 AS qx, (s_suppkey * 41) % 100 AS qy
  FROM supplier
)
SELECT s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_in_radius,
       CAST(MIN((px-qx)*(px-qx) + (py-qy)*(py-qy)) AS BIGINT) AS min_d2,
       CAST(round(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 4) AS DOUBLE)
         AS total_acctbal
FROM q JOIN pts
  ON (px-qx)*(px-qx) + (py-qy)*(py-qy) <= 25
GROUP BY s_suppkey
"""

# G5: the two-phase grid kNN is EXACT (ring-resolve law + brute-force
# remainder) — the oracle is plain brute-force row_number.
KNN_GRID_JOIN = """
WITH d AS (
  SELECT GREATEST(CAST(ceil(sqrt(COUNT(*))) AS BIGINT), 1) AS side
  FROM customer
),
pts AS (
  SELECT c_custkey,
         CAST(('0x' || substr(md5('knx|' || CAST(c_custkey AS VARCHAR)),
                              1, 15)) AS BIGINT)
           % (SELECT side FROM d) AS px,
         CAST(('0x' || substr(md5('kny|' || CAST(c_custkey AS VARCHAR)),
                              1, 15)) AS BIGINT)
           % (SELECT side FROM d) AS py
  FROM customer
),
q AS (
  SELECT s_suppkey,
         CAST(('0x' || substr(md5('kqx|' || CAST(s_suppkey AS VARCHAR)),
                              1, 15)) AS BIGINT)
           % (SELECT side FROM d) AS qx,
         CAST(('0x' || substr(md5('kqy|' || CAST(s_suppkey AS VARCHAR)),
                              1, 15)) AS BIGINT)
           % (SELECT side FROM d) AS qy
  FROM supplier
),
scored AS (
  SELECT s_suppkey, c_custkey,
         (px-qx)*(px-qx) + (py-qy)*(py-qy) AS d2,
         ROW_NUMBER() OVER (
           PARTITION BY s_suppkey
           ORDER BY (px-qx)*(px-qx) + (py-qy)*(py-qy), c_custkey
         ) AS rnk
  FROM q CROSS JOIN pts
)
SELECT s_suppkey, CAST(rnk AS INT) AS rnk, c_custkey,
       CAST(d2 AS BIGINT) AS d2
FROM scored WHERE rnk <= 3
"""

MOVING_AVG_REVENUE = """
WITH monthly AS (
  SELECT o_orderpriority AS priority,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
         SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS tp_dec
  FROM orders GROUP BY 1, 2
),
idx AS (
  SELECT *,
         EXTRACT(year FROM month_start) * 12 + EXTRACT(month FROM month_start) - 1 AS month_idx
  FROM monthly
)
SELECT priority, month_start,
  CAST(round(tp_dec, 4) AS DOUBLE) AS total_price,
  CAST(round(SUM(tp_dec) OVER (
    PARTITION BY priority ORDER BY month_idx
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS trailing_3m_sum,
  CAST(round(SUM(tp_dec) OVER (
    PARTITION BY priority ORDER BY month_idx
    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS DOUBLE) AS centered_3m_sum
FROM idx
"""

GLOB_SCAN_SUMMARY = f"""
SELECT COUNT(*) AS n_rows,
       {_DSUM.format(c='l_quantity')} AS sum_qty,
       {_DSUM.format(c='l_extendedprice')} AS sum_price
FROM lineitem
"""

SALTED_SKEW_JOIN = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_events,
       {_DSUM.format(c='value')} AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1
"""

DISJUNCTIVE_JOIN = f"""
SELECT COUNT(*) AS n_rows,
       CAST(round(SUM({_REV}), 4) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
 AND ((p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25 AND p_size BETWEEN 5 AND 25))
"""

NULL_SAFE_JOIN = """
WITH open_side AS (
  SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS prio_key, COUNT(*) AS n_open
  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
),
done_side AS (
  SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS prio_key_r, COUNT(*) AS n_done
  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
)
SELECT prio_key, n_open, n_done
FROM open_side JOIN done_side ON prio_key IS NOT DISTINCT FROM prio_key_r
"""

ARGMINMAX_PER_CUSTOMER = """
WITH o AS (
  SELECT *, (epoch_us(o_orderdate) // 1000000) * 10000000 + o_orderkey AS uniq
  FROM orders
)
SELECT o_custkey,
       arg_min(o_totalprice, uniq) AS first_order_price,
       arg_max(o_totalprice, uniq) AS last_order_price,
       COUNT(*) AS n_orders
FROM o GROUP BY o_custkey
"""

STREAMING_DEDUP_COUNTS = """
WITH keys AS (
  SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hour_start
  FROM events
)
SELECT event_type, COUNT(*) AS n_distinct_keys FROM keys GROUP BY event_type
"""

CONDITIONAL_AGG_BY_PRIORITY = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_done,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                  FILTER (WHERE o_orderstatus = 'O'), 4) AS DOUBLE) AS open_value
FROM orders GROUP BY o_orderpriority
"""

PAGINATED_TOP_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 10
"""

# keyset twin: the boundary row (10th of the total order) is the
# continuation token; page 2 is everything strictly after it
KEYSET_PAGINATED_ORDERS = """
WITH b AS (
  SELECT o_totalprice AS b_price, o_orderkey AS b_key
  FROM orders
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 1 OFFSET 9
)
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders, b
WHERE o_totalprice < b_price
   OR (o_totalprice = b_price AND o_orderkey > b_key)
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""

POSEXPLODE_LEADING_TOKENS = """
WITH t AS (
  SELECT doc_id, str_split(text, ' ')[1:3] AS l FROM documents
)
SELECT doc_id,
       CAST(unnest(generate_series(1, len(l))) AS INT) AS pos,
       unnest(l) AS token
FROM t
"""

# E4: the schema-drift audit replayed from CATALOG METADATA — the
# oracle can't glob files (it sees pre-registered views), but
# information_schema.columns exposes exactly the per-table schema the
# mergeSchema scan discovers, and each fixture table is one parquet
# file, so (table lacks expected column) == (that file reads all-NULL
# under mergeSchema) == the Spark flag. The all-NULL-but-present leg
# of the audit (count(col)=0 with rows>0) is covered by the drift
# unit tests; the fixtures exercise the schema-absence leg.
DRIFT_AUDIT = """
WITH expected(missing_column) AS (
  VALUES ('male_female_ratio'), ('post_hunt_estimate'), ('unit')
),
tabs(tab) AS (
  VALUES ('customer'), ('documents'), ('lineitem'), ('orders')
),
present AS (
  SELECT table_name AS tab, column_name AS col
  FROM information_schema.columns
  WHERE table_name IN ('customer', 'documents', 'lineitem', 'orders')
)
SELECT t.tab || '.parquet' AS file, e.missing_column
FROM tabs t
CROSS JOIN expected e
LEFT JOIN present p ON p.tab = t.tab AND p.col = e.missing_column
WHERE p.col IS NULL
"""

PARTITION_ROUNDTRIP = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       o_orderpriority,
       COUNT(*) AS n_orders,
       {_DSUM.format(c='o_totalprice')} AS total_price
FROM orders
WHERE EXTRACT(year FROM o_orderdate) = 1997
GROUP BY 1, 2
"""

CORR_QTY_PRICE = """
WITH sums AS (
  -- VARCHAR round-trip = correctly-rounded decimal->double (matches
  -- Spark's cast); DuckDB's direct cast is 1 ulp off above ~2^52
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (n * sxy - sx * sy) /
       (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
FROM sums
"""

ARRAY_AGG_ACTIVE_YEARS = """
WITH y AS (
  SELECT o_custkey, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr
  FROM orders
)
SELECT o_custkey,
       CAST(len(list_distinct(list(yr))) AS INT) AS n_years,
       array_to_string(
         list_transform(list_sort(list_distinct(list(yr))),
                        x -> CAST(x AS VARCHAR)), ',') AS years_csv
FROM y GROUP BY o_custkey
"""


# --- function families (plans.funcfamilies) ----------------------------

ARRAY_SET_OPS = """
WITH per AS (
  SELECT o_custkey,
         list_sort(list_distinct(list(o_orderpriority))) AS prios
  FROM orders GROUP BY o_custkey
), c AS (SELECT ['1-URGENT','2-HIGH','3-MEDIUM'] AS ref)
SELECT o_custkey,
       array_to_string(prios, '|') AS prios_csv,
       CAST(len(prios) AS INT) AS n_prios,
       COALESCE(array_to_string(
         list_filter(prios, x -> list_contains(ref, x)), '|'), '')
         AS shared_csv,
       COALESCE(array_to_string(
         list_filter(prios, x -> NOT list_contains(ref, x)), '|'), '')
         AS extra_csv,
       array_to_string(
         list_concat(prios,
                     list_filter(ref, x -> NOT list_contains(prios, x))),
         '|') AS union_csv,
       len(list_filter(prios, x -> list_contains(ref, x))) > 0 AS any_shared,
       list_contains(prios, '1-URGENT') AS has_urgent,
       CAST(COALESCE(list_position(prios, '2-HIGH'), 0) AS BIGINT) AS pos_high,
       prios[-1] AS last_prio,
       array_to_string(prios[1:2], '|') AS first_two_csv
FROM per, c
"""

STRING_FUNCTION_SUITE = """
SELECT p_partkey,
       upper(p_brand) AS up_brand,
       lower(p_type) AS low_type,
       split_part(p_type, ' ', 2) AS type_mid,
       CAST(strpos(p_name, 'a') AS INT) AS first_a,
       left(p_name, 5) AS name5,
       right(p_type, 4) AS type4,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
       translate(p_brand, '#', '_') AS brand_u,
       replace(p_name, ' ', '_') AS name_snake,
       reverse(p_brand) AS rev_brand,
       p_brand || '/' || p_type AS brand_type,
       CAST(length(p_name) AS INT) AS name_len,
       starts_with(p_name, 'a') AS a_prefix,
       ends_with(p_type, 'S') AS s_suffix,
       CAST(ascii(substring(p_name, 1, 1)) AS INT) AS first_byte
FROM part
"""

DATE_ARITHMETIC = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(o_orderdate AS DATE) + 30 AS ship_by,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
         AS next_quarter_day,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
            AS INT) AS age_days,
       CAST(o_orderdate AS DATE)
         + CAST(CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
                     ELSE (8 - isodow(o_orderdate)) % 7 END AS INT)
         AS next_monday,
       make_date(CAST(year(o_orderdate) AS INT), 1, 1) AS year_start
FROM orders
"""

MAP_FUNCTIONS = """
WITH per AS (
  SELECT o_custkey, o_orderpriority AS k, count(*) AS cnt
  FROM orders GROUP BY o_custkey, o_orderpriority
)
SELECT o_custkey,
       string_agg(k, '|' ORDER BY k) AS keys_csv,
       CAST(count(*) AS INT) AS n_keys,
       max(CASE WHEN k = '1-URGENT' THEN cnt END) AS urgent_cnt,
       string_agg(k || ':' || cnt, '|' ORDER BY k) AS kv_csv,
       CAST(count(*) FILTER (WHERE cnt >= 2) AS INT) AS n_repeat,
       CAST(sum(cnt) AS BIGINT) AS total_orders
FROM per GROUP BY o_custkey
"""

MM_RESIZE_MEDIA = """
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
)
SELECT doc_id,
       CAST((nb % 640 + 2) // 2 AS INT) AS out_w,
       CAST((nb % 480 + 2) // 2 AS INT) AS out_h,
       CAST(LEAST(nb, ((nb % 640 + 2) // 2) * ((nb % 480 + 2) // 2)) AS INT)
         AS out_bytes
FROM d
"""

NESTED_STRUCT_ROUNDTRIP = f"""
WITH yearly AS (
  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
         COUNT(*) AS n_orders,
         {_DSUM.format(c='o_totalprice')} AS total_price
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey,
       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY yr) AS INT)
         AS seq,
       yr, n_orders, total_price
FROM yearly
"""

STREAMING_UPSERT = """
WITH ranked AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS last_t_us, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type,
       event_id AS last_event_id, last_t_us, value AS last_value
FROM ranked WHERE rn = 1
"""

TRY_ARITHMETIC = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice / (l_quantity - 25) AS price_per_excess,
       l_orderkey * 1099511627776 AS key_shifted,
       (['a','b','c'])[l_linenumber + 2] AS third_or_null,
       CAST(l_quantity AS BIGINT) + l_linenumber AS qty_plus_line
FROM lineitem
"""

BITWISE_OPS = """
WITH proj AS (
  SELECT o_orderpriority,
         o_orderkey & 255 AS masked,
         o_custkey << 3 AS shifted,
         xor(o_orderkey, o_custkey) AS folded
  FROM orders
)
SELECT o_orderpriority,
       count(*) AS n,
       bit_and(masked) AS and_mask,
       bit_or(masked) AS or_mask,
       bit_xor(folded) AS xor_fold,
       min(shifted) AS min_shifted,
       max(shifted) AS max_shifted
FROM proj GROUP BY o_orderpriority
"""

CONDITIONAL_SCALARS = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 25 THEN 'mid'
            ELSE 'high' END AS qty_band,
       greatest(l_quantity, l_extendedprice / 1000) AS qty_or_kprice,
       least(l_quantity, l_extendedprice / 1000) AS min_metric,
       nullif(l_tax, 0.0e0) AS tax_or_null,
       ifnull(nullif(l_tax, 0.0e0), -1.0e0) AS tax_default,
       CASE WHEN nullif(l_tax, 0.0e0) IS NOT NULL
            THEN 'taxed' ELSE 'untaxed' END AS tax_flag
FROM lineitem
"""

UDF_TABLE_FUNCTION = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
c AS (
  SELECT doc_id, l,
         unnest(generate_series(0,
            CAST(ceil(len(l) / 8.0) AS INT) - 1)) AS chunk_idx
  FROM t
),
s AS (
  SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
         array_to_string(l[chunk_idx * 8 + 1 :
                           least((chunk_idx + 1) * 8, len(l))], ' ') AS chunk
  FROM c
)
SELECT doc_id, chunk_idx, chunk, CAST(length(chunk) AS INT) AS n_chars
FROM s
"""

SQL_DDL_ROUNDTRIP = """
SELECT n_regionkey,
       COUNT(*) AS n_nations,
       MIN(n_name) AS first_nation
FROM nation
GROUP BY n_regionkey
"""

CSV_ROUNDTRIP = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       {_DSUM.format(c='c_acctbal')} AS total_balance
FROM customer GROUP BY c_mktsegment
"""

JSON_ROUNDTRIP = f"""
SELECT o_orderpriority AS prio, o_orderstatus AS status,
       COUNT(*) AS n_orders,
       {_DSUM.format(c='o_totalprice')} AS total_price
FROM orders GROUP BY 1, 2
"""

SESSION_WINDOW_BUILTIN = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s FROM events
),
g AS (
  SELECT *, LAG(epoch_s) OVER (PARTITION BY user_id ORDER BY epoch_s) AS prev_s
  FROM ev
),
f AS (
  -- boundary rule verified against the native operator at sf0.1: an
  -- event exactly `gap` after the previous one still MERGES (windows
  -- abut and session_window coalesces abutting ranges), so a new
  -- session starts only when the diff is STRICTLY greater
  SELECT *, CASE WHEN prev_s IS NULL OR epoch_s - prev_s > 1800
                 THEN 1 ELSE 0 END AS is_new
  FROM g
),
s AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY epoch_s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM f
)
SELECT user_id,
       MIN(epoch_s) AS session_start_s,
       MAX(epoch_s) AS session_end_s,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""

STAGE_FULL_REFRESH = f"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       COUNT(*) AS n_orders,
       {_DSUM.format(c='o_totalprice')} AS total_price
FROM orders GROUP BY 1
"""

UDF_GROUPED_MAP_ARROW = """
WITH c AS (
  SELECT p_brand,
         CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM part
)
SELECT p_brand,
       COUNT(*) AS n_parts,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       MIN(cents) AS min_cents,
       MAX(cents) AS max_cents
FROM c GROUP BY p_brand
"""

MM_AUDIO_WINDOWS = """
WITH d AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1),
                        i -> unicode(text[i:i])) AS b
  FROM documents
),
w AS (
  SELECT doc_id, b,
         unnest(generate_series(0,
            CAST(ceil(len(b) / 64.0) AS INT) - 1)) AS win_idx
  FROM d
),
s AS (
  SELECT doc_id, CAST(win_idx AS INT) AS win_idx,
         b[win_idx * 64 + 1 : least((win_idx + 1) * 64, len(b))] AS chunk
  FROM w
)
SELECT doc_id, win_idx,
       CAST(len(chunk) AS INT) AS n_samples,
       CAST(list_sum(list_transform(chunk, x -> x * x)) AS BIGINT) AS energy,
       CAST(list_max(chunk) AS INT) AS peak
FROM s
"""


PENDING_WORK = f"""
SELECT o_orderpriority AS priority,
       COUNT(*) AS pending_orders,
       {_DSUM.format(c='o_totalprice')} AS pending_value
FROM orders
WHERE o_orderkey NOT IN (
  SELECT o_orderkey FROM orders WHERE o_orderkey % 4 = 0
)
GROUP BY 1
"""


# --- A4+: Z-order clustered layout ------------------------------------
# Mirrors plans.pipeline.zorder_layout: 16-bit Morton code from the low
# 8 bits of (custkey, day-number), bucketed by z >> 6 — pure integer
# shifts/masks, identical in every engine.

ZORDER_LAYOUT = """
WITH coded AS (
  SELECT (o_custkey % 256) AS ck_bits,
         (date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 256) AS day_bits
  FROM orders
),
z AS (SELECT ck_bits, day_bits, ((((ck_bits >> 0) & 1) << 0) + (((day_bits >> 0) & 1) << 1) + (((ck_bits >> 1) & 1) << 2) + (((day_bits >> 1) & 1) << 3) + (((ck_bits >> 2) & 1) << 4) + (((day_bits >> 2) & 1) << 5) + (((ck_bits >> 3) & 1) << 6) + (((day_bits >> 3) & 1) << 7) + (((ck_bits >> 4) & 1) << 8) + (((day_bits >> 4) & 1) << 9) + (((ck_bits >> 5) & 1) << 10) + (((day_bits >> 5) & 1) << 11) + (((ck_bits >> 6) & 1) << 12) + (((day_bits >> 6) & 1) << 13) + (((ck_bits >> 7) & 1) << 14) + (((day_bits >> 7) & 1) << 15)) AS z FROM coded)
SELECT (z >> 6) AS z_bucket, COUNT(*) AS n_orders,
       CAST(MIN(ck_bits) AS BIGINT) AS min_ck, CAST(MAX(ck_bits) AS BIGINT) AS max_ck,
       CAST(MIN(day_bits) AS BIGINT) AS min_day, CAST(MAX(day_bits) AS BIGINT) AS max_day
FROM z GROUP BY 1
"""

RECURSIVE_HIERARCHY = """
WITH RECURSIVE chain AS (
  SELECT c_custkey, CAST(c_custkey AS BIGINT) AS node, 0 AS depth
  FROM customer
  UNION ALL
  SELECT c_custkey, CAST(floor(node / 10e0) AS BIGINT) AS node,
         depth + 1 AS depth
  FROM chain WHERE node >= 10
),
to_root AS (
  SELECT c_custkey, MAX(depth) AS chain_len FROM chain GROUP BY c_custkey
)
SELECT chain_len, COUNT(*) AS n_customers,
       MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
FROM to_root GROUP BY chain_len
"""

# E5+: incremental rollup merges partial states; the oracle recomputes
# from scratch — decimal associativity makes them bit-identical.
INCREMENTAL_ROLLUP = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 4) AS DOUBLE)
         AS total_price
FROM orders GROUP BY o_orderpriority
"""

# A1+: the Python-DataSource feed is deterministic integer arithmetic;
# the oracle regenerates it without the connector.
PYTHON_DATASOURCE_FEED = """
WITH states(state, sidx) AS (VALUES ('co', 0), ('mt', 1), ('wy', 2)),
units AS (SELECT unnest(generate_series(1, 40)) AS unit),
years(year) AS (VALUES (2020), (2021), (2022)),
feed AS (
  SELECT state, unit, year,
         (sidx*1000 + unit*37 + year*13) % 97 AS harvest,
         ((sidx*1000 + unit*37 + year*13) % 97) * 3 + (unit + year) % 11
           AS hunters
  FROM states, units, years
)
SELECT state, year, COUNT(*) AS n_units,
       CAST(SUM(harvest) AS BIGINT) AS total_harvest,
       CAST(SUM(hunters) AS BIGINT) AS total_hunters,
       CAST(MAX(harvest) AS INT) AS max_unit_harvest
FROM feed GROUP BY state, year
"""

# A1 (write side): the sink roundtrip is lossless over exact-integer
# columns, so the oracle aggregates orders directly.
PYTHON_DATASOURCE_WRITER = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
FROM orders
WHERE year(o_orderdate) = 1995
GROUP BY o_orderpriority
"""

# mapInArrow twin: plain per-source text stats.
UDF_MAP_IN_ARROW = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total_words,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(MAX(len(str_split(text, ' '))) AS BIGINT) AS max_words
FROM documents GROUP BY source
"""

UDF_ARROW_SCALAR = """
SELECT doc_id,
       CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
       CAST(length(text) AS INT) AS n_chars_checked
FROM documents
"""

# A8+: SQL UDF bodies inlined by the oracle directly
SQL_UDF_ROUNDTRIP = """
WITH t AS (
  SELECT CASE WHEN o_totalprice >= 200000e0 THEN 'high'
              WHEN o_totalprice >= 100000e0 THEN 'mid' ELSE 'low' END AS tier,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 2 ELSE 1 END AS w
  FROM orders
), r AS (
  SELECT tier, CAST(unnest(generate_series(1, w)) AS INT) AS copy FROM t
)
SELECT tier, copy, COUNT(*) AS n_orders FROM r GROUP BY tier, copy
"""

XML_ROUNDTRIP = """
SELECT s_nationkey, COUNT(*) AS n_suppliers,
       CAST(round(SUM(CAST(s_acctbal AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS total_balance,
       MIN(s_suppkey) AS min_suppkey
FROM supplier GROUP BY s_nationkey
"""

# A6+: additive schema evolution — old-generation rows NULL the column
SCHEMA_MERGE_SCAN = """
WITH merged AS (
  SELECT s_suppkey, NULL AS balance_tier FROM supplier WHERE s_suppkey % 2 = 0
  UNION ALL
  SELECT s_suppkey,
         CASE WHEN s_acctbal >= 5000 THEN 'high' ELSE 'low' END AS balance_tier
  FROM supplier WHERE s_suppkey % 2 = 1
)
SELECT COALESCE(balance_tier, 'pre-evolution') AS balance_tier,
       COUNT(*) AS n_suppliers,
       MIN(s_suppkey) AS min_key, MAX(s_suppkey) AS max_key
FROM merged GROUP BY 1
"""


C6_YEAR_FROM_PATH = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS file_year,
       COUNT(*) AS n_orders,
       {_DSUM.format(c='o_totalprice')} AS total_price
FROM orders
GROUP BY 1
"""


ORC_ROUNDTRIP = f"""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       {_DSUM.format(c='o_totalprice')} AS total_price
FROM orders
GROUP BY o_orderstatus
"""

TEXT_ROUNDTRIP = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents
GROUP BY lang
"""


FULL_OUTER_RECONCILIATION = """
WITH base AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price
  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
),
s AS (
  SELECT k, CASE WHEN k % 7 = 0
            THEN CAST(CAST(price AS DECIMAL(12,2))
                      * CAST(1.05 AS DECIMAL(7,4)) AS DOUBLE)
            ELSE price END AS s_price
  FROM base WHERE k % 11 <> 0
),
t AS (SELECT k, price AS t_price FROM base),
j AS (
  SELECT COALESCE(s.k, t.k) AS k, s_price, t_price
  FROM s FULL OUTER JOIN t ON s.k = t.k
),
c AS (
  SELECT k, s_price, t_price,
         CASE WHEN t_price IS NULL THEN 'only_in_source'
              WHEN s_price IS NULL THEN 'only_in_target'
              WHEN s_price <> t_price THEN 'differing'
              ELSE 'matching' END AS status,
         CASE WHEN s_price IS NOT NULL AND t_price IS NOT NULL
              THEN CAST(s_price AS DECIMAL(18,6))
                   - CAST(t_price AS DECIMAL(18,6)) END AS drift
  FROM j
)
SELECT status, COUNT(*) AS n_keys,
       CAST(round(SUM(drift), 4) AS DOUBLE) AS price_drift,
       MIN(k) AS min_key, MAX(k) AS max_key
FROM c GROUP BY status
"""


UNION_SCHEMA_EVOLUTION = """
WITH gen1 AS (
  SELECT s_suppkey, s_acctbal, CAST(NULL AS VARCHAR) AS tier
  FROM supplier WHERE s_suppkey % 2 = 0
),
gen2 AS (
  SELECT s_suppkey, s_acctbal,
         CASE WHEN s_acctbal >= 0 THEN 'solvent' ELSE 'deficit' END AS tier
  FROM supplier WHERE s_suppkey % 2 = 1
),
combined AS (SELECT * FROM gen1 UNION ALL SELECT * FROM gen2)
SELECT coalesce(tier, 'pre-evolution') AS tier,
       COUNT(*) AS n_suppliers,
       CAST(round(SUM(CAST(s_acctbal AS DECIMAL(12,2))), 4) AS DOUBLE)
         AS total_acctbal,
       MIN(s_suppkey) AS min_key
FROM combined GROUP BY 1
"""


INCREMENTAL_JOIN_MAINTENANCE = """
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_rows,
       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l_discount AS DECIMAL(7,4))), 4) AS DOUBLE)
         AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


# G4+: Holt — the recursive CTE replays the engine's exact op tree;
# l_new recomputed inline in the b-expression yields identical bits.
HOLT_LINEAR_TREND = """
WITH RECURSIVE monthly AS (
  SELECT o_orderpriority AS priority,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS month_idx,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS x
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT priority, x,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY month_idx)
           AS i
  FROM monthly
),
n AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_months
  FROM ranked GROUP BY priority
),
h(priority, i, l, b) AS (
  SELECT priority, i, x, 0.0e0 FROM ranked WHERE i = 1
  UNION ALL
  SELECT r.priority, r.i,
         0.5e0 * r.x + 0.5e0 * (h.l + h.b),
         0.25e0 * ((0.5e0 * r.x + 0.5e0 * (h.l + h.b)) - h.l)
           + 0.75e0 * h.b
  FROM h JOIN ranked r ON r.priority = h.priority AND r.i = h.i + 1
)
SELECT n.priority, n.n_months, h.l AS level, h.b AS trend,
       h.l + h.b AS forecast_next
FROM h JOIN n ON h.priority = n.priority AND h.i = n.n_months
"""

# G4+: EWMA — list_reduce with no init makes the first element the
# seed (s_1 = x_1), matching the engine's element_at/slice fold.
EWMA_TREND = """
WITH monthly AS (
  SELECT o_orderpriority AS priority,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS month_idx,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS x
  FROM orders GROUP BY 1, 2
),
series AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_months,
         list(x ORDER BY month_idx) AS xs
  FROM monthly GROUP BY priority
)
SELECT priority, n_months,
       list_reduce(xs, (acc, x) -> 0.5e0 * x + 0.5e0 * acc) AS ewma_fast,
       list_reduce(xs, (acc, x) -> 0.25e0 * x + 0.75e0 * acc) AS ewma_slow
FROM series
"""

# F: SMB co-location changes the plan, never the values.
SMB_COLOCATED_JOIN = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(round(SUM(CAST(l_quantity AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS sum_qty,
       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 4)
            AS DOUBLE) AS sum_price
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""

SEASONALITY_INDEX = """
WITH monthly AS (
  SELECT o_orderpriority AS priority,
         CAST(month(o_orderdate) AS INT) AS month,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT priority, month, n_orders,
       CAST(12 * n_orders AS DOUBLE)
         / CAST(SUM(n_orders) OVER (PARTITION BY priority) AS DOUBLE)
         AS seasonality_index
FROM monthly
"""

EQUI_DEPTH_HISTOGRAM = """
WITH binned AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS price,
         CAST(NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT)
           AS bin
  FROM orders
)
SELECT bin, COUNT(*) AS n_orders, MIN(price) AS lo, MAX(price) AS hi
FROM binned GROUP BY bin
"""


SCD2_POINT_IN_TIME = """
WITH hist AS (
  SELECT o_custkey, o_orderpriority AS priority,
         o_orderdate AS valid_from,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey)
           AS valid_to,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS INT)
           AS version
  FROM orders
)
SELECT priority, COUNT(*) AS n_customers,
       MIN(o_custkey) AS min_custkey,
       MAX(version) AS max_version
FROM hist
WHERE valid_from <= TIMESTAMP '1996-06-30'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '1996-06-30')
GROUP BY priority
"""


DYNAMIC_PARTITION_BACKFILL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       COUNT(*) AS n_orders,
       CAST(round(SUM(CAST(CASE
              WHEN EXTRACT(year FROM o_orderdate) = 1996
              THEN CAST(CAST(o_totalprice AS DOUBLE) AS DECIMAL(12,2))
                   * CAST(1.05 AS DECIMAL(7,4))
              ELSE CAST(CAST(o_totalprice AS DOUBLE) AS DECIMAL(18,6))
            END AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_price
FROM orders
GROUP BY 1
"""


DPP_PRUNED_JOIN = f"""
WITH years AS (
  SELECT DISTINCT 1992 + n_nationkey % 7 AS order_year,
         CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS label
  FROM nation
),
dim AS (SELECT * FROM years WHERE label = 'even')
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       dim.label,
       COUNT(*) AS n_orders,
       {_DSUM.format(c='o_totalprice')} AS total_price
FROM orders JOIN dim ON EXTRACT(year FROM o_orderdate) = dim.order_year
GROUP BY 1, 2
"""


TX_SCHEMA_EVOLUTION = """
WITH e AS (
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'
),
u AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(7,4))
              AS DOUBLE) AS o_totalprice,
         o_orderpriority,
         CASE WHEN o_orderkey % 2 = 0 THEN 'online' ELSE 'store' END
           AS channel
  FROM orders WHERE o_orderdate >= TIMESTAMP '1994-01-01'
),
merged AS (
  SELECT COALESCE(e.o_orderkey, u.o_orderkey) AS o_orderkey,
         CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
              ELSE e.o_totalprice END AS o_totalprice,
         CASE WHEN e.o_orderkey IS NOT NULL THEN e.o_orderpriority
              ELSE u.o_orderpriority END AS o_orderpriority,
         CASE WHEN u.o_orderkey IS NOT NULL THEN u.channel END AS channel
  FROM e FULL OUTER JOIN u ON e.o_orderkey = u.o_orderkey
)
SELECT o_orderpriority, coalesce(channel, 'legacy') AS channel,
       COUNT(*) AS n_orders,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 4) AS DOUBLE)
         AS total_price
FROM merged
GROUP BY 1, 2
"""


ZSTD_COMPRESSION_ROUNDTRIP = f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       {_DSUM.format(c='l_quantity')} AS sum_qty,
       {_DSUM.format(c='l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY l_returnflag
"""


ASOF_FORWARD_RECOVERY = """
WITH l AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us
  FROM events WHERE event_type = 'error'
),
r AS (
  SELECT user_id, epoch_us(ts) AS r_ts_us, event_type AS r_type
  FROM events WHERE event_type <> 'error'
),
nxt AS (
  SELECT l.event_id, l.user_id, l.t_us, MIN(r.r_ts_us) AS next_ts_us
  FROM l LEFT JOIN r ON r.user_id = l.user_id AND r.r_ts_us >= l.t_us
  GROUP BY 1, 2, 3
)
SELECT n.event_id, n.user_id, n.t_us, n.next_ts_us,
       r.r_type AS next_type,
       n.next_ts_us - n.t_us AS recovery_us
FROM nxt n
LEFT JOIN r ON r.user_id = n.user_id AND r.r_ts_us = n.next_ts_us
"""


REFERENTIAL_INTEGRITY_AUDIT = """
SELECT 'orders->customer' AS fk_edge,
       (SELECT COUNT(*) FROM orders) AS n_child_rows,
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_orphans
UNION ALL
SELECT 'lineitem->orders',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem->part',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem->supplier',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'customer->nation',
       (SELECT COUNT(*) FROM customer),
       (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
"""


MULTISET_OPS = """
WITH keys AS (SELECT o_custkey AS custkey FROM orders),
urgent AS (
  SELECT o_custkey AS custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
),
bag AS (SELECT * FROM keys UNION ALL SELECT * FROM urgent),
i AS (SELECT * FROM bag INTERSECT ALL SELECT * FROM keys),
x AS (SELECT * FROM bag EXCEPT ALL SELECT * FROM keys)
SELECT 'intersect_all' AS op, COUNT(*) AS n_rows,
       COUNT(DISTINCT custkey) AS n_customers FROM i
UNION ALL
SELECT 'except_all', COUNT(*), COUNT(DISTINCT custkey) FROM x
"""


GINI_CONCENTRATION = """
WITH per_cust AS (
  SELECT c.c_nationkey, c.c_custkey,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, c.c_custkey
),
ranked AS (
  SELECT c_nationkey, rev_cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
              ORDER BY rev_cents, c_custkey) AS BIGINT) AS i,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
  FROM per_cust
)
SELECT c_nationkey AS nationkey,
       COUNT(*) AS n_customers,
       CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
       CAST(CAST(SUM((2 * i - n - 1) * rev_cents) AS BIGINT) AS DOUBLE)
         / (CAST(COUNT(*) AS DOUBLE)
            * CAST(CAST(SUM(rev_cents) AS BIGINT) AS DOUBLE)) AS gini
FROM ranked GROUP BY c_nationkey
"""


NTILE_CUSTOMER_TIERS = """
WITH tiers AS (
  SELECT c_nationkey,
         CAST(NTILE(4) OVER (
           PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
         ) AS INT) AS tier,
         CAST(c_acctbal AS DECIMAL(12,2)) AS bal
  FROM customer
)
SELECT c_nationkey, tier, COUNT(*) AS n_customers,
       CAST(MIN(bal) AS DOUBLE) AS lo_bal,
       CAST(MAX(bal) AS DOUBLE) AS hi_bal,
       CAST(CAST(SUM(bal) AS DECIMAL(18,2)) AS DOUBLE) AS sum_bal
FROM tiers GROUP BY c_nationkey, tier
"""


SEASONAL_NAIVE_FORECAST = """
WITH monthly AS (
  SELECT o_orderpriority AS priority,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_dec
  FROM orders GROUP BY 1, 2, 3
),
j AS (
  SELECT c.priority, c.total_dec AS actual, p.total_dec AS forecast
  FROM monthly c
  JOIN monthly p ON c.priority = p.priority
   AND c.yr = p.yr + 1 AND c.mo = p.mo
)
SELECT priority, COUNT(*) AS n_forecasts,
       CAST(round(SUM(ABS(actual - forecast)), 4) AS DOUBLE) / COUNT(*)
         AS mae,
       CAST(round(SUM(actual - forecast), 4) AS DOUBLE) / COUNT(*)
         AS mean_bias
FROM j GROUP BY priority
"""


RETRACTABLE_ROLLUP = """
WITH post AS (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(12,2))
              * CAST(1.1 AS DECIMAL(7,4)) AS DECIMAL(18,6)) AS price
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(18,6))
  FROM orders WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(round(SUM(price), 4) AS DOUBLE) AS total_price
FROM post GROUP BY o_orderpriority
"""


JSON_CORRUPT_RECORDS = """
SELECT o_orderpriority AS priority, COUNT(*) AS n_rows,
       CAST(0 AS BIGINT) AS n_corrupt,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 4) AS DOUBLE)
         AS total_price
FROM orders WHERE o_orderkey % 50 <> 0
GROUP BY o_orderpriority
UNION ALL
SELECT '_corrupt' AS priority, COUNT(*) AS n_rows,
       COUNT(*) AS n_corrupt,
       CAST(NULL AS DOUBLE) AS total_price
FROM orders WHERE o_orderkey % 50 = 0
"""


INTERVAL_RANGE_FRAME = """
WITH daily AS (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         COUNT(*) AS n_day,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS sum_dec
  FROM orders GROUP BY 1, 2
)
SELECT priority, day, n_day,
       CAST(SUM(n_day) OVER (PARTITION BY priority ORDER BY day
         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
         AS BIGINT) AS n_30d,
       CAST(round(SUM(sum_dec) OVER (PARTITION BY priority ORDER BY day
         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 4)
         AS DOUBLE) AS sum_30d
FROM daily
"""


TX_GUARDED_MERGE = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderdate AS g,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 4 <> 3
),
upd AS (
  SELECT o_orderkey AS k,
    CASE o_orderkey % 4
      WHEN 0 THEN o_orderdate + INTERVAL 365 DAY
      WHEN 1 THEN o_orderdate - INTERVAL 365 DAY
      ELSE o_orderdate END AS g,
    CASE o_orderkey % 4
      WHEN 0 THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 100000
                       AS DOUBLE)
      WHEN 1 THEN -1e0
      WHEN 2 THEN -2e0
      ELSE CAST(o_totalprice AS DOUBLE) END AS price
  FROM orders
),
final AS (
  SELECT COALESCE(b.k, u.k) AS k,
         CASE WHEN u.k IS NOT NULL AND (b.k IS NULL OR u.g > b.g)
              THEN u.g ELSE b.g END AS g,
         CASE WHEN u.k IS NOT NULL AND (b.k IS NULL OR u.g > b.g)
              THEN u.price ELSE b.price END AS price
  FROM base b FULL OUTER JOIN upd u ON b.k = u.k
)
SELECT k % 4 AS bucket, COUNT(*) AS n_rows,
       CAST(round(SUM(CAST(price AS DECIMAL(18,6))), 4) AS DOUBLE)
         AS total_price,
       MIN(g) AS min_g, MAX(g) AS max_g
FROM final GROUP BY 1
"""


TX_DELETE_RESTORE = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS total_price,
       'deleted' AS state
FROM orders WHERE o_orderkey % 7 <> 0
GROUP BY 1
UNION ALL
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS total_price,
       'restored' AS state
FROM orders
GROUP BY 1
"""


TX_UPDATE_CHANGE_FEED = """
SELECT 'delete' AS _change_type, COUNT(*) AS n_rows,
       CAST(round(SUM(CAST(CAST(o_totalprice AS DOUBLE) AS DECIMAL(14,2))),
                  4) AS DOUBLE) AS total_price,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT 'insert' AS _change_type, COUNT(*) AS n_rows,
       CAST(round(SUM(CAST(CAST(o_totalprice AS DOUBLE) * 2
                           AS DECIMAL(14,2))), 4) AS DOUBLE) AS total_price,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM orders WHERE o_orderpriority = '1-URGENT'
"""


TX_STREAM_SOURCE = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS total_price,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM orders
GROUP BY 1
"""


TX_DV_DELETE = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS total_price,
       'remaining' AS state
FROM orders WHERE o_orderkey % 5 <> 0
GROUP BY 1
UNION ALL
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS total_price,
       'dv_deleted' AS state
FROM orders WHERE o_orderkey % 5 = 0
GROUP BY 1
"""


TX_ZORDER_PRUNED_DELETE = """
WITH b AS (
  SELECT MIN(o_custkey) AS lo,
         MIN(o_custkey) + (MAX(o_custkey) - MIN(o_custkey)) // 8 AS hi
  FROM orders
)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS total_price,
       MIN(o_custkey) AS min_cust
FROM orders, b
WHERE o_custkey NOT BETWEEN b.lo AND b.hi
GROUP BY 1
"""


# E2+: the manifest freezes v1 (1995+1996); the live read sees v2
# (+1997). Both populations replayed straight off orders.
TX_MANIFEST_EXPORT = """
WITH v1 AS (
  SELECT o_orderpriority, o_orderkey FROM orders
  WHERE year(o_orderdate) IN (1995, 1996)
),
v2 AS (
  SELECT o_orderpriority, o_orderkey FROM orders
  WHERE year(o_orderdate) IN (1995, 1996, 1997)
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
       'manifest_v1' AS reader
FROM v1 GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
       'live_v2' AS reader
FROM v2 GROUP BY o_orderpriority
"""

# E2+: bloom pruning never changes results (no false negatives), so
# the oracle is the plain IN-list.
TX_BLOOM_PRUNED_LOOKUP = """
SELECT o_orderkey, o_custkey, o_orderpriority
FROM orders
WHERE o_orderkey IN (
  (SELECT MIN(o_orderkey) FROM orders),
  (SELECT MAX(o_orderkey) FROM orders),
  -1
)
"""

# E2+: parquet-sidecar bloom lookup with a DV-deleted max key — the
# deleted key must return nothing, the min key everything, pruning
# never changes results.
TX_BLOOM_TABLE_LOOKUP = """
SELECT o_orderkey, o_custkey, o_orderpriority
FROM orders
WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM orders)
"""

# E2+: incremental bloom index — maintenance strategy never changes
# answers: min key present, first CDC-only key present (arrived
# pre-indexed), DV-deleted max key absent, absent key absent.
TX_INCREMENTAL_BLOOM_INDEX = """
WITH bounds AS (
  SELECT MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx FROM orders
), cdc AS (
  SELECT MIN(o_orderkey) AS ck FROM orders WHERE o_orderkey % 3 = 0
), base AS (
  SELECT MIN(o_orderkey) AS bk FROM orders WHERE o_orderkey % 3 <> 0
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderpriority
FROM orders o, bounds b, cdc c, base e
WHERE o.o_orderkey IN (b.mn, c.ck, e.bk, b.mx, -1)
  AND o.o_orderkey <> b.mx
"""

# E2+: replaceWhere — the urgent region rebuilt: even keys survive
# with negated custkeys, everything else unchanged.
TX_REPLACE_WHERE = f"""
WITH merged AS (
  SELECT o_orderpriority, o_custkey, o_totalprice FROM orders
  WHERE o_orderpriority <> '1-URGENT'
  UNION ALL
  SELECT o_orderpriority, -o_custkey, o_totalprice FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 2 = 0
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey,
       {_DSUM.format(c='o_totalprice')} AS total_price
FROM merged GROUP BY o_orderpriority
"""

# E2+: generated columns are pure derivations — the replay just
# re-derives them.
TX_GENERATED_COLUMNS = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_orderkey % 16) AS BIGINT) AS n_buckets,
       {_DSUM.format(c='o_totalprice')} AS total_price
FROM orders GROUP BY 1
"""

# E2+: column-mapping rename is presentation-only — the replay just
# aliases; the min key's revenue was zeroed by the post-rename merge.
TX_COLUMN_RENAME = f"""
WITH merged AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderkey = (SELECT MIN(o_orderkey) FROM orders)
              THEN 0e0 ELSE o_totalprice END AS revenue
  FROM orders
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       {_DSUM.format(c='revenue')} AS sum_revenue
FROM merged GROUP BY o_orderpriority
"""

# E2+: composite-key pruned merge — the merge replayed relationally:
# min-composite-key row gets +100 quantity, one (-1, 1) insert.
TX_COMPOSITE_PRUNED_MERGE = """
WITH target AS (
  SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
), mink AS (
  SELECT l_orderkey, l_linenumber FROM target
  ORDER BY l_orderkey, l_linenumber LIMIT 1
), merged AS (
  SELECT t.l_linenumber,
         CASE WHEN m.l_orderkey IS NOT NULL
              THEN t.l_quantity + 100 ELSE t.l_quantity END AS l_quantity
  FROM target t LEFT JOIN mink m
    ON t.l_orderkey = m.l_orderkey AND t.l_linenumber = m.l_linenumber
  UNION ALL
  SELECT 1, 7e0
)
SELECT l_linenumber, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(round(SUM(CAST(l_quantity AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS sum_qty
FROM merged GROUP BY l_linenumber
"""

# E2+: vacuum reclaims storage, never answers — the retained head is
# orders minus the deleted key band plus the appended batch.
TX_VACUUM_RETENTION = f"""
WITH survive AS (
  SELECT o_orderpriority, o_totalprice FROM orders
  WHERE o_orderkey % 5 <> 0
), extra AS (
  SELECT o_orderpriority, o_totalprice FROM orders
  WHERE o_orderkey % 7 = 0
), allr AS (
  SELECT * FROM survive UNION ALL SELECT * FROM extra
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
       {_DSUM.format(c="o_totalprice")} AS total_price
FROM allr GROUP BY o_orderpriority
"""

# E2+: DF-planned merge — planner strategy never changes answers:
# max composite key's quantity bumped, (-2, 1) row inserted.
TX_DF_PLANNED_MERGE = """
WITH target AS (
  SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
), maxk AS (
  SELECT l_orderkey, l_linenumber FROM target
  ORDER BY l_orderkey DESC, l_linenumber DESC LIMIT 1
), merged AS (
  SELECT t.l_orderkey, t.l_linenumber,
         CASE WHEN m.l_orderkey IS NOT NULL
              THEN t.l_quantity + 50 ELSE t.l_quantity END AS l_quantity
  FROM target t LEFT JOIN maxk m
    ON t.l_orderkey = m.l_orderkey AND t.l_linenumber = m.l_linenumber
  UNION ALL
  SELECT -2, 1, 5e0
)
SELECT l_linenumber, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(round(SUM(CAST(l_quantity AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS sum_qty,
       MIN(l_orderkey) AS min_okey
FROM merged GROUP BY l_linenumber
"""

TX_APPEND_EVOLUTION = """
SELECT COALESCE(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
                      AND o_orderdate < TIMESTAMP '1996-01-01'
                     THEN o_orderpriority END, '<none>') AS priority,
       COUNT(*) AS n_orders,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS total_price,
       MIN(o_orderkey) AS min_key
FROM orders
GROUP BY 1
"""


SQL_VARIABLES_INTERFACE = """
SELECT o_orderpriority,
       CAST(year(o_orderdate) AS INT) AS order_year,
       COUNT(*) AS n_orders,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4)
            AS DOUBLE) AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY 1, 2
HAVING COUNT(*) >= 5
"""


CDC_APPLY_CHANGES = """
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_keys,
       CAST(round(SUM(CAST(CASE WHEN o_orderkey % 3 = 0
                 THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 1000
                           AS DOUBLE)
                 ELSE CAST(o_totalprice AS DOUBLE) END
            AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_price,
       CAST(SUM(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_updated
FROM orders
WHERE o_orderkey % 5 <> 0
GROUP BY 1
"""


STREAMING_CDF_APPLY = """
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_keys,
       CAST(round(SUM(CAST(CASE WHEN o_orderkey % 3 = 0
                 THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 1000
                           AS DOUBLE)
                 ELSE CAST(o_totalprice AS DOUBLE) END
            AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_price,
       MIN(o_orderkey) AS min_key
FROM orders
WHERE o_orderkey % 5 <> 0
GROUP BY 1
"""


# Final CDC state by MAX SEQUENCE (not arrival order): keys div 5 are
# deleted at seq 2 UNLESS seq-3 updated (keys div 15), whose late
# stale delete must be rejected and counted — one rejection per such
# key. Prices follow the CDF-apply exactness discipline.
STREAMING_CDC_LATE_ARRIVALS = """
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_keys,
       CAST(round(SUM(CAST(CASE WHEN o_orderkey % 3 = 0
                 THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 1000
                           AS DOUBLE)
                 ELSE CAST(o_totalprice AS DOUBLE) END
            AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_price,
       CAST(SUM(CASE WHEN o_orderkey % 15 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_stale,
       MIN(o_orderkey) AS min_key
FROM orders
WHERE o_orderkey % 5 <> 0 OR o_orderkey % 15 = 0
GROUP BY 1
"""


# PIVOT replayed as conditional aggregation (what Spark's pinned-value
# pivot compiles to); column order mirrors the pivot output exactly.
PIVOT_PRIORITY_MATRIX = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT_n",
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
            FILTER (WHERE o_orderpriority = '1-URGENT'), 4) AS DOUBLE)
         AS "1-URGENT_rev",
       COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH_n",
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
            FILTER (WHERE o_orderpriority = '2-HIGH'), 4) AS DOUBLE)
         AS "2-HIGH_rev",
       COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM_n",
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
            FILTER (WHERE o_orderpriority = '3-MEDIUM'), 4) AS DOUBLE)
         AS "3-MEDIUM_rev",
       COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
         AS "4-NOT SPECIFIED_n",
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
            FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED'), 4) AS DOUBLE)
         AS "4-NOT SPECIFIED_rev",
       COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW_n",
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
            FILTER (WHERE o_orderpriority = '5-LOW'), 4) AS DOUBLE)
         AS "5-LOW_rev"
FROM orders GROUP BY 1
"""


LATERAL_TOPN_PER_CUSTOMER = """
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 3
) o
"""


# The IVM state after create -> bump-merge -> DV delete must equal the
# from-scratch rollup of the surviving rows with bumped prices.
STREAMING_CDF_IVM = """
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_rows,
       CAST(round(SUM(CAST(CASE WHEN o_orderkey % 3 = 0
                 THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 1000
                           AS DOUBLE)
                 ELSE CAST(o_totalprice AS DOUBLE) END
            AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderkey % 5 <> 0
GROUP BY 1
"""

# G4: CUSUM via its closed window form — every s_t is exact integer
# arithmetic; window sums cast back to BIGINT (DuckDB widens them).
CUSUM_CHANGEPOINT = """
WITH monthly AS (
  SELECT o_orderpriority AS priority,
         CAST(year(o_orderdate) AS BIGINT) * 12
           + month(o_orderdate) - 1 AS month_idx,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS x
  FROM orders GROUP BY 1, 2
),
refs AS (
  SELECT priority, CAST(SUM(x) AS BIGINT) // COUNT(*) AS ref
  FROM monthly GROUP BY priority
),
scored AS (
  SELECT m.priority, m.month_idx, r.ref,
         CAST(SUM(m.x - r.ref) OVER (
           PARTITION BY m.priority ORDER BY m.month_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS p
  FROM monthly m JOIN refs r USING (priority)
),
cusum AS (
  SELECT priority, month_idx, ref,
         p - least(CAST(0 AS BIGINT), CAST(MIN(p) OVER (
           PARTITION BY priority ORDER BY month_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT)) AS s
  FROM scored
),
peaked AS (
  SELECT priority, month_idx, ref, s,
         MAX(s) OVER (PARTITION BY priority) AS max_s
  FROM cusum
)
SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_months,
       CAST(MIN(ref) AS BIGINT) AS ref_cents,
       CAST(MAX(s) AS BIGINT) AS max_cusum,
       MIN(CASE WHEN s = max_s THEN month_idx END) AS peak_month_idx
FROM peaked GROUP BY priority
"""

# F: pipe syntax is sugar — the oracle is the standard form.
SQL_PIPE_SYNTAX = """
SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY 1, 2
"""


# Multimodal: VAD-style energy segmentation — active windows
# (integer gate) merged into runs via gaps-and-islands.
MM_AUDIO_SEGMENTS = """
WITH d AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1),
                        i -> unicode(text[i:i])) AS b
  FROM documents
),
w AS (
  SELECT doc_id, b,
         unnest(generate_series(0,
            CAST(ceil(len(b) / 64.0) AS INT) - 1)) AS win_idx
  FROM d
),
s AS (
  SELECT doc_id, CAST(win_idx AS INT) AS win_idx,
         b[win_idx * 64 + 1 : least((win_idx + 1) * 64, len(b))] AS chunk
  FROM w
),
f AS (
  SELECT doc_id, win_idx, len(chunk) AS n,
         CAST(list_sum(list_transform(chunk, x -> x * x)) AS BIGINT)
           AS energy
  FROM s
),
a AS (SELECT * FROM f WHERE energy >= 9800 * n),
i AS (
  SELECT doc_id, win_idx, energy,
         win_idx - ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY win_idx) AS seg_id
  FROM a
)
SELECT doc_id, CAST(MIN(win_idx) AS INT) AS seg_start,
       CAST(MAX(win_idx) AS INT) AS seg_end,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(energy) AS BIGINT) AS seg_energy
FROM i GROUP BY doc_id, seg_id
"""


# E2+: partition-spec evolution is layout, never semantics — one
# calendar-month window replayed off raw orders.
TX_PARTITION_EVOLUTION = """
WITH w AS (
  SELECT COALESCE(date_trunc('month', MIN(o_orderdate)),
                  TIMESTAMP '1970-01-01') AS lo
  FROM orders
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey
FROM orders, w
WHERE o_orderdate >= lo AND o_orderdate < lo + INTERVAL 1 MONTH
GROUP BY o_orderpriority
"""


# E2+: TIMESTAMP AS OF between commits serves the earlier commit —
# the mid-history state is orders minus the %3 key band.
TX_TIMETRAVEL_ASOF = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
       {_DSUM.format(c="o_totalprice")} AS total_price
FROM orders WHERE o_orderkey % 3 <> 0
GROUP BY o_orderpriority
"""


# E2+ declarative pipeline: the gold rollup replayed over ONLY the
# rows passing every silver expectation, plus one row per DECLARED
# expectation with its violation count (zero included; NOT(expr IS
# TRUE) mirrors the NULL-counts-as-violation routing).
TX_DECLARATIVE_PIPELINE = f"""
WITH sl AS (
  SELECT * FROM lineitem WHERE (l_quantity < 50) IS TRUE
                           AND (l_tax >= 0) IS TRUE
),
so AS (
  SELECT * FROM orders WHERE (o_totalprice < 400000) IS TRUE
                         AND (o_orderpriority IS NOT NULL) IS TRUE
),
gold AS (
  SELECT 'gold' AS section,
         l_returnflag AS k1,
         o_orderpriority AS k2,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         {_DSUM.format(c='l_quantity')} AS sum_qty,
         CAST(round(SUM({_REV}), 4) AS DOUBLE) AS revenue
  FROM sl JOIN so ON l_orderkey = o_orderkey
  GROUP BY l_returnflag, o_orderpriority
),
q AS (
  SELECT 'silver_lineitem' AS k1, 'non_negative_tax' AS k2,
         CAST(COUNT(*) FILTER (NOT ((l_tax >= 0) IS TRUE)) AS BIGINT)
           AS n_rows
  FROM lineitem
  UNION ALL
  SELECT 'silver_lineitem', 'qty_below_max',
         CAST(COUNT(*) FILTER (NOT ((l_quantity < 50) IS TRUE)) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'silver_orders', 'has_priority',
         CAST(COUNT(*) FILTER (NOT ((o_orderpriority IS NOT NULL) IS TRUE))
              AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'silver_orders', 'modest_price',
         CAST(COUNT(*) FILTER (NOT ((o_totalprice < 400000) IS TRUE))
              AS BIGINT)
  FROM orders
)
SELECT * FROM gold
UNION ALL
SELECT 'quarantine' AS section, k1, k2, n_rows,
       CAST(NULL AS DOUBLE) AS sum_qty, CAST(NULL AS DOUBLE) AS revenue
FROM q
"""


# E2+ cross-table atomic pipeline: run 2's published gold (full
# corpus through the qty_cap expectation and the silver filter) plus
# the mid-run observer's bronze count, which all-or-none visibility
# pins to RUN 1's half-corpus bronze — the atomicity evidence rides
# inside the hashed row values.
TX_ATOMIC_PIPELINE = """
WITH b2 AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
  FROM lineitem WHERE l_quantity <= 45
),
s2 AS (SELECT * FROM b2 WHERE l_orderkey % 4 <> 1),
s1 AS (SELECT * FROM s2 WHERE l_orderkey % 2 = 0),
b1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM lineitem
  WHERE l_orderkey % 2 = 0 AND l_quantity <= 45
)
SELECT l_linenumber,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 4)
            AS DOUBLE) AS sum_price,
       CAST(1 AS INT) AS pipeline_version,
       (SELECT c FROM b1) AS mid_run_bronze_rows
FROM s2 GROUP BY l_linenumber
UNION ALL
SELECT l_linenumber,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 4)
            AS DOUBLE) AS sum_price,
       CAST(0 AS INT) AS pipeline_version,
       (SELECT c FROM b1) AS mid_run_bronze_rows
FROM s1 GROUP BY l_linenumber
"""


# E2+ incremental pipeline: publish 1's gold over BOTH appended
# chunks and publish 0's over chunk 1 alone (read back via manifest
# history), plus the delta cardinality run 2's silver observed — the
# incremental law's evidence rides inside the hashed row values.
TX_INCREMENTAL_PIPELINE = """
WITH b AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
  FROM lineitem WHERE l_quantity <= 45
),
s AS (SELECT * FROM b WHERE l_linenumber <= 5),
s1 AS (SELECT * FROM s WHERE l_orderkey % 2 = 0),
d2 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM b WHERE l_orderkey % 2 = 1
)
SELECT l_linenumber,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 4)
            AS DOUBLE) AS sum_price,
       CAST(1 AS INT) AS pipeline_version,
       (SELECT c FROM d2) AS silver_delta_rows
FROM s GROUP BY l_linenumber
UNION ALL
SELECT l_linenumber,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 4)
            AS DOUBLE) AS sum_price,
       CAST(0 AS INT) AS pipeline_version,
       (SELECT c FROM d2) AS silver_delta_rows
FROM s1 GROUP BY l_linenumber
"""


# E2+ tri-clause MERGE (mirror sync): non-URGENT rows untouched; the
# URGENT region is replaced by the authoritative source batch (its
# even-key rows updated + two inserts; odd-key rows deleted).
TX_MERGE_SYNC = """
WITH src AS (
  SELECT o_orderkey, o_orderpriority, -o_custkey AS o_custkey,
         o_totalprice
  FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 2 = 0
  UNION ALL
  SELECT * FROM (VALUES
    (CAST(-1 AS BIGINT), '1-URGENT', CAST(-77 AS BIGINT), 111e0),
    (CAST(-2 AS BIGINT), '1-URGENT', CAST(-88 AS BIGINT), 222e0)
  ) v(o_orderkey, o_orderpriority, o_custkey, o_totalprice)
),
after AS (
  SELECT o_orderkey, o_orderpriority, o_custkey, o_totalprice
  FROM orders WHERE o_orderpriority <> '1-URGENT'
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_custkey, o_totalprice FROM src
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4)
            AS DOUBLE) AS total_price
FROM after GROUP BY o_orderpriority
"""


# E2+ DV purge: the purge changes no answer, so the oracle is simply
# the survivors of the two layered deletes.
TX_DV_PURGE = """
SELECT o_orderkey % 5 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4)
            AS DOUBLE) AS total_price
FROM orders
WHERE NOT (o_orderkey % 7 = 3 OR o_orderkey % 11 = 5)
GROUP BY 1
"""


# E2+ metadata-only DROP COLUMN: the drop never moves data, so the
# post-drop table is simply every row without the dropped column.
TX_DROP_COLUMN = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4)
            AS DOUBLE) AS total_price
FROM orders GROUP BY o_orderpriority
"""


# F: skyline / Pareto frontier — direct full-data window formulation
# (the Spark side prefilters at month grain first; same final rows).
# r13 encoding: zero convertible output types — int day offset instead
# of DATE, the raw parquet double instead of DECIMAL(12,2); double
# compares/copies are bit-exact on both engines, so no cast surface
# remains for any comparator to canonicalize.
PARETO_FRONTIER = """
WITH pts AS (
  SELECT c.c_mktsegment AS segment, o.o_orderkey,
         o.o_totalprice AS price,
         CAST(date_diff('day', DATE '1992-01-01',
                        CAST(o.o_orderdate AS DATE)) AS INTEGER) AS day_idx
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), f AS (
  SELECT segment, o_orderkey, day_idx, price,
         MAX(price) OVER (PARTITION BY segment ORDER BY day_idx
           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS past_max,
         MAX(price) OVER (PARTITION BY segment, day_idx) AS same_date_max
  FROM pts
)
SELECT segment, o_orderkey, day_idx, price
FROM f
WHERE price = same_date_max AND (past_max IS NULL OR price > past_max)
"""


# E2+ (r13): pipeline-level multi-writer OCC — the published history
# after A(residue 0) -> B(residue 1, interloper wins) -> C(residue 2,
# CAS-aborted then retried): gold at pipeline versions 0/1/2.
TX_CONCURRENT_PIPELINE_OCC = """
SELECT l_linenumber,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 4)
            AS DOUBLE) AS sum_price,
       CAST(v.pipeline_version AS INT) AS pipeline_version
FROM lineitem, (SELECT unnest(generate_series(0, 2)) AS pipeline_version) v
WHERE l_orderkey % 3 = v.pipeline_version
GROUP BY l_linenumber, v.pipeline_version
"""

TX_PIPELINE_VACUUM_READERS = """
SELECT l_linenumber,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 4)
            AS DOUBLE) AS sum_price,
       CAST(v.pipeline_version AS INT) AS pipeline_version
FROM lineitem, (SELECT unnest(generate_series(2, 3)) AS pipeline_version) v
WHERE l_orderkey % 5 = v.pipeline_version
GROUP BY l_linenumber, v.pipeline_version
"""
