"""DuckDB oracle SQL for the TPC-H completion wave (plans.tpch).

Same dialect discipline as oracles_f/oracles_h: e-notation doubles,
decimal-exact float reductions, INT casts where DuckDB widens, and
constants imported from the plan module so both sides move together.
"""

from __future__ import annotations

from bow_hunter_pipeline_spark.plans import tpch as t

_DSUM = "CAST(round(SUM(CAST({c} AS DECIMAL(14,2))), 4) AS DOUBLE)"
_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(7,4))"
)

Q6_FORECAST_REVENUE = f"""
SELECT
  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(7,4))), 4) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{t.Q6_YEAR_START}'
  AND l_shipdate < TIMESTAMP '{t.Q6_YEAR_END}'
  AND l_discount >= {t.Q6_DISC_LO}e0 AND l_discount <= {t.Q6_DISC_HI}e0
  AND l_quantity < {t.Q6_QTY_MAX}e0
"""

Q10_RETURNED_ITEMS = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(round(SUM({_REV}), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{t.Q10_QTR_START}'
  AND o_orderdate < TIMESTAMP '{t.Q10_QTR_END}'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

Q12_LATE_SHIPMENT = f"""
SELECT
  l_shipdate > o_orderdate + INTERVAL {t.Q12_LATE_DAYS} DAY AS is_late,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""

Q14_PROMO_REVENUE = f"""
WITH agg AS (
  SELECT
    CAST(round(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                        ELSE CAST(0 AS DECIMAL(20,6)) END), 4) AS DOUBLE)
      AS promo_rev,
    CAST(round(SUM({_REV}), 4) AS DOUBLE) AS total_rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{t.Q14_MONTH_START}'
    AND l_shipdate < TIMESTAMP '{t.Q14_MONTH_END}'
)
SELECT 100.0e0 * promo_rev / total_rev AS promo_revenue_pct,
       promo_rev, total_rev
FROM agg
"""

Q15_TOP_SUPPLIER = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(round(SUM({_REV}), 4) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{t.Q15_QTR_START}'
    AND l_shipdate < TIMESTAMP '{t.Q15_QTR_END}'
  GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""

Q17_SMALL_QUANTITY = f"""
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{t.Q17_BRAND}'
), per_part AS (
  SELECT l_partkey AS ap_partkey,
         {_DSUM.format(c='l_quantity')} / COUNT(l_quantity) AS avg_qty
  FROM brand_li
  GROUP BY l_partkey
)
SELECT {_DSUM.format(c='l_extendedprice')} / 7.0e0 AS avg_yearly,
       COUNT(*) AS n_rows
FROM brand_li JOIN per_part ON l_partkey = ap_partkey
WHERE l_quantity < 0.2e0 * avg_qty
"""

Q18_LARGE_VOLUME = f"""
WITH big AS (
  SELECT l_orderkey AS agg_orderkey,
         {_DSUM.format(c='l_quantity')} AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING {_DSUM.format(c='l_quantity')} > {t.Q18_QTY_THRESHOLD}e0
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big
JOIN orders ON agg_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""

# --- batch 2: subquery-heavy shapes ------------------------------------

Q8_MARKET_SHARE = f"""
WITH yearly AS (
  SELECT
    CAST(year(o_orderdate) AS INT) AS o_year,
    CAST(round(SUM(CASE WHEN n2.n_name = '{t.Q8_NATION}' THEN {_REV}
                        ELSE CAST(0 AS DECIMAL(20,6)) END), 4) AS DOUBLE)
      AS nation_volume,
    CAST(round(SUM({_REV}), 4) AS DOUBLE) AS total_volume
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = '{t.Q8_REGION}'
    AND p_type = '{t.Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '{t.Q8_START}'
    AND o_orderdate < TIMESTAMP '{t.Q8_END}'
  GROUP BY 1
)
SELECT o_year, nation_volume / total_volume AS mkt_share,
       nation_volume, total_volume
FROM yearly
"""

Q9_PRODUCT_PROFIT = f"""
SELECT
  n_name AS nation,
  CAST(year(o_orderdate) AS INT) AS o_year,
  CAST(round(SUM({_REV}
      - CAST(p_retailprice AS DECIMAL(12,2))
        * CAST(l_quantity AS DECIMAL(14,2))
        * CAST(0.5 AS DECIMAL(7,4))), 4) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{t.Q9_PART_TOKEN}%'
GROUP BY n_name, 2
"""

_MONEY_SUM = "CAST(round(SUM(CAST({c} AS DECIMAL(12,2))), 4) AS DOUBLE)"

Q11_IMPORTANT_STOCK = f"""
WITH asia_li AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{t.Q11_REGION}'
)
SELECT l_partkey, {_MONEY_SUM.format(c='l_extendedprice')} AS part_value
FROM asia_li
GROUP BY l_partkey
HAVING {_MONEY_SUM.format(c='l_extendedprice')} >
  {t.Q11_FRACTION}e0 * (SELECT {_MONEY_SUM.format(c='l_extendedprice')} FROM asia_li)
"""

Q16_SUPPLIER_PART_COUNTS = f"""
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM pairs JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{t.Q16_EXCL_BRAND}'
  AND p_size IN {t.Q16_SIZES}
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0e0)
GROUP BY p_brand, p_type, p_size
"""

Q2_MIN_COST_SUPPLIER = f"""
WITH offers AS (
  SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         l_extendedprice / l_quantity AS unit_price
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{t.Q2_REGION}'
    AND p_type = '{t.Q2_TYPE}' AND p_size = {t.Q2_SIZE}
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey, unit_price
FROM offers o
WHERE unit_price = (
  SELECT min(unit_price) FROM offers i WHERE i.p_partkey = o.p_partkey)
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC,
         unit_price ASC
LIMIT {t.Q2_TOP_K}
"""

Q20_MAJORITY_SHIPPERS = f"""
WITH pair_qty AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = '{t.Q20_TYPE}'
    AND l_shipdate >= TIMESTAMP '{t.Q20_YEAR_START}'
    AND l_shipdate < TIMESTAMP '{t.Q20_YEAR_END}'
  GROUP BY l_partkey, l_suppkey
), majority AS (
  SELECT DISTINCT l_suppkey
  FROM (SELECT l_suppkey, supp_qty,
               SUM(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
        FROM pair_qty)
  WHERE supp_qty > 0.5e0 * part_qty
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM majority)
"""

Q21_WAITING_SUPPLIERS = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL {t.Q12_LATE_DAYS} DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), l1 AS (
  SELECT l_orderkey, l_suppkey, s_name
  FROM li
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE is_late AND n_name = '{t.Q21_NATION}'
)
SELECT s_name, COUNT(*) AS numwait
FROM l1
WHERE EXISTS (
    SELECT 1 FROM li l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM li l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.is_late)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT {t.Q21_TOP_K}
"""

Q22_SALES_OPPORTUNITY = f"""
WITH c AS (
  SELECT c_custkey, c_acctbal,
         substr(c_name, length(c_name) - 1, 2) AS cntrycode
  FROM customer
), a AS (
  SELECT {_MONEY_SUM.format(c='c_acctbal')} / COUNT(c_acctbal) AS avg_bal
  FROM c WHERE c_acctbal > 0.0e0
)
SELECT cntrycode, COUNT(*) AS numcust,
       {_MONEY_SUM.format(c='c_acctbal')} AS totacctbal
FROM c, a
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '{t.Q22_RECENT_CUTOFF}')
GROUP BY cntrycode
"""

# --- EP1 ingestion chain (plans.ingest_demo) ---------------------------
# The oracle recomputes the simulated scan values directly from doc_id
# (the payload is a pure function of it); Spark must reproduce them by
# running the actual extract → pivot → offset → sanitize → parse chain.

PDF_INGEST_PIPELINE = """
SELECT 'doc_' || doc_id AS path,
       CAST(doc_id * 10 + i AS INT) AS unit,
       (doc_id * 37 + i * 11) % 9000 + 1000 AS total_harvest,
       ((doc_id + i) % 1000) / 10.0e0 AS percent_success
FROM documents
CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS i) g
"""

# --- Python UDF family (plans.pandas_udfs) -----------------------------
# Each UDF computes integral or single-subtraction measures, so the
# SQL recomputation is bit-identical regardless of reduction order.

UDF_SCALAR_TOKEN_STATS = """
SELECT doc_id,
       length(text) - length(replace(text, ' ', '')) AS n_spaces,
       length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
         AS n_vowels,
       CAST(length(text) AS INT) AS n_chars_checked
FROM documents
"""

UDF_GROUPED_AGG_FLOORSUM = """
SELECT c_nationkey,
       CAST(SUM(floor(c_acctbal)) AS DOUBLE) AS floor_bal_sum,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_nationkey
"""

UDF_GROUPED_MAP_NEIGHBORS = """
SELECT c_nationkey, c_custkey, c_acctbal,
       CAST(row_number() OVER w AS BIGINT) AS bal_ordinal,
       lag(c_acctbal) OVER w - c_acctbal AS gap_to_prev
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
"""

UDF_COGROUPED_ORDER_PROFILE = """
SELECT o.o_orderkey, o.o_totalprice,
       count(l.l_orderkey) AS n_items,
       CAST(coalesce(SUM(l.l_quantity), 0.0e0) AS DOUBLE) AS sum_qty
FROM orders o
LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '2001-01-01'
GROUP BY o.o_orderkey, o.o_totalprice
"""

# --- window distribution + higher-order arrays (plans.relational) ------

WINDOW_DISTRIBUTION_FUNCTIONS = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       first_value(o_totalprice) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS prio_max_price,
       last_value(o_totalprice) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS prio_min_price,
       nth_value(o_orderkey, 2) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS runnerup_key,
       count(*) OVER
         (PARTITION BY o_orderpriority ORDER BY o_totalprice
          RANGE BETWEEN 1000.0e0 PRECEDING AND CURRENT ROW)
         AS n_in_1k_band
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey ASC)
"""

HIGHER_ORDER_ARRAY_FUNCTIONS = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
)
SELECT doc_id,
       CAST(len(l) AS INT) AS n_tokens,
       CAST(len(list_filter(l, t -> length(t) > 5)) AS INT) AS n_long_tokens,
       CAST(list_sum(list_transform(l, t -> length(t))) AS BIGINT)
         AS total_token_len,
       len(list_filter(l, t -> t = 'the')) > 0 AS has_the,
       len(list_filter(l, t -> t <> lower(t))) = 0 AS all_lowercase
FROM toks
"""


_Q19_BRANCH = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {s} "
    f"AND l_quantity BETWEEN {lo}e0 AND {hi}e0)"
    for b, s, lo, hi in t.Q19_BANDS
)

Q19_DISCOUNTED_PARTS = f"""
SELECT
  CAST(round(SUM({_REV}), 4) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem JOIN part
  ON l_partkey = p_partkey AND ({_Q19_BRANCH})
"""
