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
  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS high_line_count,
  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
    AS low_line_count
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
