-- TPC-H Q14 shape: CASE-gated aggregate ratio.
-- Twin of operators/relational_ext.py:promo_revenue_share.
SELECT CAST(COALESCE(SUM(CASE WHEN p_type LIKE 'PROMO%'
           THEN CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(3,2))) END),
           CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS total_revenue,
       100.0 * CAST(COALESCE(SUM(CASE WHEN p_type LIKE 'PROMO%'
           THEN CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(3,2))) END),
           CAST(0 AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-10-01'
