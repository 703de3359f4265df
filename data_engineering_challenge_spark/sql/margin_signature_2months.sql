-- Total margin, signature products, last 2 calendar months
-- (reference src/sql/queries/total_margin_signature_last_2_months.sql:1-21)
WITH anchor AS (
    SELECT trunc(MAX(CAST(l_shipdate AS DATE)), 'month') AS m FROM lineitem
),
month_window AS (
    SELECT add_months(m, -1) AS start_d, add_months(m, 1) AS end_d FROM anchor
)
SELECT CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))),
                CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS total_margin
FROM lineitem
JOIN part ON p_partkey = l_partkey
CROSS JOIN month_window
WHERE p_type = 'PROMO'
  AND CAST(l_shipdate AS DATE) >= start_d
  AND CAST(l_shipdate AS DATE) < end_d
