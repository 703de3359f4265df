-- Total margin, signature products, rolling 60 days — scalar-subquery bounds
-- (reference src/sql/queries/total_margin_signature_last_2_months_in_days.sql:1-11)
SELECT CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))),
                CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS total_margin
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_type = 'PROMO'
  AND CAST(l_shipdate AS DATE)
      BETWEEN (SELECT date_sub(CAST(MAX(l_shipdate) AS DATE), 60) FROM lineitem)
          AND (SELECT CAST(MAX(l_shipdate) AS DATE) FROM lineitem)
