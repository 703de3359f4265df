-- Revenue per day (reference src/sql/queries/revenue_split_per_day.sql:1-6)
SELECT CAST(o_orderdate AS DATE) AS order_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
FROM orders
GROUP BY order_date
ORDER BY order_date
