-- Cumulative sum over pre-aggregated daily revenue.
-- Twin of operators/windows.py:revenue_running_total.
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_revenue
    FROM orders GROUP BY 1
)
SELECT order_date, CAST(day_revenue AS DOUBLE) AS day_revenue,
       CAST(SUM(day_revenue) OVER (
           ORDER BY order_date
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_revenue
FROM daily
ORDER BY order_date
