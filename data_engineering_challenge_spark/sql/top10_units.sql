-- Top-10 products by units sold (reference src/sql/queries/top_10_products_units_sold.sql:1-7)
SELECT l_partkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_units_sold
FROM lineitem
GROUP BY l_partkey
ORDER BY total_units_sold DESC, l_partkey
LIMIT 10
