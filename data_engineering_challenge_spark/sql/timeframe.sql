-- Dataset timeframe (reference src/sql/queries/transactions_timeframe.sql:1-4)
SELECT CAST(MIN(o_orderdate) AS DATE) AS first_order_date,
       CAST(MAX(o_orderdate) AS DATE) AS last_order_date
FROM orders
