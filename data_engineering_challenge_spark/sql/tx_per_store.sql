-- Transactions per store, raw + distinct (reference src/sql/queries/number_transactions_per_store.sql:1-7)
SELECT l_suppkey,
       COUNT(l_orderkey) AS n_tx,
       COUNT(DISTINCT l_orderkey) AS n_unique_tx
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
