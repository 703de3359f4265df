-- Duplicate-group audit over a column subset (reference notebook cells 26-29)
SELECT l_partkey, l_suppkey, l_quantity, COUNT(*) AS n_dup
FROM lineitem
GROUP BY l_partkey, l_suppkey, l_quantity
HAVING COUNT(*) > 1
ORDER BY n_dup DESC, l_partkey, l_suppkey, l_quantity
