-- TPC-H Q4 shape: correlated EXISTS (Catalyst rewrites to left semi).
-- Twin of operators/relational_ext.py:orders_with_discounted_lines.
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
