-- TPC-H Q13 shape: LEFT OUTER JOIN + two-level aggregation.
-- Twin of operators/relational_ext.py:customer_order_distribution.
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) AS per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
