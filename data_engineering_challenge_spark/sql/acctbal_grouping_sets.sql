-- GROUPING SETS with GROUPING() flags; single Expand + hash agg.
-- Twin of operators/relational_ext.py:acctbal_grouping_sets.
SELECT r_name, n_name,
       CAST(grouping(r_name) AS INT) AS g_region,
       CAST(grouping(n_name) AS INT) AS g_nation,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
       COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
ORDER BY g_region, g_nation, r_name, n_name
