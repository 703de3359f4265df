-- Per-group top-k via ranking window over a pre-aggregate.
-- Twin of operators/windows.py:top3_parts_per_supplier.
WITH agg AS (
    SELECT l_suppkey, l_partkey,
           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS units
    FROM lineitem
    GROUP BY l_suppkey, l_partkey
),
ranked AS (
    SELECT l_suppkey, l_partkey, units,
           ROW_NUMBER() OVER (
               PARTITION BY l_suppkey
               ORDER BY units DESC, l_partkey
           ) AS rn
    FROM agg
)
SELECT l_suppkey, l_partkey, CAST(units AS DOUBLE) AS units, rn
FROM ranked WHERE rn <= 3
ORDER BY l_suppkey, rn
