-- Row-level EXCEPT ALL (bag semantics).
-- Twin of operators/relational.py:supplier_shipments_lost_yoy.
SELECT l_suppkey FROM lineitem WHERE year(l_shipdate) = 1997
EXCEPT ALL
SELECT l_suppkey FROM lineitem WHERE year(l_shipdate) = 1998
ORDER BY l_suppkey
