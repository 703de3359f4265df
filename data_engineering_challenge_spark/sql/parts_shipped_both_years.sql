-- Row-level INTERSECT. Twin of operators/relational.py:parts_shipped_both_years.
SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1997
INTERSECT
SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1998
ORDER BY l_partkey
