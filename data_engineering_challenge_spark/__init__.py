"""data_engineering_challenge_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference `LucPellinger/data-engineering-challenge` (see SURVEY.md),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by
Catalyst, columnar Parquet at rest, broadcast-hash joins for dims,
partial+final hash aggregation, AQE for runtime re-planning.

Layout
------
- ``session``    : SparkSession factory tuned for local[N] testing but
                   configured with cluster-scale posture (AQE, skew join).
- ``catalog``    : testdata table loading + temp-view registration.
- ``schemas``    : explicit StructType registry (reference-shaped tables).
- ``sources/``   : readers — parquet, messy CSV kit, Excel bridge, sniffers.
- ``operators/`` : relational query set, data-quality/validation,
                   profiling, dedup, similarity, text analysis.
- ``functions/`` : scalar expression builders (cleaning, text, vectors).
- ``plans/``     : plan-inspection helpers (pushdown/broadcast asserts).
- ``streaming/`` : Structured Streaming slices over the events table.
- ``sinks/``     : partitioned parquet / CSV writers.

The public correctness surface is the query registry
(:mod:`data_engineering_challenge_spark.registry`), consumed by
``__spark_entry__.py`` for the driver's DuckDB-oracle checks.
"""

__version__ = "0.1.0"
