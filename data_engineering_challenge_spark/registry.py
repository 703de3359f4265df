"""Query registry — the engine's public correctness surface.

Every operator family registers named queries here; each query pairs a
Spark implementation (``(spark, sf_dir) -> DataFrame``) with, where
SQL-expressible, a DuckDB oracle SQL string computing the identical
result (same column names, same values). ``__spark_entry__.py``
exposes this registry to the driver.

Design rule for oracle parity: aggregate money/quantity doubles are
cast to DECIMAL before summation on BOTH sides — decimal addition is
exact and order-independent, so the distributed partial/final
aggregation in Spark hashes identically to DuckDB's sequential sum.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL over the pre-registered views, or None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def _self_cleaning(fn: SparkQuery) -> SparkQuery:
    """Wrap a query fn to drop cached frames left by *earlier* queries.

    Several operators persist multiply-consumed sub-frames (LSH
    signatures, shingles, CC labels) and cannot unpersist them before
    the caller collects. A harness that runs the whole suite through
    one session would otherwise accumulate those caches until LRU
    eviction churns recomputation (observed 2.4× slowdowns). Each
    query starts from a clean cache; correctness is unaffected either
    way."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        return fn(spark, sf_dir)

    return wrapped


def spark_queries() -> dict[str, SparkQuery]:
    """Driver-facing view of the registry (cache-hygienic wrappers)."""
    return {k: _self_cleaning(v.fn) for k, v in all_queries().items()}


def oracles() -> dict[str, str]:
    return {k: v.oracle for k, v in all_queries().items() if v.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        dedup,
        graph,
        merge,
        multimodal,
        profiling,
        relational,
        relational_ext,
        similarity,
        sketches,
        temporal,
        text_analysis,
        validation,
        windows,
    )

    _LOADED = True
