"""Text expression builders: normalization, tokenization, shingling.

All pure Column expressions (JVM-side, codegen'd — no UDFs), mirroring
the reference's vectorized-expression approach to text handling
(`src/utils/dataset_profiling.py:322-324`: strip, lower, whitespace
collapse) and extending it with the shingling/tokenization primitives
the dedup/similarity/text-analysis operators need.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """lower → trim → collapse whitespace (reference F2/F3/F4)."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text: array<string>."""
    return F.split(normalize_text(col), " ")


def word_ngrams(tok: Column, n: int) -> Column:
    """Array of space-joined word n-grams; empty array when < n tokens.

    Guarded with when(): F.sequence(1, size-n+1) would generate a
    *descending* sequence for short docs instead of an empty one.
    """
    seq = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    grams = F.transform(seq, lambda i: F.concat_ws(" ", F.slice(tok, i, n)))
    return F.when(F.size(tok) >= n, grams).otherwise(F.array().cast("array<string>"))


def count_in_set(tok: Column, words: tuple[str, ...]) -> Column:
    """How many tokens fall in a fixed word set (JVM-side filter)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tok, lambda t: F.array_contains(arr, t)))
