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


# Unicode whitespace for normalization: \s (ASCII) plus NBSP, ogham
# mark, the U+2000 block, line/para separators, narrow NBSP, math
# space, ideographic space. Java regex (Spark) and RE2 (DuckDB) treat
# \s as ASCII-only, but DuckDB's trim() IS Unicode-aware — without an
# explicit class the two engines disagree on e.g. '\xa0text\xa0'
# (found by an adversarial-Unicode probe). One definition, two
# dialect spellings, used by BOTH the Spark expression and the oracle
# SQL so normalization is engine-identical by construction.
_WS_JAVA = "[\\s\\u00A0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]+"
_WS_RE2 = (
    "[\\s\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}"
    "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+"
)

# DuckDB twin of normalize_text(text) — import this wherever an oracle
# needs the normalized form, never hand-write the expression.
NORM_SQL = f"trim(regexp_replace(lower(text), '{_WS_RE2}', ' ', 'g'))"


def normalize_text(col: Column) -> Column:
    """lower → collapse Unicode whitespace runs to ' ' → trim
    (reference F2/F3/F4, extended to Unicode whitespace; ends are
    plain spaces after the collapse, so ASCII trim finishes the job
    identically in both engines)."""
    return F.trim(F.regexp_replace(F.lower(col), _WS_JAVA, " "))


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
