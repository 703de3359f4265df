"""Messy-data cleaning expressions: null tokens, decimal commas, format
regexes, boolean parsing.

Re-expresses the reference's read-time cleaning kit as composable
Column expressions:
- null tokens ``""`` / ``"#NO VALUE"`` (reference
  src/assets/metadata/transactions.py:3, discovery notebook cell 21),
  wider default set at src/utils/routing.py:43-45,
- European decimal comma (src/db/pipeline.py:221,233 decimal_comma=True),
- generic format regexes (src/utils/routing.py:34-41).

Spark's CSV reader takes a single nullValue, so multi-token null
normalization is a post-read pass (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# exact token set observed in the reference's raw files
NULL_TOKENS: tuple[str, ...] = ("", "#NO VALUE")
# wider default set (reference routing.py:43-45)
WIDE_NULL_TOKENS: tuple[str, ...] = NULL_TOKENS + (
    "na", "n/a", "none", "null", "nan", "missing", "unknown", "-",
)

# generic format contracts (reference routing.py:34-41)
RE_INT = r"^[+-]?\d+$"
RE_US_NUMERIC = r"^[+-]?\d+(\.\d+)?$"
RE_EU_NUMERIC = r"^[+-]?\d+(,\d+)?$"
RE_BOOL = r"^(?i)(true|false|t|f|yes|no|y|n|0|1)$"
RE_ISO_DATE = r"^\d{4}-\d{2}-\d{2}$"
RE_ISO_DATETIME = r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?$"
RE_TIME = r"^\d{2}:\d{2}:\d{2}$"
RE_JSON_OBJECT = r"^\{.*\}$"


def normalize_null_tokens(col: Column, tokens: tuple[str, ...] = NULL_TOKENS) -> Column:
    """Map any null-token value to real NULL (exact match, like the
    reference's read-time ``null_values=[...]``)."""
    return F.when(col.isin(*tokens), F.lit(None)).otherwise(col)


def _trim_ws(col: Column) -> Column:
    """Strip leading/trailing ASCII whitespace (space, tab, CR, LF, FF,
    VT). SQL TRIM strips only spaces — messy CSV values carry tabs and
    form feeds too (hypothesis found '0\x0c' parsing to NULL)."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def parse_decimal_comma(col: Column, dtype: str = "decimal(18,6)") -> Column:
    """European-decimal-aware numeric parse: '737,114' → 737.114.

    Regex-gated so US-format values pass through unchanged and garbage
    becomes NULL instead of a corrupt number (SURVEY.md §7.3).
    """
    s = _trim_ws(col.cast("string"))
    eu = F.regexp_replace(s, ",", ".")
    return (
        F.when(s.rlike(RE_EU_NUMERIC), eu.cast(dtype))
        .when(s.rlike(RE_US_NUMERIC), s.cast(dtype))
        .otherwise(F.lit(None).cast(dtype))
    )


def parse_bool(col: Column) -> Column:
    """Lenient boolean parse ('' /0/1/true/false/..., reference
    schemas_regex.py:56, routing.py:39)."""
    s = F.lower(_trim_ws(col.cast("string")))
    return (
        F.when(s.isin("true", "t", "yes", "y", "1"), F.lit(True))
        .when(s.isin("false", "f", "no", "n", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def parse_date(col: Column, fmt: str = "yyyy-MM-dd") -> Column:
    """Date parse with the cleaning kit's garbage→NULL contract.

    try_to_date, not to_date: under ANSI mode (Spark 4 default) a
    plain to_date THROWS on the first malformed value — one bad row
    killing a 100-TB load. Unparseable dates become NULL and flow to
    the validation layer like every other contract violation."""
    return F.try_to_date(_trim_ws(col.cast("string")), fmt)
