"""Property-based tests (hypothesis) for the messy-data cleaning kit:
the invariants hold for arbitrary inputs, not just the fixtures."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_engineering_challenge_spark.functions.cleaning import (
    NULL_TOKENS,
    WIDE_NULL_TOKENS,
    normalize_null_tokens,
    parse_bool,
    parse_decimal_comma,
)

_SETTINGS = dict(
    max_examples=12,  # each example is a Spark job — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _roundtrip(spark, values, expr):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    return [r.y for r in df.select(expr(F.col("x")).alias("y")).collect()]


@given(st.lists(st.sampled_from(sorted(WIDE_NULL_TOKENS)), min_size=1, max_size=5))
@settings(**_SETTINGS)
def test_null_tokens_always_null(spark, tokens):
    got = _roundtrip(
        spark, tokens, lambda c: normalize_null_tokens(c, WIDE_NULL_TOKENS)
    )
    assert all(v is None for v in got)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            min_size=1,
            max_size=20,
        ).filter(lambda s: s not in NULL_TOKENS),
        min_size=1,
        max_size=5,
    )
)
@settings(**_SETTINGS)
def test_non_tokens_pass_through(spark, values):
    got = _roundtrip(spark, values, lambda c: normalize_null_tokens(c, NULL_TOKENS))
    assert got == values


@given(
    st.lists(
        st.decimals(
            min_value=Decimal("-999999.999999"),
            max_value=Decimal("999999.999999"),
            allow_nan=False,
            allow_infinity=False,
            places=6,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(**_SETTINGS)
def test_decimal_comma_equals_decimal_point(spark, decs):
    """'123,45' must parse to exactly what '123.45' parses to."""
    eu = [str(d).replace(".", ",") for d in decs]
    us = [str(d) for d in decs]
    got_eu = _roundtrip(spark, eu, parse_decimal_comma)
    got_us = _roundtrip(spark, us, parse_decimal_comma)
    assert got_eu == got_us
    assert got_eu == [d.quantize(Decimal("0.000001")) for d in decs]


@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            max_size=15,
        ),
        min_size=1,
        max_size=5,
    )
)
@example(values=["0\x1f"])  # control char: engine-garbage, Python-whitespace
@settings(**_SETTINGS)
def test_garbage_never_corrupts_numeric(spark, values):
    """Anything that isn't a clean EU/US numeric becomes NULL, never a
    wrong number."""
    import re

    got = _roundtrip(spark, values, parse_decimal_comma)
    for v, g in zip(values, got):
        # strip exactly the engine's whitespace class (Java \s): Python
        # str.strip() also removes \x1c-\x1f, which the engine treats
        # as garbage — '0\x1f' must parse to NULL, not 0 (hypothesis)
        s = v.strip(" \t\n\x0b\f\r")
        if re.fullmatch(r"[+-]?\d+(,\d+)?", s):
            assert g == Decimal(s.replace(",", ".")).quantize(Decimal("0.000001"))
        elif re.fullmatch(r"[+-]?\d+(\.\d+)?", s):
            assert g == Decimal(s).quantize(Decimal("0.000001"))
        else:
            assert g is None


@given(
    st.lists(
        st.sampled_from(
            ["true", "T", "YES", "y", "1", "false", "F", "no", "N", "0", "maybe", "", "2"]
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_bool_parse_total_and_correct(spark, values):
    got = _roundtrip(spark, values, parse_bool)
    for v, g in zip(values, got):
        lv = v.lower()
        if lv in ("true", "t", "yes", "y", "1"):
            assert g is True
        elif lv in ("false", "f", "no", "n", "0"):
            assert g is False
        else:
            assert g is None


@given(
    st.lists(
        st.lists(
            st.text(alphabet=st.characters(codec="ascii", categories=["Ll", "Nd"]), min_size=1, max_size=6),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(**_SETTINGS)
def test_word_ngrams_matches_naive_python(spark, token_lists):
    """The zip_with shingling must equal the naive Python sliding
    window for arbitrary token arrays (guards the 6x-faster rewrite)."""
    from data_engineering_challenge_spark.functions.text import word_ngrams

    df = spark.createDataFrame([(t,) for t in token_lists], "toks array<string>")
    got = [r.g for r in df.select(word_ngrams(F.col("toks"), 3).alias("g")).collect()]
    want = [
        [" ".join(t[i : i + 3]) for i in range(len(t) - 2)] if len(t) >= 3 else []
        for t in token_lists
    ]
    assert got == want


@given(
    values=st.lists(
        st.one_of(
            st.dates().map(str),
            st.text(
                alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
                max_size=12,
            ),
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(**_SETTINGS)
def test_garbage_dates_null_never_throw(spark, values):
    """ANSI mode makes plain to_date throw on malformed input; the kit
    must map garbage to NULL instead (and still parse valid dates)."""
    import datetime
    import re

    from data_engineering_challenge_spark.functions.cleaning import parse_date

    got = _roundtrip(spark, values, parse_date)
    for v, g in zip(values, got):
        s = v.strip()
        if re.fullmatch(r"\d{4}-\d{2}-\d{2}", s):
            try:
                want = datetime.date.fromisoformat(s)
            except ValueError:
                want = None  # e.g. month 13 — shape ok, value invalid
            assert g == want
        else:
            assert g is None
