"""Statistical language-model corpus filter (the CCNet/KenLM seat).

Production LLM pipelines (CCNet, RedPajama, Dolma) filter crawl text
by perplexity under a small n-gram LM trained on a reference corpus —
the stage that sits BEFORE the trained quality classifier
(`operators/quality_probe.py`). The reference repo has no analog
(its quality surface stops at per-column regex contracts,
`src/utils/data_validation.py`); this is a north-star extension.

Spark-first design, with the engine's cross-engine exactness rule:
floating log-probabilities would make the doc score depend on
summation order, so the LM here is QUANTIZED TO INTEGER BITS —
per-bigram surprisal is computed with floor(log2 n) over integer
counts (`length(bin(n)) - 1` in Spark, `length(format('{:b}', n)) - 1`
in DuckDB — both exact string lengths, no libm), and a document's
score is an exact BIGINT sum. One final division produces the
human-readable bits/bigram. This mirrors `bm25_topk`'s libm-free
rational idf and the fixed-point pagerank: rank-equivalent to the
float LM at the resolution that matters for a keep/drop gate, and
bit-identical across engines, partitionings and summation orders.

Model: add-one-smoothed bigram surprisal
    bits(prev, cur) = floor(log2(c1(prev) + V)) - floor(log2(c12(prev, cur) + 1))
with c12/c1 counted over the TRAIN split's bigram stream (the same
content-hash 8/1/1 split every other pipeline stage uses), and V the
context vocabulary (# distinct bigram-lead tokens in train). Since
c12 <= c1 and V >= 1, surprisal is always >= 0; unseen contexts cost
floor(log2 V) — the add-one uniform.

Scale posture (100 TB):
- counts tables are vocabulary-sized (one row per distinct bigram /
  context), pre-aggregated before any join — map-side combine does
  the heavy lifting on the token stream;
- the scoring stream joins on fixed-width 60-bit hashes of the gram
  strings (shuffle bytes independent of token length), two hash joins
  that AQE handles; V is a 1-row broadcast;
- doc scores and the per-(source, split) rollup are exact integer
  partial aggregations — no order sensitivity anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread_scan
from ..functions.text import tokens, word_ngrams
from ..registry import register
from .pipeline_ops import _SPLIT_CASE_SQL, _TOK_SQL, _gram_sql, _split_col

# Keep/drop gate: flag a doc whose mean surprisal exceeds this many
# CENTIBITS per bigram. Integer cross-multiply — doc_bits * 100 >
# LM_FLAG_CENTIBITS * n_bigrams — so the gate is exact. 4.95 sits at
# ~p95 of the per-doc distribution on the test corpus (p50 = 4.89,
# max = 5.27): the flag selects the high-perplexity tail a CCNet-style
# pipeline would route to its "drop or re-review" bucket.
LM_FLAG_CENTIBITS = 495  # 4.95 bits/bigram


def _gh60(col) -> F.Column:
    """60-bit md5-prefix hash (the repo's standard join key width)."""
    return (
        F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
    )


def _bits(col) -> F.Column:
    """floor(log2(n)) for n >= 1, exactly: binary digit count - 1."""
    return (F.length(F.bin(col)) - 1).cast("bigint")


def _bigram_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, split, gh, ph) — one row per bigram occurrence."""
    d = spread_scan(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    toks = tokens(F.col("text"))
    return (
        d.select(
            "doc_id",
            "source",
            _split_col().alias("split"),
            toks.alias("toks"),
        )
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            "source",
            "split",
            F.explode(word_ngrams(F.col("toks"), 2)).alias("g"),
        )
        .select(
            "doc_id",
            "source",
            "split",
            _gh60(F.col("g")).alias("gh"),
            _gh60(F.split(F.col("g"), " ").getItem(0)).alias("ph"),
        )
    )


@register(
    "bigram_lm_score",
    oracle=f"""
        WITH docs AS (
            SELECT doc_id, source, {_SPLIT_CASE_SQL} AS split,
                   {_gram_sql(2)} AS g2
            FROM documents WHERE len({_TOK_SQL}) >= 2
        ),
        stream AS (
            SELECT doc_id, source, split,
                   ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh,
                   ('0x' || substr(md5(split_part(g, ' ', 1)), 1, 15))::BIGINT AS ph
            FROM (SELECT doc_id, source, split, unnest(g2) AS g FROM docs)
        ),
        train AS (SELECT gh, ph FROM stream WHERE split = 'train'),
        c12 AS (SELECT gh, COUNT(*)::BIGINT AS c12 FROM train GROUP BY gh),
        c1  AS (SELECT ph, COUNT(*)::BIGINT AS c1 FROM train GROUP BY ph),
        v AS (SELECT COUNT(DISTINCT ph)::BIGINT AS vctx FROM train),
        scored AS (
            SELECT s.doc_id, s.source, s.split,
                   CAST(length(format('{{:b}}', COALESCE(c12_t.c12, 0) + 1)) AS BIGINT)
                       AS lo_bits,
                   CAST(length(format('{{:b}}', COALESCE(c1_t.c1, 0) + v.vctx)) AS BIGINT)
                       AS hi_bits
            FROM stream s
            LEFT JOIN c12 c12_t ON s.gh = c12_t.gh
            LEFT JOIN c1 c1_t ON s.ph = c1_t.ph
            CROSS JOIN v
        ),
        docbits AS (
            SELECT doc_id, source, split,
                   SUM(hi_bits - lo_bits)::BIGINT AS doc_bits,
                   COUNT(*)::BIGINT AS n_bigrams
            FROM scored GROUP BY doc_id, source, split
        )
        SELECT source, split,
               COUNT(*)::BIGINT AS n_docs,
               SUM(n_bigrams)::BIGINT AS total_bigrams,
               SUM(doc_bits)::BIGINT AS total_bits,
               CAST(SUM(doc_bits) AS DOUBLE) / CAST(SUM(n_bigrams) AS DOUBLE)
                   AS avg_bits,
               COUNT(*) FILTER (WHERE doc_bits * 100 > {LM_FLAG_CENTIBITS} * n_bigrams)
                   ::BIGINT AS n_flagged
        FROM docbits GROUP BY source, split ORDER BY source, split
    """,
    doc="Statistical-LM corpus filter (the CCNet/KenLM stage): add-one "
    "bigram surprisal quantized to INTEGER BITS (floor-log2 via binary "
    "digit counts — no libm, so doc scores are exact BIGINT sums, "
    "bit-identical across engines and partitionings), trained on the "
    "content-hash train split, scored over every doc, rolled up per "
    "(source, split) with an exact integer keep/drop flag count.",
    tags=("text", "lm", "quality", "extension"),
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, split, n_docs, total_bigrams, total_bits, avg_bits,
    n_flagged) under the integer-bits bigram LM."""
    stream = _bigram_stream(spark, sf_dir)
    train = stream.filter(F.col("split") == "train").select("gh", "ph")
    c12 = train.groupBy("gh").agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    c1 = train.groupBy("ph").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    vctx = train.agg(F.countDistinct("ph").cast("bigint").alias("vctx"))
    scored = (
        stream.join(c12, "gh", "left")
        .join(c1, "ph", "left")
        .crossJoin(F.broadcast(vctx))
        .select(
            "doc_id",
            "source",
            "split",
            # bin() digit counts, not the -1'd floor-log2: the -1s
            # cancel in the difference and the oracle mirrors this.
            F.length(F.bin(F.coalesce(F.col("c12"), F.lit(0)) + 1))
            .cast("bigint")
            .alias("lo_bits"),
            F.length(F.bin(F.coalesce(F.col("c1"), F.lit(0)) + F.col("vctx")))
            .cast("bigint")
            .alias("hi_bits"),
        )
    )
    docbits = scored.groupBy("doc_id", "source", "split").agg(
        F.sum(F.col("hi_bits") - F.col("lo_bits")).cast("bigint").alias("doc_bits"),
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
    )
    return (
        docbits.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("total_bigrams"),
            F.sum("doc_bits").cast("bigint").alias("total_bits"),
            (
                F.sum("doc_bits").cast("double")
                / F.sum("n_bigrams").cast("double")
            ).alias("avg_bits"),
            F.count(
                F.when(
                    F.col("doc_bits") * 100
                    > F.lit(LM_FLAG_CENTIBITS) * F.col("n_bigrams"),
                    1,
                )
            )
            .cast("bigint")
            .alias("n_flagged"),
        )
        .orderBy("source", "split")
    )
