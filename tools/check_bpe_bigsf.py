"""Big-SF dual-oracle gate for bpe_learn / bpe_apply.

    PYTHONPATH=/root/repo python tools/check_bpe_bigsf.py <sf_dir> [slice_mod]

Protocol (documented in SCALING.md "Round 8"): the registered full
oracle replays every merge->re-segment generation over the WHOLE
corpus — exact but oracle-infeasible above sf10 (80 GB spill at sf10,
>55 GB disk at sf100). This tool is the cheap second mode:

1. run the ENGINE's bpe_learn over the FULL corpus (the thing under
   test actually sees every row),
2. take a content-hash held-out slice (md5(doc_id) % slice_mod == 0 —
   the same sampling family as the ngram/embedding audits),
3. encode the slice twice with the engine-learned FIXED merge table:
   engine-side via bpe_apply_merges, DuckDB-side via
   _bpe_apply_fixed_sql (gaps-and-islands replay, no argmax search),
4. compare final segmentations exactly.

What it proves: the full-corpus merge table is internally consistent
and both engines' greedy re-segmentation agree on real data at scale.
What it does not prove (the full replay at sf0.01/sf1/sf10 covers it):
that each step's argmax was the true corpus-wide winner.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_challenge_spark import testing
from data_engineering_challenge_spark.catalog import load_table
from data_engineering_challenge_spark.functions.text import tokens
from data_engineering_challenge_spark.operators.analytics_ext import (
    _bpe_apply_fixed_sql,
    bpe_apply_merges,
    bpe_learn,
)
from data_engineering_challenge_spark.session import get_session


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    slice_mod = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    spark = get_session("check_bpe_bigsf")
    t0 = time.time()
    merges = [(r.lhs, r.rhs) for r in bpe_learn(spark, sf_dir).collect()]
    t_learn = time.time() - t0
    print(f"engine bpe_learn (FULL corpus): {len(merges)} merges, {t_learn:.1f}s")
    for i, (lhs, rhs) in enumerate(merges, 1):
        print(f"  step {i}: ({lhs!r}, {rhs!r})")

    in_slice = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % slice_mod == 0
    base = (
        load_table(spark, sf_dir, "documents")
        .filter(in_slice)
        .select("doc_id", tokens(F.col("text")).alias("seq"))
    )
    t0 = time.time()
    enc = bpe_apply_merges(base, merges)
    got = {
        r.doc_id: "|".join(r.seq)
        for r in enc.select("doc_id", "seq").collect()
    }
    t_engine = time.time() - t0
    print(f"engine slice encode: {len(got)} docs, {t_engine:.1f}s")

    doc_filter = (
        f"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
        f" % {slice_mod} = 0"
    )
    con = testing.duckdb_con(sf_dir)
    t0 = time.time()
    _cols, rows = testing.run_oracle(con, _bpe_apply_fixed_sql(merges, doc_filter))
    want = {r[0]: r[1] for r in rows}
    t_oracle = time.time() - t0
    print(f"oracle slice replay: {len(want)} docs, {t_oracle:.1f}s")

    if got == want:
        print(f"\nbpe dual-oracle OK: {len(got)} slice docs identical "
              f"(full-corpus learn, 1/{slice_mod} held-out encode)")
        return 0
    only_e = set(got) - set(want)
    only_o = set(want) - set(got)
    diff = [d for d in set(got) & set(want) if got[d] != want[d]]
    print(f"\nFAIL: engine-only={sorted(only_e)[:5]} oracle-only={sorted(only_o)[:5]} "
          f"first-diffs={[(d, got[d][:80], want[d][:80]) for d in sorted(diff)[:3]]}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
