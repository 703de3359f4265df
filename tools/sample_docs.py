"""Materialize a deterministic content-hash subsample of `documents`
for the sampled exact-verify mode of ngram_jaccard_pairs at big SFs.

    python tools/sample_docs.py SRC_DIR DST_DIR [--mod 16]

Writes DST_DIR/documents.parquet = the docs whose 60-bit md5 content
hash is ≡ 0 (mod MOD) and symlinks every other table from SRC_DIR, so
`tools/check_oracle.py DST_DIR ngram_jaccard_pairs` runs the REGISTERED
operator unchanged with both engines reading the identical sampled
corpus. Rationale (VERDICT r5 item 2): the gen_sf corpus has a fixed
~30k-gram vocab, so at sf10 every gram's document frequency is ~850 —
there is no "rare" gram, the AllPairs prefix index is dense everywhere,
and the mirrored DuckDB plan spills unboundedly. A content-hash sample
keeps the exact-verify audit workload ~constant as the corpus grows
(the audit is a fixed-size spot check; minhash_lsh_pairs is the
full-corpus linear-time path). Content hash (not doc_id) makes the
sample stable under re-identification, the same property stable_split
relies on (operators/text_analysis.py stable_split).
"""

from __future__ import annotations

import argparse
import os

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src_dir")
    ap.add_argument("dst_dir")
    ap.add_argument("--mod", type=int, default=16)
    ap.add_argument(
        "--table",
        default="documents",
        choices=("documents", "embeddings", "lineitem"),
        help="which table to subsample (embeddings hashes the vector "
        "content, so the sample is stable under re-identification "
        "exactly like the documents mode; lineitem hashes l_orderkey, "
        "so whole BASKETS survive or drop together — the copurchase "
        "graph of the sample is a genuine basket subgraph, which is "
        "what the pagerank big-SF audit needs)",
    )
    args = ap.parse_args()

    os.makedirs(args.dst_dir, exist_ok=True)
    src_docs = os.path.join(args.src_dir, f"{args.table}.parquet")
    pat = (
        f"read_parquet('{src_docs}/**/*.parquet')"
        if os.path.isdir(src_docs)
        else f"read_parquet('{src_docs}')"
    )
    dst_docs = os.path.join(args.dst_dir, f"{args.table}.parquet")
    content = {
        "documents": "text",
        "embeddings": "array_to_string(embedding, ',')",
        "lineitem": "l_orderkey::VARCHAR",
    }[args.table]
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT * FROM {pat}
            WHERE ('0x' || substr(md5({content}), 1, 15))::BIGINT % {args.mod} = 0
        ) TO '{dst_docs}' (FORMAT PARQUET)
        """
    )
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dst_docs}')").fetchone()[0]
    for t in TABLES:
        if t == args.table:
            continue
        src = os.path.join(args.src_dir, f"{t}.parquet")
        dst = os.path.join(args.dst_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(os.path.abspath(src), dst)
    print(
        f"wrote {dst_docs}: {n} {args.table} rows "
        f"(1/{args.mod} content-hash sample)"
    )


if __name__ == "__main__":
    main()
