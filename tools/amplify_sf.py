#!/usr/bin/env python
"""Amplify a test scale factor by an integer factor, preserving the star
schema's join semantics, so scale slopes can be measured beyond the largest
driver-provided SF (sf0.1) without touching /root/testdata.

Each fact/mid table becomes `factor` copies with primary AND foreign keys
offset consistently per copy (copy i shifts custkey/orderkey/... by
i * OFFSET), so per-copy join fan-outs and group cardinalities match the
original — volume grows by `factor`, key skew does not. Tiny dims
(region, nation) are left as-is, exactly like a real 100 TB warehouse where
dimensions grow orders of magnitude slower than facts.

Usage: python tools/amplify_sf.py [factor] [src_dir] [dst_dir]
Defaults: 10 /root/testdata/sf0.1 /tmp/sf1_amplified
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 10_000_000  # well above any natural key and all planting offsets

# per-table key columns to shift per copy (PKs and the FKs that reference
# an amplified table; nationkey/partkey-style FKs into *unamplified* dims
# stay put)
SHIFT: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ASIS = ["region", "nation"]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1_amplified"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_ASIS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied as-is")
    for t, keys in SHIFT.items():
        cols = con.execute(f"SELECT * FROM '{src}/{t}.parquet' LIMIT 0").df().columns
        selects = []
        for i in range(factor):
            proj = ", ".join(
                f"{c} + {i * OFFSET} AS {c}"
                if c in keys
                # documents: suffix every token per copy so copies are not
                # exact/near duplicates of each other — otherwise every text
                # gains factor-1 twins and dedup pair output measures the
                # planted duplication (C(factor,2) per text), not engine
                # scaling; suffixing every token keeps shingle doc-frequency
                # at original levels
                else (
                    rf"regexp_replace(text, '(\S+)', '\1c{i}', 'g') AS text"
                    if t == "documents" and c == "text" and i > 0
                    else c
                )
                for c in cols
            )
            selects.append(f"SELECT {proj} FROM '{src}/{t}.parquet'")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: x{factor} -> {n} rows")


if __name__ == "__main__":
    main()
