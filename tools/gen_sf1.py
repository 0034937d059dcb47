#!/usr/bin/env python3
"""Regenerate the 10x probe frames in /tmp/graft_sf1 from sf0.1.

The BASELINE.md sf1 probes (Sf1Probe) measure constant-cost claims on
these frames; /tmp is wiped between sessions, so this script IS the
repro the probe tables cite. Replication rules (fixed since r07-r09 --
changing them breaks comparability with recorded numbers):

- lineitem: 10 replicas on disjoint orderkey ranges (+r*10_000_000),
  SHARED part/supp universe -- pair support multiplies, join structure
  is 10 disjoint copies.
- orders:   same orderkey offsets as lineitem (r09) so orderkey joins
  line up replica-by-replica.
- events:   10 replicas on disjoint event/user id ranges
  (+r*1_000_000 / +r*10_000). Stream gates slice user_id < N, so all
  replicas land OUTSIDE the slice: gate cost must stay constant.
- documents: disjoint doc_ids (+r*1_000_000); text token-prefixed per
  replica so near-dup pairs don't explode across replicas (r08).
- embeddings: offset vec_ids (+r*10_000) -> 20,000 vectors.

Driver-side tooling only (duckdb is not available to the engine).
Usage: python3 tools/gen_sf1.py [src_dir] [out_dir]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    copies = {
        "lineitem": """
            SELECT l_orderkey + r*10000000 AS l_orderkey, l_partkey,
                   l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM src, range(10) t(r)""",
        "orders": """
            SELECT o_orderkey + r*10000000 AS o_orderkey, o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM src, range(10) t(r)""",
        "events": """
            SELECT event_id + r*1000000 AS event_id, ts,
                   user_id + r*10000 AS user_id, event_type, value, props
            FROM src, range(10) t(r)""",
        "documents": """
            SELECT doc_id + r*1000000 AS doc_id,
                   CASE WHEN r = 0 THEN text
                        ELSE 'replica' || r || ' ' || text END AS text,
                   lang, source, n_chars
            FROM src, range(10) t(r)""",
        "embeddings": """
            SELECT vec_id + r*10000 AS vec_id, embedding, label
            FROM src, range(10) t(r)""",
    }
    # dims pass through UNREPLICATED: at a real 10x only facts grow;
    # the reference universe (customers, parts, regions) stays fixed —
    # which is also what dim-reading probes (stream_static_join_parity's
    # broadcast customer join) need to prove dim cost stays constant
    for table in ("customer", "supplier", "part", "nation", "region"):
        copies[table] = "SELECT * FROM src"
    for table, sel in copies.items():
        con.execute(f"CREATE OR REPLACE VIEW src AS "
                    f"SELECT * FROM read_parquet('{SRC}/{table}.parquet')")
        con.execute(f"COPY ({sel}) TO '{OUT}/{table}.parquet' "
                    f"(FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{OUT}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows -> {OUT}/{table}.parquet")


if __name__ == "__main__":
    main()
