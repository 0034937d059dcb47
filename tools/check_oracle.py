#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query output
parquet in OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB over the same scale-factor tables and compare row sets.

Usage: check_oracle.py <sfDir> <outDir>
"""
import json, math, sys
import duckdb

def canon(rows, cols):
    """Sort columns by name, round doubles, sort rows -> canonical list."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)  # absolute + relative-ish guard
                    v = float(f"{v:.12g}")
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # Both sides of the gate, on the record: the engine writes env.json
    # (Spark/Java/TZ), the oracle side prints its own versions here.
    import os, platform
    eng_env = {}
    if os.path.exists(f"{out_dir}/env.json"):
        eng_env = json.load(open(f"{out_dir}/env.json"))
    print(f"ENV oracle: duckdb={duckdb.__version__} "
          f"python={platform.python_version()}")
    print(f"ENV engine: " + (" ".join(f"{k}={v}" for k, v in
                                      sorted(eng_env.items())) or "(no env.json)"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    produced = sorted(d for d in os.listdir(out_dir)
                      if os.path.isdir(f"{out_dir}/{d}"))
    for name in produced:
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows = got.columns, got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: engine output unreadable: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only check): rows={len(grows)}")
            continue
        try:
            exp = con.sql(oracle[name])
            ecols, erows = exp.columns, exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(ecols)}")
            n_fail += 1
            continue
        # Driver's compare hashes typed values, so a DuckDB HUGEINT SUM vs a
        # Spark BIGINT mismatches even when the numbers are equal. Compare
        # dtypes per column name so the local mirror catches that class.
        gtypes = dict(zip(gcols, [str(t) for t in got.types]))
        etypes = dict(zip(ecols, [str(t) for t in exp.types]))
        tmis = {c: (gtypes[c], etypes[c]) for c in gtypes
                if gtypes[c] != etypes[c]}
        if tmis:
            print(f"FAIL {name}: dtype mismatch {tmis}")
            n_fail += 1
            continue
        g, e = canon(grows, gcols), canon(erows, ecols)
        if g == e:
            print(f"PASS {name}: {len(g)} rows")
            n_pass += 1
        else:
            n_fail += 1
            diff_g = [r for r in g if r not in set(e)][:3]
            diff_e = [r for r in e if r not in set(g)][:3]
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            print(f"  engine-only: {diff_g}")
            print(f"  oracle-only: {diff_e}")
    missing = set(oracle) - set(produced)
    for m in sorted(missing):
        print(f"FAIL {m}: oracle declared but no engine output")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(produced) - n_pass - n_fail} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
