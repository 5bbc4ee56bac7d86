#!/usr/bin/env python3
"""Self-check harness (builder-local only; mirrors the driver's t2 gate).

Reads Verify output parquet per query, runs the dumped oracle SQL in
DuckDB over the same sf dir, and diffs values. Usage:
    python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def load_tables(con, sf_dir):
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def _sval(v):
    if v is None:
        return "NULL"
    if isinstance(v, float) and v != v:  # NaN
        return "NULL"
    return str(v)

def norm(df):
    # Stringify EVERY value, exactly like the driver's hash does. This
    # is deliberately strict: an int64 3 and a float64 3.0 are numerically
    # equal but stringify differently ("3" vs "3.0"), and the driver
    # hashes strings — DuckDB's HUGEINT sum() burned us this way in r6
    # (n1/v6/v7 were selfcheck-green, driver-red). Cast oracle sums to
    # BIGINT instead of loosening this compare.
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            df[c] = df[c].map(_sval)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    load_tables(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pq_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{pq_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in files]))
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        diff = (got.values != want.values)
        # treat NaN==NaN as equal
        try:
            eq = got.compare(want).empty
        except Exception:
            eq = False
        if eq:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            bad = got.compare(want)
            print(f"FAIL {name}: {len(bad)} differing rows; first:\n{bad.head(3)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
