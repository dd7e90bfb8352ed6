#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads <outDir>/<name>/ parquet (Spark results) and <outDir>/oracle_sql.json,
runs each oracle in DuckDB over <sfDir>/*.parquet, sorts columns by name and
rows by all columns, and compares values exactly (floats: exact bitwise).
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    dumped = {d for d in os.listdir(outdir)
              if os.path.isdir(f"{outdir}/{d}")}
    # a query that crashed before writing its directory must not vanish
    try:
        declared = set(json.load(open(f"{outdir}/queries.json")))
    except FileNotFoundError:
        declared = dumped | set(oracle)
    for name in sorted(declared - dumped - set(oracle)):
        print(f"FAIL {name}: declared but no output dumped"); n_fail += 1
    # queries without an oracle get the driver's weaker rows>0 check
    for name in sorted(dumped - set(oracle)):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        if n > 0:
            print(f"PASS {name} (rows-only, {n} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: rows-only check, 0 rows"); n_fail += 1
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            ddf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
            n_fail += 1; continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            n_fail += 1; continue
        a, b = norm(sdf), norm(ddf)
        bad = None
        for c in a.columns:
            av, bv = a[c].tolist(), b[c].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                xn = isinstance(x, float) and math.isnan(x)
                yn = isinstance(y, float) and math.isnan(y)
                if xn and yn:
                    continue
                if x is None and y is None:
                    continue
                if x != y:
                    bad = (c, i, x, y); break
            if bad: break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
