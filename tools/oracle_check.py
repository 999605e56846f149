#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB over the testdata parquet and
compares (columns sorted by name, rows sorted, exact value match) against the
Spark-written parquet in <verifyOutDir>/<name>/.
"""
import json, sys, glob, math
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in glob.glob(f"{sf_dir}/*.parquet"):
        name = t.split("/")[-1].replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); n_bad += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in files]))
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"[COLS] {name}: {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: {len(got)} vs {len(want)}"); n_bad += 1; continue
        # the driver's hash stringifies values, so int64 123 vs float64 123.0
        # (e.g. DuckDB sum(BIGINT) -> HUGEINT -> pandas float) is a mismatch
        # even when values are numerically equal — flag dtype-kind drift
        kinds = [(c, got[c].dtype.kind, want[c].dtype.kind) for c in got.columns]
        drift = [k for k in kinds if (k[1] in "iu") != (k[2] in "iu")]
        if drift:
            print(f"[TYPE] {name}: int/float kind drift {drift}"); n_bad += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c].values, want[c].values
            for i in range(len(a)):
                x, y = a[i], b[i]
                if isinstance(x, float) or isinstance(y, float):
                    xf, yf = float(x), float(y)
                    if math.isnan(xf) and math.isnan(yf):
                        continue
                    if xf != yf:
                        bad = (c, i, x, y); break
                elif x != y:
                    bad = (c, i, x, y); break
            if bad: break
        if bad:
            c, i, x, y = bad
            print(f"[VAL ] {name}: col={c} row={i}: spark={x!r} duckdb={y!r}")
            n_bad += 1
        else:
            print(f"[ OK ] {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
