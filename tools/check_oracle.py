#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same testdata tables and compare with the parquet the
Verify main dumped. Columns sorted by name; rows sorted by all columns;
values compared with a small numeric tolerance fallback after exact
comparison."""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def compare(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return f"schema mismatch: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"rowcount mismatch: {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if pd.api.types.is_numeric_dtype(av) or pd.api.types.is_numeric_dtype(bv):
                af = pd.to_numeric(av, errors="coerce").astype(float)
                bf = pd.to_numeric(bv, errors="coerce").astype(float)
                if not ((af.isna() == bf.isna()).all()):
                    return f"null mismatch in {c}"
                d = (af - bf).abs()
                if not (d.fillna(0) <= 1e-9 + 1e-9 * bf.abs().fillna(0)).all():
                    i = d.idxmax()
                    return f"value mismatch in {c} at row {i}: {av[i]} vs {bv[i]}"
            else:
                if not (av.astype(str) == bv.astype(str)).all():
                    neq = (av.astype(str) != bv.astype(str))
                    i = neq[neq].index[0]
                    return f"value mismatch in {c} at row {i}: {av[i]!r} vs {bv[i]!r}"
        except Exception as e:
            return f"compare error in {c}: {e}"
    return None

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tbl in ["region","nation","customer","supplier","part","orders",
                "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{tbl}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); n_bad += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); n_bad += 1; continue
        err = compare(got, want)
        if err: print(f"[FAIL] {name}: {err}"); n_bad += 1
        else: print(f"[ OK ] {name}: {len(got)} rows"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
