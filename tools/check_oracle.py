#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same testdata tables and compare with the parquet the
Verify main dumped.

EXACT comparison (default): mirrors the driver's hash gate — columns sorted
by name, rows sorted by all columns, every value stringified and compared
exactly. A float that differs in the last ulp FAILS here, exactly like the
driver's hash. Pass --tolerant for the old 1e-9 numeric fallback (debugging
only; never trust it as the gate).
"""
import json, sys, glob, os
import duckdb
import numpy as np
import pandas as pd

TOLERANT = "--tolerant" in sys.argv


def _cell(v):
    """Canonical exact string for a value, stable across engines."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if np.isnan(v):
            return "<null>"
        # repr() is shortest round-trip — bit-exact doubles stringify equal
        return repr(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "<null>" if np.isnan(f) else repr(f)
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if v is pd.NaT:
        return "<null>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.map(_cell)
    order = np.lexsort([s[c].to_numpy() for c in reversed(s.columns)])
    return df.iloc[order].reset_index(drop=True), s.iloc[order].reset_index(drop=True)


def compare_exact(a_raw, a, b_raw, b):
    if list(a.columns) != list(b.columns):
        return f"schema mismatch: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"rowcount mismatch: {len(a)} vs {len(b)}"
    for c in a.columns:
        neq = (a[c] != b[c]).to_numpy()
        if neq.any():
            i = int(np.argmax(neq))
            return (f"value mismatch in {c} at row {i}: "
                    f"{a_raw[c].iloc[i]!r} vs {b_raw[c].iloc[i]!r}")
    return None


def compare_tolerant(a: pd.DataFrame, b: pd.DataFrame):
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


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{tbl}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        # --only=q7,q72 exact-prefix match on the qNN id (the part before
        # the first underscore) or the full name — a substring match would
        # silently sweep q70..q75 into --only=q7
        wanted = [o.strip() for o in only.split(",") if o.strip()]
        oracle = {k: v for k, v in oracle.items()
                  if any(k == o or k.split("_")[0] == o for o in wanted)}
        print(f"[only] selected {len(oracle)}: {', '.join(sorted(oracle))}")
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); n_bad += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files])
            want = con.sql(sql).df()
            if TOLERANT:
                from_old = canon(got)[0], canon(want)[0]
                err = compare_tolerant(*from_old)
            else:
                g_raw, g = canon(got)
                w_raw, w = canon(want)
                err = compare_exact(g_raw, g, w_raw, w)
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); n_bad += 1; continue
        if err: print(f"[FAIL] {name}: {err}"); n_bad += 1
        else: print(f"[ OK ] {name}: {len(got)} rows"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = next((a.split("=", 1)[1] for a in sys.argv[1:]
                 if a.startswith("--only=")), None)
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out = argv[1] if len(argv) > 1 else "/tmp/verify_out"
    sys.exit(main(sf, out, only))
