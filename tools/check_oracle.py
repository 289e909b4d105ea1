#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [out.json]

Loads each <verify_out_dir>/<query> parquet result, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf tables, sorts
columns by name, and compares row counts + values (exact for non-floats,
1e-9 relative tolerance reported for floats).

With a third argument, also writes a CORRECTNESS_r*-shaped JSON
(name -> {rows_match, schema_match, hash_match, err}) — feed that to
tools/regen_coverage.py to refresh COVERAGE.md's marks mechanically.
"""
import sys, json, glob, math, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_result(d):
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        return None
    return pq.ParquetDataset(d).read().to_pandas()

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def compare(name, got, exp):
    got, exp = norm(got), norm(exp)
    if list(got.columns) != list(exp.columns):
        return f"SCHEMA cols {list(got.columns)} vs {list(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS {len(got)} vs {len(exp)}"
    # exact dtype parity (int32 vs int64 etc.) — the driver checks schema.
    # DATE columns are equivalent logical types but surface differently in
    # pandas (object-of-date from pyarrow vs datetime64 from duckdb).
    import datetime
    def canon(s):
        d = str(s.dtype)
        if d.startswith("datetime64"):
            return "date"
        if d == "object" and s.dropna().map(
                lambda x: isinstance(x, datetime.date)).all():
            return "date"
        return d
    dt = [f"{c}: {got[c].dtype} vs {exp[c].dtype}" for c in got.columns
          if canon(got[c]) != canon(exp[c])]
    if dt:
        return "DTYPE " + "; ".join(dt)
    probs = []
    for c in got.columns:
        g, e = got[c], exp[c]
        try:
            if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                gn, en = g.isna(), e.isna()
                if not gn.equals(en):
                    probs.append(f"{c}: null-mask mismatch")
                    continue
                gv, ev = g[~gn].astype(float), e[~en].astype(float)
                diff = (gv - ev).abs()
                denom = ev.abs().clip(lower=1.0)
                rel = (diff / denom).max() if len(gv) else 0.0
                if rel > 1e-9:
                    i = (diff / denom).idxmax()
                    probs.append(f"{c}: maxrel {rel:.2e} at row {i}: {gv[i]!r} vs {ev[i]!r}")
            else:
                gs = g.astype(str).where(~g.isna(), "<NULL>")
                es = e.astype(str).where(~e.isna(), "<NULL>")
                if not gs.equals(es):
                    bad = (gs != es)
                    i = bad.idxmax()
                    probs.append(f"{c}: {bad.sum()} diffs, first row {i}: {gs[i]!r} vs {es[i]!r}")
        except Exception as ex:
            probs.append(f"{c}: compare error {ex}")
    return "; ".join(probs) if probs else None

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(set(oracles) | {d for d in os.listdir(out_dir)
                                   if os.path.isdir(os.path.join(out_dir, d))})
    n_pass = n_fail = 0
    report = {}
    def record(name, err):
        ok = err is None
        report[name] = {"rows_match": ok, "schema_match": ok,
                        "hash_match": ok, "err": err}
    for name in names:
        rd = os.path.join(out_dir, name)
        if not os.path.isdir(rd):
            print(f"FAIL {name}: no spark result"); n_fail += 1
            record(name, "no spark result"); continue
        if name not in oracles:
            print(f"WARN {name}: no oracle (rows-only check)"); continue
        got = load_result(rd)
        if got is None:
            print(f"FAIL {name}: empty result dir"); n_fail += 1
            record(name, "empty result dir"); continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL error: {ex}"); n_fail += 1
            record(name, f"oracle SQL error: {ex}"); continue
        prob = compare(name, got, exp)
        record(name, prob)
        if prob:
            print(f"FAIL {name}: {prob}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(report, f, indent=1)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
