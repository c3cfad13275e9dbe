#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir>

Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle in DuckDB with views over the
sfDir parquet tables, and compares: column set (sorted by name), row
count, and values (rows sorted by all columns; exact for non-floats,
exact-then-1e-9-relative report for floats).
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    no_oracle = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no parquet written"); n_fail += 1; continue
        if name not in oracles:
            no_oracle.append(name); continue
        try:
            got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                f"SELECT {', '.join(quote(c) for c in got_cols)} FROM '{d}/*.parquet' ORDER BY ALL"
            ).fetchall()
            exp = con.sql(oracles[name])
            exp_cols = sorted(exp.columns)
            exp_rows = con.sql(
                f"SELECT {', '.join(quote(c) for c in exp_cols)} FROM ({oracles[name]}) ORDER BY ALL"
            ).fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}"); n_fail += 1; continue
        if got_cols != exp_cols:
            print(f"[FAIL] {name}: cols {got_cols} != {exp_cols}"); n_fail += 1; continue
        if len(got_rows) != len(exp_rows):
            print(f"[FAIL] {name}: {len(got_rows)} rows != {len(exp_rows)}"); n_fail += 1; continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            for c, (gv, ev) in zip(got_cols, zip(g, e)):
                gv, ev = norm(gv), norm(ev)
                if gv == ev:
                    continue
                if isinstance(gv, float) and isinstance(ev, float):
                    if gv == ev or abs(gv - ev) <= 1e-9 * max(abs(gv), abs(ev)):
                        continue
                bad = (i, c, gv, ev)
                break
            if bad:
                break
        if bad:
            print(f"[FAIL] {name}: row {bad[0]} col {bad[1]}: got {bad[2]!r} exp {bad[3]!r}")
            n_fail += 1
        else:
            print(f"[PASS] {name} ({len(got_rows)} rows)")
            n_pass += 1
    if no_oracle:
        print(f"[INFO] rows-only (no oracle): {no_oracle}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

def quote(c):
    return '"' + c.replace('"', '""') + '"'

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
