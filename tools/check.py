#!/usr/bin/env python3
"""Local differential harness mimicking the driver's correctness gate:
run graft.Verify to dump each query's result + oracle_sql.json, then run
every oracle in DuckDB over the same parquet tables and compare
column-sorted, row-sorted values exactly.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
(Verify must have been run first: sbt "runMain graft.Verify <sfDir> <outDir>")
"""
import duckdb, glob, json, math, os, sys
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name, got: pd.DataFrame, exp: pd.DataFrame) -> list:
    errs = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns differ: spark={sorted(got.columns)} oracle={sorted(exp.columns)}"]
    if len(got) != len(exp):
        errs.append(f"row count: spark={len(got)} oracle={len(exp)}")
        return errs
    g, e = normalize(got), normalize(exp)
    for c in g.columns:
        gv, ev = g[c].values, e[c].values
        if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(e[c].dtype, np.floating):
            gv = gv.astype(float)
            ev = ev.astype(float)
            neq = ~((gv == ev) | (np.isnan(gv) & np.isnan(ev)))
            if neq.any():
                i = int(np.argmax(neq))
                md = np.nanmax(np.abs(np.nan_to_num(gv) - np.nan_to_num(ev)))
                errs.append(
                    f"col {c}: {int(neq.sum())}/{len(gv)} cells differ, "
                    f"maxdiff={md:.3e}, first@{i}: spark={gv[i]!r} oracle={ev[i]!r}")
        else:
            neq = gv.astype(str) != ev.astype(str)
            if neq.any():
                i = int(np.argmax(neq))
                errs.append(
                    f"col {c}: {int(neq.sum())}/{len(gv)} cells differ, "
                    f"first@{i}: spark={gv[i]!r} oracle={ev[i]!r}")
    return errs


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = n_skip = 0
    # Lint: DuckDB returns HUGEINT (int128) for bare integer sum();
    # the driver's hasher serializes int128 differently from Spark's
    # BIGINT, so a cell-exact result still hash-mismatches. Reject any
    # oracle whose result schema contains a HUGEINT column — the fix is
    # CAST(... AS BIGINT) in the oracle SQL.
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").df()
        except Exception:
            # missing table (subset runs / the stress gate's events-only
            # frame) or a broken oracle — the compare below reports it
            continue
        huge = [f"{r.column_name}:{r.column_type}" for r in desc.itertuples()
                if "HUGEINT" in str(r.column_type).upper()
                or "INT128" in str(r.column_type).upper()]
        if huge:
            print(f"[LINT] {name}: HUGEINT result column(s) {huge} — "
                  f"CAST to BIGINT in the oracle SQL")
            n_bad += 1
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        res_dir = f"{outdir}/{name}"
        if not glob.glob(f"{res_dir}/*.parquet"):
            print(f"[MISS] {name}: no spark output at {res_dir}")
            n_bad += 1
            continue
        got = pd.read_parquet(res_dir)
        try:
            exp = con.execute(sql).df()
        except Exception as ex:
            print(f"[ORACLE-ERR] {name}: {ex}")
            n_bad += 1
            continue
        errs = compare(name, got, exp)
        if errs:
            print(f"[FAIL] {name} ({len(got)} rows)")
            for e in errs:
                print(f"    {e}")
            n_bad += 1
        else:
            print(f"[ OK ] {name} ({len(got)} rows)")
            n_ok += 1
    # queries DuckDB cannot express: exact Python oracles (pyoracle.py
    # recomputes the expected frame with bit-identical arithmetic),
    # compared with the same rigor as the SQL oracles
    from pyoracle import PY_ORACLES
    # a py-oracled query with NO spark output is a gate failure, same
    # as a missing SQL-oracled output — not a silent skip
    for name in sorted(PY_ORACLES):
        if name in oracle or (only and name not in only):
            continue
        if not glob.glob(f"{outdir}/{name}/*.parquet"):
            print(f"[MISS] {name}: no spark output at {outdir}/{name}")
            n_bad += 1
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle or (only and name not in only):
            continue
        if not glob.glob(f"{d}/*.parquet"):
            print(f"[ROWS] {name}: no output (no oracle)")
            n_skip += 1
            continue
        got = pd.read_parquet(d)
        if name in PY_ORACLES:
            try:
                exp = PY_ORACLES[name](sfdir)
            except FileNotFoundError as ex:
                print(f"[ROWS] {name}: {len(got)} rows (py-oracle input missing: {ex})")
                n_skip += 1
                continue
            errs = compare(name, got, exp)
            if errs:
                print(f"[FAIL] {name} ({len(got)} rows, py-oracle)")
                for e in errs:
                    print(f"    {e}")
                n_bad += 1
            else:
                print(f"[ OK ] {name} ({len(got)} rows, py-oracle)")
                n_ok += 1
        else:
            print(f"[ROWS] {name}: {len(got)} rows (no oracle)")
            n_skip += 1
    print(f"== {n_ok} ok, {n_bad} bad, {n_skip} rows-only ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
