#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, load the corresponding Spark result
parquet from Verify's outDir, sort columns by name + rows, and compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-aware → naive UTC so Spark/DuckDB timestamps compare equal
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracles.items()):
        try:
            oracle = canon(con.execute(sql).df())
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        try:
            mine = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            failures.append((name, f"spark result missing: {e}"))
            continue
        if list(oracle.columns) != list(mine.columns):
            failures.append((name, f"columns differ: oracle={list(oracle.columns)} mine={list(mine.columns)}"))
            continue
        if len(oracle) != len(mine):
            failures.append((name, f"row count differs: oracle={len(oracle)} mine={len(mine)}"))
            continue
        diff_cells = 0
        first = None
        for c in oracle.columns:
            ov, mv = oracle[c].tolist(), mine[c].tolist()
            for i, (a, b) in enumerate(zip(ov, mv)):
                if not cells_equal(a, b):
                    diff_cells += 1
                    if first is None:
                        first = f"col {c} row {i}: oracle={a!r} mine={b!r}"
        if diff_cells:
            failures.append((name, f"{diff_cells} differing cells; first: {first}"))
        else:
            print(f"OK   {name} ({len(oracle)} rows)")
    # rows-only queries (no oracle): just report row counts
    import os
    for d in sorted(os.listdir(out_dir)):
        if d not in oracles and os.path.isdir(f"{out_dir}/{d}"):
            n = len(pd.read_parquet(f"{out_dir}/{d}"))
            print(f"ROWS {d} ({n} rows){' <-- EMPTY' if n == 0 else ''}")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(oracles) - len(failures)}/{len(oracles)} oracle queries match")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
