#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, load the corresponding Spark result
parquet from Verify's outDir, sort columns by name + rows, and compare.

The driver's hash is type-sensitive, so this gate must be at least as
strict: in addition to cell values it (a) fails when the pandas dtype
*kind* differs between the oracle and Spark frames (int vs float, object
vs numeric, ...) and (b) lints every oracle SQL's projected types via
`DESCRIBE`, failing on any HUGEINT/UHUGEINT column (DuckDB's SUM(BIGINT)
widening — Spark has no int128, so the driver hash can never match) and
on any DECIMAL column whose Spark counterpart is not also decimal.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
       compare_oracle.py --lint-only <sfDir> <verifyOutDir>   # types only
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


def dtype_mismatches(oracle: pd.DataFrame, mine: pd.DataFrame):
    """Columns whose pandas dtype *kind* differs (int vs float vs object
    vs bool ...). This is the class the driver's type-sensitive hash
    catches and loose value comparison does not. Same-kind width diffs
    (int32 vs int64) are reported as warnings, not failures."""
    hard, soft = [], []
    for c in oracle.columns:
        od, md = oracle[c].dtype, mine[c].dtype
        if od.kind != md.kind:
            hard.append(f"col {c}: oracle dtype {od} vs spark dtype {md}")
        elif str(od) != str(md):
            soft.append(f"col {c}: oracle dtype {od} vs spark dtype {md}")
    return hard, soft


def lint_oracle_types(con, oracles, out_dir):
    """DESCRIBE each oracle SQL (no execution) and flag projected types
    the driver hash can never reconcile with Spark output:
      - HUGEINT/UHUGEINT: DuckDB's SUM(BIGINT) widening → pandas float64
        while Spark emits int64. Always a bug; cast to BIGINT in the SQL.
      - DECIMAL: only a bug when the Spark parquet column is not decimal
        (DuckDB decimal → float64/object, Spark long/double hashes differ).
    Returns a list of (query, finding) pairs."""
    import os
    findings = []
    for name, sql in sorted(oracles.items()):
        try:
            cols = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:
            findings.append((name, f"DESCRIBE failed: {e}"))
            continue
        spark_dtypes = {}
        try:
            spark_dtypes = dict(
                pd.read_parquet(f"{out_dir}/{name}").dtypes.astype(str))
        except Exception:
            pass  # lint still covers the unconditional HUGEINT class
        for col, typ, *_ in cols:
            t = typ.upper()
            if "HUGEINT" in t:
                findings.append(
                    (name, f"col {col}: oracle projects {typ} "
                           f"(DuckDB int128 → pandas float64; Spark has no "
                           f"int128) — wrap in CAST(... AS BIGINT)"))
            elif t.startswith("DECIMAL"):
                sd = spark_dtypes.get(col, "")
                if sd and sd != "object":
                    findings.append(
                        (name, f"col {col}: oracle projects {typ} but Spark "
                               f"emits {sd} — cast one side to match"))
        # Raw DECIMAL-sum → DOUBLE cast: DuckDB's direct cast double-rounds
        # (int128 → double, then ÷10^scale), so at >=17 significant digits
        # it can sit 1 ulp off Spark's correctly-rounded Decimal.toDouble —
        # caught live at sf1 on q1_agg.sum_charge. Required idiom:
        # CAST(CAST(SUM(...) AS VARCHAR) AS DOUBLE) (string parse is
        # correctly rounded). Textual check: every "CAST(SUM(" whose
        # matching close is " AS DOUBLE)" must be wrapped by "CAST(CAST(".
        i = 0
        while True:
            j = sql.find("CAST(SUM(", i)
            if j < 0:
                break
            k, depth = j + len("CAST("), 1
            while depth > 0 and k < len(sql):
                depth += {"(": 1, ")": -1}.get(sql[k], 0)
                k += 1
            inner = sql[j + len("CAST("):k - 1].rstrip()
            if inner.endswith("AS DOUBLE") and \
                    sql[max(0, j - 5):j] != "CAST(":
                findings.append(
                    (name, "raw CAST(SUM(...) AS DOUBLE) — DuckDB's direct "
                           "decimal→double cast double-rounds at >=17 sig "
                           "digits; hop through VARCHAR: "
                           "CAST(CAST(SUM(...) AS VARCHAR) AS DOUBLE)"))
            i = k
    return findings


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    lint_only = "--lint-only" in sys.argv
    # --only=q_a,q_b: restrict the compare (and lint) to named queries —
    # for targeted cross-scale runs where executing every oracle SQL at a
    # big SF is infeasible (e.g. the all-pairs formulations at sf1).
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
    sf_dir, out_dir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        missing = only - set(oracles)
        if missing:
            print(f"--only names without oracle SQL: {sorted(missing)}")
        oracles = {k: v for k, v in oracles.items() if k in only}

    lint = lint_oracle_types(con, oracles, out_dir)
    for name, why in lint:
        print(f"LINT {name}: {why}")
    if lint_only:
        print(f"\nlint: {len(lint)} findings over {len(oracles)} oracle SQLs")
        sys.exit(1 if lint else 0)

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
        hard, soft = dtype_mismatches(oracle, mine)
        for w in soft:
            print(f"WARN {name}: {w} (same kind — driver hash may still match)")
        if hard:
            failures.append((name, f"dtype kind mismatch: {'; '.join(hard)}"))
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
        if d not in oracles and os.path.isdir(f"{out_dir}/{d}") \
                and (only is None or d in only):
            n = len(pd.read_parquet(f"{out_dir}/{d}"))
            print(f"ROWS {d} ({n} rows){' <-- EMPTY' if n == 0 else ''}")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(oracles) - len(failures)}/{len(oracles)} oracle queries match; "
          f"{len(lint)} lint findings")
    sys.exit(1 if failures or lint else 0)


if __name__ == "__main__":
    main()
