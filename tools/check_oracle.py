#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--approx]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir
parquet tables, normalizes (sort columns by name, sort rows by all
columns), and reports exact / approximate equality per query.

STRICT BY DEFAULT: a query that matches only within 1e-9 float
tolerance ("OK~") counts as a FAILURE in the exit code, because the
driver's gate hashes bit-exact values — a tolerance-only match here
is a hash-fail there. Pass --approx to restore the old lenient exit
(e.g. while bisecting which column broke).
"""
import duckdb, glob, json, math, os, sys
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def cell_eq(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b

def main(sf_dir: str, out_dir: str, approx: bool = False) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            failures += 1
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        # Output-TYPE gate: pandas .df() launders DuckDB HUGEINT (and
        # friends) to float64 before the value compare, but the driver's
        # hash is type-sensitive — an uncast sum(BIGINT) window (HUGEINT)
        # matches values here yet hash-fails there (q218/q219/q256, r9-r11).
        # DESCRIBE the oracle body and fail on any non-portable output type.
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
            bad_types = [(c, t) for c, t, *_ in desc
                         if any(x in t.upper() for x in
                                ("HUGEINT", "UHUGEINT", "DECIMAL"))]
            if bad_types:
                print(f"FAIL {name}: oracle emits non-portable types "
                      f"(cast ::BIGINT/::DOUBLE): {bad_types}")
                failures += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: oracle DESCRIBE error: {e}")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in sorted(files)])
        w, g = norm(want), norm(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns differ\n  oracle: {list(w.columns)}\n  spark : {list(g.columns)}")
            failures += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: row count oracle={len(w)} spark={len(g)}")
            failures += 1
            continue
        exact = w.equals(g) or (w.astype(object).values == g.astype(object).values).all()
        if exact:
            print(f"OK   {name}: exact match ({len(w)} rows)")
            continue
        # cell-level diff with float tolerance, to localize the break
        bad_cells = 0
        first = None
        for col in w.columns:
            for i, (a, b) in enumerate(zip(w[col].tolist(), g[col].tolist())):
                if not cell_eq(a, b):
                    bad_cells += 1
                    if first is None:
                        first = (col, i, a, b)
        if bad_cells == 0:
            tag = "OK~ " if approx else "FAIL"
            print(f"{tag} {name}: match within float tolerance only ({len(w)} rows) — WILL fail the driver's exact hash")
            if not approx:
                # localize the first bit-inexact cell for debugging
                for col in w.columns:
                    for i, (a, b) in enumerate(zip(w[col].tolist(), g[col].tolist())):
                        if not (a == b or (isinstance(a, float) and isinstance(b, float)
                                           and math.isnan(a) and math.isnan(b))):
                            print(f"     first inexact cell: col={col} row={i} oracle={a!r} spark={b!r}")
                            break
                    else:
                        continue
                    break
                failures += 1
        else:
            col, i, a, b = first
            print(f"FAIL {name}: {bad_cells} mismatched cells; first at col={col} row={i}: oracle={a!r} spark={b!r}")
            failures += 1
    return failures

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.exit(1 if main(args[0], args[1], approx="--approx" in sys.argv) else 0)
