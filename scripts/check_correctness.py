#!/usr/bin/env python3
"""Dev-loop harness mimicking the driver's correctness gate.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the oracle SQL in DuckDB against
the same parquet tables, sorts columns by name, and compares row count,
schema (column names), and a value hash. NOT part of the shipped library —
pure build tooling (driver-side python deps only).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              str(type(v)).find("ndarray") >= 0 else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "int64", "Int32", "Int64"):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1;  continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1;  continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}");  n_fail += 1;  continue
        # The driver hashes raw values, so representation drift (e.g. DuckDB
        # HUGEINT -> float64 vs Spark int64) fails there. Mirror that: dtypes
        # must agree after norm, and integer columns compare exactly.
        mism = [c for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        if mism:
            print(f"FAIL {name}: dtype mismatch "
                  f"{[(c, str(got[c].dtype), str(exp[c].dtype)) for c in mism]}")
            n_fail += 1;  continue
        try:
            int_cols = [c for c in got.columns if str(got[c].dtype) in ("int64", "bool")]
            for c in int_cols:
                if not got[c].equals(exp[c]):
                    d = (got[c] != exp[c])
                    raise AssertionError(
                        f"integer column {c} differs at {int(d.sum())} rows "
                        f"(first idx {int(d.idxmax())})")
            rest = [c for c in got.columns if c not in int_cols]
            if rest:
                pd.testing.assert_frame_equal(got[rest], exp[rest], check_dtype=True,
                                              check_exact=False, rtol=0, atol=1e-9)
            print(f"PASS {name} ({len(got)} rows)");  n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n  {str(e)[:400]}");  n_fail += 1
    # rows-only checks for queries without an oracle
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(d)
        if os.path.isdir(d) and name not in oracle:
            files = glob.glob(os.path.join(d, "*.parquet"))
            nrows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"{'PASS' if nrows > 0 else 'FAIL'} {name} (rows-only: {nrows})")
            if nrows > 0: n_pass += 1
            else: n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
