#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare (schema-insensitively: columns
sorted by name, rows sorted by all values) against the Spark parquet dumps
written by graft.Verify. Usage: check.py <sfDir> <verifyOutDir> [query...]"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints (int32 vs int64) and floats
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            # list/array columns -> tuples so sort/compare work
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                hasattr(v, "__len__") and not isinstance(v, (str, bytes)) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").fetchdf())
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            fails += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            fails += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            fails += 1
        elif not got.equals(exp):
            neq = (got != exp) & ~(got.isna() & exp.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; first:")
            print(pd.concat([got[bad].head(3).assign(side='spark'),
                             exp[bad].head(3).assign(side='duckdb')]))
            fails += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
