#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same tables, and
compares: column names (sorted), row counts, and values (rows sorted by all
columns). Exits nonzero on any mismatch.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            pass
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = []
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            failures.append((name, f"oracle failed: {e}"))
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            failures.append(
                (name, f"columns {list(spark_df.columns)} vs {list(duck_df.columns)}"))
            continue
        if len(spark_df) != len(duck_df):
            failures.append((name, f"rows {len(spark_df)} vs {len(duck_df)}"))
            continue
        try:
            pd.testing.assert_frame_equal(
                spark_df, duck_df, check_dtype=False, check_exact=False,
                rtol=0, atol=1e-6)
            print(f"  OK    {name} ({len(spark_df)} rows)")
        except AssertionError as e:
            failures.append((name, str(e).splitlines()[-1][:300]))
    n_oracle_failures = len(failures)
    # rows-only check for queries without an oracle
    import os
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path) or name in oracles:
            continue
        try:
            n = len(pd.read_parquet(path))
            print(f"  OK*   {name} (rows-only: {n} rows)")
            if n == 0:
                failures.append((name, "rows-only query returned 0 rows"))
        except Exception as e:
            failures.append((name, f"rows-only output unreadable: {e}"))
    for name, msg in failures:
        print(f"  FAIL  {name}: {msg}")
    print(f"{len(oracles) - n_oracle_failures}/{len(oracles)} oracle queries match"
          + (f"; {len(failures) - n_oracle_failures} rows-only failure(s)"
             if len(failures) > n_oracle_failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
