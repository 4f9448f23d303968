"""Self-check harness mimicking the driver's correctness gate: run each
queries() entry and its oracle_sql() on the same sf dir, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        got = fn(sf_dir)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas() if hasattr(got, "to_pandas") else pd.DataFrame(got)
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:24s} rows-only: {len(got)} rows, cols={list(got.columns)}")
            continue
        exp = con.execute(sql).fetchdf()
        g, x = canon(got), canon(exp)
        ok_rows = len(g) == len(x)
        ok_cols = list(g.columns) == list(x.columns)
        ok_vals = ok_rows and ok_cols and g.equals(x)
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(f"{name:24s} {status}  rows {len(g)}/{len(x)} cols_match={ok_cols} vals={ok_vals}")
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_rows:
                diff = (g != x).any(axis=1)
                print("  first diffs:")
                print(pd.concat([g[diff].head(3), x[diff].head(3)], keys=["got", "exp"]))
            else:
                print("  got cols:", list(g.columns), "exp cols:", list(x.columns))
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
