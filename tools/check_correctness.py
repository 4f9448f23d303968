"""Local replica of the driver's correctness gate: run every
`__ray_entry__.queries()` entry and its `oracle_sql()` DuckDB counterpart
at a given sf dir, compare row counts, schemas (column names) and value
hashes (column-name-sorted, like the driver).

Usage: python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _value_hash(df) -> str:
    import pandas as pd

    norm = _normalize(df)
    payload = norm.round(6).to_csv(index=False).encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main() -> None:
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in queries.items():
        row = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            got = fn(SF)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            row["spark_rows"] = len(got)
            sql = oracles.get(name)
            if sql is None:
                row["err"] = "no_oracle"
            else:
                exp = con.execute(sql).df()
                row["oracle_rows"] = len(exp)
                row["rows_match"] = len(got) == len(exp)
                row["schema_match"] = sorted(got.columns) == sorted(exp.columns)
                row["hash_match"] = (
                    row["rows_match"]
                    and row["schema_match"]
                    and _value_hash(got) == _value_hash(exp)
                )
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {e}"
        results[name] = row
        status = "OK " if row.get("hash_match") else ("--- " if row["err"] == "no_oracle" else "FAIL")
        print(f"{status} {name}: {json.dumps(row)}")
    bad = [
        n for n, r in results.items()
        if r["err"] not in (None, "no_oracle") or r.get("hash_match") is False
    ]
    print("FAILURES:", bad if bad else "none")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
