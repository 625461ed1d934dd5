#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each <sfDir>/*.parquet as a
DuckDB view named after the table, runs every oracle query, and compares the
result against the Spark parquet dump in <verifyOutDir>/<query>/ —
columns sorted by name, rows as written, exact value equality (floats are
pre-rounded on both sides by the queries themselves).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def _is_float(x) -> bool:
    return isinstance(x, (float, np.floating))


def _is_int(x) -> bool:
    return isinstance(x, (int, np.integer)) and not isinstance(x, (bool, np.bool_))


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if _is_float(a) and _is_float(b):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # Type-strict across the int/float divide: the driver hashes canonical
    # string renderings, so DuckDB HUGEINT->float 500.0 vs Spark BIGINT 500
    # is a driver FAIL even though 500.0 == 500 in Python. Mirror that here
    # so the replica can't green-light what the driver's hash rejects.
    if (_is_float(a) and _is_int(b)) or (_is_int(a) and _is_float(b)):
        return False
    return a == b


def main() -> int:
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for p in sf_dir.glob("*.parquet"):
        con.sql(f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = out_dir / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output at {spark_dir}")
            failures += 1
            continue
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        got = norm(pd.concat(
            [pd.read_parquet(f) for f in sorted(spark_dir.glob("*.parquet"))],
            ignore_index=True))
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            failures += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            failures += 1
            continue
        bad = []
        # Column-wise access (want[c].values[i]) preserves each column's
        # dtype. Row-wise df.iloc[i][c] builds a row Series upcast to the
        # row's common dtype, which silently turns int64 cells into float64
        # whenever ANY column of the row is float — hiding exactly the
        # DuckDB HUGEINT->float vs Spark BIGINT divergence (q138 class)
        # that the driver's canonical hash rejects.
        for c in want.columns:
            wv, gv = want[c].values, got[c].values
            for i in range(len(want)):
                a, b = wv[i], gv[i]
                if not cell_eq(a, b):
                    bad.append((i, c, a, b))
        if bad:
            print(f"FAIL {name}: {len(bad)} cell mismatches, first: {bad[:5]}")
            failures += 1
        else:
            print(f"OK   {name} ({len(want)} rows x {len(want.columns)} cols)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
