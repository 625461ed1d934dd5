#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB — the columnar-engine cost baseline the
judge's "is this the plan you'd want" question needs: a query where the Spark
plan is an order of magnitude off the DuckDB cost on the same data is a plan
smell even when the absolute seconds are small.

Usage: python3 tools/bench_oracle.py <sfDir> <oracle_sql.json> [out.json]

Runs each query once untimed (buffer/JIT warm-up) then twice timed, keeping
the min (same steady-state estimator as graft.Bench). Writes
{"sf": ..., "engine": "duckdb", "queries": {name: sec}, "total": sec}
to out.json (default BENCH_ORACLE.json) and prints per-query seconds with the
Spark/DuckDB ratio when BENCH_LATEST.json is present.
"""
import json
import sys
import time
from pathlib import Path

import duckdb


def main() -> int:
    sf_dir = Path(sys.argv[1])
    oracle_path = Path(sys.argv[2])
    out_path = Path(sys.argv[3]) if len(sys.argv) > 3 else Path("BENCH_ORACLE.json")
    oracle = json.loads(oracle_path.read_text())
    con = duckdb.connect()
    for p in sf_dir.glob("*.parquet"):
        con.sql(f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")

    spark_times = {}
    latest = Path("BENCH_LATEST.json")
    if latest.exists():
        try:
            spark_times = json.loads(latest.read_text()).get("queries", {})
        except Exception:
            pass

    times = {}
    for name, sql in sorted(oracle.items()):
        try:
            con.sql(sql).fetchall()  # warm-up
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 4)
            ratio = ""
            if name in spark_times and best > 0:
                ratio = f"  spark/duck={spark_times[name] / best:8.1f}x"
            print(f"{name:45s} {best:8.3f} s{ratio}")
        except Exception as e:
            times[name] = None
            print(f"{name:45s}     FAIL {e}")

    ok = {k: v for k, v in times.items() if v is not None}
    out = {"sf": str(sf_dir), "engine": "duckdb", "unit": "sec",
           "total": round(sum(ok.values()), 3), "queries": times}
    out_path.write_text(json.dumps(out) + "\n")
    print(f"\nduckdb total: {out['total']} s over {len(ok)}/{len(times)} queries"
          f" -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
