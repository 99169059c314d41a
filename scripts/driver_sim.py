"""Simulate the driver's t2 correctness gate: load __spark_entry__,
run every queries() entry at sf0.01, compare against oracle_sql() via
DuckDB. Exit 0 iff everything matches.

Usage: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from discogs_xml_to_parquet_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="driver-sim", master="local[16]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    rows = entrymod.entry(spark).count()
    print(f"entry(): {rows} rows {'OK' if rows > 0 else 'FAIL'}")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in sorted(queries.items()):
        t0 = time.perf_counter()
        try:
            if name in oracles:
                compare(spark, sf_dir, fn, oracles[name], name)
                verdict = "MATCH"
            else:
                n = fn(spark, sf_dir).count()
                verdict = f"rows-only ({n} rows)"
        except Exception as exc:  # noqa: BLE001
            verdict = f"FAIL: {str(exc)[:200]}"
            failed.append(name)
        print(f"  {name:32s} {time.perf_counter() - t0:6.2f}s  {verdict}")

    spark.stop()
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print(f"all {len(queries)} queries pass at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
