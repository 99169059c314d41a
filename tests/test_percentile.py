"""Cross-check Spark's exact percentile against numpy's linear
interpolation (the rows-only q_percentiles query's exact half)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE


def test_exact_percentile_matches_numpy(spark):
    li = load(spark, SF_SMOKE, "lineitem")
    got = {
        r["l_returnflag"]: (r["med"], r["p95"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", 0.5).alias("med"),
            F.percentile("l_extendedprice", 0.95).alias("p95"),
        )
        .collect()
    }
    rows = li.select("l_returnflag", "l_extendedprice").collect()
    by_flag: dict[str, list[float]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    for flag, vals in by_flag.items():
        med, p95 = got[flag]
        assert abs(med - np.percentile(vals, 50)) < 1e-6 * abs(med)
        assert abs(p95 - np.percentile(vals, 95)) < 1e-6 * abs(p95)
