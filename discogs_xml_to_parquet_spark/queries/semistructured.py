"""Map-typed columns and full JSON struct parsing (SURVEY.md §2.B
'Array/map fns' + 'JSON fns' beyond get_json_object)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load


@query(
    "q_map_funcs",
    oracle="""
WITH m AS (
  SELECT c_mktsegment,
         MAP(list(c_nationkey ORDER BY c_nationkey), list(cnt ORDER BY c_nationkey)) AS seg_map
  FROM (
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt
    FROM customer GROUP BY c_mktsegment, c_nationkey
  )
  GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       len(map_keys(seg_map)) AS n_keys,
       CAST(list_sum(map_values(seg_map)) AS BIGINT) AS total_customers,
       list_min(map_keys(seg_map)) AS min_nation,
       map_extract(seg_map, list_min(map_keys(seg_map)))[1] AS min_nation_count
FROM m
ORDER BY c_mktsegment
""",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map column per group (nationkey -> customer count), then
    compute over it with map_keys/map_values/element_at. Maps are
    emitted only as derived scalars: map key order is engine-internal,
    so canonical scalar projections are the cross-engine-stable form."""
    c = load(spark, sf_dir, "customer")
    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = counts.groupBy("c_mktsegment").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("c_nationkey", "cnt")))
        ).alias("seg_map")
    )
    min_key = F.array_min(F.map_keys("seg_map"))
    return m.select(
        "c_mktsegment",
        F.size(F.map_keys("seg_map")).alias("n_keys"),
        F.aggregate(
            F.map_values("seg_map"), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("total_customers"),
        min_key.alias("min_nation"),
        F.element_at(F.col("seg_map"), min_key).alias("min_nation_count"),
    ).orderBy("c_mktsegment")


@query(
    "q_json_struct",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
       json_extract(props, '$.k') IS NOT NULL AS has_expected_shape,
       to_json(struct_pack(id := event_id, k := CAST(json_extract(props, '$.k') AS BIGINT))) AS rebuilt
FROM events
WHERE event_id < 100
ORDER BY event_id
""",
)
def q_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema -> typed struct -> field
    access, plus to_json re-serialization (canonical: both engines emit
    {"id":N,"k":M} for a two-field struct with these names)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    parsed = e.select(
        "event_id",
        F.from_json("props", "k bigint").alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_val"),
        F.col("p.k").isNotNull().alias("has_expected_shape"),
        F.to_json(F.struct(F.col("event_id").alias("id"), F.col("p.k").alias("k"))).alias("rebuilt"),
    ).orderBy("event_id")
