"""General-input readers beyond parquet/XML (SURVEY §2.B scan row:
'+ parquet/json/csv readers for general inputs'): explicit schemas,
never inferred, FAILFAST on corrupt rows."""

from __future__ import annotations

import pytest

from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE

SCHEMA = (
    "event_id long, user_id long, event_type string, value double"
)


@pytest.fixture(scope="module")
def events_subset(spark):
    return load(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


def _assert_roundtrip(spark, df, back):
    assert back.schema.simpleString() == df.schema.simpleString()
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_json_roundtrip(spark, events_subset, tmp_path):
    p = str(tmp_path / "events_json")
    events_subset.write.mode("overwrite").json(p)
    back = spark.read.schema(SCHEMA).option("mode", "FAILFAST").json(p)
    _assert_roundtrip(spark, events_subset, back)


def test_csv_roundtrip(spark, events_subset, tmp_path):
    p = str(tmp_path / "events_csv")
    events_subset.write.mode("overwrite").option("header", True).csv(p)
    back = (
        spark.read.schema(SCHEMA)
        .option("header", True)
        .option("mode", "FAILFAST")
        .csv(p)
    )
    _assert_roundtrip(spark, events_subset, back)


def test_json_failfast_rejects_corrupt(spark, tmp_path):
    p = tmp_path / "bad.json"
    p.write_text('{"event_id": 1, "user_id": 2, "event_type": "x", "value": 1.0}\n'
                 "{not json at all}\n")
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    with pytest.raises((PySparkException, Py4JJavaError)):
        spark.read.schema(SCHEMA).option("mode", "FAILFAST").json(
            str(p)
        ).collect()
