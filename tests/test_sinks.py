from __future__ import annotations

import glob

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.operators.sinks import write_partitioned
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE


def test_partitioned_write_compacts_files(spark, tmp_path):
    out = str(tmp_path / "docs_by_lang")
    d = load(spark, SF_SMOKE, "documents")
    write_partitioned(d, out, ["lang"])

    dirs = sorted(
        p.rsplit("lang=", 1)[1] for p in glob.glob(out + "/lang=*")
    )
    assert dirs == ["de", "en", "es", "fr", "zh"]
    # compaction: one file per partition key, not one per task x key
    for p in glob.glob(out + "/lang=*"):
        assert len(glob.glob(p + "/*.parquet")) == 1

    back = spark.read.parquet(out)
    assert back.count() == d.count()
    # pruning key filter must become a PartitionFilter, scanning one dir
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("lang") == "en").explain(mode="formatted")
    assert "PartitionFilters" in buf.getvalue()
