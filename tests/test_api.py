from __future__ import annotations

from discogs_xml_to_parquet_spark.api import Engine
from tests.conftest import SF_SMOKE


def test_engine_surfaces(spark, tmp_path):
    eng = Engine(spark, sf_dir=SF_SMOKE)

    assert eng.table("region").count() == 5

    df = eng.sql(
        "SELECT r_name, COUNT(*) AS n FROM nation n "
        "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r_name"
    )
    assert df.count() == 5

    assert "q1_pricing_summary" in eng.queries()
    assert eng.query("q1_pricing_summary").count() > 0

    from discogs_xml_to_parquet_spark.sources.fixture import write_fixture_gz

    src = write_fixture_gz(str(tmp_path / "r.xml.gz"))
    out = str(tmp_path / "out.parquet")
    eng.convert(src, out)
    assert spark.read.parquet(out).count() == 3
