"""Table-format adapter tests: the parquet route end-to-end, and the
Iceberg route gated on runtime availability (absent in this container,
so the catalog test documents-by-skipping)."""

import pytest

from crrf_det_spark import sources


def test_path_detection():
    assert sources.is_path("/tmp/x")
    assert sources.is_path("s3://bucket/key")
    assert not sources.is_path("catalog.db.transcripts")


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("c1", 0, 10), ("c2", 1, 11)], "conv_id string, turn_idx int, b int"
    )
    out = str(tmp_path / "t")
    sources.write_table(df, out, partition_by=["b"], overwrite_partitions=True)
    got = sources.read_table(spark, out)
    assert got.count() == 2
    assert set(got.columns) == {"conv_id", "turn_idx", "b"}
    # idempotent per-partition overwrite: rewrite one partition only
    df2 = spark.createDataFrame(
        [("c1-new", 0, 10)], "conv_id string, turn_idx int, b int"
    )
    sources.write_table(
        df2, out, partition_by=["b"], overwrite_partitions=True
    )
    rows = {
        (r.conv_id, r.b)
        for r in sources.read_table(spark, out).collect()
    }
    assert rows == {("c1-new", 10), ("c2", 11)}


def test_iceberg_route_when_available(spark):
    if not sources.iceberg_available(spark):
        pytest.skip(
            "iceberg-spark-runtime not on classpath in this container; "
            "the catalog route uses DataFrameWriterV2 (writeTo/"
            "overwritePartitions) unchanged"
        )
    # with a catalog configured this exercises the same API surface
    sources.write_table(
        spark.range(3), "spark_catalog.default.crrf_sources_smoke"
    )
