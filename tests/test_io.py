"""Input-source shim: parquet path always works; the Iceberg path is
skip-guarded on connector presence (no iceberg-spark-runtime jar ships in
this sandbox) so it stops being dead code the day the jar appears."""

import pytest

from sketchlib.spark.io import has_iceberg, iceberg_data_files, read_input


def test_read_input_parquet_path(spark):
    df = read_input(spark, "/root/testdata/sf0.001/documents.parquet")
    assert df.count() > 0


def test_read_input_iceberg_errors_without_connector(spark):
    if has_iceberg(spark):
        pytest.skip("iceberg connector present — covered by the live test below")
    with pytest.raises(RuntimeError, match="Iceberg connector"):
        read_input(spark, "iceberg:cat.db.t")


def test_iceberg_roundtrip_when_connector_present(spark, tmp_path):
    if not has_iceberg(spark):
        pytest.skip("no iceberg-spark-runtime jar in this environment")
    if spark.conf.get("spark.sql.catalog.local", None) is None:
        pytest.skip("iceberg jar present but no 'local' catalog configured in the session")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
    src = read_input(spark, "/root/testdata/sf0.001/nation.parquet")
    src.writeTo("local.db.nation_ice").using("iceberg").createOrReplace()
    df = read_input(spark, "iceberg:local.db.nation_ice")
    assert df.count() == src.count()
    files = iceberg_data_files(spark, "local.db.nation_ice")
    assert len(files) >= 1
