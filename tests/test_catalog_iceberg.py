"""Iceberg binding of the snapshot-catalog API.  The sandbox ships no
Iceberg runtime jar, so these tests SKIP here and run green on a cluster
whose session was built with iceberg_session_conf (documented in catalog.py);
make_catalog's fallback selection is tested everywhere."""

import pytest

from tabbyld_spark.sources.catalog import (
    IcebergCatalog,
    SnapshotCatalog,
    iceberg_available,
    iceberg_session_conf,
    make_catalog,
)


def test_make_catalog_falls_back_to_parquet(spark, tmp_path):
    cat = make_catalog(spark, str(tmp_path))
    if not iceberg_available(spark):
        assert isinstance(cat, SnapshotCatalog)
    else:  # pragma: no cover - needs the Iceberg jar
        assert isinstance(cat, (SnapshotCatalog, IcebergCatalog))


def test_session_conf_shape():
    conf = iceberg_session_conf("/tmp/wh", catalog="c1")
    assert conf["spark.sql.catalog.c1"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.c1.warehouse"] == "/tmp/wh"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


@pytest.fixture
def iceberg_spark(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar on the classpath")
    for k, v in iceberg_session_conf(str(tmp_path / "wh")).items():  # pragma: no cover
        spark.conf.set(k, v)
    return spark


def test_iceberg_roundtrip_and_resume(iceberg_spark, tmp_path):  # pragma: no cover
    from pyspark.sql import functions as F

    cat = IcebergCatalog()
    df = iceberg_spark.range(10).withColumn("v", F.col("id") * 2)
    cat.write(df, "t", lineage={"stage": "s1"})
    assert cat.read(iceberg_spark, "t").count() == 10
    cat.write(df.limit(3), "t")
    man = cat.manifest("t")
    assert [h["rows"] for h in man["history"]] == [10, 3]
    assert man["history"][0]["lineage"] == {"stage": "s1"}

    calls = []

    def compute():
        calls.append(1)
        return iceberg_spark.range(5)

    cat.run_stage(iceberg_spark, "s1", compute)
    cat.run_stage(iceberg_spark, "s1", compute)
    assert len(calls) == 1
    cat.drop("t")
    cat.drop("s1")


def test_iceberg_append_accretes(iceberg_spark, tmp_path):  # pragma: no cover
    # append = native Iceberg append snapshot (O(delta) commit); initial
    # append on a missing table is the create
    from pyspark.sql import functions as F

    cat = IcebergCatalog()
    df = iceberg_spark.range(4).withColumn("v", F.col("id") * 3)
    cat.append(df, "t_app", lineage={"op": "b1"})
    cat.append(iceberg_spark.range(4, 6).withColumn("v", F.col("id") * 3), "t_app")
    assert cat.read(iceberg_spark, "t_app").count() == 6
    man = cat.manifest("t_app")
    assert man["history"][-1]["rows"] == 6
