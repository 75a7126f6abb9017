"""loop_shuffle_width + fixture_dir environment behavior."""

import os

from tabbyld_spark.fixtures.sti_fixture import fixture_dir
from tabbyld_spark.functions.joins import loop_shuffle_width


def test_narrows_and_restores(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with loop_shuffle_width(spark, 100) as width:
        assert width == 4
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_keeps_session_width_for_large_volumes(spark):
    prev = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with loop_shuffle_width(spark, 10_000_000) as width:
        assert width == prev  # never widens past the session setting


def test_noop_under_aqe(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        with loop_shuffle_width(spark, 100) as width:
            assert width == int(prev)
            assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "false")


def test_restores_on_error(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with loop_shuffle_width(spark, 100):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_fixture_dir_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("TABBYLD_FIXTURE_DIR", str(tmp_path / "fx"))
    assert fixture_dir().startswith(str(tmp_path / "fx"))


def test_fixture_dir_zip_import_fallback(monkeypatch):
    # when the package is zip-imported the repo-relative parent is NOT a
    # real directory — the cache must fall back to a writable tmp dir
    monkeypatch.delenv("TABBYLD_FIXTURE_DIR", raising=False)
    import tabbyld_spark.fixtures.sti_fixture as sf

    monkeypatch.setattr(sf, "_REPO", "/nonexistent/pkg.zip/tabbyld_spark")
    d = sf.fixture_dir()
    assert d.startswith(os.path.join(os.sep, "tmp")) or "tabbyld_sti_fixture" in d
