"""getNormalizedEntry parity: Spark expression == pure-Python twin == DuckDB SQL.

Reference semantics: /root/reference/components/CanonicalTableAnnotator.php:121-137.
"""

import duckdb
import pytest

from tabbyld_spark.functions.normalize import (
    entity_localname,
    normalize_entry,
    normalize_entry_py,
    normalize_entry_sql,
    split_multivalue,
)

CASES = [
    "Almaty",
    "new york city",
    "  padded   spaces  ",
    "O'Brien & Sons, Ltd.",
    "R&D 2024!",
    "москва",            # leading Cyrillic stays lowercase (byte-wise ucfirst)
    "Река Волга",
    "a",
    "42 things",
    "MiXeD CaSe-Value_x",
    "tab\tand  spaces",
]


def test_python_twin_examples():
    assert normalize_entry_py("new york city") == "New_york_city"
    assert normalize_entry_py("O'Brien & Sons, Ltd.") == "Obrien_sons_ltd"
    # PHP: ucfirst on a multibyte lowercase Cyrillic first byte is a no-op
    assert normalize_entry_py("москва") == "москва"
    assert normalize_entry_py("  A  B ") == "A_b"


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(c,) for c in CASES], ["raw"])
    got = {
        r["raw"]: r["norm"]
        for r in df.select("raw", normalize_entry("raw").alias("norm")).collect()
    }
    for c in CASES:
        assert got[c] == normalize_entry_py(c), c


def test_duckdb_matches_python():
    con = duckdb.connect()
    expr = normalize_entry_sql("raw")
    for c in CASES:
        (got,) = con.execute(f"select {expr} from (select ? as raw)", [c]).fetchone()
        assert got == normalize_entry_py(c), c


def test_split_multivalue(spark):
    df = spark.createDataFrame([("Alpha | Beta | G | d",), ("Solo",)], ["v"])
    rows = df.select(split_multivalue("v").alias("a")).collect()
    assert rows[0]["a"] == ["Alpha", "Beta", "G", "d"]
    assert rows[1]["a"] == ["Solo"]


def test_entity_localname(spark):
    df = spark.createDataFrame(
        [
            ("http://dbpedia.org/resource/Paris",),
            ("http://dbpedia.org/ontology/City",),
            ("http://dbpedia.org/property/name",),
            ("plain",),
        ],
        ["e"],
    )
    vals = [r["l"] for r in df.select(entity_localname("e").alias("l")).collect()]
    assert vals == ["Paris", "City", "name", "plain"]


@pytest.mark.parametrize("case", ["", "   ", "!!!"])
def test_degenerate_inputs(case):
    assert normalize_entry_py(case) == ""
