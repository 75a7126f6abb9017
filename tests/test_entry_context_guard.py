"""entry_context (P12) group-size guard: oversized (table, heading) groups
route through a self-join instead of one executor-side collect_list array —
output must be identical on both paths (VERDICT r2 'What's wrong #3')."""

from pyspark.sql import functions as F

from tabbyld_spark.operators.mentions import entry_context


def _rows(out):
    return sorted(
        (r["table_id"], r["mention"], r["ctx_value"], r["n"]) for r in out.collect()
    )


def _canonical(spark, data):
    return spark.createDataFrame(
        data, "table_id string, row_idx long, col_idx long, data string, "
        "row_heading string, column_heading string"
    )


def test_pathological_single_heading_group(spark):
    # one table, EVERY row shares the same row_heading: the heading group
    # holds 200 distinct DATA values, far above the test cap of 8
    data = [
        ("t1", i, 0, f"v{i:03d}", "shared", f"col{i % 3}") for i in range(200)
    ]
    # plus duplicated values to exercise multiplicities
    data += [("t1", 200 + i, 0, f"v{i:03d}", "shared", "col0") for i in range(5)]
    canonical = _canonical(spark, data)
    small_path = entry_context(canonical, hashed=False, max_group_values=1_000_000)
    join_path = entry_context(canonical, hashed=False, max_group_values=8)
    a, b = _rows(small_path), _rows(join_path)
    assert a == b
    assert len(a) > 0
    # v000 is duplicated (rows 0 and 200): sharing 'shared' with all 205 rows
    # means every value's context includes v000 with multiplicity >= 2
    n_by_pair = {(m, c): n for (_, m, c, n) in a}
    assert n_by_pair[("v001", "v000")] >= 2


def test_mixed_small_and_big_groups(spark):
    # table t2: row_heading groups of size 2 (small path) AND a column_heading
    # group of size 40 (> cap 8, join path) — the inclusion-exclusion overlap
    # term must stay consistent when the three streams take different paths
    data = []
    for i in range(40):
        data.append(("t2", i, 0, f"d{i}", f"rh{i // 2}", "one_col"))
    canonical = _canonical(spark, data)
    ref = entry_context(canonical, hashed=False, max_group_values=1_000_000)
    mixed = entry_context(canonical, hashed=False, max_group_values=8)
    assert _rows(ref) == _rows(mixed)


def test_hashed_shape_consistent_across_paths(spark):
    data = [("t3", i, 0, f"x{i % 7}", "h", "c") for i in range(30)]
    canonical = _canonical(spark, data)
    a = entry_context(canonical, hashed=True, max_group_values=2)
    b = entry_context(canonical, hashed=True, max_group_values=1_000_000)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.columns == ["ctx_key", "vhash", "n"]


def test_empty_headings_excluded(spark):
    # rows with empty heading cells must not join through that heading
    data = [
        ("t4", 0, 0, "a", "", "c1"),
        ("t4", 1, 0, "b", "", "c1"),
        ("t4", 2, 0, "c", "rh", ""),
        ("t4", 3, 0, "d", "rh", ""),
    ]
    canonical = _canonical(spark, data)
    for cap in (1, 100):
        out = _rows(entry_context(canonical, hashed=False, max_group_values=cap))
        pairs = {(m, c) for (_, m, c, _) in out}
        assert ("a", "b") in pairs and ("c", "d") in pairs
        assert ("a", "c") not in pairs and ("b", "d") not in pairs
