from __future__ import annotations

import pytest

from tabbyld_spark.fixtures.kg import build_kg
from tabbyld_spark.fixtures.pages import gen_pages_pd
from tabbyld_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tabbyld-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def kg():
    return build_kg(seed=42)


@pytest.fixture(scope="session")
def kg_spark(spark, kg):
    dfs = kg.to_spark(spark)
    for df in dfs.values():
        df.cache().count()
    return dfs


@pytest.fixture(scope="session")
def pages_fx(kg):
    return gen_pages_pd(kg, n_pages=120, seed=42)
