from tabbyld_spark.fixtures.kg import KG, build_kg  # noqa: F401
from tabbyld_spark.fixtures.pages import gen_pages_df, gen_pages_pd  # noqa: F401
