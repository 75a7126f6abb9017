from tabbyld_spark.functions.normalize import (  # noqa: F401
    entity_localname,
    normalize_entry,
    normalize_entry_py,
    split_multivalue,
)
