from tabbyld_spark.extract.html import (  # noqa: F401
    extract_content,
    extract_pages,
    serialize_blocks,
)
