from etl_pipeline_4handling_listings_spark.sources.readers import (  # noqa: F401
    read_dims,
    read_table,
    read_union,
)
from etl_pipeline_4handling_listings_spark.sources.store import MergeStore  # noqa: F401
from etl_pipeline_4handling_listings_spark.sources.writers import (  # noqa: F401
    write_export,
    write_json_lines,
)
