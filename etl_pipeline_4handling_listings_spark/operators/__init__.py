from etl_pipeline_4handling_listings_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    latest_record,
)
from etl_pipeline_4handling_listings_spark.operators.history import (  # noqa: F401
    changed_against_previous,
)
from etl_pipeline_4handling_listings_spark.operators.asof import asof_join  # noqa: F401
from etl_pipeline_4handling_listings_spark.operators.groupmap import (  # noqa: F401
    grouped_ols,
)
from etl_pipeline_4handling_listings_spark.operators.merge import merge_upsert  # noqa: F401
from etl_pipeline_4handling_listings_spark.operators.metrics import (  # noqa: F401
    observe_rows,
)
from etl_pipeline_4handling_listings_spark.operators.rangejoin import (  # noqa: F401
    point_in_interval_join,
)
from etl_pipeline_4handling_listings_spark.operators.topk import priority_top_k  # noqa: F401
from etl_pipeline_4handling_listings_spark.operators.validate import (  # noqa: F401
    Rule,
    apply_rules,
    split_valid,
)
