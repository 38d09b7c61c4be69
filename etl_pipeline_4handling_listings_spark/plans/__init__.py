from etl_pipeline_4handling_listings_spark.plans.listings import (  # noqa: F401
    ListingsDims,
    backfill_property_ids,
    run_curated_load,
    run_history_load,
    transform_listings,
    validate_listings,
)
