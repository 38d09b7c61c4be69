from etl_pipeline_4handling_listings_spark.streaming.pipeline import (  # noqa: F401
    foreach_batch_cdc_apply,
    foreach_batch_lateness_profile,
    foreach_batch_sketch_merge,
    foreach_batch_upsert,
    suggest_watermark_us,
    stream_dedup_redelivery,
    stream_hourly_rollup,
    stream_interval_join,
    stream_latest_record_dedup,
    stream_ohlc_bars,
    stream_session_rollup,
)
