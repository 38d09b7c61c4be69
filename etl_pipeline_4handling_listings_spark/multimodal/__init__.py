from etl_pipeline_4handling_listings_spark.multimodal.binaryops import (  # noqa: F401
    attach_binary_metadata,
    decode_images,
    sample_video_frames,
    sniff_format,
)
