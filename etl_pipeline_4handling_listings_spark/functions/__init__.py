from etl_pipeline_4handling_listings_spark.functions.cleaning import (  # noqa: F401
    blank_as_null,
    clean_phone_number,
    collapse_whitespace,
    instr_any,
    null_if_before_year,
    regexp_like,
    sum_columns,
    trim_all_strings,
)
from etl_pipeline_4handling_listings_spark.functions.text import (  # noqa: F401
    char_shingles,
    detect_language,
    document_fingerprint,
    quality_score,
    token_count,
    word_shingles,
)
