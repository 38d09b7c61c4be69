"""listings-spark: a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference ETL system (an incremental MLS-listings
curation pipeline): declarative validation, broadcast dimension joins,
window-based latest-record dedup, SCD2-style change history, MERGE
upsert stores, priority top-k, batched external enrichment — plus the
large-scale training-data operators a 100 TB pipeline needs:
exact/approximate deduplication (MinHash-LSH, SimHash, n-gram
Jaccard), similarity search over embeddings, text analysis, and
multimodal binary-column plumbing.

Everything is expressed against the Spark DataFrame API so Catalyst
owns optimization (pushdown, pruning, join selection, AQE); Python
touches data only through Arrow-batched ``mapInPandas`` where the
built-in operators genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from etl_pipeline_4handling_listings_spark.session import get_spark  # noqa: F401
