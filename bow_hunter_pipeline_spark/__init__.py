"""bow_hunter_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference repo ``MattPerreault/bow-hunter-pipeline`` (pandas + AWS
Textract + DuckDB ETL for hunting statistics), re-expressed Spark-first:
DataFrame/SQL plans optimized by Catalyst, partitioned Parquet I/O,
distributed joins/aggregations, plus the large-scale training-data
operators (dedup, similarity search, text analysis, streaming) required
at 100 TB scale.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, shuffle sizing)
- ``schema``     canonical StructTypes (warehouse DDL analogs)
- ``io``         readers (parquet glob, binaryFile), writers
  (partitioned parquet), incremental work-list (anti-join)
- ``functions``  scalar helpers: numeric parsing, header sanitize,
  text shingling/hashing
- ``operators``  normalize (dialect→canonical), explode gate, upsert
  (MERGE semantics), uniqueness check, schema-drift audit
- ``plans``      analytics (success rates, joins, rankings, trends),
  dedup (exact/MinHash/SimHash/Jaccard), similarity search, text
  analysis, event-time windows
- ``sources``    PDF table-extraction source adapter (mapInPandas)
- ``streaming``  Structured Streaming analogs of the batch plans
"""

__version__ = "0.1.0"
