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
  (MERGE semantics), uniqueness check, schema-drift audit, scale
  paths (salted skew join, bucketed co-located join)
- ``plans``      analytics (success rates, joins, rankings, trends),
  relational completion (rollup/cube, set ops, semi/anti/as-of/range
  joins), dedup (exact/MinHash/SimHash/Jaccard/embedding), similarity
  search, text analysis, event-time windows, sketch aggregation,
  multimodal binary pipelines, normalize composite
- ``sources``    PDF table-extraction source adapter (mapInPandas)
- ``streaming``  Structured Streaming: windowed aggs under watermarks,
  stateful sessionization (applyInPandasWithState)
- ``warehouse``  stage→production build (DDL, full refresh, explode,
  merge with PK post-condition)
"""

__version__ = "0.1.0"
