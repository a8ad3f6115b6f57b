from bow_hunter_pipeline_spark.io.readers import (  # noqa: F401
    read_binary_files,
    read_parquet_glob,
    read_table,
)
from bow_hunter_pipeline_spark.io.writers import write_partitioned_parquet  # noqa: F401
from bow_hunter_pipeline_spark.io.incremental import pending_work  # noqa: F401
