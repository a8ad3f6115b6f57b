from bow_hunter_pipeline_spark.operators.normalize import (  # noqa: F401
    add_metadata,
    drop_footer_rows,
    ensure_columns,
    normalize_headers,
    rename_dialect,
)
from bow_hunter_pipeline_spark.operators.explode import gate_split_explode  # noqa: F401
from bow_hunter_pipeline_spark.operators.upsert import (  # noqa: F401
    assert_unique_keys,
    duplicate_keys,
    upsert,
)
from bow_hunter_pipeline_spark.operators.drift import audit_missing_columns  # noqa: F401
