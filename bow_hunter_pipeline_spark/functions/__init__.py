from bow_hunter_pipeline_spark.functions.parsing import (  # noqa: F401
    parse_double,
    parse_long,
    parse_unit,
    sanitize_header,
    year_from_path,
)
from bow_hunter_pipeline_spark.functions.text import (  # noqa: F401
    hash64,
    minhash_signature,
    tokens,
    word_shingles,
)
