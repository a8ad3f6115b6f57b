"""Incremental work-list — A7 existence probe / E5 incremental skip.

The reference asks S3 ``head_object`` once per raw file to skip
already-processed inputs (``ingest_harvest_data.py:42-64``, batch loop
``:349-379``). Distributed analog: list both sides once, left-anti join.
O(files) with two listings instead of O(files) sequential HEAD calls —
at 100 TB / millions of objects the anti-join is a single tiny shuffle
(or broadcast when the processed side fits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pending_work(
    raw: DataFrame,
    processed: DataFrame,
    key_cols: list[str],
    *,
    broadcast_processed: bool = True,
) -> DataFrame:
    """Rows of ``raw`` with no twin in ``processed`` (by ``key_cols``).

    ``broadcast_processed`` is right while the processed-key set is
    dimension-sized (the common case: keys only, heavily compressed);
    disable it to fall back to a shuffled anti-join when the key set
    itself is huge. The streaming file source (streaming.pipeline)
    subsumes this with checkpointed exactly-once tracking; this is the
    batch form.
    """
    keys = processed.select(*key_cols).distinct()
    if broadcast_processed:
        keys = F.broadcast(keys)
    return raw.join(keys, on=key_cols, how="left_anti")
