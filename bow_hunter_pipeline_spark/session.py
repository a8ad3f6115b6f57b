"""SparkSession factory.

Replaces the reference's per-process clients (boto3 S3/Textract clients
created in each ETL driver, DuckDB connections opened per script run —
``/root/reference/src/db/load_duckdb_data.py:8-20`` configures S3 creds
via ``SET s3_*`` pragmas) with one configured SparkSession: S3A
credentials belong in ``spark.hadoop.fs.s3a.*``, Arrow is enabled for
pandas interchange, and AQE handles runtime re-planning.

Scale notes (100 TB posture)
----------------------------
- AQE on: runtime partition coalescing + skew-join splitting means the
  static ``spark.sql.shuffle.partitions`` only needs to be an upper
  bound; at cluster scale set it ~2-3x total cores.
- ``maxPartitionBytes`` 128m keeps scan partitions memory-friendly; at
  100 TB that is ~800k tasks for a full scan, which is fine — tasks are
  cheap, OOMs are not.
- Broadcast threshold stays at default 10m; dimension tables (region,
  nation, supplier — and the reference's population table, O(10^3) rows
  per SURVEY §6) are far below it and get broadcast automatically; we
  still hint explicitly at join sites.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "bow-hunter-pipeline-spark"


def default_parallelism() -> int:
    """CPU budget: honor the driver's SPARK_GRAFT_CPUS, else all cores."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return os.cpu_count() or 8


def default_driver_memory() -> str:
    """Size the local JVM to the machine instead of Spark's 1g default
    (optimization guide §5/§9). In ``local[*]`` mode the driver heap IS
    the executor heap: every shuffle buffer, broadcast, checkpointed
    block and cached relation of a multi-query session shares that one
    1 GB unless raised, and a long bench session spends its tail in GC
    — measured r14: the identical 28-query bench read 65.6 s under the
    1g default and 49.0 s at 8g, a uniform ~25% GC tax on every query.
    Default: RAM/16 clamped to [2g, 8g] (1/16 leaves plenty for Python
    workers and the OS at any machine size); ``SPARK_GRAFT_DRIVER_MEM``
    overrides. On a real cluster spark-submit's --driver-memory /
    --executor-memory take precedence as usual — this default only
    matters where nothing was configured, exactly where the 1g default
    was the silent bottleneck."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo") as fh:
            kb = int(
                next(
                    line for line in fh if line.startswith("MemTotal")
                ).split()[1]
            )
    except (OSError, StopIteration, ValueError, IndexError):
        return "2g"
    gb = max(2, min(8, kb // (16 * 1024 * 1024)))
    return f"{gb}g"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Local mode uses ``local[$SPARK_GRAFT_CPUS]``; on a real cluster pass
    ``master=None`` with external conf and everything here still applies.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # One-JVM heap sized to the machine (guide §5/§9; see
        # default_driver_memory). Applies at JVM launch — a no-op for
        # sessions attached to an already-running JVM or configured
        # explicitly via spark-submit.
        .config("spark.driver.memory", default_driver_memory())
        # Runtime re-planning: partition coalescing, skew-join handling.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for any pandas interchange (pandas UDFs, toPandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Shuffle sizing: bounded above; AQE coalesces down at runtime.
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or max(cpus, 8)),
        )
        # Scan partition sizing for the 100 TB posture (see module doc).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Deterministic wall-clock semantics for timestamp arithmetic.
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS); read as nanos longs
        # (io.readers.read_events derives the usable columns).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Quieter local runs; harmless on a cluster.
        .config("spark.ui.showConsoleProgress", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def configure_s3a(
    spark: SparkSession,
    *,
    region: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,
    path_style: bool = False,
) -> SparkSession:
    """S3 access conf — the analog of the reference's DuckDB ``SET s3_*``
    pragmas (``/root/reference/src/db/load_duckdb_data.py:8-20``).

    Spark-first: credentials are session/Hadoop configuration, not
    per-statement pragmas; every reader/writer then just uses
    ``s3a://`` paths.
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    if region:
        hconf.set("fs.s3a.endpoint.region", region)
    if access_key:
        hconf.set("fs.s3a.access.key", access_key)
    if secret_key:
        hconf.set("fs.s3a.secret.key", secret_key)
    if endpoint:
        hconf.set("fs.s3a.endpoint", endpoint)
    if path_style:
        hconf.set("fs.s3a.path.style.access", "true")
    return spark
