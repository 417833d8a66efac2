"""SparkSession bootstrap tuned for local[N] testing and cluster-scale defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf that is safe to apply to an already-running session (runtime-settable).
RUNTIME_CONF = {
    # DuckDB-oracle parity: duckdb timestamps are UTC-naive.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any toPandas()/pandas_udf boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # INT96 (the legacy default) carries NO footer statistics, which
    # would blind the commit-time footer-stats harvest (tablelog) and
    # Delta's add-action stats on timestamp columns; int64 micros is
    # also what the Iceberg spec requires of parquet data files.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # the tablelog batch reader (Python Data Source API) prunes its
    # file list from pushed filters; without this flag Spark refuses
    # to plan a reader that implements pushFilters at all
    "spark.sql.python.filterPushdown.enabled": "true",
    # right-size externally-created sessions (e.g. the driver's) for the
    # local testdata: ~core-count shuffle partitions (AQE coalesces
    # further) and small scan splits for the single-file tables
    "spark.sql.shuffle.partitions": os.environ.get("SDW_SHUFFLE_PARTITIONS", "32"),
    "spark.sql.files.maxPartitionBytes": os.environ.get(
        "SDW_MAX_PARTITION_BYTES", "2097152"
    ),
}


def ensure_parallelism(df, min_partitions: int | None = None):
    """Round-robin repartition an under-partitioned input ahead of
    compute-heavy per-row work (regex batteries, minhash signatures,
    pairwise vector math).

    A 1-row-group parquet file cannot be split by the reader, so a small
    dimension table otherwise pins an expensive op to ONE core. The
    shuffle this adds is proportional to the (small) input, the win is
    N-way parallel compute. No-op when the input is already parallel —
    at cluster scale inputs arrive in many splits and this does nothing.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def driver_memory_bytes(spark: SparkSession) -> int:
    """``spark.driver.memory`` as bytes (the budget that bounds every
    capped driver-side transfer); 1 GiB when unset/unparseable — the
    JVM default, i.e. the conservative regime."""
    raw = ""
    try:
        raw = (spark.conf.get("spark.driver.memory", "") or "").strip().lower()
    except Exception:
        pass
    m = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    try:
        if raw and raw[-1] in m:
            return int(float(raw[:-1]) * m[raw[-1]])
        if raw:
            return int(raw)
    except ValueError:
        pass
    return 1024**3


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf to an existing session (e.g. the driver's)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this deployment — keep going
    # the driver's numpy work is many SMALL seeded fits (PQ codebooks,
    # coarse quantizers) where a core-count OpenBLAS pool is 4-20x
    # slower than one thread and wildly variable (see blasctl) — pin
    # it; results are bit-identical, env-overridable for deployments
    # whose driver hosts large solo solves
    from simple_data_workflow_spark import blasctl

    try:
        n_blas = int(os.environ.get("SDW_DRIVER_BLAS_THREADS", "1"))
    except ValueError:
        n_blas = 1  # malformed env var degrades to the pinned default
    blasctl.set_threads(n_blas)
    return spark


def get_spark(
    app_name: str = "simple-data-workflow-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Local default: ``local[$SPARK_GRAFT_CPUS]`` with shuffle partitions ==
    cores (the 200 default over-parallelizes small local data). On a real
    cluster callers pass their own master/conf; AQE coalescing handles the
    rest at scale.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or int(os.environ.get("SDW_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("SDW_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # local testdata is single small parquet files; small splits keep
        # all cores busy. On a real cluster leave the 128 MB default
        # (override via env) — tiny splits there just multiply task overhead.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SDW_MAX_PARTITION_BYTES", "2097152"),
        )
        .config("spark.sql.files.openCostInBytes", "131072")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
