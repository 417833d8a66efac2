"""Table-maintenance operators: MERGE-style upsert and SCD2 history.

No Delta/Iceberg jars in this environment (sources.lakehouse gates the
real MERGE INTO), so these are the engine-level emulations the guide's
CDC pattern describes: anti-join + union for upsert; interval-close +
append for slowly-changing-dimension type 2. Both are single-shuffle
plans on the merge key and write-format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE semantics: rows of ``updates`` win on key collision, unmatched
    target rows survive. If ``updates`` carries duplicate keys, the last
    one by the other columns' sort order wins (deterministic).

    Shape: dedupe updates (window on key) → target anti-join updates →
    union. One shuffle on the key for each leg.
    """
    others = [c for c in updates.columns if c != key]
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in others])
    latest = (
        updates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    untouched = target.join(latest, on=key, how="left_anti")
    return untouched.unionByName(latest)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str,
    end_col: str = "valid_to",
    start_col: str = "valid_from",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the current interval of a
    changed key and append the new version.

    ``dim`` rows carry (start_col, end_col, current_flag); ``changes``
    carries (key, ts_col, attributes). A changed key's open row gets
    ``end_col = change ts`` and ``is_current = false``; the change row
    becomes the new open version (end = NULL, is_current = true).
    Unchanged keys and already-closed history pass through untouched.
    """
    attr_cols = [c for c in changes.columns if c not in (key, ts_col)]
    ch = changes.select(
        F.col(key),
        F.col(ts_col).alias("__change_ts"),
        *[F.col(c) for c in attr_cols],
    )
    # close open rows for changed keys
    open_rows = dim.where(F.col(current_flag))
    closed_history = dim.where(~F.col(current_flag))
    key_changes = ch.select(key, "__change_ts").groupBy(key).agg(
        F.max("__change_ts").alias("__change_ts")
    )
    newly_closed = (
        # no forced broadcast: a change batch is unbounded in principle;
        # AQE broadcasts key_changes when it is actually small
        open_rows.join(key_changes, on=key, how="inner")
        .withColumn(end_col, F.col("__change_ts"))
        .withColumn(current_flag, F.lit(False))
        .drop("__change_ts")
    )
    untouched_open = open_rows.join(key_changes, on=key, how="left_anti")
    # new open versions from the latest change per key
    w = Window.partitionBy(key).orderBy(F.desc("__change_ts"))
    new_versions = (
        ch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col(key),
            F.col("__change_ts").alias(start_col),
            F.lit(None).cast(dim.schema[end_col].dataType).alias(end_col),
            F.lit(True).alias(current_flag),
            *[F.col(c) for c in attr_cols],
        )
    )
    cols = dim.columns
    return (
        closed_history.select(*cols)
        .unionByName(newly_closed.select(*cols))
        .unionByName(untouched_open.select(*cols))
        .unionByName(new_versions.select(*cols))
    )
