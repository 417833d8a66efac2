"""Incremental materialized aggregate views over transaction-log
tables — the cursor-driven batch sibling of
``streaming/sinks.streaming_materialized_agg``.

``refresh_aggregate_view`` maintains
``SELECT group_cols, COUNT(*), SUM/MIN/MAX(...) FROM src GROUP BY ...``
as its own tablelog table, reading ONLY the source commits since the
last refresh (``table_changes``) and folding the partial aggregate
into the stored state. The properties that make this the lakehouse
incremental-ETL pattern:

- **Cost ∝ new data.** A refresh touches the change-feed files and the
  view (aggregate-sized), never the source table. The proof is in the
  test: after a refresh the already-consumed source data files can be
  physically deleted and the next refresh still succeeds.
- **Exactly-once increments.** The source cursor (``src_version``)
  rides INSIDE the same atomic log entry as the refreshed data, so a
  crash anywhere leaves either (old view, old cursor) or (new view,
  new cursor) — a re-run is always safe, double-counting is
  impossible. This is the transactional-consistency trick the real
  formats' ``txn`` actions enable.
- **Decomposable aggregates only** (count/sum/min/max — avg = sum/cnt
  downstream): the view consumes APPEND commits; ``table_changes``
  raises on DML rewrites rather than silently double-counting, which
  is exactly the failure mode non-decomposable maintenance hits.
- **Conflict-safe**: the refresh commits against its base version;
  concurrent refreshes serialize or raise, never silently lose one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_data_workflow_spark.sources.tablelog import (
    _collect_stats,
    _commit_entry,
    _list_log,
    _read_json,
    _resolve_state,
    _stage_data_files,
    table_changes,
    table_read,
)


def _view_cursor(spark: SparkSession, view_path: str) -> int:
    """The source version the view last folded in — the NEWEST log
    entry carrying ``src_version``. Scanned newest-first (bounded by
    retained history) so that maintenance commits on the view itself
    (``table_compact``, ``table_restore``) don't mask the cursor —
    reading only the latest entry would reset it to -1 after a
    compaction and the next refresh would silently double-count the
    whole source."""
    entries, _ = _list_log(spark, view_path)
    for v in reversed(entries):
        sv = _read_json(spark, view_path, f"{v:08d}.json").get("src_version")
        if sv is not None:
            return int(sv)
    return -1


def refresh_aggregate_view(
    spark: SparkSession,
    src_path: str,
    view_path: str,
    group_cols: list[str],
    sum_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
) -> int:
    """Fold the source commits since the last refresh into the view;
    returns the view's new version (or its current one when the source
    has not advanced). View schema:
    ``group_cols..., cnt, sum_<c>..., min_<c>..., max_<c>...``."""

    def partial_aggs():
        return [
            F.sum("cnt").alias("cnt"),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
            *[F.min(f"min_{c}").alias(f"min_{c}") for c in min_cols],
            *[F.max(f"max_{c}").alias(f"max_{c}") for c in max_cols],
        ]

    try:
        state = _resolve_state(spark, view_path, None)
        base: int | None = state["version"]
        cursor = _view_cursor(spark, view_path)
        current: DataFrame | None = table_read(spark, view_path)
    except FileNotFoundError:
        # base -1 ⇒ the creation commit must win slot 0: two concurrent
        # first refreshes conflict instead of both committing
        base, cursor, current = -1, -1, None
    src_latest = _resolve_state(spark, src_path, None)["version"]
    if src_latest <= cursor:
        return base  # nothing new
    changes = table_changes(
        spark, src_path, start_version=cursor, end_version=src_latest
    ).drop("_commit_version")
    partial = changes.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("cnt"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        *[F.min(c).alias(f"min_{c}") for c in min_cols],
        *[F.max(c).alias(f"max_{c}") for c in max_cols],
    )
    merged = (
        partial
        if current is None
        else current.unionByName(partial).groupBy(*group_cols).agg(*partial_aggs())
    )
    files = _stage_data_files(merged, view_path)
    entry = {
        "action": "overwrite",
        "files": files,
        "stats": _collect_stats(spark, view_path, files),
        "schema": merged.schema.simpleString(),
        "base": base,
        "op": "refresh",
        "src_version": src_latest,
    }
    return _commit_entry(spark, view_path, entry, base=base)
