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
- **Decomposable aggregates** (count/sum/min/max — avg = sum/cnt
  downstream). Append-only sources fold the cheap add-only way; a
  pending range containing DML commits (round 8) switches to the
  row-level change feed (``table_changes_rowlevel``) and folds delete
  preimages with NEGATIVE sign — exact for the invertible aggregates
  (count/sum), cost still ∝ the changes. min/max are not invertible
  under deletes (the deleted row may have held the extremum), so
  groups touched by a delete are PARTIALLY RECOMPUTED from the source
  behind a broadcast semi-join on the affected group keys — cost ∝
  the affected groups' source data, never the table (the standard
  delta + partial-recompute maintenance for non-invertible
  aggregates; untouched groups still fold incrementally).
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
    _read_files,
    _read_json,
    _resolve_state,
    _stage_data_files,
    table_changes,
    table_changes_rowlevel,
    table_read,
)


class ViewCursorLost(RuntimeError):
    """The view holds aggregate state but no retained log entry or
    checkpoint carries its source cursor — refreshing would re-fold
    the ENTIRE source into state that already contains it (silent
    double counting). Recoverable by rebuilding the view from scratch
    (drop + full refresh); the error exists so that recovery is an
    explicit choice, never an accident."""


def _view_cursor(spark: SparkSession, state: dict) -> int:
    """The source version the view last folded in, resolved by the
    same log replay as the snapshot itself (``src_version`` propagates
    newest-writer-wins through entries AND checkpoints, so compaction,
    restore, and history truncation never mask it). A view with rows
    but no cursor anywhere is corrupt-by-maintenance — raise rather
    than return -1, because -1 means "never refreshed" and the next
    refresh would double-count the whole source."""
    sv = state.get("src_version")
    if sv is None:
        if state["files"]:
            raise ViewCursorLost(
                "materialized view has aggregate state but no src_version "
                "in any retained log entry or checkpoint — refusing to "
                "refresh (it would double-count the source); rebuild the "
                "view from scratch"
            )
        return -1
    return int(sv)


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
        cursor = _view_cursor(spark, state)
        current: DataFrame | None = (
            _read_files(spark, view_path, state["files"], state["schema"])
            if state["files"]
            else None
        )
    except FileNotFoundError:
        # base -1 ⇒ the creation commit must win slot 0: two concurrent
        # first refreshes conflict instead of both committing
        base, cursor, current = -1, -1, None
    src_latest = _resolve_state(spark, src_path, None)["version"]
    if src_latest <= cursor:
        return base  # nothing new
    def full_aggs():
        return [
            F.count(F.lit(1)).alias("cnt"),
            *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
            *[F.min(c).alias(f"min_{c}") for c in min_cols],
            *[F.max(c).alias(f"max_{c}") for c in max_cols],
        ]

    # metadata-only peek at the pending commits: all-append sources
    # take the cheap add-only fold; DML commits (delta/restore) switch
    # to the row-level change feed. count/sum fold SIGNED (delete
    # preimages with negative sign — exact, cost ∝ changes). min/max
    # are not invertible under deletes (the deleted row may have held
    # the extremum), so groups touched by a delete are PARTIALLY
    # RECOMPUTED from the source, bounded by a semi-join on the
    # affected group keys — cost ∝ the affected groups' source data,
    # never the table (the standard delta + partial-recompute
    # maintenance for non-invertible aggregates).
    entries, _ = _list_log(spark, src_path)
    pending = [v for v in entries if cursor < v <= src_latest]

    def _pure_add(v: int) -> bool:
        e = _read_json(spark, src_path, f"{v:08d}.json")
        # compaction (full or bin-pack) rewrites bytes, not rows — it
        # contributes zero changes and must not force the DML path
        return e["action"] == "append" or e.get("op") in (
            "compact",
            "compact_small",
        )

    all_appends = all(_pure_add(v) for v in pending)
    recomputed: DataFrame | None = None
    if all_appends:
        changes = table_changes(
            spark, src_path, start_version=cursor, end_version=src_latest
        ).drop("_commit_version")
        partial = changes.groupBy(*group_cols).agg(*full_aggs())
    else:
        changes = table_changes_rowlevel(
            spark, src_path, start_version=cursor, end_version=src_latest
        )
        if min_cols or max_cols:
            # groups with any delete preimage need a re-scan for their
            # extrema; the rest of the feed is inserts-only for them
            # and folds the cheap append way
            # alias-isolated: `affected` derives from `changes`, so the
            # anti-join below is a self-join — unqualified column refs
            # would be ambiguous
            affected = (
                changes.where(F.col("_change_type") == "delete")
                .select(*group_cols)
                .distinct()
                .alias("aff")
            )

            def minus_affected(df: DataFrame, how: str) -> DataFrame:
                lhs = df.alias("lhs")
                cond = None
                for c in group_cols:
                    eq = F.col(f"lhs.{c}").eqNullSafe(F.col(f"aff.{c}"))
                    cond = eq if cond is None else (cond & eq)
                return lhs.join(F.broadcast(affected), on=cond, how=how)

            partial = (
                minus_affected(
                    changes.where(F.col("_change_type") == "insert"),
                    "left_anti",
                )
                .groupBy(*group_cols)
                .agg(*full_aggs())
            )
            recomputed = (
                minus_affected(table_read(spark, src_path, src_latest), "left_semi")
                .groupBy(*group_cols)
                .agg(*full_aggs())
            )
            if current is not None:
                current = minus_affected(current, "left_anti")
        else:
            sign = F.when(
                F.col("_change_type") == "delete", F.lit(-1)
            ).otherwise(F.lit(1))
            neg = F.col("_change_type") == "delete"
            partial = (
                changes.withColumn("_sign", sign)
                .groupBy(*group_cols)
                .agg(
                    F.sum("_sign").alias("cnt"),
                    # negate-then-sum (not sign*value) keeps each
                    # column's exact type — decimal×int would widen
                    # precision and drift the view's schema between
                    # refreshes
                    *[
                        F.sum(
                            F.when(neg, -F.col(c)).otherwise(F.col(c))
                        ).alias(f"sum_{c}")
                        for c in sum_cols
                    ],
                )
            )
    merged = (
        partial
        if current is None
        else current.unionByName(partial).groupBy(*group_cols).agg(*partial_aggs())
    )
    if not all_appends and recomputed is None:
        # a group whose rows were all deleted folds to cnt 0 — it must
        # vanish, as it would in the full recompute
        merged = merged.where(F.col("cnt") != 0)
    if recomputed is not None:
        # affected groups were stripped from `current` above and their
        # inserts excluded from `partial`: the recompute REPLACES them
        # (fully-deleted groups simply have no source rows and vanish)
        merged = merged.unionByName(recomputed)
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
