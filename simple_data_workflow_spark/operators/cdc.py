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


def scd2_build(
    changes: DataFrame,
    key: str,
    ts_col: str,
    tie_break: str | None = None,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Build a FULL type-2 slowly-changing-dimension history from a raw
    change log (every change event, not just the latest batch —
    ``scd2_apply`` is the per-batch sibling).

    Each key's changes become consecutive versions:
    ``valid_from = change ts``, ``valid_to = next change's ts`` (NULL on
    the open row), ``is_current`` on the last version. Multiple changes
    of one key at the same timestamp collapse to the one with the
    largest ``tie_break`` value (deterministic; required when the log
    has same-instant writes).

    Shape: ONE shuffle on ``key`` serves both the same-instant dedupe
    and the interval chaining. The dedupe is a lag-compare over the
    (key)-partitioned window sorted (ts, tie_break desc) — the first
    row of each instant is the winner — rather than a row_number over
    (key, ts), which would hash-partition on (key, ts) and force a
    SECOND exchange for the ``lead``. The chain window's required sort
    (key, ts) is a prefix of the dedupe's (key, ts, tie desc), so
    Catalyst inserts no re-sort either: one exchange + one sort + two
    window passes total. No join, no global sort; at 100 TB the cost is
    one exchange of the change log, the floor for any interval
    chaining.
    """
    attr_cols = [c for c in changes.columns if c not in (key, ts_col, tie_break)]
    if tie_break is not None:
        w_all = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.desc(tie_break))
        prev_ts = F.lag(ts_col).over(w_all)
        changes = (
            changes.withColumn(
                "__first", prev_ts.isNull() | (prev_ts != F.col(ts_col))
            )
            .where(F.col("__first"))
            .drop("__first", tie_break)
        )
    w_chain = Window.partitionBy(key).orderBy(ts_col)
    nxt = F.lead(ts_col).over(w_chain)
    return changes.select(
        F.col(key),
        F.col(ts_col).alias(start_col),
        nxt.alias(end_col),
        nxt.isNull().alias(current_flag),
        *[F.col(c) for c in attr_cols],
    )


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension version
    whose validity interval contains the fact's timestamp
    (``start <= ts < end``, open row = NULL end). The lakehouse "join
    facts to SCD2 dim AS OF event time" primitive.

    Shape: an equi-join on ``key`` with the interval predicate as a
    residual join condition — Catalyst plans the join on the equality
    (broadcast or shuffle-hash/SMJ per AQE) and evaluates the range
    residual inside the join, so there is no nested-loop blowup. SCD2
    intervals of one key are disjoint by construction, so at most one
    dim version matches per fact row (no fanout). At 100 TB: facts
    shuffle on ``key`` once (or not at all if the dim broadcasts);
    versions-per-key is the only multiplier and it is bounded by change
    frequency, not data size.
    """
    f, d = facts.alias("__fact"), dim.alias("__dim")
    fk, dk = F.col(f"__fact.{key}"), F.col(f"__dim.{key}")
    fts = F.col(f"__fact.{ts_col}")
    start, end = F.col(f"__dim.{start_col}"), F.col(f"__dim.{end_col}")
    # explicit aliases: facts and dim often share lineage (dim built from
    # the same source), which would otherwise trip ambiguous-self-join
    cond = (fk == dk) & (fts >= start) & (end.isNull() | (fts < end))
    return f.join(d, cond, how).drop(dk)


def incremental_agg_apply(
    state: DataFrame,
    cdc: DataFrame,
    group_cols: list[str],
    sum_col: str = "sum_val",
    cnt_col: str = "n_rows",
    op_col: str = "op",
    old_col: str = "old_val",
    new_col: str = "new_val",
) -> DataFrame:
    """Maintain a grouped SUM/COUNT materialization from a CDC batch
    without recomputing from base data — the incremental-view-
    maintenance primitive for 100 TB fact tables where a full re-agg
    per refresh is the thing you cannot afford.

    ``state`` holds one row per group: ``group_cols + [sum_col,
    cnt_col]``. ``cdc`` rows carry ``op`` ('I' insert / 'U' update /
    'D' delete), the group columns, and ``old_val``/``new_val`` (U
    needs both; I reads ``new_val``; D reads ``old_val``). A row whose
    update MOVES it between groups must be emitted as D(old group) +
    I(new group) — an in-place 'U' assumes the group key is unchanged.

    Per group: ``Δsum = Σ(I: new, U: new-old, D: -old)``,
    ``Δcount = Σ(I: +1, D: -1)``. The merge is a full-outer join of
    state with the (tiny) delta aggregate; groups whose count reaches 0
    disappear. Only TOUCHED groups appear on the delta side — shuffle
    volume is O(|cdc|), not O(|state|), and if the state table is
    stored bucketed on the group key the state side needs no shuffle at
    all. Exactness: pass sums as scaled-integer DECIMALs (see
    ``plans.relational.dsum``) and the incremental result is bit-equal
    to a recompute, which is exactly the invariant the oracle query
    checks.
    """
    is_i = F.col(op_col) == "I"
    is_u = F.col(op_col) == "U"
    is_d = F.col(op_col) == "D"
    deltas = cdc.groupBy(*group_cols).agg(
        F.sum(
            F.when(is_i, F.col(new_col))
            .when(is_u, F.col(new_col) - F.col(old_col))
            .when(is_d, -F.col(old_col))
        ).alias("__d_sum"),
        F.sum(
            F.when(is_i, F.lit(1)).when(is_d, F.lit(-1)).otherwise(F.lit(0))
        ).alias("__d_cnt"),
    )
    zero_sum = F.lit(0).cast(state.schema[sum_col].dataType)
    merged = state.join(deltas, on=group_cols, how="full_outer").select(
        *group_cols,
        (
            F.coalesce(F.col(sum_col), zero_sum)
            + F.coalesce(F.col("__d_sum"), zero_sum)
        ).alias(sum_col),
        (
            F.coalesce(F.col(cnt_col), F.lit(0)) + F.coalesce(F.col("__d_cnt"), F.lit(0))
        ).alias(cnt_col),
    )
    return merged.where(F.col(cnt_col) > 0)


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE semantics: rows of ``updates`` win on key collision, unmatched
    target rows survive. If ``updates`` carries duplicate keys, the last
    one by the other columns' sort order wins (deterministic).

    Shape: dedupe updates (window on key) → target anti-join updates →
    union. One shuffle on the key for each leg.
    """
    others = [c for c in updates.columns if c != key]
    if others:
        w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in others])
        latest = (
            updates.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        # key-only batch: duplicates are identical rows, so a distinct
        # is the dedupe (a row_number over an order-less window would
        # fail analysis)
        latest = updates.distinct()
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
