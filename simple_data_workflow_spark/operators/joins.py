"""Join operators Spark lacks natively: as-of join, range-bucket join.

The as-of join (each left row matched to the most recent right row with
``right_ts ≤ left_ts`` per key) is built with the union+window technique:
tag both sides, union on (key, ts), and carry the latest right payload
forward with a running ``last_value(ignorenulls)`` window. ONE shuffle on
the key, per-key ordered scan — linear and skew-tolerant, unlike the
naive range join (quadratic per key) or a per-key ``pd.merge_asof``
(Python in the hot path). Reference has no joins at all (SURVEY.md §2.2);
this is the engine-extension operator used by e.g. event↔dimension
enrichment at stream scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _epoch_seconds(col: F.Column, dtype_name: str) -> F.Column:
    """Temporal → epoch-seconds double for tolerance arithmetic.

    DATE and TIMESTAMP_NTZ cannot cast to numeric directly — hop via
    TIMESTAMP (session TZ pinned UTC in ``session.py``, so the epoch is
    unambiguous). Plain TIMESTAMP and numeric ts columns cast straight
    through."""
    if dtype_name in ("date", "timestamp_ntz"):
        col = col.cast("timestamp")
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    right_tiebreak: str | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For each left row: columns of the matched right row for the same
    ``on`` key (NULLs when none exists). ``direction="backward"`` (the
    default) matches the LATEST right row with ``right_ts <= left_ts``;
    ``"forward"`` matches the EARLIEST right row with ``right_ts >=
    left_ts`` — the two directions of ``pandas.merge_asof``, same
    union+window shape either way (forward just scans time descending).

    ``tolerance_s`` bounds the match distance: a matched row further
    than this from the left timestamp (seconds for TIMESTAMP columns,
    same unit as the column for numeric ones) is nulled out — e.g.
    "latest sensor fix, but only if it is fresher than 10 minutes".
    The bound is a projection on the carried match, not a join-shape
    change: still ONE shuffle, still linear.

    Ties on timestamp: right rows sort before left rows at the same
    instant (a fix at time t is visible to a query at time t, in both
    directions); among right rows at the same timestamp the highest
    ``right_tiebreak`` wins — pass one whenever (key, ts) is not unique
    on the right, or the winner is partition-order-dependent.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_payload = right_payload or [
        c for c in right.columns if c not in (on, right_ts, right_tiebreak)
    ]

    r_struct = F.struct(F.col(right_ts).alias(f"{right_ts}{suffix}"), *right_payload)
    lhs = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None)
        .cast(right.select(r_struct.alias("s")).schema["s"].dataType.simpleString())
        .alias("__r"),
    )
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        (F.col(right_tiebreak).cast("long") if right_tiebreak else F.lit(0).cast("long")).alias("__tb"),
        F.lit(None)
        .cast(left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType.simpleString())
        .alias("__l"),
        r_struct.alias("__r"),
    )
    unioned = lhs.unionByName(rhs)
    # right rows (__is_left=0) sort before left rows at equal ts; among
    # right rows the highest tiebreak sorts last, so last() picks it.
    # forward = the same scan over time DESCENDING (earliest future row
    # is the last right row seen walking backwards from +inf)
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("__is_left"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    if tolerance_s is not None:
        # The unioned __ts takes the union's common type (which stays NTZ
        # when both sides are NTZ, or DATE when both are DATE); the struct
        # field keeps the right side's original type. Normalize BOTH
        # through the shared DATE/NTZ→TIMESTAMP→double helper.
        mts = _epoch_seconds(
            F.col("__match").getField(f"{right_ts}{suffix}"),
            right.schema[right_ts].dataType.simpleString(),
        )
        lts = _epoch_seconds(
            F.col("__ts"), unioned.schema["__ts"].dataType.simpleString()
        )
        delta = (lts - mts) if direction == "backward" else (mts - lts)
        carried = carried.withColumn(
            "__match", F.when(delta <= F.lit(float(tolerance_s)), F.col("__match"))
        )
    out = carried.where(F.col("__is_left") == 1).select("__l.*", "__match.*")
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    chunk_seconds: int = 300,
) -> DataFrame:
    """Point-in-interval join: each left row matched to every right
    interval with ``right_start <= left_ts < right_end``.

    A naive range-predicate join has no equi key, so Spark falls back to
    BroadcastNestedLoopJoin — O(L·R) and a broadcast of a whole side.
    Instead both sides are bucketed onto a time grid: a point lands in
    exactly ONE chunk of ``chunk_seconds``; an interval is exploded to
    every chunk it overlaps (``sequence()`` — bounded by interval length
    / chunk size). The join becomes an equi-join on the chunk id with the
    exact range predicate as a post-filter. Shuffle volume ∝ rows ×
    overlap factor, never L·R; each (point, interval) pair meets at most
    once because the point side is never replicated — no dedup pass.

    Pick ``chunk_seconds`` ≈ the typical interval length: shorter chunks
    replicate intervals more; longer chunks put more non-matching pairs
    through the post-filter.
    """
    # exact integer microsecond arithmetic — unix_timestamp() truncates to
    # seconds and double division can be off-by-ulp at chunk boundaries,
    # either of which silently drops boundary matches. DIV truncates
    # toward zero == floor for the post-1970 timestamps this targets.
    chunk_us = chunk_seconds * 1_000_000
    point_chunk = F.expr(f"unix_micros(`{left_ts}`) DIV {chunk_us}")
    lo_chunk = F.expr(f"unix_micros(`{right_start}`) DIV {chunk_us}")
    # end is exclusive: the chunk of the last INCLUDED microsecond
    hi_chunk = F.expr(f"(unix_micros(`{right_end}`) - 1) DIV {chunk_us}")
    lhs = left.withColumn("__chunk", point_chunk)
    rhs = right.withColumn(
        "__chunk", F.explode(F.sequence(lo_chunk, F.greatest(hi_chunk, lo_chunk)))
    )
    out = lhs.join(rhs, "__chunk").where(
        (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) < F.col(right_end))
    )
    return out.drop("__chunk")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    chunk_seconds: int = 300,
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair whose half-open
    intervals ``[start, end)`` intersect — the two-sided sibling of
    ``interval_join`` (point-in-interval), same time-grid shape.

    Both sides explode to every chunk their interval touches, meet in an
    equi-join on the chunk id, and the exact predicate
    ``greatest(starts) < least(ends)`` (intersection non-empty — also
    correct for degenerate empty intervals, unlike the pairwise
    ``a_s < b_e AND b_s < a_e`` form) filters false chunk-neighbors.
    An overlapping pair shares EVERY chunk of its intersection, so pairs
    are assigned to one canonical chunk — the chunk containing
    ``greatest(left_start, right_start)``, i.e. the intersection's first
    microsecond, which both sides' chunk ranges provably contain — and
    kept only there: no duplicate pairs, no dedup pass, no distinct.

    Shuffle volume ∝ rows × (interval length / chunk_seconds); pick
    ``chunk_seconds`` near the typical interval length. Column names
    must be disjoint across the two inputs (as with any self-describing
    join output).
    """
    chunk_us = chunk_seconds * 1_000_000

    def lo(c: str):
        return F.expr(f"unix_micros(`{c}`) DIV {chunk_us}")

    def hi(c: str):
        # end is exclusive: the chunk of the last INCLUDED microsecond
        return F.expr(f"(unix_micros(`{c}`) - 1) DIV {chunk_us}")

    lhs = left.withColumn(
        "__chunk",
        F.explode(F.sequence(lo(left_start), F.greatest(hi(left_end), lo(left_start)))),
    )
    rhs = right.withColumn(
        "__chunk",
        F.explode(
            F.sequence(lo(right_start), F.greatest(hi(right_end), lo(right_start)))
        ),
    )
    inter_start = F.greatest(F.col(left_start), F.col(right_start))
    overlap = inter_start < F.least(F.col(left_end), F.col(right_end))
    canonical = F.expr(
        f"unix_micros(greatest(`{left_start}`, `{right_start}`)) DIV {chunk_us}"
    )
    out = (
        lhs.join(rhs, "__chunk")
        .where(overlap & (F.col("__chunk") == canonical))
    )
    return out.drop("__chunk")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-tolerant equi-join: spread each hot left key over ``n_salts``
    shuffle partitions, replicate the (smaller) right side once per salt.

    Use when one key dominates (AQE's skew-join handles moderate skew at
    runtime; salting is the explicit fix when a single key exceeds what
    one task can hold). Left salt is derived from deterministic row
    content hashing — no rand(), so retries/recomputes stay consistent.
    """
    salt_l = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lhs = left.withColumn("__salt", salt_l)
    rhs = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    out = lhs.join(rhs, [key, "__salt"], how)
    return out.drop("__salt")
