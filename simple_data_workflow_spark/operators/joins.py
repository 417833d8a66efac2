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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    right_tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right[right_ts] <= left[left_ts]`` for the same ``on`` key (NULLs
    when no prior right row exists).

    Ties on timestamp: right rows sort before left rows at the same
    instant (a fix at time t is visible to a query at time t); among
    right rows at the same timestamp the highest ``right_tiebreak``
    wins — pass one whenever (key, ts) is not unique on the right, or
    the winner is partition-order-dependent.
    """
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
    # right rows the highest tiebreak sorts last, so last() picks it
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__is_left"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = carried.where(F.col("__is_left") == 1).select("__l.*", "__match.*")
    return out


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
