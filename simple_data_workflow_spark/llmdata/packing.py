"""Training-batch assembly ops: sequence packing and group-aware splits.

Beyond the reference surface (SURVEY.md §2.3): the last mile of an LLM
data pipeline — after filtering/dedup, documents are packed into fixed
token-budget context windows and partitioned into leakage-free splits.

Scale shapes:

- ``pack_sequences`` needs a GLOBAL running token total. A plain
  ``Window.orderBy`` with no partition key serializes the whole table
  onto one task, so the prefix sum is computed distributedly instead:
  range-shard on the order key (exact min/max from one tiny agg),
  per-shard cumulative sums under a shard-partitioned window, per-shard
  totals (``n_shards`` rows) prefix-summed on the driver and re-injected
  as a literal map. Two shuffles bounded by ``n_shards``, never a global
  sort.
- ``split_train_holdout`` is a pure stateless filter — a hash of the
  GROUP key alone decides the side, so every row of a group lands
  together (no near-dup leakage across the split) under any
  partitioning, with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simple_data_workflow_spark.llmdata.text import token_count
from simple_data_workflow_spark.session import ensure_parallelism


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    budget: int = 2048,
    n_shards: int = 32,
) -> DataFrame:
    """Concat-and-chunk packing: documents ordered by ``id_col`` form one
    continuous token stream cut into windows of ``budget`` tokens.

    Adds per-document placement columns:

    - ``n_tokens`` — the document's token count;
    - ``start_token`` — global offset of its first token in the stream;
    - ``bin_id`` — window index containing that first token;
    - ``n_bins`` — how many windows the document spans (a document
      straddling a cut contributes to several windows — standard
      concat-then-chunk pretraining layout).

    Deterministic for a given ``id_col`` ordering regardless of
    partitioning; integer-only arithmetic, so cross-engine exact.

    ``id_col`` must be a unique numeric column: range-sharding does
    integer arithmetic on it, and a duplicated id would make the
    per-shard running order nondeterministic AND fan rows out in the
    final placement join. The type is checked at plan-build time; the
    uniqueness check rides the shard-totals aggregate for free (dupes
    always share a shard, so per-shard distinct counts catch every one).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from pyspark.sql.types import NumericType

    id_field = df.schema[id_col]
    if not isinstance(id_field.dataType, NumericType):
        raise TypeError(
            f"pack_sequences id_col {id_col!r} must be numeric for range "
            f"sharding, got {id_field.dataType.simpleString()}"
        )
    toks = (
        F.col(token_col)
        if token_col
        else token_count(F.col(text_col))
    ).cast("long")
    # tokenization is the expensive scan and three downstream actions need
    # its result (min/max, shard totals, final placement) — so it runs
    # ONCE over a persisted NARROW (id, count) projection (~16 B/row, not
    # the full document width), and placements join back to the original
    # frame on the id at the end: one tokenize pass + one co-partitioned
    # join instead of three full-text scans. The narrow cache stays
    # registered (the returned plan still reads it); it is O(rows×16 B),
    # evicted LRU, and a caller packing many corpora in one session can
    # reclaim it eagerly with spark.catalog.clearCache().
    narrow = (
        ensure_parallelism(df)
        .select(F.col(id_col), toks.alias("n_tokens"))
        .persist()
    )

    lo, hi = narrow.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        narrow.unpersist()
        return df.select(
            "*",
            F.lit(None).cast("long").alias("n_tokens"),
            F.lit(None).cast("long").alias("start_token"),
            F.lit(None).cast("long").alias("bin_id"),
            F.lit(None).cast("long").alias("n_bins"),
        )
    width = max((int(hi) - int(lo)) // n_shards + 1, 1)
    # integer DIV, not double division: exact for 64-bit ids
    sharded = narrow.withColumn(
        "__shard",
        F.expr(f"CAST((`{id_col}` - {int(lo)}) DIV {width} AS BIGINT)"),
    )
    w = (
        Window.partitionBy("__shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sharded = sharded.withColumn("__cum", F.sum("n_tokens").over(w))

    shard_rows = sharded.groupBy("__shard").agg(
        F.sum("n_tokens").alias("t"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(id_col).alias("nd"),
    ).collect()
    dup_shards = [r["__shard"] for r in shard_rows if r["n"] != r["nd"]]
    if dup_shards:
        narrow.unpersist()
        raise ValueError(
            f"pack_sequences requires unique ids in {id_col!r}; duplicates "
            f"found in {len(dup_shards)} shard(s)"
        )
    totals = {r["__shard"]: r["t"] for r in shard_rows}
    offsets, running = {}, 0
    for s in sorted(totals):
        offsets[s] = running
        running += totals[s]
    # literal shard→offset map: n_shards entries riding in the plan
    offset_map = F.create_map(
        *[
            c
            for s, off in sorted(offsets.items())
            for c in (F.lit(int(s)).cast("long"), F.lit(int(off)).cast("long"))
        ]
    )
    start = offset_map[F.col("__shard")] + F.col("__cum") - F.col("n_tokens")
    end_tok = start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    placement = sharded.select(
        id_col,
        "n_tokens",
        start.alias("start_token"),
        F.floor(start / budget).cast("long").alias("bin_id"),
        (F.floor(end_tok / budget) - F.floor(start / budget) + 1)
        .cast("long")
        .alias("n_bins"),
    )
    return df.join(placement, id_col)


def split_train_holdout(
    df: DataFrame,
    group_col: str,
    holdout_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Leakage-free train/holdout labeling: the side is a deterministic
    hash of the GROUP key (domain, source, dedup-cluster id …), so all
    rows of a group — including near-duplicates clustered under one key —
    land on the same side. Adds a ``split`` column.

    md5 (not xxhash64) so external engines can reproduce the exact
    assignment; the first 8 hex chars give a uniform 32-bit draw.

    A NULL group is keyed by the ``'\\x00null'`` sentinel so NULL-group
    rows still split ~holdout_pct/100 — without it Spark would hash the
    salt alone (every NULL row on one fixed side) while a SQL twin's
    NULL-propagating concat would force them all into 'train'. Oracle
    twins must apply ``coalesce(col, chr(0) || 'null')`` identically."""
    if not 0 <= holdout_pct <= 100:
        raise ValueError(f"holdout_pct must be in [0, 100], got {holdout_pct}")
    group = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00null"))
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(salt), group)), 1, 8),
        16,
        10,
    ).cast("long")
    return df.withColumn(
        "split",
        F.when(F.pmod(bucket, F.lit(100)) < holdout_pct, F.lit("holdout")).otherwise(
            F.lit("train")
        ),
    )


def select_by_token_budget(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str | None = None,
    token_col: str | None = None,
    n_buckets: int = 1024,
) -> DataFrame:
    """Quality-ranked corpus selection under a token budget: rank docs by
    (score DESC, id ASC) and keep the maximal prefix whose cumulative
    token count stays ≤ ``budget`` — "take the best N tokens" without
    ever sorting the corpus globally.

    Semantics are EXACTLY ``SUM(tokens) OVER (ORDER BY score DESC, id)
    ≤ budget`` (inclusive), which is what the oracle runs. The plan
    avoids the single-task global window behind that SQL:

    1. one tiny agg reads min/max score (first planned action);
    2. scores are ``width_bucket``-ed into ``n_buckets`` uniform ranges —
       monotone in score, so global (score, id) order is bucket-major;
    3. per-bucket token sums (ONE partial-aggregating shuffle of
       ``n_buckets`` rows) come back to the driver (second action),
       which walks buckets best-first to find the boundary bucket and
       the budget remaining at its edge;
    4. the final filter keeps whole buckets above the boundary and runs
       the exact cumulative window ONLY inside the boundary bucket —
       partitioned by bucket, so the sorted slice is ~n/n_buckets rows,
       not n. (A corpus where most docs share ONE score degrades that
       partition toward n — ties can't cross buckets — documented, not
       defended; real quality scores spread.)

    Like the ``mode='auto'`` guards, the two driver actions are the
    planned cost of the algorithm; the corpus itself is touched by one
    projection, one bounded shuffle, and one bucket-partitioned window.
    """
    toks = F.col(token_col) if token_col else token_count(F.col(text_col))
    score = F.col(score_col) if score_col else F.lit(0.0)
    # three passes need (id, tokens, score) — min/max agg, bucket sums,
    # the boundary window — and deriving them usually means tokenizing
    # text, so the NARROW projection checkpoints once (~24 B/row, same
    # shape as pack_sequences' narrow cache; the first action below
    # materializes it) and the budget-bounded kept-id set semi-joins
    # back at the end. Previously all three actions re-tokenized the
    # corpus (guide §1.2 — don't compute things three times).
    narrow = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            toks.cast("long").alias("__tok"),
            score.cast("double").alias("__score"),
        )
        .localCheckpoint(eager=False)
    )
    mn, mx = narrow.agg(F.min("__score"), F.max("__score")).first()
    if mn is None:
        return df.limit(0)
    if mn == mx:
        bucket = F.lit(1)
        n_buckets = 1
    else:
        bucket = F.least(
            F.width_bucket(F.col("__score"), F.lit(mn), F.lit(mx), F.lit(n_buckets)),
            F.lit(n_buckets),
        )
    base = narrow.withColumn("__b", bucket)
    sums = {
        r["__b"]: r["t"]
        for r in base.groupBy("__b").agg(F.sum("__tok").alias("t")).collect()
    }
    remaining = budget
    boundary = None
    for b in sorted(sums, reverse=True):  # best-first: higher bucket = higher score
        if sums[b] <= remaining:
            remaining -= sums[b]
        else:
            boundary = b
            break
    if boundary is None:  # everything fits
        return df
    w = Window.partitionBy("__b").orderBy(F.col("__score").desc(), F.col(id_col))
    kept_ids = (
        base.withColumn("__cum", F.sum("__tok").over(w))
        .where(
            (F.col("__b") > F.lit(boundary))
            | (
                (F.col("__b") == F.lit(boundary))
                & (F.col("__cum") <= F.lit(remaining))
            )
        )
        .select(id_col)
    )
    # the kept set is budget-bounded (≤ budget rows even at one token
    # per doc), so this semi-join broadcasts/AQE-converts rather than
    # shuffling the corpus; ``id_col`` must be a unique key (same
    # contract as pack_sequences)
    return df.join(kept_ids, id_col, "left_semi")
