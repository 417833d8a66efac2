"""Relational/OLAP query library over the TPC-H-ish testdata.

Engine coverage for SURVEY.md §2.2 (categories absent from the
reference, mandated by the driver's correctness corpus): joins
(broadcast/sort-merge/semi/anti), group-by aggregation, rollup,
windows (ranking, lag/lead, frames), sorts/limits/top-k, set ops,
date functions, JSON extraction, sessionization, as-of lookup.

Cross-engine determinism: monetary aggregates accumulate exactly as
scaled-integer DECIMALs (``dsum`` / ``exact_grouped_agg`` — a parallel
double sum is not reproducible bit-for-bit across engines, and a
fractional double→DECIMAL cast rounds differently per engine); every
float output is rounded; every ordering has a unique tie-break key.

Scale notes: only TRUE dimensions (region: 5 rows, nation: 25 rows —
fixed-size regardless of scale factor) carry explicit ``broadcast``
hints. customer/supplier scale with SF (~TB at a 100 TB lineitem), so
their joins carry no hint — AQE broadcasts them at small sf and falls
back to shuffle joins at scale. Fact-fact joins (orders⋈lineitem)
shuffle on the join key and AQE handles skew; top-k uses per-key
windows (partition-local sorts), never a global order-by of the fact
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEC = "decimal(38,10)"
_SCALE = 1_000_000.0  # 6 fractional digits


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from simple_data_workflow_spark.sources.readers import load_table

    return load_table(spark, sf_dir, name)


def dsum(col) -> F.Column:
    """Exact, order-insensitive, engine-portable sum of a double column.

    ``round(x·10⁶)`` yields an *integral* double — and integral
    double→DECIMAL conversion is exact in both Spark and DuckDB, unlike
    fractional conversion, whose rounding differs between engines in the
    last decimal. The DECIMAL(38,0) accumulation is then exact and
    order-insensitive, and the final double division is IEEE-identical
    everywhere. (A parallel double sum is not reproducible at all;
    a DECIMAL(38,10) cast of a raw double is not portable.)

    BigDecimal accumulation costs ~9× a native double sum per row — for
    hot full-scan aggregates use :func:`exact_grouped_agg`, which gets
    the same exact result with long-typed map-side partials.
    """
    return F.sum(F.round(col * F.lit(_SCALE)).cast("decimal(38,0)")).cast("double") / F.lit(_SCALE)


def davg(col) -> F.Column:
    return dsum(col) / F.count(col)


def exact_grouped_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, F.Column],
    avgs: dict[str, F.Column] | None = None,
    count_alias: str | None = None,
    scale: float = _SCALE,
    scales: dict[str, float] | None = None,
) -> DataFrame:
    """Two-level exact scaled-integer aggregation — the scale path for
    :func:`dsum` semantics.

    Level 1 groups by ``keys + spark_partition_id()`` and accumulates
    ``round(x·scale)`` as plain LONGs — native codegen speed, partials
    stay map-side (one row per (group, input partition)). Level 2 reduces
    the tiny partial set with exact DECIMAL sums. The result is the same
    exact integer total as a single DECIMAL pass (integer addition is
    associative), at ~the cost of a double sum.

    Overflow headroom: a long partial holds |Σ round(x·10⁶)| < 9.2e18 —
    with |x| ≤ 1e6 that is ≥ 7.6e6 rows per input partition, far above a
    default 128 MB parquet split; the final DECIMAL(38,0) reduce is
    unbounded. ``avgs`` emits ROUND(sum/scale/count, 6) like the oracle's
    ``ROUND(.../COUNT(x), 6)`` (columns here are non-null, so COUNT(*)
    == COUNT(x)).
    """
    avgs = avgs or {}
    # per-alias scale override: large-magnitude columns (e.g. squared
    # prices) need a smaller scale so round(x·scale) keeps fitting the
    # long partial within a partition's row count — both engines quantize
    # with the SAME scale, so cross-engine exactness is unaffected
    scales = scales or {}

    def _sc(a: str) -> float:
        return scales.get(a, scale)

    partial_aggs = [
        F.sum(F.round(c * F.lit(_sc(a))).cast("long")).alias(f"__s_{a}")
        for a, c in {**sums, **avgs}.items()
    ]
    partial_aggs.append(F.count(F.lit(1)).alias("__n"))
    partials = df.groupBy(*keys, F.spark_partition_id().alias("__pid")).agg(*partial_aggs)
    final_aggs = []
    for a in sums:
        final_aggs.append(
            (F.sum(F.col(f"__s_{a}").cast("decimal(38,0)")).cast("double") / F.lit(_sc(a))).alias(a)
        )
    for a in avgs:
        final_aggs.append(
            F.round(
                F.sum(F.col(f"__s_{a}").cast("decimal(38,0)")).cast("double")
                / F.lit(_sc(a))
                / F.sum("__n"),
                6,
            ).alias(a)
        )
    final_aggs.append(F.sum("__n").alias(count_alias or "__count"))
    out = partials.groupBy(*keys).agg(*final_aggs)
    if count_alias is None:
        out = out.drop("__count")
    return out


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with 8 aggregates.

    Catalyst pushes the shipdate filter to the parquet scan; the
    groupBy is a two-phase hash aggregate (map-side partial combine)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    filtered = li.where(F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp"))
    out = exact_grouped_agg(
        filtered,
        keys=["l_returnflag", "l_linestatus"],
        sums={
            "sum_qty": F.col("l_quantity"),
            "sum_base_price": F.col("l_extendedprice"),
            "sum_disc_price": disc_price,
            "sum_charge": charge,
        },
        avgs={
            "avg_qty": F.col("l_quantity"),
            "avg_price": F.col("l_extendedprice"),
            "avg_disc": F.col("l_discount"),
        },
        count_alias="count_order",
    )
    return out.orderBy("l_returnflag", "l_linestatus")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND((l_quantity)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS sum_qty,
       CAST(SUM(CAST(ROUND((l_extendedprice)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS sum_base_price,
       CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount))*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS sum_disc_price,
       CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount)*(1+l_tax))*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS sum_charge,
       ROUND(CAST(SUM(CAST(ROUND((l_quantity)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0/COUNT(l_quantity), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(ROUND((l_extendedprice)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0/COUNT(l_extendedprice), 6) AS avg_price,
       ROUND(CAST(SUM(CAST(ROUND((l_discount)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0/COUNT(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast dim join + fact-fact shuffle join +
    group + deterministic top-10."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    # scale shape: customer scales with SF (not a true dimension), so no
    # forced broadcast — AQE converts the join locally when the filtered
    # side fits; the fact-fact orders⋈lineitem leg shuffles on the order key
    return (
        li.join(orders.join(cust, orders.o_custkey == cust.c_custkey),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
    )


Q3_SQL = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount))*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; true dims (nation/region) broadcast,
    SF-proportional sides (customer/supplier) left to AQE, facts shuffle
    on keys."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount))*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders by price within each market segment.
    The sort is per-partition-key inside the window — no global sort."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.round(F.col("o_totalprice"), 6).alias("o_totalprice"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


TOP3_SQL = """
SELECT c_mktsegment, o_orderkey, ROUND(o_totalprice, 6) AS o_totalprice, rk
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rk <= 3
"""


def revenue_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function group-by over the fact table."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").cast("long").alias("ship_year"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return exact_grouped_agg(
        li, keys=["ship_year"], sums={"revenue": F.col("rev")}, count_alias="n_items"
    ).orderBy("ship_year")


REVENUE_BY_YEAR_SQL = """
SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount))*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets aggregate (subtotals + grand total)."""
    li = _t(spark, sf_dir, "lineitem")
    # two-level: long partials per (group, input partition) at scan speed,
    # then the ROLLUP runs over the tiny partial set with exact DECIMAL
    # sums — grouping-set supersets of exact integer partials stay exact
    partials = li.groupBy(
        "l_returnflag", "l_linestatus", F.spark_partition_id().alias("__pid")
    ).agg(
        F.sum(F.round(F.col("l_quantity") * F.lit(_SCALE)).cast("long")).alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        partials.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(F.col("__s").cast("decimal(38,0)")).cast("double") / F.lit(_SCALE)).alias("sum_qty"),
            F.sum("__n").alias("n"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND((l_quantity)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS sum_qty,
       COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def segment_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op + anti-join: BUILDING customers with no 1999+ order."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    recent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_mktsegment = 'BUILDING'
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
ORDER BY c_custkey
"""


def nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: nation keys present among BOTH customers and
    suppliers (INTERSECT), minus an EXCEPT leg for coverage."""
    cust_nations = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    supp_nations = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    return cust_nations.intersect(supp_nations).orderBy("nationkey")


INTERSECT_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
INTERSECT
SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
ORDER BY nationkey
"""


def events_json_kpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + aggregate: avg value per event_type × props.k bucket."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", (k % 10).alias("k_bucket"), "value")
        .groupBy("event_type", "k_bucket")
        .agg(
            F.round(davg(F.col("value")), 6).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type", "k_bucket")
    )


EVENTS_JSON_SQL = """
SELECT event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       ROUND(CAST(SUM(CAST(ROUND((value)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0/COUNT(value), 6) AS avg_value,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


def sessionize_events(spark: SparkSession, sf_dir: str, gap_s: int = 1800) -> DataFrame:
    """Sessionization: lag + gap>threshold cumulative sum per user.

    Window partitioned by user_id — per-user sorts, shuffle on user_id
    only; a 100 TB event log sessionizes with one shuffle."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_idx", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_idx").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, event_id,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - LAG(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY user_id ORDER BY user_id
"""


def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows over the event stream (batch form of the
    Structured Streaming query in ``streaming.events``; epoch-aligned in
    both engines)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(dsum(F.col("value")), 6).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


WINDOWED_COUNTS_SQL = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(ROUND((value)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0, 6) AS total_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of lookup: for each purchase, the most recent prior-or-equal
    signup timestamp of the same user — expressed as a running max over
    an ordered window (no n² join, one shuffle on user_id)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    signup_ts = F.max(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("last_signup", signup_ts)
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.date_format("last_signup", "yyyy-MM-dd HH:mm:ss").alias("last_signup"),
        )
        .orderBy("event_id")
    )


ASOF_SQL = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       strftime(last_signup, '%Y-%m-%d %H:%M:%S') AS last_signup
FROM (
  SELECT event_id, user_id, ts, event_type,
         MAX(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS last_signup
  FROM events
) WHERE event_type = 'purchase'
ORDER BY event_id
"""


def cube_year_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (ship_year, returnflag) — two-level exact
    partials (see rollup_flag_status) under the grouping-set expansion."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").cast("long").alias("ship_year"),
        "l_returnflag",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    partials = li.groupBy("ship_year", "l_returnflag", F.spark_partition_id().alias("__pid")).agg(
        F.sum(F.round(F.col("rev") * F.lit(_SCALE)).cast("long")).alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        partials.cube("ship_year", "l_returnflag")
        .agg(
            (F.sum(F.col("__s").cast("decimal(38,0)")).cast("double") / F.lit(_SCALE)).alias("revenue"),
            F.sum("__n").alias("n"),
        )
        .orderBy(
            F.col("ship_year").asc_nulls_first(), F.col("l_returnflag").asc_nulls_first()
        )
    )


CUBE_SQL = """
SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year, l_returnflag,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS revenue,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (1, 2)
ORDER BY 1 ASC NULLS FIRST, 2 ASC NULLS FIRST
"""

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def pivot_segment_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per year × market segment (explicit value list
    keeps the plan static — no pre-scan for distinct pivot values)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.year("o_orderdate").cast("long").alias("order_year"), "c_mktsegment"
    )
    return (
        joined.groupBy("order_year")
        .pivot("c_mktsegment", SEGMENTS)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("order_year")
    )


PIVOT_SQL = """
SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
       COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS AUTOMOBILE,
       COUNT(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 END) AS BUILDING,
       COUNT(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 END) AS FURNITURE,
       COUNT(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 END) AS HOUSEHOLD,
       COUNT(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 END) AS MACHINERY
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (expands to a two-phase distinct
    aggregate; the exact form — approx_count_distinct is the one-pass
    sketch alternative when a ~2% error is acceptable at 100 TB)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def quantiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``); percentile_approx is the sketch path."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.round(F.percentile("o_totalprice", 0.5), 6).alias("p50"),
            F.round(F.percentile("o_totalprice", 0.9), 6).alias("p90"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )


QUANTILES_SQL = """
SELECT c_mktsegment,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90,
       COUNT(*) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def large_parts_except_cheap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL set operation over projected keys."""
    part = _t(spark, sf_dir, "part")
    big = part.where(F.col("p_size") > 40).select("p_partkey")
    cheap = part.where(F.col("p_retailprice") < 950).select("p_partkey")
    return big.exceptAll(cheap).orderBy("p_partkey")


EXCEPT_SQL = """
SELECT p_partkey FROM part WHERE p_size > 40
EXCEPT ALL
SELECT p_partkey FROM part WHERE p_retailprice < 950
ORDER BY p_partkey
"""


def asof_purchase_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table as-of join (operators.joins.asof_join): each purchase
    event picks up the latest order at-or-before its timestamp for the
    same key — union+window, one shuffle, no quadratic range join."""
    from simple_data_workflow_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey", "o_totalprice"
    )
    out = asof_join(
        purchases,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=["o_totalprice"],
        right_tiebreak="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format("o_orderdate_asof", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate_asof"),
        "o_totalprice",
    ).orderBy("event_id")


ASOF_JOIN_SQL = """
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       strftime(m.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_asof,
       m.o_totalprice
FROM events e
LEFT JOIN LATERAL (
  SELECT o.o_orderdate, o.o_totalprice
  FROM orders o
  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
  LIMIT 1
) m ON TRUE
WHERE e.event_type = 'purchase'
ORDER BY e.event_id
"""


def asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance (operators.joins.asof_join,
    direction='forward'): each purchase event picks up the EARLIEST
    order at-or-after its timestamp for the same key, nulled when more
    than 30 days out — "did this purchase lead to an order within a
    month". Same union+window shape as the backward join, one shuffle."""
    from simple_data_workflow_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey", "o_totalprice"
    )
    out = asof_join(
        purchases,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=["o_totalprice"],
        right_tiebreak="o_orderkey",
        direction="forward",
        tolerance_s=30 * 86400,
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format("o_orderdate_asof", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate_asof"),
        "o_totalprice",
    ).orderBy("event_id")


ASOF_FORWARD_SQL = """
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       strftime(m.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_asof,
       m.o_totalprice
FROM events e
LEFT JOIN LATERAL (
  SELECT o.o_orderdate, o.o_totalprice
  FROM orders o
  WHERE o.o_custkey = e.user_id
    AND o.o_orderdate >= e.ts
    AND o.o_orderdate <= e.ts + INTERVAL 30 DAY
  ORDER BY o.o_orderdate ASC, o.o_orderkey DESC
  LIMIT 1
) m ON TRUE
WHERE e.event_type = 'purchase'
ORDER BY e.event_id
"""


def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark SQL surface (free via temp views): explicit GROUPING SETS —
    per (status, priority), per status, and grand total in one pass."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def customers_above_segment_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: customers whose account balance exceeds
    their segment's average — expressed as a broadcast join against the
    tiny per-segment aggregate (the decorrelated plan Catalyst would aim
    for; no per-row subquery execution)."""
    cust = _t(spark, sf_dir, "customer")
    seg_avg = cust.groupBy("c_mktsegment").agg(
        (dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("seg_avg")
    )
    return (
        cust.join(F.broadcast(seg_avg), "c_mktsegment")
        .where(F.col("c_acctbal") > F.col("seg_avg"))
        .select("c_custkey", "c_mktsegment", F.round("c_acctbal", 6).alias("c_acctbal"))
        .orderBy("c_custkey")
    )


CORRELATED_SQL = """
SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 6) AS c_acctbal
FROM customer c
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(ROUND(c2.c_acctbal*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0/COUNT(*)
  FROM customer c2 WHERE c2.c_mktsegment = c.c_mktsegment
)
ORDER BY c_custkey
"""


def unpivot_flag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide per-flag aggregates → long (flag, metric, value)
    via ``stack()`` — the same unpivot the CI chart frame uses
    (reference src/tasks.py:593-600)."""
    li = _t(spark, sf_dir, "lineitem")
    wide = exact_grouped_agg(
        li,
        keys=["l_returnflag"],
        sums={
            "sum_qty": F.col("l_quantity"),
            "sum_disc": F.col("l_discount"),
            "sum_tax": F.col("l_tax"),
        },
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(3, 'sum_qty', sum_qty, 'sum_disc', sum_disc, 'sum_tax', sum_tax) AS (metric, value)",
    ).orderBy("l_returnflag", "metric")


UNPIVOT_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(ROUND(l_quantity*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS sum_qty,
         CAST(SUM(CAST(ROUND(l_discount*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS sum_disc,
         CAST(SUM(CAST(ROUND(l_tax*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS sum_tax
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, metric, value FROM wide
UNPIVOT (value FOR metric IN (sum_qty, sum_disc, sum_tax))
ORDER BY l_returnflag, metric
"""


def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch path for 100 TB: HyperLogLog++ distinct counts and
    t-digest-style approximate percentiles — one pass, bounded memory,
    mergeable across partitions. Engine-specific sketch values →
    rows-only check, but SELF-VALIDATING (round 10, VERDICT r9 #9):
    the query computes the exact twins in the SAME aggregate and
    asserts the HLL estimate lands within ~3× the declared rsd of the
    exact distinct count (rsd is a standard deviation — 3σ bounds the
    assert against legitimate tail draws) and each approx percentile
    between the exact values at ranks ±(n/accuracy) — Spark's
    documented rank-error contract for percentile_approx. A sketch
    regression now fails the driver run loudly instead of passing as
    an unchecked number. (Exact twins remain oracle-checked in
    distinct_parts_per_flag / quantiles_by_segment.)"""
    li = _t(spark, sf_dir, "lineitem")
    acc = 10_000
    # exact twins in a SEPARATE aggregate: mixing countDistinct with
    # the sketch aggs triggers Catalyst's distinct-agg EXPAND rewrite,
    # which runs the percentile buffers over the duplicated stream —
    # measured 18.6 s mixed vs 3.4 + 1.4 s split at sf0.1. Both
    # results are 3 rows; checkpointed so the validation plan below
    # reads them instead of re-running either scan per branch.
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, acc).alias("approx_p50_price"),
        F.percentile_approx("l_extendedprice", 0.99, acc).alias("approx_p99_price"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("__exact_parts"),
        F.count(F.lit(1)).alias("__n"),
    )
    agg = sketches.join(exact, "l_returnflag").localCheckpoint(eager=True)
    # exact values at ranks ±(err+1) around each target rank, computed
    # DISTRIBUTEDLY in ONE pass (per-group sort window + conditional
    # min/max — only 3 boundary rows ever reach the driver; never a
    # collect_list of the data). The +1 absorbs the 1-based/0-based
    # rank-convention ambiguity in percentile_approx's contract.
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("__rn"),
    ).join(F.broadcast(agg.select("l_returnflag", "__n")), "l_returnflag")
    err = F.greatest(F.lit(1), (F.col("__n") / acc).cast("long")) + 1
    price, rn = F.col("l_extendedprice"), F.col("__rn")
    conds = {}
    for q in (0.5, 0.99):
        rank = F.floor(F.lit(q) * (F.col("__n") - 1)) + 1  # 1-based
        conds[int(q * 100)] = rn.between(rank - err, rank + err)
    bounds = (
        ranked.where(conds[50] | conds[99])
        .groupBy("l_returnflag")
        .agg(
            *[
                f
                for q, c in conds.items()
                for f in (
                    F.min(F.when(c, price)).alias(f"__lo_{q}"),
                    F.max(F.when(c, price)).alias(f"__hi_{q}"),
                )
            ]
        )
    )
    for r in agg.join(bounds, "l_returnflag").collect():  # 3 groups
        assert abs(r["approx_parts"] - r["__exact_parts"]) <= max(
            3 * 0.02 * r["__exact_parts"], 1
        ), (r["l_returnflag"], r["approx_parts"], r["__exact_parts"])
        for q in (50, 99):
            got = r[f"approx_p{q}_price"]
            lo, hi = r[f"__lo_{q}"], r[f"__hi_{q}"]
            assert lo <= got <= hi, (r["l_returnflag"], q, got, lo, hi)
    return agg.select(
        "l_returnflag", "approx_parts", "approx_p50_price", "approx_p99_price"
    ).orderBy("l_returnflag")


def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2-hour length, 1-hour slide): each event lands in
    two windows; Spark's window() generates the assignment natively."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
        .orderBy("window_start", "event_type")
    )


SLIDING_WINDOW_SQL = """
WITH b AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS b0, event_type FROM events),
assigned AS (
  SELECT b0 AS ws, event_type FROM b
  UNION ALL
  SELECT b0 - INTERVAL '1 hour' AS ws, event_type FROM b
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, COUNT(*) AS n
FROM assigned GROUP BY 1, 2 ORDER BY 1, 2
"""


def running_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames: per-customer running total (unbounded preceding) and
    3-row moving average over ordered orders."""
    orders = _t(spark, sf_dir, "orders")
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_mov = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    # exact engine-portable running sum: accumulate scaled longs in the frame
    scaled = F.round(F.col("o_totalprice") * F.lit(_SCALE)).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(scaled).over(w_run).cast("double") / F.lit(_SCALE)).alias("running_total"),
        F.round(
            (F.sum(scaled).over(w_mov).cast("double") / F.lit(_SCALE))
            / F.count(F.lit(1)).over(w_mov),
            6,
        ).alias("moving_avg3"),
    ).orderBy("o_custkey", "o_orderkey")


RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS BIGINT)) OVER w_run AS DOUBLE)/1000000.0 AS running_total,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS BIGINT)) OVER w_mov AS DOUBLE)/1000000.0
             / COUNT(*) OVER w_mov, 6) AS moving_avg3
FROM orders
WINDOW w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING),
       w_mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


def events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map/JSON functions: parse the props JSON into map<string,bigint>,
    explode entries, aggregate per key bucket."""
    ev = _t(spark, sf_dir, "events")
    entries = ev.select(
        "event_id",
        F.explode(F.from_json("props", "map<string,bigint>")).alias("key", "val"),
    )
    return (
        entries.groupBy("key", (F.col("val") % 5).alias("val_mod5"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("total"))
        .orderBy("key", "val_mod5")
    )


PROPS_MAP_SQL = """
WITH entries AS (
  SELECT event_id, k.key AS key,
         CAST(json_extract(props, '$.' || k.key) AS BIGINT) AS val
  FROM events, unnest(json_keys(props)) AS k(key)
)
SELECT key, val % 5 AS val_mod5, COUNT(*) AS n, CAST(SUM(val) AS BIGINT) AS total
FROM entries GROUP BY 1, 2 ORDER BY 1, 2
"""


def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join customer⟕orders (with a
    predicate on the fact side), per-customer counts including zeros,
    then the count-of-counts histogram."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose lineitem quantity total exceeds a
    threshold (aggregate → semi-join back to the fact), with customer
    enrichment."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > 180)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 6).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
    )


Q18_SQL = """
SELECT c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       ROUND(o_totalprice, 6) AS o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey,
         CAST(SUM(CAST(ROUND(l_quantity*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(ROUND(l_quantity*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 > 180
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
"""


def order_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window battery: ntile, percent_rank, lag/lead over
    per-segment price ordering (unique tie-break via order key)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        joined.select(
            "c_mktsegment",
            "o_orderkey",
            F.ntile(4).over(w).cast("long").alias("price_quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.lag("o_orderkey").over(w).alias("prev_orderkey"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
        )
        .orderBy("c_mktsegment", "o_orderkey")
    )


RANK_METRICS_SQL = """
SELECT c_mktsegment, o_orderkey,
       CAST(NTILE(4) OVER w AS BIGINT) AS price_quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       LAG(o_orderkey) OVER w AS prev_orderkey,
       LEAD(o_orderkey) OVER w AS next_orderkey
FROM orders JOIN customer ON o_custkey = c_custkey
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC)
ORDER BY c_mktsegment, o_orderkey
"""


def string_fn_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function battery: case, substring, replace, padding,
    reverse, edit distance, position — all codegen built-ins."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#11")).cast("long").alias("brand_dist"),
        F.locate("a", F.col("p_name")).cast("long").alias("first_a"),
    ).orderBy("p_partkey")


STRING_BATTERY_SQL = """
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       substr(p_name, 1, 10) AS name_prefix,
       CAST(length(p_name) AS BIGINT) AS name_len,
       replace(p_type, ' ', '_') AS type_snake,
       lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
       reverse(p_brand) AS brand_rev,
       CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS brand_dist,
       CAST(strpos(p_name, 'a') AS BIGINT) AS first_a
FROM part ORDER BY p_partkey
"""


def date_fn_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date/time-function battery: parts, truncation, arithmetic,
    month boundaries — all pushed through codegen."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_95"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    ).orderBy("o_orderkey")


DATE_BATTERY_SQL = """
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS BIGINT) AS y,
       CAST(MONTH(o_orderdate) AS BIGINT) AS m,
       CAST(DAY(o_orderdate) AS BIGINT) AS d,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
FROM orders ORDER BY o_orderkey
"""


def cheapest_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-min subquery — rows equal to their
    group's minimum — expressed as a min-over-window filter (no join,
    one shuffle on the group key)."""
    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey")
    return (
        s.withColumn("__min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("__min_bal"))
        .select(
            "s_suppkey",
            F.col("s_nationkey").cast("long").alias("s_nationkey"),
            F.round("s_acctbal", 6).alias("s_acctbal"),
        )
        .orderBy("s_suppkey")
    )


Q2_SHAPE_SQL = """
SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS s_nationkey, ROUND(s_acctbal, 6) AS s_acctbal
FROM supplier s
WHERE s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = s.s_nationkey)
ORDER BY s_suppkey
"""


def conditional_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregates: filtered counts, bool_or/bool_and,
    sum-if — the FILTER(WHERE ...) family."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
            F.count_if(F.col("l_discount") == 0).alias("n_no_discount"),
            F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
            F.sum(
                F.when(F.col("l_discount") > 0.05, F.round(F.col("l_quantity"))).otherwise(0)
            ).cast("long").alias("qty_discounted"),
        )
        .orderBy("l_returnflag")
    )


CONDITIONAL_AGG_SQL = """
SELECT l_returnflag,
       COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
       COUNT(*) FILTER (WHERE l_discount = 0) AS n_no_discount,
       bool_or(l_tax > 0.07) AS any_high_tax,
       bool_and(l_quantity > 0) AS all_positive_qty,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN ROUND(l_quantity) ELSE 0 END) AS BIGINT) AS qty_discounted
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted statistics: quantity-weighted mean unit price per flag
    via two exact scaled sums (Σw·x / Σw)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice") * F.col("l_quantity")).alias("wx"),
        F.col("l_quantity").alias("w"),
    )
    agg = exact_grouped_agg(
        li, keys=["l_returnflag"], sums={"swx": F.col("wx"), "sw": F.col("w")}
    )
    return agg.select(
        "l_returnflag", F.round(F.col("swx") / F.col("sw"), 6).alias("weighted_avg_price")
    ).orderBy("l_returnflag")


WEIGHTED_AVG_SQL = """
SELECT l_returnflag,
       ROUND(
         (CAST(SUM(CAST(ROUND(l_extendedprice*l_quantity*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0)
         / (CAST(SUM(CAST(ROUND(l_quantity*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0), 6)
         AS weighted_avg_price
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def regexp_extract_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture groups: split 'Brand#NN' into its number, count
    parts per brand number × size bucket."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("long").alias("brand_num"),
            (F.col("p_size") / 10).cast("long").alias("size_decile"),
        )
        .groupBy("brand_num", "size_decile")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("brand_num", "size_decile")
    )


REGEXP_EXTRACT_SQL = r"""
SELECT CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_num,
       CAST(p_size // 10 AS BIGINT) AS size_decile,
       COUNT(*) AS n
FROM part GROUP BY 1, 2 ORDER BY 1, 2
"""


def rollup_with_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping()/grouping_id(): distinguish subtotal rows from data
    rows that happen to carry NULL keys."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().cast("long").alias("gid"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
            "gid",
        )
    )


GROUPING_ID_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST, gid
"""


def stats_corr_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate battery per return flag: Pearson correlation,
    sample covariance, and sample stddevs of (extendedprice, quantity).

    Built from EXACT scaled-integer sums and closed-form double
    arithmetic instead of native ``corr()``/``covar_samp()``
    aggregates: a native streaming-merge aggregate's result depends on
    partition merge order in the last ulps, so it cannot hash-match
    across engines — n, Σx, Σy, Σxy, Σx², Σy² are order-insensitive
    exact integers, and the identical closed-form formula on both sides
    is bit-identical. The sums run through ``exact_grouped_agg`` (long
    partials per input partition, DECIMAL reduce of the tiny partial
    set) so exactness costs ~a double sum, not a per-row BigDecimal;
    product columns carry smaller scales (1e4 for x·y, 1 for x²) to
    keep long partials within overflow headroom — the oracle quantizes
    with the same scales, so hashes still match.
    """
    li = _t(spark, sf_dir, "lineitem")
    g = exact_grouped_agg(
        li,
        ["l_returnflag"],
        sums={
            "sx": F.col("l_extendedprice"),
            "sy": F.col("l_quantity"),
            "sxy": F.col("l_extendedprice") * F.col("l_quantity"),
            "sxx": F.col("l_extendedprice") * F.col("l_extendedprice"),
            "syy": F.col("l_quantity") * F.col("l_quantity"),
        },
        scales={"sxy": 1e4, "sxx": 1.0},
        count_alias="n_rows",
    ).withColumn("n", F.col("n_rows").cast("double"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov = (sxy - sx * sy / n) / (n - 1)
    vx = (sxx - sx * sx / n) / (n - 1)
    vy = (syy - sy * sy / n) / (n - 1)
    return g.select(
        "l_returnflag",
        n.cast("long").alias("n_items"),
        F.round(cov / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("price_qty_corr"),
        F.round(cov, 6).alias("price_qty_covar"),
        F.round(F.sqrt(vx), 6).alias("price_stddev"),
        F.round(F.sqrt(vy), 6).alias("qty_stddev"),
    ).orderBy("l_returnflag")


STATS_CORR_SQL = """
WITH g AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(ROUND(l_extendedprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS sx,
         CAST(SUM(CAST(ROUND(l_quantity*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS sy,
         CAST(SUM(CAST(ROUND(l_extendedprice*l_quantity*10000.0) AS DECIMAL(38,0))) AS DOUBLE)/10000.0 AS sxy,
         CAST(SUM(CAST(ROUND(l_extendedprice*l_extendedprice*1.0) AS DECIMAL(38,0))) AS DOUBLE)/1.0 AS sxx,
         CAST(SUM(CAST(ROUND(l_quantity*l_quantity*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_items,
       ROUND(((sxy - sx*sy/n)/(n-1)) / (sqrt((sxx - sx*sx/n)/(n-1)) * sqrt((syy - sy*sy/n)/(n-1))), 6) AS price_qty_corr,
       ROUND((sxy - sx*sy/n)/(n-1), 6) AS price_qty_covar,
       ROUND(sqrt((sxx - sx*sx/n)/(n-1)), 6) AS price_stddev,
       ROUND(sqrt((syy - sy*sy/n)/(n-1)), 6) AS qty_stddev
FROM g ORDER BY l_returnflag
"""


def trailing_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per customer, each order's trailing-30-day
    order total (the frame is value-based — all orders within 30 days —
    not row-count-based, so ties and gaps are handled by semantics, not
    data luck).

    The frame key is epoch seconds (a numeric range both engines define
    identically), and the windowed sum accumulates the scaled-integer
    DECIMAL (exact, order-insensitive) — a double window sum's
    accumulation order inside a sliding frame is engine-internal and
    cannot hash-match. Per-key window: partition-local sort, no global
    sort."""
    orders = _t(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1995)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    scaled = F.round(F.col("o_totalprice") * 1e6).cast("decimal(38,0)")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            (F.sum(scaled).over(w).cast("double") / 1e6).alias("t30"),
        )
        .select(
            "o_custkey",
            "o_orderkey",
            "order_date",
            F.round("t30", 6).alias("trailing_30d_total"),
        )
        .orderBy("o_orderkey")
    )


TRAILING_30D_SQL = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) OVER (
           PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
           RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
       ) AS DOUBLE)/1000000.0, 6) AS trailing_30d_total
FROM orders WHERE year(o_orderdate) = 1995
ORDER BY o_orderkey
"""

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table scan-heavy predicate aggregate — a
    year of shipments in a discount band below a quantity cap, summing
    the discounted-away revenue.

    All three predicates reach the parquet scan (PushedFilters); the
    aggregate is one exact scaled-integer sum over the surviving rows
    (the l_extendedprice·l_discount double product is IEEE-identical in
    both engines, so quantizing the product is portable). At 100 TB this
    is the pure scan-throughput query: no shuffle beyond the single-row
    partial reduce."""
    li = _t(spark, sf_dir, "lineitem")
    filtered = li.where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        F.round(dsum(F.col("l_extendedprice") * F.col("l_discount")), 6).alias(
            "forecast_revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


Q6_SQL = """
SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice*l_discount*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0, 6) AS forecast_revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returns in a
    quarter — orders in the window ⋈ returned lineitems, grouped per
    customer with nation enrichment, global top-20.

    Join order keeps the fact⋈fact shuffle on the order key with both
    date/returnflag filters pushed below it; nation (25 rows, fixed
    regardless of SF) is the only explicit broadcast. The top-20 sorts
    only the aggregated per-customer rows (bounded by |customer|), never
    the fact table."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    per_cust = exact_grouped_agg(
        orders.join(li, orders.o_orderkey == li.l_orderkey),
        ["o_custkey"],
        sums={"revenue": rev},
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 6).alias("c_acctbal"),
            "n_name",
            F.round("revenue", 6).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 6) AS c_acctbal, n_name,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0, 6) AS revenue
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey AND l_returnflag = 'R'
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-10-01' AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one shipping month — a
    conditional-numerator / unconditional-denominator ratio over the
    part⋈lineitem join.

    Both sums run in ONE exact grouped aggregate pass (numerator is the
    CASE-masked revenue), so the fact table is scanned and joined once;
    the ratio is a single-row double division, identical everywhere. The
    month filter prunes at the scan; part is SF-proportional so the join
    carries no broadcast hint (AQE decides)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    g = exact_grouped_agg(
        li.join(part, li.l_partkey == part.p_partkey),
        [],
        sums={
            "promo_rev": F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)),
            "total_rev": rev,
        },
        count_alias="n_items",
    )
    return g.select(
        F.round(F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 6).alias(
            "promo_pct"
        ),
        F.round("total_rev", 6).alias("total_rev"),
        "n_items",
    )


Q14_SQL = """
WITH g AS (
  SELECT
    CAST(SUM(CAST(ROUND(CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS promo_rev,
    CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_rev,
    COUNT(*) AS n_items
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
)
SELECT ROUND(100.0 * promo_rev / total_rev, 6) AS promo_pct,
       ROUND(total_rev, 6) AS total_rev, n_items
FROM g
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR-ed brand/size/quantity
    predicate groups spanning BOTH join sides.

    The equi-join key (partkey) stays a hash join; Catalyst derives the
    single-side implications of the disjunction (p_brand IN (...),
    l_quantity ≤ 30 bounds) and pushes them below the join, so the
    cross-side OR is evaluated only on pre-filtered rows — the shape a
    nested-loop translation of the reference predicate would miss."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    grp = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return j.where(grp).agg(
        F.round(dsum(rev), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_SQL = """
SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0, 6) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#7'  AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: per user, the
    first *view*, the first *click* at-or-after that view, and the first
    *purchase* at-or-after that click; one row per stage with the user
    count and median stage latency.

    Ordering matters (a click BEFORE the first view must not count).
    ONE shuffle of the (type-filtered) event stream on user_id serves
    everything: two window passes over the same partitioning compute
    the running first-view and running first-QUALIFIED-click per row
    (two passes because a window expression cannot nest inside another;
    same partitioning + ordering → Catalyst inserts no second exchange
    or sort), RANGE frames make same-instant stages qualify exactly
    like the ``>=`` chain. The per-user aggregate then reuses the same
    hash partitioning (no exchange), and the stage rollups run over the
    |users|-sized frame. Equivalent to the 3-aggregate + 2-join chain
    (min qualified click == min click >= first view; a purchase has a
    qualified click at-or-before it iff it is >= the first qualified
    click) at a third of the shuffles. Median latency uses the portable
    exact percentile over epoch-second deltas."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click", "purchase")
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    et, t = F.col("event_type"), F.col("ts")
    with_fv = ev.select(
        "user_id", "ts", "event_type",
        F.min(F.when(et == "view", t)).over(wr).alias("__fv"),
    )
    with_qc = with_fv.withColumn(
        "__qc",
        F.min(
            F.when((et == "click") & F.col("__fv").isNotNull(), t)
        ).over(wr),
    )
    per_user = with_qc.groupBy("user_id").agg(
        F.min(F.when(et == "view", t)).alias("v_ts"),
        F.min(F.when((et == "click") & F.col("__fv").isNotNull(), t)).alias("c_ts"),
        F.min(F.when((et == "purchase") & F.col("__qc").isNotNull(), t)).alias("p_ts"),
    )
    # one conditional rollup over the |users|-sized frame (percentile
    # skips NULLs, so the stage filters become the latency expressions'
    # own nullability), exploded to the 3 stage rows — a 3-branch union
    # would re-plan the whole pipeline per branch
    lats = per_user.select(
        "v_ts", "c_ts", "p_ts",
        (F.col("c_ts").cast("double") - F.col("v_ts").cast("double")).alias("c_lat"),
        (F.col("p_ts").cast("double") - F.col("c_ts").cast("double")).alias("p_lat"),
    )
    one = lats.agg(
        F.count("v_ts").alias("n1"),
        F.count("c_ts").alias("n2"),
        F.count("p_ts").alias("n3"),
        F.round(F.expr("percentile(c_lat, 0.5)"), 3).alias("m2"),
        F.round(F.expr("percentile(p_lat, 0.5)"), 3).alias("m3"),
    )
    return (
        one.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).alias("stage_no"), F.lit("view").alias("stage"),
                        F.col("n1").alias("n_users"),
                        F.lit(0.0).alias("median_latency_s"),
                    ),
                    F.struct(
                        F.lit(2).alias("stage_no"),
                        F.lit("click_after_view").alias("stage"),
                        F.col("n2").alias("n_users"),
                        F.col("m2").alias("median_latency_s"),
                    ),
                    F.struct(
                        F.lit(3).alias("stage_no"),
                        F.lit("purchase_after_click").alias("stage"),
                        F.col("n3").alias("n_users"),
                        F.col("m3").alias("median_latency_s"),
                    ),
                )
            ).alias("col")
        )
        .select("col.stage_no", "col.stage", "col.n_users", "col.median_latency_s")
        .orderBy("stage_no")
    )


FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts, ANY_VALUE(v.v_ts) AS v_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.v_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts, ANY_VALUE(c.c_ts) AS c_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
  GROUP BY e.user_id
)
SELECT 1 AS stage_no, 'view' AS stage, COUNT(*) AS n_users, 0.0 AS median_latency_s FROM v
UNION ALL
SELECT 2, 'click_after_view', COUNT(*),
       ROUND(MEDIAN(epoch(c_ts) - epoch(v_ts)), 3) FROM c
UNION ALL
SELECT 3, 'purchase_after_click', COUNT(*),
       ROUND(MEDIAN(epoch(p_ts) - epoch(c_ts)), 3) FROM p
ORDER BY stage_no
"""


def listagg_priorities_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """String aggregation (LISTAGG / string_agg): per market segment, the
    alphabetically-ordered CSV of distinct order priorities its customers
    used, plus the order count.

    collect_set → array_sort → array_join makes the concatenation
    order-deterministic (a bare collect_list is partition-order-dependent
    and would never reproduce across engines or runs). The set is bounded
    by the priority domain (5 values), so the aggregate state stays tiny
    regardless of SF."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), ","
            ).alias("priorities_csv"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


LISTAGG_SQL = """
SELECT c_mktsegment,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities_csv,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority distribution for a quarter's
    orders that contain at least one heavy lineitem — a correlated
    EXISTS expressed as a LEFT SEMI join.

    The semi join deduplicates the probe side inside the join (no
    distinct pass over lineitem); the quantity filter pushes to the
    lineitem scan, the date window to the orders scan. Counting happens
    after the semi join on the surviving orders only."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    heavy = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o.o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def stats_moments_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment battery per return flag: mean, sample stddev,
    population skewness g₁ and excess kurtosis g₂ of l_quantity, plus
    exact min/max.

    Like :func:`stats_corr_battery`, native ``skewness()``/
    ``kurtosis()`` aggregates are streaming-merge and not reproducible
    across engines in the last ulps, so the battery is built from EXACT
    scaled-integer raw power sums (Σx..Σx⁴ via ``exact_grouped_agg``
    long partials) and the identical closed-form double expression on
    both sides. Scale headroom: qty ≤ 50 so qty⁴ ≤ 6.25e6 — at the 1e6
    quantization a partial stays within a long for ~1.4e6 rows/partition,
    an order of magnitude above a 128 MB split; round(qty⁴·1e6) < 2^53
    so the quantization itself is exact."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    g = exact_grouped_agg(
        li,
        ["l_returnflag"],
        sums={"s1": x, "s2": x * x, "s3": x * x * x, "s4": x * x * x * x},
        count_alias="n_rows",
    ).withColumn("n", F.col("n_rows").cast("double"))
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - F.lit(3.0) * mean * (s2 / n) + F.lit(2.0) * mean * mean * mean
    m4 = (
        s4 / n
        - F.lit(4.0) * mean * (s3 / n)
        + F.lit(6.0) * mean * mean * (s2 / n)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    extrema = li.groupBy("l_returnflag").agg(
        F.min(x).alias("qty_min"), F.max(x).alias("qty_max")
    )
    return (
        g.join(extrema, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("n_rows").alias("n_items"),
            F.round(mean, 6).alias("qty_mean"),
            F.round(F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1.0))), 6).alias("qty_stddev"),
            F.round(m3 / F.sqrt(m2 * m2 * m2), 6).alias("qty_skewness"),
            F.round(m4 / (m2 * m2) - F.lit(3.0), 6).alias("qty_kurtosis"),
            F.round("qty_min", 6).alias("qty_min"),
            F.round("qty_max", 6).alias("qty_max"),
        )
        .orderBy("l_returnflag")
    )


STATS_MOMENTS_SQL = """
WITH g AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         COUNT(*) AS n_items,
         CAST(SUM(CAST(ROUND(l_quantity*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS s1,
         CAST(SUM(CAST(ROUND(l_quantity*l_quantity*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS s2,
         CAST(SUM(CAST(ROUND(l_quantity*l_quantity*l_quantity*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS s3,
         CAST(SUM(CAST(ROUND(l_quantity*l_quantity*l_quantity*l_quantity*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS s4,
         MIN(l_quantity) AS qty_min,
         MAX(l_quantity) AS qty_max
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n_items,
       ROUND(s1/n, 6) AS qty_mean,
       ROUND(sqrt((s2 - s1*s1/n)/(n-1.0)), 6) AS qty_stddev,
       ROUND((s3/n - 3.0*(s1/n)*(s2/n) + 2.0*(s1/n)*(s1/n)*(s1/n))
             / sqrt(power(s2/n - (s1/n)*(s1/n), 3.0)), 6) AS qty_skewness,
       ROUND((s4/n - 4.0*(s1/n)*(s3/n) + 6.0*(s1/n)*(s1/n)*(s2/n) - 3.0*(s1/n)*(s1/n)*(s1/n)*(s1/n))
             / ((s2/n - (s1/n)*(s1/n))*(s2/n - (s1/n)*(s1/n))) - 3.0, 6) AS qty_kurtosis,
       ROUND(qty_min, 6) AS qty_min,
       ROUND(qty_max, 6) AS qty_max
FROM g ORDER BY l_returnflag
"""


def window_nav_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window-navigation battery over a NULL-holed measure:
    per user, running first non-null value, latest non-null so far,
    second non-null overall, and the previous raw value with a default.

    The measure masks low values to NULL so the ignore-nulls semantics
    are actually exercised. Frames are explicit ROWS frames (the
    ignore-nulls navigators are frame-sensitive); ordering is the unique
    event id so both engines see the same sequence. Per-user windows are
    partition-local sorts — no global sort at any scale."""
    ev = _t(spark, sf_dir, "events")
    v = F.when(F.col("value") < 1, F.lit(None)).otherwise(F.col("value"))
    base = ev.select("event_id", "user_id", v.alias("v"))
    run = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    seq = Window.partitionBy("user_id").orderBy("event_id")
    return base.select(
        "event_id",
        "user_id",
        F.round("v", 6).alias("v"),
        F.round(F.first("v", ignorenulls=True).over(run), 6).alias("first_nn"),
        F.round(F.last("v", ignorenulls=True).over(run), 6).alias("latest_nn"),
        F.round(F.nth_value("v", 2, ignoreNulls=True).over(full), 6).alias("second_nn"),
        F.round(F.lag("v", 1, -1.0).over(seq), 6).alias("prev_raw"),
    ).orderBy("event_id")


WINDOW_NAV_SQL = """
WITH base AS (
  SELECT event_id, user_id,
         CASE WHEN value < 1 THEN NULL ELSE value END AS v
  FROM events
)
SELECT event_id, user_id, ROUND(v, 6) AS v,
       ROUND(FIRST_VALUE(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS first_nn,
       ROUND(LAST_VALUE(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS latest_nn,
       ROUND(NTH_VALUE(v, 2 IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6) AS second_nn,
       ROUND(LAG(v, 1, -1.0) OVER (PARTITION BY user_id ORDER BY event_id), 6) AS prev_raw
FROM base
ORDER BY event_id
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year — lineitem enriched with its SUPPLIER nation on one side and its
    ORDER'S CUSTOMER nation on the other, keeping only the two flow
    directions between NATION_1 and NATION_2.

    The same 25-row nation dim is broadcast twice under different roles
    (supp_nation / cust_nation); supplier and customer are SF-scaled so
    their joins carry no hint (AQE decides). The nation-pair disjunction
    can only be evaluated after both enrichments, but Catalyst pushes
    the derived single-side implication (supp_nation IN (N1, N2), and
    likewise for cust) into each branch, so the orders⋈lineitem shuffle
    carries pre-filtered rows. Group-by is 2 years × 2 directions — the
    partial aggregate collapses map-side."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    j = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("cn_key"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
    )
    g = exact_grouped_agg(
        j, ["supp_nation", "cust_nation", "l_year"], sums={"volume": rev}
    )
    return g.select(
        "supp_nation",
        "cust_nation",
        "l_year",
        F.round("volume", 6).alias("volume"),
    ).orderBy("supp_nation", "cust_nation", "l_year")


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       ROUND(CAST(SUM(CAST(ROUND(volume*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0, 6) AS volume
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1.0 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
      OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_2's share of ASIA-customer revenue for
    STANDARD-type parts, per order year — a conditional-numerator /
    total-denominator ratio computed in ONE grouped pass (the CASE-masked
    sum rides the same aggregate as the total, so the 5-table join runs
    once).

    region (5 rows) and nation (25) broadcast; part's type filter prunes
    before its join; the o_orderdate year bound reaches the orders scan.
    The supplier-nation lookup feeds only the numerator mask, not a
    second join tree — the decisive difference from a literal two-query
    translation."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    cn = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
        )
    )
    sn = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    region = F.broadcast(
        _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(region, F.col("cr_key") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
    )
    g = exact_grouped_agg(
        j,
        ["o_year"],
        sums={
            "nation_rev": F.when(
                F.col("supp_nation") == "NATION_2", rev
            ).otherwise(F.lit(0.0)),
            "total_rev": rev,
        },
    )
    return g.select(
        "o_year",
        F.round(F.col("nation_rev") / F.col("total_rev"), 6).alias("mkt_share"),
        F.round("total_rev", 6).alias("total_rev"),
    ).orderBy("o_year")


Q8_SQL = """
WITH j AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1.0 - l_discount) AS rev,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
), g AS (
  SELECT o_year,
         CAST(SUM(CAST(ROUND(CASE WHEN supp_nation = 'NATION_2' THEN rev ELSE 0.0 END * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS nation_rev,
         CAST(SUM(CAST(ROUND(rev*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_rev
  FROM j GROUP BY o_year
)
SELECT o_year, ROUND(nation_rev / total_rev, 6) AS mkt_share,
       ROUND(total_rev, 6) AS total_rev
FROM g ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on *widget* parts by supplier nation and
    order year. The reference schema has no partsupp, so supply cost is
    the deterministic surrogate 0.6·p_retailprice·l_quantity — the plan
    shape (substring part filter, 4-way fact enrichment, two-key
    group-by) is what's under test, and the oracle computes the same
    surrogate.

    p_name LIKE '%widget%' prunes part before its join; profit is
    accumulated as ONE exact scaled-integer sum of the per-row
    difference (not sum-minus-sum, halving the aggregate state); nation
    broadcasts, the fact joins shuffle and AQE picks build sides."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    profit = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            profit.alias("profit"),
        )
    )
    g = exact_grouped_agg(j, ["nation", "o_year"], sums={"sum_profit": F.col("profit")})
    return g.select(
        "nation", "o_year", F.round("sum_profit", 6).alias("sum_profit")
    ).orderBy("nation", F.desc("o_year"))


Q9_SQL = """
SELECT nation, o_year,
       ROUND(CAST(SUM(CAST(ROUND(profit*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0, 6) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1.0 - l_discount) - 0.6 * p_retailprice * l_quantity AS profit
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
)
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp-free adaptation): parts whose shipped
    value from NATION_9 suppliers exceeds 0.1% of that nation's total
    shipped value — a per-group aggregate HAVING-compared against a
    scalar over the SAME aggregate.

    The per-part aggregate is computed ONCE and reused for both sides:
    the global total re-aggregates the tiny per-part frame (|parts| rows,
    not |lineitem|) and comes back as a one-row broadcast-joined scalar
    — the fact table is scanned once, where a literal correlated
    translation would scan twice. Exact decimal partials make the
    0.001·total threshold bit-identical across engines, so the boundary
    part membership can't flap."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = F.broadcast(
        _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
    )
    shipped = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
    )
    per_part = exact_grouped_agg(
        shipped, ["l_partkey"], sums={"value": F.col("l_extendedprice")}
    )
    total = per_part.agg(
        F.sum(F.round(F.col("value") * F.lit(_SCALE)).cast("decimal(38,0)"))
        .cast("double")
        .alias("total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value") * F.lit(_SCALE) > F.lit(0.001) * F.col("total_value"))
        .select(F.col("l_partkey").alias("p_partkey"), F.round("value", 6).alias("value"))
        .orderBy(F.desc("value"), "p_partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_9'
  GROUP BY l_partkey
)
SELECT p_partkey, ROUND(value, 6) AS value
FROM per_part
WHERE value * 1000000.0 > 0.001 * (SELECT CAST(SUM(CAST(ROUND(value*1000000.0) AS DECIMAL(38,0))) AS DOUBLE) FROM per_part)
ORDER BY value DESC, p_partkey
"""


def q12_shipdelay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode-free adaptation): order-priority mix by
    shipping-delay tier for one ship year. The schema has no l_shipmode /
    commit/receipt dates, so the classification column is the derived
    delay datediff(l_shipdate, o_orderdate) bucketed into early / on-time
    (≤90d) / late tiers — same plan shape: fact⋈fact join, derived CASE
    dimension, two CASE-masked counts.

    The ship-year filter prunes the lineitem scan before the orders
    shuffle; the tier expression is pure codegen; counts are exact longs
    so no decimal machinery is needed."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    tier = (
        F.when(delay < 0, "early").when(delay <= 90, "on-time").otherwise("late")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(tier.alias("delay_tier"), urgent.alias("is_urgent"))
        .groupBy("delay_tier")
        .agg(
            F.count(F.when(F.col("is_urgent"), 1)).alias("high_priority_items"),
            F.count(F.when(~F.col("is_urgent"), 1)).alias("low_priority_items"),
        )
        .orderBy("delay_tier")
    )


Q12_SQL = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 0 THEN 'early'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN 'on-time'
            ELSE 'late' END AS delay_tier,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_priority_items,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_priority_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY delay_tier
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the top revenue supplier(s) for one quarter —
    a per-supplier aggregate equi-joined against its own global MAX
    (ties all surface, exactly like the view-based original).

    The revenue "view" is one exact grouped aggregate (|supplier| rows);
    its max re-aggregates that tiny frame and broadcasts back as a
    single-row join — no second fact scan, no global sort. Exact decimal
    revenue makes the max comparison portable (a double-summed max could
    disagree with the oracle on ties in the last bit)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    per_supp = exact_grouped_agg(li, ["l_suppkey"], sums={"total_revenue": rev})
    top = per_supp.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        per_supp.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, per_supp.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 6).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ROUND(total_revenue, 6) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp-free adaptation): how many distinct
    suppliers have shipped each (brand, type, size) combination, for six
    target sizes and excluding one brand — a COUNT(DISTINCT) over a
    three-key group on the part⋈lineitem join.

    Both part filters (size IN-list, brand exclusion) prune the part
    scan before the join. The distinct-agg is Spark's two-phase expand:
    partial distinct on (keys, l_suppkey) map-side, then exact count —
    the group keys bound the output at |brands|·|types|·6 rows
    regardless of fact size."""
    part = _t(spark, sf_dir, "part").where(
        F.col("p_size").isin(1, 5, 10, 15, 20, 25) & (F.col("p_brand") != "Brand#1")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 5, 10, 15, 20, 25) AND p_brand <> 'Brand#1'
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if Brand#3 orders
    below half the part's average quantity were not taken — a correlated
    scalar subquery (per-part avg over the SAME fact) decorrelated into
    aggregate + equi-join.

    The per-part average aggregates only Brand#3 lineitems (the brand
    filter pushes through the join into both branches), produces a
    |parts|-sized frame, and joins back on partkey — two scans of the
    pruned fact slice instead of the naive per-row rescan. l_quantity
    values are integral doubles, so their sum is exact in IEEE double
    and avg = exact_sum/count is bit-identical in both engines — the
    qty < 0.5·avg boundary cannot flap."""
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    li = _t(spark, sf_dir, "lineitem")
    branded = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = branded.groupBy("l_partkey").agg(
        (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty")
    ).select(F.col("l_partkey").alias("ap_key"), "avg_qty")
    return (
        branded.join(avg_qty, branded.l_partkey == F.col("ap_key"))
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            F.round(dsum(F.col("l_extendedprice")) / F.lit(7.0), 6).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q17_SQL = """
WITH branded AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
), avg_qty AS (
  SELECT l_partkey AS ap_key, SUM(l_quantity) / COUNT(l_quantity) AS avg_qty
  FROM branded GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 / 7.0, 6) AS avg_yearly,
       COUNT(*) AS n_items
FROM branded JOIN avg_qty ON l_partkey = ap_key
WHERE l_quantity < 0.5 * avg_qty
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone-prefix-free adaptation): per nation, the
    count and balance of rich-but-dormant customers — above the global
    average positive account balance, with NO order since 1999 — an
    aggregate-scalar filter plus an anti-join against recent orders.

    The average-balance scalar aggregates customer once and broadcasts
    back (one row); the dormancy check is a left-anti hash join on
    custkey against the date-pruned orders slice (the filter reaches the
    orders scan, so the anti-join build side is the small recent subset,
    not all orders). Customers with zero orders ever are dormant by
    definition and survive the anti-join, exactly like Q22's empty-
    subquery semantics. The balance sum is exact decimal."""
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    recent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "1999-01-01"
    ).select("o_custkey")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal")).alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        dormant.join(nation, dormant.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(dsum(F.col("c_acctbal")), 6).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


Q22_SQL = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(ROUND(c_acctbal*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 / COUNT(c_acctbal) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
), rich AS (
  SELECT c_custkey, c_nationkey, c_acctbal
  FROM customer, avg_bal
  WHERE c_acctbal > avg_bal
), dormant AS (
  SELECT * FROM rich
  WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = rich.c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01'
  )
)
SELECT n_name, COUNT(*) AS numcust,
       ROUND(CAST(SUM(CAST(ROUND(c_acctbal*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0, 6) AS totacctbal
FROM dormant JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# CDC / temporal / incremental-maintenance queries (round 6)
# ---------------------------------------------------------------------------


def scd2_customer_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SCD2 history of each customer's order status built from the
    orders change log (``operators.cdc.scd2_build``): consecutive
    versions chained with lead(), same-day collisions resolved by max
    orderkey. One shuffle on the key, no join."""
    from simple_data_workflow_spark.operators.cdc import scd2_build

    o = _t(spark, sf_dir, "orders")
    changes = o.select(
        "o_custkey", "o_orderdate", "o_orderkey",
        F.col("o_orderstatus").alias("status"),
    )
    dim = scd2_build(
        changes, key="o_custkey", ts_col="o_orderdate", tie_break="o_orderkey"
    )
    return (
        dim.where(F.col("o_custkey") < 300)
        .select(
            "o_custkey",
            F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
            F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
            "is_current",
            "status",
        )
        .orderBy("o_custkey", "valid_from")
    )


SCD2_CUSTOMER_STATUS_SQL = """
WITH dedup AS (
  SELECT o_custkey, o_orderdate, o_orderstatus AS status,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
), chained AS (
  SELECT o_custkey, o_orderdate AS vf,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS vt,
         status
  FROM dedup WHERE rn = 1
)
SELECT o_custkey,
       strftime(vf, '%Y-%m-%d') AS valid_from,
       strftime(vt, '%Y-%m-%d') AS valid_to,
       vt IS NULL AS is_current,
       status
FROM chained WHERE o_custkey < 300
ORDER BY o_custkey, valid_from
"""


def temporal_status_of_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each click event picks the user's status
    (last signup/purchase) version valid AT the click's timestamp —
    facts ⋈ SCD2 dim via ``operators.cdc.temporal_join`` (equi-join on
    user with the interval predicate as a residual, no fanout since
    versions are disjoint)."""
    from simple_data_workflow_spark.operators.cdc import scd2_build, temporal_join

    # the user slice is a filter on the JOIN KEY, so it is applied to
    # BOTH inputs before the window/join (Catalyst cannot push a
    # post-join filter through the dim's window by itself)
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") % 5 == 0)
    status_log = ev.where(F.col("event_type").isin("signup", "purchase")).select(
        "user_id", "ts", "event_id", F.col("event_type").alias("status")
    )
    dim = scd2_build(status_log, key="user_id", ts_col="ts", tie_break="event_id")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = temporal_join(clicks, dim, key="user_id", ts_col="ts")
    return (
        joined
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "status",
            F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("status_since"),
        )
        .orderBy("event_id")
    )


TEMPORAL_STATUS_SQL = """
WITH dedup AS (
  SELECT user_id, ts, event_type AS status,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type IN ('signup', 'purchase')
), dim AS (
  SELECT user_id, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
         status
  FROM dedup WHERE rn = 1
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       d.status,
       strftime(d.valid_from, '%Y-%m-%d %H:%M:%S') AS status_since
FROM events e
JOIN dim d ON d.user_id = e.user_id
          AND e.ts >= d.valid_from
          AND (d.valid_to IS NULL OR e.ts < d.valid_to)
WHERE e.event_type = 'click' AND e.user_id % 5 = 0
ORDER BY e.event_id
"""


def incremental_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance
    (``operators.cdc.incremental_agg_apply``): a per-(priority, year)
    SUM/COUNT state built from a base slice of orders is refreshed with
    a synthetic CDC batch (inserts/updates/deletes carved
    deterministically from orderkey residues) WITHOUT re-aggregating
    the base. The oracle recomputes the post-CDC table from scratch —
    equality proves the incremental result matches a full recompute
    exactly (scaled-integer DECIMAL sums on both sides)."""
    from simple_data_workflow_spark.operators.cdc import incremental_agg_apply

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    grp = [
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ]
    scaled = F.round(F.col("o_totalprice") * F.lit(_SCALE)).cast("decimal(38,0)")
    # +100.0 is exact in double arithmetic, so the updated scaled value
    # is exactly old + 100e6 — no cross-engine rounding hazard
    scaled_new = F.round((F.col("o_totalprice") + F.lit(100.0)) * F.lit(_SCALE)).cast(
        "decimal(38,0)"
    )
    base = o.where(k % 10 != 0)
    state = (
        base.select(*grp, scaled.alias("__v"))
        .groupBy("priority", "o_year")
        .agg(F.sum("__v").alias("sum_val"), F.count(F.lit(1)).alias("n_rows"))
    )
    # one scan builds the whole CDC batch (a 3-branch union would scan
    # orders three times); op derives from orderkey residues
    null_dec = F.lit(None).cast("decimal(38,0)")
    op = (
        F.when(k % 10 == 0, F.lit("I"))
        .when(k % 7 == 0, F.lit("U"))
        .when(k % 13 == 0, F.lit("D"))
    )
    cdc = (
        o.select(
            *grp,
            op.alias("op"),
            F.when(op.isin("U", "D"), scaled).otherwise(null_dec).alias("old_val"),
            F.when(op == "I", scaled)
            .when(op == "U", scaled_new)
            .otherwise(null_dec)
            .alias("new_val"),
        )
        .where(F.col("op").isNotNull())
    )
    out = incremental_agg_apply(state, cdc, ["priority", "o_year"])
    return out.select(
        "priority",
        "o_year",
        F.round(F.col("sum_val").cast("double") / F.lit(_SCALE), 6).alias("sum_price"),
        "n_rows",
    ).orderBy("priority", "o_year")


INCREMENTAL_AGG_SQL = """
WITH post AS (
  SELECT o_orderpriority AS priority,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CASE WHEN o_orderkey % 10 <> 0 AND o_orderkey % 7 = 0
              THEN o_totalprice + 100.0 ELSE o_totalprice END AS price
  FROM orders
  WHERE NOT (o_orderkey % 10 <> 0 AND o_orderkey % 7 <> 0 AND o_orderkey % 13 = 0)
)
SELECT priority, o_year,
       ROUND(CAST(SUM(CAST(ROUND(price*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0, 6) AS sum_price,
       COUNT(*) AS n_rows
FROM post
GROUP BY priority, o_year
ORDER BY priority, o_year
"""


def ewma_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-horizon EWMA (8 taps, alpha decay 0.5) of each customer's
    order totals over their order history — a lag-stack window feature,
    one shuffle on the customer key, all codegen. Exact cross-engine:
    taps are integral scaled doubles times powers of two, so every
    partial sum is exact in 53-bit floats and the single final division
    is IEEE-identical in Spark and DuckDB."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    sp = F.round(F.col("o_totalprice") * F.lit(_SCALE))
    num = sp * F.lit(1.0)
    den = F.lit(1.0)
    for i in range(1, 8):
        lv = F.lag(sp, i).over(w)
        wgt = F.lit(0.5 ** i)
        num = num + F.when(lv.isNotNull(), lv * wgt).otherwise(F.lit(0.0))
        den = den + F.when(lv.isNotNull(), wgt).otherwise(F.lit(0.0))
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            F.round(num / den / F.lit(_SCALE), 6).alias("ewma_price"),
        )
        .orderBy("o_orderkey")
    )


EWMA_SQL = """
WITH f AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         ROUND(o_totalprice*1000000.0) AS sp
  FROM orders WHERE o_custkey < 200
), l AS (
  SELECT o_orderkey, o_custkey, o_orderdate, sp,
         LAG(sp, 1) OVER w AS l1, LAG(sp, 2) OVER w AS l2,
         LAG(sp, 3) OVER w AS l3, LAG(sp, 4) OVER w AS l4,
         LAG(sp, 5) OVER w AS l5, LAG(sp, 6) OVER w AS l6,
         LAG(sp, 7) OVER w AS l7
  FROM f
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       ROUND((sp * 1.0
              + (CASE WHEN l1 IS NOT NULL THEN l1 * 0.5 ELSE 0.0 END)
              + (CASE WHEN l2 IS NOT NULL THEN l2 * 0.25 ELSE 0.0 END)
              + (CASE WHEN l3 IS NOT NULL THEN l3 * 0.125 ELSE 0.0 END)
              + (CASE WHEN l4 IS NOT NULL THEN l4 * 0.0625 ELSE 0.0 END)
              + (CASE WHEN l5 IS NOT NULL THEN l5 * 0.03125 ELSE 0.0 END)
              + (CASE WHEN l6 IS NOT NULL THEN l6 * 0.015625 ELSE 0.0 END)
              + (CASE WHEN l7 IS NOT NULL THEN l7 * 0.0078125 ELSE 0.0 END))
             / (1.0
              + (CASE WHEN l1 IS NOT NULL THEN 0.5 ELSE 0.0 END)
              + (CASE WHEN l2 IS NOT NULL THEN 0.25 ELSE 0.0 END)
              + (CASE WHEN l3 IS NOT NULL THEN 0.125 ELSE 0.0 END)
              + (CASE WHEN l4 IS NOT NULL THEN 0.0625 ELSE 0.0 END)
              + (CASE WHEN l5 IS NOT NULL THEN 0.03125 ELSE 0.0 END)
              + (CASE WHEN l6 IS NOT NULL THEN 0.015625 ELSE 0.0 END)
              + (CASE WHEN l7 IS NOT NULL THEN 0.0078125 ELSE 0.0 END))
             / 1000000.0, 6) AS ewma_price
FROM l ORDER BY o_orderkey
"""


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by quantity-weighted median extended price, via the
    GROUPED_AGG pandas-UDAF surface (``functions.aggregates``): JVM
    grouping/shuffle, one Arrow transfer per group, numpy crossing
    search.

    Grouped by ``l_partkey`` deliberately: a GROUPED_AGG UDF
    materializes each group in executor memory, so the registered plan
    must live in the regime the UDAF is designed for — many small
    groups (part count scales with SF, rows-per-part stays ~30-ish
    constant), never a handful of giant ones (a per-returnflag
    grouping would pull ⅓ of lineitem into one pandas group at any
    scale). For giant groups the oracle's window-cumsum formulation is
    the documented rewrite (``tests/test_udaf.py`` pins the two
    equal). Exact and engine-portable for integral weights. Top-k
    output is a partial-ordered take, not a global sort; ties at the
    boundary break on ``l_partkey`` so the selected set is
    deterministic cross-engine."""
    from simple_data_workflow_spark.functions.aggregates import weighted_median_udaf

    li = _t(spark, sf_dir, "lineitem")
    wm = weighted_median_udaf()
    return (
        li.groupBy("l_partkey")
        # the UDAF must be the agg expression itself (a GROUPED_AGG UDF
        # cannot nest inside another expression in agg()); round after
        .agg(wm("l_extendedprice", "l_quantity").alias("__wm"))
        .select("l_partkey", F.round("__wm", 6).alias("w_median_price"))
        .orderBy(F.desc("w_median_price"), F.asc("l_partkey"))
        .limit(20)
    )


WEIGHTED_MEDIAN_SQL = """
WITH cw AS (
  SELECT l_partkey, l_extendedprice AS v,
         SUM(l_quantity) OVER (PARTITION BY l_partkey
                               ORDER BY l_extendedprice, l_orderkey, l_linenumber
                               ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(l_quantity) OVER (PARTITION BY l_partkey) AS tot
  FROM lineitem
)
SELECT l_partkey, ROUND(MIN(v), 6) AS w_median_price
FROM cw WHERE cum >= tot / 2.0
GROUP BY l_partkey
ORDER BY w_median_price DESC, l_partkey ASC
LIMIT 20
"""


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile of the orders table
    (``operators.profiling.profile_columns``): null counts, exact
    cardinalities, engine-portable min/max strings — single aggregate
    scan, plan-side pivot to one row per column."""
    from simple_data_workflow_spark.operators.profiling import profile_columns

    return profile_columns(_t(spark, sf_dir, "orders"))


PROFILE_ORDERS_SQL = """
SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_orderkey) AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
       COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice),
       CAST(ROUND(MIN(o_totalprice), 6) AS VARCHAR),
       CAST(ROUND(MAX(o_totalprice), 6) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
       COUNT(DISTINCT o_orderdate),
       strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
       strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
ORDER BY col_name
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over the event stream: users
    bucketed by the week of their FIRST event (the cohort), counted in
    every later week they were active.

    One shuffle on user_id does all the work: per-user aggregate of
    (first week, set of active weeks) — the week set is bounded by the
    calendar, not event volume, so collect_set is safe — then a
    calendar-sized explode and a count per (cohort, offset). No join
    back to the event stream, no window; at 100 TB the event table is
    scanned once and everything after the first aggregate is
    |users|-sized."""
    ev = _t(spark, sf_dir, "events")
    um = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("w"))
    per_user = um.groupBy("user_id").agg(
        F.min("w").alias("w0"), F.collect_set("w").alias("ws")
    )
    exploded = per_user.select("user_id", "w0", F.explode("ws").alias("w"))
    return (
        exploded.groupBy(
            F.date_format("w0", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("w0")) / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_RETENTION_SQL = """
WITH um AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
), pu AS (
  SELECT user_id, w, MIN(w) OVER (PARTITION BY user_id) AS w0 FROM um
)
SELECT strftime(w0, '%Y-%m-%d') AS cohort_week,
       CAST(datediff('day', w0, w) / 7 AS INT) AS week_offset,
       COUNT(*) AS n_users
FROM pu
GROUP BY 1, 2
ORDER BY 1, 2
"""
