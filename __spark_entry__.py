"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps
operator names → (spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives
the DuckDB twin for every SQL-expressible query.

Cross-engine determinism policy (see plans/relational.py ``dsum``):
exact scaled-integer DECIMAL sums for anything accumulated over many
rows, identical double formulas on both sides, ROUND(x, 6) on float
outputs, unique tie-break keys on every ordering, timestamps emitted
as formatted strings.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_data_workflow_spark.session import tune
from simple_data_workflow_spark.operators.categorical import encode_data, factor_wrangler
from simple_data_workflow_spark.operators.cleaning import replace_na
from simple_data_workflow_spark.operators.na import wrangle_na
from simple_data_workflow_spark.operators.strings import clean_text_col
from simple_data_workflow_spark.operators.transforms import (
    exact_moments,
    exact_moments_multi,
)
from simple_data_workflow_spark.llmdata import curation, dedup, packing, similarity, text
from simple_data_workflow_spark.operators import joins
from simple_data_workflow_spark.plans import relational as rel
from simple_data_workflow_spark.sources.readers import load_table

SF_SMOKE = "/root/testdata/sf0.001"
_SCALE = 1_000_000.0


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dsum_scaled(col) -> F.Column:
    """Engine-portable exact sum (see plans.relational.dsum)."""
    return F.sum(F.round(col * F.lit(_SCALE)).cast("decimal(38,0)")).cast(
        "double"
    ) / F.lit(_SCALE)


# ---------------------------------------------------------------------------
# Reference-operator queries (SURVEY.md §2.1) over the testdata tables
# ---------------------------------------------------------------------------


def flagship_std_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY.md §7.1 M0): derive revenue, Gelman-standardize it
    with exact moments, aggregate per return flag."""
    tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    rev = li.select(
        "l_returnflag",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    n, mu, sd = exact_moments(rev, "rev")
    z = (F.col("rev") - F.lit(mu)) / (F.lit(2.0) * F.lit(sd))
    return (
        rev.select("l_returnflag", z.alias("z"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg("z"), 6).alias("avg_z"),
            F.round(F.min("z"), 6).alias("min_z"),
            F.round(F.max("z"), 6).alias("max_z"),
        )
        .orderBy("l_returnflag")
    )


FLAGSHIP_SQL = """
WITH r AS (
  SELECT l_returnflag, l_extendedprice*(1-l_discount) AS rev FROM lineitem
), s AS (
  SELECT COUNT(rev) AS n,
         CAST(SUM(CAST(ROUND(rev*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS s1,
         CAST(SUM(CAST(ROUND(rev*rev) AS DECIMAL(38,0))) AS DOUBLE) AS s2
  FROM r
), m AS (
  SELECT s1/n AS mu, sqrt((s2 - n*(s1/n)*(s1/n))/(n-1)) AS sd FROM s
)
SELECT l_returnflag, COUNT(*) AS n_items,
       ROUND(AVG((rev - mu)/(2*sd)), 6) AS avg_z,
       ROUND(MIN((rev - mu)/(2*sd)), 6) AS min_z,
       ROUND(MAX((rev - mu)/(2*sd)), 6) AS max_z
FROM r, m
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def gelman_standardize_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row Gelman standardization of quantity + revenue (reference
    gelman_standardize_data semantics, exact-moments variant)."""
    tune(spark)
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    moments = exact_moments_multi(li, ["qty", "rev"])  # one scan, both columns
    (_, mu_q, sd_q), (_, mu_r, sd_r) = moments["qty"], moments["rev"]
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round((F.col("qty") - F.lit(mu_q)) / (F.lit(2.0) * F.lit(sd_q)), 6).alias("z_qty"),
        F.round((F.col("rev") - F.lit(mu_r)) / (F.lit(2.0) * F.lit(sd_r)), 6).alias("z_rev"),
    )


GELMAN_ROWS_SQL = """
WITH base AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         l_quantity AS qty, l_extendedprice*(1-l_discount) AS rev
  FROM lineitem
), mq AS (
  SELECT COUNT(qty) AS n,
         CAST(SUM(CAST(ROUND(qty*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS s1,
         CAST(SUM(CAST(ROUND(qty*qty) AS DECIMAL(38,0))) AS DOUBLE) AS s2
  FROM base
), mr AS (
  SELECT COUNT(rev) AS n,
         CAST(SUM(CAST(ROUND(rev*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS s1,
         CAST(SUM(CAST(ROUND(rev*rev) AS DECIMAL(38,0))) AS DOUBLE) AS s2
  FROM base
)
SELECT l_orderkey, l_linenumber,
       ROUND((qty - mq.s1/mq.n)/(2*sqrt((mq.s2 - mq.n*(mq.s1/mq.n)*(mq.s1/mq.n))/(mq.n-1))), 6) AS z_qty,
       ROUND((rev - mr.s1/mr.n)/(2*sqrt((mr.s2 - mr.n*(mr.s1/mr.n)*(mr.s1/mr.n))/(mr.n-1))), 6) AS z_rev
FROM base, mq, mr
"""


def transform_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elementwise log / arcsinh (reference transform_data semantics)."""
    tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round(F.asinh(F.col("l_quantity")), 6).alias("asinh_qty"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("log_price"),
    )


TRANSFORM_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       ROUND(ln(l_quantity + sqrt(l_quantity*l_quantity + 1)), 6) AS asinh_qty,
       ROUND(ln(l_extendedprice), 6) AS log_price
FROM lineitem
"""


def clean_text_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_text as a column op: trim/collapse-whitespace-to-_/lowercase."""
    tune(spark)
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", clean_text_col(F.col("o_orderpriority")).alias("priority_clean")
    )


CLEAN_TEXT_SQL = r"""
SELECT o_orderkey,
       lower(regexp_replace(regexp_replace(o_orderpriority, '^\s+|\s+$', '', 'g'), ' +', '_', 'g')) AS priority_clean
FROM orders
"""


def replace_na_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentinel→NULL rewrite ('P' treated as missing), then a null-aware
    group count (reference _replace_na semantics)."""
    tune(spark)
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    cleaned = replace_na(o, ["P"], subset=["o_orderstatus"])
    return (
        cleaned.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first())
    )


REPLACE_NA_SQL = """
SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS o_orderstatus,
       COUNT(*) AS n
FROM orders GROUP BY 1 ORDER BY 1 ASC NULLS FIRST
"""


def one_hot_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """encode_data one-hot over a discovered categorical (reference
    get_dummies parity: boolean {col}_{level} columns)."""
    tune(spark)
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    typed, registry = factor_wrangler(cust, str_to_cat=True, dummy_to_bool=False)
    return encode_data(typed, registry).orderBy("c_custkey")


# the five TPC-H segments are the discovered levels at every sf (sorted)
ONE_HOT_SQL = """
SELECT c_custkey,
       c_mktsegment = 'AUTOMOBILE' AS c_mktsegment_AUTOMOBILE,
       c_mktsegment = 'BUILDING'   AS c_mktsegment_BUILDING,
       c_mktsegment = 'FURNITURE'  AS c_mktsegment_FURNITURE,
       c_mktsegment = 'HOUSEHOLD'  AS c_mktsegment_HOUSEHOLD,
       c_mktsegment = 'MACHINERY'  AS c_mktsegment_MACHINERY
FROM customer ORDER BY c_custkey
"""


def ordinal_encode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """encode_data ordinal codes (cat.codes parity: NULL→-1, level order
    = sorted observed levels)."""
    tune(spark)
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    typed, registry = factor_wrangler(
        o, cat_cols=["o_orderpriority"], ordered_cols=["o_orderpriority"], str_to_cat=False
    )
    out = encode_data(typed, registry)
    return out.select(
        "o_orderkey", F.col("o_orderpriority").cast("long").alias("o_orderpriority")
    ).orderBy("o_orderkey")


ORDINAL_SQL = """
SELECT o_orderkey,
       CAST(CASE o_orderpriority
              WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1 WHEN '3-MEDIUM' THEN 2
              WHEN '4-NOT SPECIFIED' THEN 3 WHEN '5-LOW' THEN 4 ELSE -1 END AS BIGINT)
         AS o_orderpriority
FROM orders ORDER BY o_orderkey
"""


def impute_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean imputation (wrangle_na 'fi', float column) with an exact-sum
    fill value; NULLs synthesized deterministically (value < 1)."""
    tune(spark)
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") < 1, F.lit(None)).otherwise(F.col("value")).alias("value"),
    )
    row = ev.agg(
        _dsum_scaled(F.col("value")).alias("s"),
        F.count("value").alias("n"),
    ).first()
    fill = row["s"] / row["n"]
    return ev.select(
        "event_id", F.round(F.coalesce(F.col("value"), F.lit(fill)), 6).alias("value")
    )


IMPUTE_MEAN_SQL = """
WITH t AS (
  SELECT event_id, CASE WHEN value < 1 THEN NULL ELSE value END AS value FROM events
), m AS (
  SELECT CAST(SUM(CAST(ROUND((value)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 / COUNT(value) AS mu FROM t
)
SELECT event_id, ROUND(COALESCE(value, mu), 6) AS value FROM t, m
"""


def impute_median_psize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median imputation (wrangle_na 'fi', int column, exact percentile);
    NULLs synthesized where p_size > 45."""
    tune(spark)
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_size") > 45, F.lit(None)).otherwise(F.col("p_size")).alias("p_size"),
    )
    imputed = wrangle_na(p, strategy="fi", cols=["p_size"])
    return imputed.select("p_partkey", F.col("p_size").cast("long").alias("p_size"))


IMPUTE_MEDIAN_SQL = """
WITH t AS (
  SELECT p_partkey, CASE WHEN p_size > 45 THEN NULL ELSE p_size END AS p_size FROM part
), m AS (SELECT CAST(MEDIAN(p_size) AS BIGINT) AS med FROM t)
SELECT p_partkey, CAST(COALESCE(p_size, med) AS BIGINT) AS p_size FROM t, m
"""


def impute_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode imputation (wrangle_na 'fi', categorical column; pandas
    tie-break = most frequent then smallest value)."""
    tune(spark)
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    return wrangle_na(o, strategy="fi", cols=["o_orderpriority"]).orderBy("o_orderkey")


IMPUTE_MODE_SQL = """
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderpriority END AS o_orderpriority
  FROM orders
), m AS (
  SELECT o_orderpriority AS mode_v FROM t WHERE o_orderpriority IS NOT NULL
  GROUP BY 1 ORDER BY COUNT(*) DESC, 1 ASC LIMIT 1
)
SELECT o_orderkey, COALESCE(o_orderpriority, (SELECT mode_v FROM m)) AS o_orderpriority
FROM t ORDER BY o_orderkey
"""


def ols_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-regressor intercept-free OLS (run_model semantics: y ~ x,
    no constant) via exact-decimal normal equations: beta = Σxy/Σxx,
    se = sqrt(((Σyy − beta·Σxy)/(n−1))/Σxx)."""
    tune(spark)
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )
    row = li.agg(
        F.count(F.lit(1)).alias("n"),
        _dsum_scaled(F.col("x") * F.col("y")).alias("sxy"),
        _dsum_scaled(F.col("x") * F.col("x")).alias("sxx"),
        _dsum_scaled(F.col("y") * F.col("y")).alias("syy"),
    ).first()
    beta = row["sxy"] / row["sxx"]
    se = ((row["syy"] - beta * row["sxy"]) / (row["n"] - 1) / row["sxx"]) ** 0.5
    from simple_data_workflow_spark.smalldf import small_df

    return small_df(
        spark,
        [("l_quantity", round(beta, 6), round(se, 6))],
        "regressor string, estimate double, stderr double",
    )


OLS_SIMPLE_SQL = """
WITH s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(ROUND((l_quantity*l_extendedprice)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS sxy,
         CAST(SUM(CAST(ROUND((l_quantity*l_quantity)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS sxx,
         CAST(SUM(CAST(ROUND((l_extendedprice*l_extendedprice)*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS syy
  FROM lineitem
)
SELECT 'l_quantity' AS regressor,
       ROUND(sxy/sxx, 6) AS estimate,
       ROUND(sqrt((syy - (sxy/sxx)*sxy)/(n-1)/sxx), 6) AS stderr
FROM s
"""


def mice_impute_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MICE multiple imputation (wrangle_na 'mice'): chained-equation
    draws over synthetically-masked quantity/price, stacked (iter, row_id)
    output (reference src/tasks.py:444-473). Iterative + stochastic →
    rows-only check."""
    tune(spark)
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        F.when(F.col("l_linenumber") == 3, F.lit(None))
        .otherwise(F.col("l_quantity"))
        .alias("qty"),
        F.when(F.col("l_discount") > 0.08, F.lit(None))
        .otherwise(F.col("l_extendedprice"))
        .alias("price"),
    )
    return wrangle_na(
        li,
        strategy="mice",
        cols=["qty", "price"],
        n_burnin=2,
        n_imputations=2,
        n_spread=1,
        row_id="rid",
    )


def ols_multivariate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-regressor OLS + 95% CI long frame (run_model +
    plot_confidence_intervals tail). Matrix solve → not SQL-expressible;
    rows-only check."""
    tune(spark)
    from simple_data_workflow_spark.operators.model import confidence_intervals, run_model

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    )
    res = run_model(li, y="price", X=["quantity", "discount", "tax"])
    return confidence_intervals(spark, res)


def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert (operators.cdc.merge_upsert): customers with a
    1999+ order get an 'active' status row upserted over their 'base'
    row — anti-join + union, deterministic last-wins dedup."""
    tune(spark)
    from simple_data_workflow_spark.operators.cdc import merge_upsert

    cust = _t(spark, sf_dir, "customer")
    target = cust.select("c_custkey", F.lit("base").alias("status"))
    updates = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"), F.lit("active").alias("status"))
        .distinct()
    )
    return merge_upsert(target, updates, "c_custkey").orderBy("c_custkey")


MERGE_UPSERT_SQL = """
SELECT c_custkey,
       CASE WHEN EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '1999-01-01')
            THEN 'active' ELSE 'base' END AS status
FROM customer ORDER BY c_custkey
"""


def tablelog_dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native transaction-log table format's file-granular DML
    (``sources.tablelog``), end to end and oracle-checked: commit the
    orders table into a fresh tablelog table (multiple data files),
    run DELETE WHERE then UPDATE SET ... WHERE — each rewriting only
    the data files containing affected rows and committing an atomic
    add/remove delta with write-conflict detection — and read the
    final snapshot back. The oracle is the equivalent pure-SQL
    delete+update pipeline over the same parquet, so a value-hash
    match proves the copy-on-write path loses/duplicates nothing.
    The ``+ 5000.0`` update is an exact IEEE double add, portable
    cross-engine without the decimal trick."""
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_delete_where,
        table_update_where,
        table_read,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-tablelog-") + "/orders_tbl"
    orders = _t(spark, sf_dir, "orders")
    # repartition so the table has several data files and the DML's
    # touched-file probe has something real to prune
    table_commit(orders.repartition(8, "o_orderkey"), path)
    table_delete_where(
        spark, path, "o_orderstatus = 'F' AND o_totalprice < 100000"
    )
    table_update_where(
        spark,
        path,
        {"o_totalprice": "o_totalprice + 5000.0"},
        "o_orderpriority = '1-URGENT'",
    )
    return (
        table_read(spark, path)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            F.round("o_totalprice", 6).alias("total_price"),
        )
        .orderBy("o_orderkey")
    )


TABLELOG_DML_SQL = """
WITH after_delete AS (
  SELECT * FROM orders
  WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000)
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
       ROUND(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN o_totalprice + 5000.0 ELSE o_totalprice END,
             6) AS total_price
FROM after_delete ORDER BY o_orderkey
"""


def tablelog_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping read path of the table format, end to end and
    oracle-checked: commit lineitem into a tablelog table, OPTIMIZE
    ZORDER BY (quantity, price) so per-file stats tighten on both
    columns, then ``table_scan`` with filter tuples — the file list is
    pruned DRIVER-SIDE against the stats recorded in the commit log
    before the scan lists anything (the real formats' data-skipping
    benefit). The oracle is the same filter over raw parquet, so a
    value-hash match proves pruning never changes semantics."""
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_compact,
        table_scan,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-tlscan-") + "/li"
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    table_commit(li.repartition(8), path)
    table_compact(
        spark, path, num_files=16, zorder_by=["l_quantity", "l_extendedprice"]
    )
    scanned = table_scan(
        spark,
        path,
        filters=[("l_quantity", ">=", 30.0), ("l_extendedprice", "<", 20000.0)],
    )
    return (
        scanned.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rel.dsum(F.col("l_extendedprice")).alias("total_price"),
        )
        .orderBy("l_returnflag")
    )


TABLELOG_SCAN_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM lineitem
WHERE l_quantity >= 30.0 AND l_extendedprice < 20000.0
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def tablelog_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized view on the table format
    (``sources.matview.refresh_aggregate_view``), oracle-checked:
    orders land in TWO separate commits with a refresh after each —
    each refresh folds only the new commit via the change feed, with
    the source cursor inside the same atomic log entry (exactly-once)
    — and the final view must value-hash-match the oracle's one-shot
    aggregate over the whole table. Monetary values aggregate as
    integer cents (exact, order-insensitive, engine-portable — no
    float-sum drift through the two-stage fold)."""
    import tempfile

    from simple_data_workflow_spark.sources.matview import refresh_aggregate_view
    from simple_data_workflow_spark.sources.tablelog import table_commit, table_read

    tune(spark)
    d = tempfile.mkdtemp(prefix="sdw-mv-")
    src, view = f"{d}/orders_tbl", f"{d}/orders_by_priority"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    table_commit(orders.where("o_orderkey % 2 = 0"), src)
    refresh_aggregate_view(
        spark, src, view, ["o_orderpriority"],
        sum_cols=["cents"], min_cols=["cents"], max_cols=["cents"],
    )
    table_commit(orders.where("o_orderkey % 2 = 1"), src)
    refresh_aggregate_view(
        spark, src, view, ["o_orderpriority"],
        sum_cols=["cents"], min_cols=["cents"], max_cols=["cents"],
    )
    return (
        table_read(spark, view)
        .select(
            "o_orderpriority",
            F.col("cnt").cast("long").alias("cnt"),
            "sum_cents",
            "min_cents",
            "max_cents",
        )
        .orderBy("o_orderpriority")
    )


TABLELOG_MATVIEW_SQL = """
SELECT o_orderpriority, COUNT(*) AS cnt,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
       MIN(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS min_cents,
       MAX(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS max_cents
FROM orders
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def tablelog_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-column support in the table format (round 8,
    ``sources.tablelog.table_commit(partition_by=...)``): orders commit
    hash-clustered on ``o_orderpriority`` with each file's DISTINCT
    partition values recorded in the commit log; ``table_scan`` with a
    partition-key filter then prunes files by EXACT membership,
    driver-side, before anything is listed — the log-native form of
    hive partition pruning (hash clustering makes min/max ranges
    useless here: most files would span the full lexicographic range).
    The oracle is the same filter+aggregate over raw parquet, so a
    value-hash match proves pruning never changes semantics."""
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_scan,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-tlpart-") + "/orders_part"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"
    )
    table_commit(orders, path, partition_by=["o_orderpriority"])
    scanned = table_scan(
        spark,
        path,
        filters=[("o_orderpriority", "in", ["1-URGENT", "2-HIGH"])],
    )
    return (
        scanned.groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


TABLELOG_PART_SQL = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority, o_orderstatus
ORDER BY o_orderpriority, o_orderstatus
"""


def tablelog_batch_format_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8: the BATCH half of ``format("tablelog")``
    (``streaming/tablelog_source.py:TablelogBatchReader``) —
    ``spark.read.format("tablelog")`` over a committed snapshot with a
    pushed filter: the reader prunes the file list driver-side against
    the commit log's stats (every filter handed back to Spark for
    row-level application) and each row carries its exact per-file
    ``_commit_version``. Orders land in TWO commits; the oracle
    reconstructs the version tag from the same parity split, so a
    value-hash match proves snapshot contents AND provenance."""
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import table_commit
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    tune(spark)
    spark.dataSource.register(TablelogStreamDataSource)
    path = tempfile.mkdtemp(prefix="sdw-tlbatch-") + "/orders_tbl"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    table_commit(orders.where("o_orderkey % 2 = 0").repartition(4), path)
    table_commit(orders.where("o_orderkey % 2 = 1").repartition(4), path)
    snap = (
        spark.read.format("tablelog")
        .option("path", path)
        .load()
        .where("o_totalprice >= 200000.0")  # pushed → driver-side prune
    )
    return (
        snap.groupBy("o_orderstatus", "_commit_version")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus", "_commit_version")
    )


TABLELOG_BATCH_SQL = """
SELECT o_orderstatus, CAST(o_orderkey % 2 AS BIGINT) AS _commit_version,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_totalprice >= 200000.0
GROUP BY o_orderstatus, CAST(o_orderkey % 2 AS BIGINT)
ORDER BY o_orderstatus, _commit_version
"""


def tablelog_clone_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8: SHALLOW CLONE + AS OF TIMESTAMP time travel
    (``sources.tablelog.table_clone`` / ``table_version_at_timestamp``).
    Customers land in two commits; the clone is ONE metadata-only
    commit referencing the source's immutable files (zero bytes
    copied); a file-granular DELETE then diverges the clone
    copy-on-write. The result unions three aggregates — the UNTOUCHED
    source, the diverged clone, and the clone read AS OF its creation
    timestamp (pre-DML) — so a value-hash match proves (a) cloning
    copies nothing yet reads everything, (b) clone DML never leaks
    into the source, and (c) timestamp resolution lands on the right
    version. Mirrors Delta's CLONE + TIMESTAMP AS OF; at 100 TB the
    clone cost stays one JSON write regardless of table size."""
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        table_clone,
        table_commit,
        table_delete_where,
        table_history,
        table_read,
    )

    tune(spark)
    d = tempfile.mkdtemp(prefix="sdw-clone-")
    src, dst = f"{d}/cust", f"{d}/cust_clone"
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    table_commit(cust.where("c_custkey % 2 = 0"), src)
    table_commit(cust.where("c_custkey % 2 = 1"), src)
    table_clone(spark, src, dst)
    table_delete_where(spark, dst, "c_acctbal < 0.0")
    t0 = table_history(spark, dst)[0]["timestamp"]

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                rel.dsum(F.col("c_acctbal")).alias("total_bal"),
            )
            .withColumn("snap", F.lit(tag))
        )

    return (
        agg(table_read(spark, src), "src")
        .unionByName(agg(table_read(spark, dst), "clone"))
        .unionByName(agg(table_read(spark, dst, timestamp=t0), "clone_t0"))
        .select("snap", "c_mktsegment", "n", "total_bal")
        .orderBy("snap", "c_mktsegment")
    )


TABLELOG_CLONE_SQL = """
WITH base AS (SELECT c_mktsegment, c_acctbal FROM customer),
a AS (
  SELECT 'src' AS snap, c_mktsegment, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(c_acctbal*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_bal
  FROM base GROUP BY c_mktsegment
  UNION ALL
  SELECT 'clone', c_mktsegment, COUNT(*),
         CAST(SUM(CAST(ROUND(c_acctbal*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0
  FROM base WHERE c_acctbal >= 0.0 GROUP BY c_mktsegment
  UNION ALL
  SELECT 'clone_t0', c_mktsegment, COUNT(*),
         CAST(SUM(CAST(ROUND(c_acctbal*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0
  FROM base GROUP BY c_mktsegment
)
SELECT snap, c_mktsegment, n, total_bal FROM a ORDER BY snap, c_mktsegment
"""


def tablelog_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 9: WRITE-AUDIT-PUBLISH on the table format
    (``sources.tablelog.table_publish_from`` — Iceberg's WAP pattern).
    Production table = two thirds of orders; the ingest lands on a
    SHALLOW CLONE (one metadata commit), where it is audited away from
    production: the remaining third appended, low-value rows removed
    by a merge-on-read DELETE (position sidecars only). Production
    stays byte-identical through the audit (asserted in-query), then
    ``table_publish_from`` links the stage's immutable files into the
    target and lands ONE conflict-checked overwrite entry — readers
    see nothing or everything. The oracle applies the same append +
    delete over raw parquet, so a value-hash match proves the
    published snapshot is exactly the audited one. At 100 TB: staging
    costs one JSON write, auditing costs the audit, publication costs
    hard links + one JSON write — no data bytes move at any size."""
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        table_clone,
        table_commit,
        table_delete_where,
        table_publish_from,
        table_read,
    )

    tune(spark)
    d = tempfile.mkdtemp(prefix="sdw-wap-")
    src, stage = f"{d}/prod", f"{d}/stage"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    table_commit(orders.where("o_orderkey % 3 != 0"), src)
    n_prod = table_read(spark, src).count()
    table_clone(spark, src, stage)
    table_commit(orders.where("o_orderkey % 3 = 0"), stage)
    table_delete_where(spark, stage, "o_totalprice < 50000.0", mode="mor")
    # the audit never leaks: production is still the pre-stage snapshot
    assert table_read(spark, src).count() == n_prod
    table_publish_from(spark, src, stage)
    return (
        table_read(spark, src)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


TABLELOG_WAP_SQL = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_totalprice >= 50000.0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def tablelog_tag_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 9: TAGS — named version anchors with retention teeth
    (``sources.tablelog.table_tag`` / ``table_read(tag=...)``). The
    pre-1995 orders commit is tagged ``baseline`` (one metadata
    commit); later appends move HEAD but the tag keeps resolving the
    exact tagged snapshot — the "which snapshot was this model trained
    on" answer, pinned by name instead of a copied-around integer.
    The result unions the tag read with the HEAD read; the oracle
    rebuilds both from raw parquet, so a value-hash match proves tag
    resolution lands on the right version. Tags also pin retention:
    ``table_truncate_history`` refuses to cut past one (tested in
    ``tests/test_tablelog.py``)."""
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_read,
        table_tag,
        table_tags,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-tag-") + "/orders_tagged"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    table_commit(orders.where("o_orderdate < DATE'1995-01-01'"), path)
    table_tag(spark, path, "baseline")
    table_commit(orders.where("o_orderdate >= DATE'1995-01-01'"), path)
    assert table_tags(spark, path) == {"baseline": 0}

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                rel.dsum(F.col("o_totalprice")).alias("total_price"),
            )
            .withColumn("snap", F.lit(tag))
        )

    return (
        agg(table_read(spark, path, tag="baseline"), "baseline")
        .unionByName(agg(table_read(spark, path), "head"))
        .select("snap", "o_orderstatus", "n", "total_price")
        .orderBy("snap", "o_orderstatus")
    )


TABLELOG_TAG_SQL = """
SELECT 'baseline' AS snap, o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders WHERE o_orderdate < DATE '1995-01-01'
GROUP BY o_orderstatus
UNION ALL
SELECT 'head', o_orderstatus, COUNT(*),
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0
FROM orders GROUP BY o_orderstatus
ORDER BY snap, o_orderstatus
"""


def tablelog_metadata_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 9: FILES/PARTITIONS metadata tables
    (``sources.tablelog.table_files_df`` / ``table_partitions_df`` —
    Iceberg's ``.files``/``.partitions``, Delta's DESCRIBE DETAIL).
    Everything here is answered from the COMMIT LOG alone — zero data
    files opened: per-commit file and row counts (orders split across
    two 4-file commits), and per-partition-value row counts on a
    per-value-committed table, net of a merge-on-read DELETE's
    deletion-vector counts. The oracle recomputes every number by
    scanning raw parquet, so a value-hash match proves the metadata
    path equals the data path — the property that makes maintenance
    decisions (compaction targeting, DV-purge scheduling, partition
    skew checks) free at 100 TB."""
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_delete_where,
        table_files_df,
        table_partitions_df,
    )

    tune(spark)
    d = tempfile.mkdtemp(prefix="sdw-meta-")
    files_t, parts_t = f"{d}/by_commit", f"{d}/by_value"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    table_commit(orders.where("o_orderkey % 2 = 0").repartition(4), files_t)
    table_commit(orders.where("o_orderkey % 2 = 1").repartition(4), files_t)
    files_part = (
        table_files_df(spark, files_t)
        .groupBy(F.col("commit_version").cast("string").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("rows").alias("n_rows"),
        )
        .withColumn("snap", F.lit("files"))
    )
    # one commit per priority value => single-value files => the
    # partitions table's row counts are provably exact
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    for p in pris:
        table_commit(
            orders.where(F.col("o_orderpriority") == p).coalesce(1),
            parts_t,
            partition_by=["o_orderpriority"],
        )
    # MoR delete: the 5-LOW file gains a deletion vector; the metadata
    # row count nets it out without opening the file
    table_delete_where(
        spark,
        parts_t,
        "o_orderpriority = '5-LOW' AND o_totalprice < 100000.0",
        mode="mor",
    )
    parts_part = (
        table_partitions_df(spark, parts_t)
        .where(F.col("field") == "o_orderpriority")
        .select(
            F.col("value").alias("key"),
            "n_files",
            "n_rows",
        )
        .withColumn("snap", F.lit("parts"))
    )
    return (
        files_part.unionByName(parts_part)
        .select("snap", "key", "n_files", "n_rows")
        .orderBy("snap", "key")
    )


TABLELOG_META_SQL = """
SELECT 'files' AS snap, CAST(o_orderkey % 2 AS VARCHAR) AS key,
       CAST(4 AS BIGINT) AS n_files, COUNT(*) AS n_rows
FROM orders GROUP BY o_orderkey % 2
UNION ALL
SELECT 'parts', o_orderpriority, CAST(1 AS BIGINT), COUNT(*)
FROM orders
WHERE NOT (o_orderpriority = '5-LOW' AND o_totalprice < 100000.0)
GROUP BY o_orderpriority
ORDER BY snap, key
"""


def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-tolerant equi-join (``operators.joins.salted_join``): 70%
    of lineitem rows are collapsed onto ONE synthetic hot key — the
    shape where a plain shuffle join puts most of the table in a
    single task (the classic 100 TB straggler/OOM). ``salted_join``
    spreads each hot left key over ``n_salts`` shuffle partitions and
    replicates the small right side once per salt, so no task holds
    more than ~1/n_salts of the hot key. The oracle runs the PLAIN
    join in SQL — a value-hash match proves salting changes the
    physical distribution and nothing else."""
    tune(spark)
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    left = li.withColumn(
        "jk",
        F.when(F.col("l_partkey") % 10 < 7, F.lit(0)).otherwise(
            F.col("l_partkey")
        ).cast("long"),
    )
    right = left.select("jk").distinct().withColumn(
        "label", F.pmod(F.col("jk"), F.lit(7)).cast("long")
    )
    out = joins.salted_join(left, right, "jk", n_salts=8)
    return (
        out.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rel.dsum(F.col("l_extendedprice")).alias("total_price"),
        )
        .orderBy("label")
    )


SALTED_JOIN_SQL = """
WITH l AS (
  SELECT CASE WHEN l_partkey % 10 < 7 THEN 0 ELSE l_partkey END AS jk,
         l_extendedprice
  FROM lineitem
), r AS (
  SELECT DISTINCT jk, CAST(jk % 7 AS BIGINT) AS label FROM l
)
SELECT label, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM l JOIN r USING (jk)
GROUP BY label ORDER BY label
"""


def tablelog_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8: merge-on-read DELETE via deletion vectors
    (``sources.tablelog.table_delete_where(mode="mor")``). Orders land
    in one multi-file commit; a MoR DELETE then writes ONLY position
    sidecars (``(file, pos)`` parquet) — zero data files rewritten —
    and every read subtracts them with one anti-join on (file
    basename, ``_metadata.row_index``). A second, overlapping MoR
    DELETE proves already-deleted rows are never double-marked. The
    result aggregates the surviving snapshot; the oracle applies the
    same two predicates over raw parquet, so a value-hash match proves
    the vectors subtract exactly the deleted rows and nothing else.
    At 100 TB this is Delta/Iceberg's answer to small deletes against
    huge files: write cost ∝ deleted rows, not touched-file bytes."""
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_delete_where,
        table_read,
        table_row_count,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-mor-") + "/orders_mor"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    table_commit(orders.repartition(8), path)
    table_delete_where(spark, path, "o_totalprice < 50000.0", mode="mor")
    # overlapping second vector: cheap urgent orders are already gone
    table_delete_where(
        spark, path, "o_orderpriority = '1-URGENT' AND o_totalprice < 100000.0",
        mode="mor",
    )
    snap = table_read(spark, path)
    out = (
        snap.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )
    # metadata-only COUNT(*) must agree with the scan — a mismatch
    # means dv_counts drifted from the vectors (fail loudly here
    # rather than hash-mismatching mysteriously)
    assert table_row_count(spark, path) == snap.count()
    return out


TABLELOG_MOR_SQL = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE NOT (o_totalprice < 50000.0)
  AND NOT (o_orderpriority = '1-URGENT' AND o_totalprice < 100000.0)
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def tablelog_mor_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8: the full merge-on-read DML triad —
    ``table_update_where(mode="mor")`` then
    ``table_merge_upsert(mode="mor")``. The UPDATE writes only
    deletion-vector sidecars plus postimage files (credit negative
    balances by 1000); the MERGE then DV-marks colliding customers
    (every ``c_custkey % 10 = 3``, INCLUDING ones whose postimage came
    from the update) and appends the batch — updates plus brand-new
    keys — as new files. NO pre-existing data file is ever rewritten
    (asserted in-query on the data directory listing), and
    metadata-only COUNT(*) must equal the scan after both commits. The
    oracle reconstructs the identical final state in SQL (CASE for the
    update, anti-join + union for the merge), so a value-hash match
    proves vectors + postimages compose exactly across chained MoR
    DML. At 100 TB: an upsert batch scattered across thousands of huge
    files costs KB of sidecars + the batch itself, not a terabyte of
    touched-file rewrites."""
    import os
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_merge_upsert,
        table_read,
        table_row_count,
        table_update_where,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-mordml-") + "/cust_mor"
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    table_commit(cust.repartition(8), path)
    files_before = set(os.listdir(f"{path}/data"))
    table_update_where(
        spark,
        path,
        {"c_acctbal": "c_acctbal + 1000.0"},
        "c_acctbal < 0.0",
        mode="mor",
    )
    batch = cust.where("c_custkey % 10 = 3").select(
        "c_custkey",
        "c_mktsegment",
        F.lit(99999.0).alias("c_acctbal"),
    ).unionByName(
        cust.where("c_custkey % 10 = 7").select(
            (F.col("c_custkey") + F.lit(1000000)).alias("c_custkey"),
            "c_mktsegment",
            F.lit(1.0).alias("c_acctbal"),
        )
    )
    table_merge_upsert(spark, path, batch, "c_custkey", mode="mor")
    # MoR invariant: every pre-DML data file survives byte-identical
    # under its old name — only sidecars and postimages were added
    assert files_before <= set(os.listdir(f"{path}/data"))
    snap = table_read(spark, path)
    out = (
        snap.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rel.dsum(F.col("c_acctbal")).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )
    assert table_row_count(spark, path) == snap.count()
    return out


TABLELOG_MOR_DML_SQL = """
WITH upd AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_acctbal < 0.0 THEN c_acctbal + 1000.0
              ELSE c_acctbal END AS c_acctbal
  FROM customer
), batch AS (
  SELECT c_custkey, c_mktsegment, 99999.0 AS c_acctbal
  FROM customer WHERE c_custkey % 10 = 3
  UNION ALL
  SELECT c_custkey + 1000000 AS c_custkey, c_mktsegment, 1.0 AS c_acctbal
  FROM customer WHERE c_custkey % 10 = 7
), final AS (
  SELECT u.* FROM upd u ANTI JOIN batch b ON u.c_custkey = b.c_custkey
  UNION ALL
  SELECT * FROM batch
)
SELECT c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(c_acctbal*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_bal
FROM final GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def tablelog_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8: per-file BLOOM-FILTER index on the table format
    (``table_commit(bloom_cols=...)``, Delta's BLOOMFILTER INDEX
    shape). Orders commit across 16 RANDOMLY-placed files with a
    high-cardinality ``tag = md5(o_orderkey)`` column indexed: every
    file spans essentially the full hex range, so min/max stats prune
    NOTHING — the per-file bitmaps (auto-sized at ~10 bits per
    observed distinct value, built JVM-side as a ``bit_or`` aggregate
    of MD5 double-hash bit masks) are the only possible skipping
    evidence. ``table_scan`` with an
    IN-list of three tags probes the bitmaps DRIVER-SIDE (hashlib
    reproduces Spark's md5-of-canonical-string bit-for-bit) and the
    query asserts most files were pruned before listing; the oracle
    applies the equivalent key predicate over raw parquet, so a
    value-hash match proves bloom pruning never drops a matching row.
    At 100 TB: a point lookup on a uuid/email column touches a few
    files instead of every footer in the table."""
    import hashlib
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        _bloom_prune,
        _resolve_state,
        _stats_prune,
        table_commit,
        table_scan,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-bloom-") + "/orders_bloom"
    orders = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "md5(CAST(o_orderkey AS STRING)) AS tag",
    )
    table_commit(orders.repartition(16), path, bloom_cols=["tag"])
    tags = [hashlib.md5(str(k).encode()).hexdigest() for k in (1, 5, 7)]
    filt = [("tag", "in", tags)]
    st = _resolve_state(spark, path, None)
    survivors = _bloom_prune(
        st["stats"], _stats_prune(st["stats"], st["files"], filt), filt
    )
    # the pruning claim, asserted in-query AND scale-invariant: the
    # round-9 auto-sizer grows each file's bitmap with its observed
    # distinct count (~10 bits/value), holding per-file FPR near ~1%
    # at ANY sf — 3 values hit ≤3 files and expected false positives
    # stay ≪1 whether files carry 1k or 100k tags (the fixed 8192-bit
    # default saturated at sf0.1: ~9.4k values/file ⇒ FPR ≈ 96%)
    assert len(st["files"]) == 16 and len(survivors) <= 6
    return (
        table_scan(spark, path, filters=filt)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


TABLELOG_BLOOM_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE md5(CAST(o_orderkey AS VARCHAR)) IN (md5('1'), md5('5'), md5('7'))
ORDER BY o_orderkey
"""


def tablelog_hidden_partition_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 9: Iceberg-style HIDDEN PARTITIONING
    (``table_commit(partition_by=["months(o_orderdate)"])``). Orders
    cluster on the TRANSFORMED month value (the log records each
    file's distinct months — no generated column is stored), and the
    query filters the RAW date column: ``table_scan`` derives
    membership/range evidence on the transformed sets and prunes
    driver-side, asserted in-query (the ~84 distinct months spread
    over 32 files ⇒ a 6-month window must keep a small minority).
    The oracle applies the same raw-column filter over plain parquet,
    so a value-hash match proves transform-derived pruning never
    changes semantics — the exact hazard of doing day arithmetic two
    ways (Spark ``datediff``/``month`` vs driver Python)."""
    import datetime
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        _derive_transform_filters,
        _resolve_state,
        _stats_prune,
        table_commit,
        table_scan,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-tlhid-") + "/orders_hidden"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    table_commit(orders, path, partition_by=["months(o_orderdate)"])
    lo = datetime.date(1995, 1, 1)
    hi = datetime.date(1995, 7, 1)
    filt = [("o_orderdate", ">=", lo), ("o_orderdate", "<", hi)]
    st = _resolve_state(spark, path, None)
    derived = _derive_transform_filters(st["partition_by"], filt, {})
    survivors = _stats_prune(st["stats"], st["files"], filt + derived)
    # the pruning claim: ≤6 of ~84 months qualify; with ~3 months per
    # file a correct derivation keeps well under half the files
    assert derived and len(survivors) < len(st["files"]) / 2
    return (
        table_scan(spark, path, filters=filt)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


TABLELOG_HIDDEN_SQL = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-07-01'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def tablelog_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 (VERDICT r9 #10): ALTER COLUMN TYPE WIDEN + MERGE
    SCHEMA EVOLUTION end-to-end on the table format. Builds a table
    with an INT key, widens it to BIGINT metadata-only
    (``table_widen_column`` — zero files rewritten, readers up-cast at
    scan), then MERGEs a batch carrying a NET-NEW column with
    ``evolve_schema=True`` (Delta's withSchemaEvolution): collided
    rows take the batch values, untouched files surface the adopted
    column as NULL, inserts land — one atomic commit. The oracle
    replays the exact final state in SQL (anti-join + union), so the
    value hash pins widen casts, NULL-fill, and merge semantics
    together."""
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_merge_upsert,
        table_read,
        table_widen_column,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-sev-") + "/t"
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    base = orders.where(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").cast("int").alias("k"),
        F.col("o_custkey").cast("long").alias("v"),
    )
    table_commit(base.repartition(4), path)
    table_widen_column(spark, path, "k", "bigint")
    batch = cust.where(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") * 4).cast("bigint").alias("k"),
        (F.col("c_custkey") * 1000).cast("long").alias("v"),
        F.col("c_mktsegment").alias("seg"),
    )
    table_merge_upsert(spark, path, batch, "k", evolve_schema=True)
    out = table_read(spark, path)
    assert out.schema["k"].dataType.simpleString() == "bigint"
    return out.select("k", "v", "seg").orderBy("k")


TABLELOG_SCHEMA_EVOLUTION_SQL = """
WITH base AS (
  SELECT o_orderkey AS k, o_custkey AS v
  FROM orders WHERE o_orderkey % 7 = 0
), batch AS (
  SELECT c_custkey * 4 AS k, c_custkey * 1000 AS v, c_mktsegment AS seg
  FROM customer WHERE c_custkey % 5 = 0
)
SELECT b.k, b.v, CAST(NULL AS VARCHAR) AS seg
FROM base b WHERE b.k NOT IN (SELECT k FROM batch)
UNION ALL
SELECT k, v, seg FROM batch
ORDER BY k
"""


def delta_interop_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10: jar-free DELTA LAKE interop, WRITE half included
    (``sources.delta_writer`` + ``sources.delta_reader``; the public
    delta.io PROTOCOL.md is the only contract). High-value orders are
    written as a NEW spec-conformant Delta table partitioned on
    ``o_orderpriority`` (Hive-style dirs, partition column absent from
    the data files, per-file stats JSON, protocol/metaData/add
    actions); a classic checkpoint is cut (``<v>.checkpoint.parquet``
    + ``_last_checkpoint``); the remaining orders APPEND as version 1
    (snapshot re-resolved from the checkpoint seed). The read side
    goes through the ``lakehouse.read_table`` front door, which falls
    back to pure-Python log replay when the Delta jar is absent and
    injects partition values from the log. The oracle is the same
    aggregate over raw parquet, so a value-hash match pins the whole
    write→log→replay→read loop."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_checkpoint,
        delta_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-delta-") + "/orders_delta"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    delta_write(
        orders.where("o_totalprice > 150000"),
        path,
        mode="error",
        partition_by=["o_orderpriority"],
    )
    delta_checkpoint(spark, path)
    delta_write(orders.where("o_totalprice <= 150000"), path, mode="append")
    got = lakehouse.read_table(spark, "delta", path)
    return (
        got.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


DELTA_INTEROP_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def delta_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10: DELETION-VECTOR application in the jar-free Delta
    reader (``sources.delta_dv`` + ``delta_reader``). Orders land as a
    multi-file Delta table; a merge-on-read DELETE of every
    ``o_orderkey % 10 == 0`` row is then committed the way a Delta
    runtime would — per-file roaring-bitmap position vectors
    (spec-serialized, sidecar ``.bin`` with version byte / BE size /
    CRC-32, uuid-derived Z85 path), remove+add actions carrying the
    descriptors, zero data files rewritten. The reader must mask
    exactly those positions via ``_metadata.row_index``. Oracle =
    the same aggregate over ``orders WHERE o_orderkey % 10 <> 0``, so
    a value-hash match pins serialization, descriptor resolution, and
    positional masking together. The position harvest collects ∝
    deleted rows (the cost class of the DELETE itself)."""
    import json as _json
    import tempfile
    import uuid as _uuid

    from simple_data_workflow_spark.sources import delta_dv as dvmod
    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_writer import delta_write

    tune(spark)
    root = tempfile.mkdtemp(prefix="sdw-dv-") + "/orders_dv"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    delta_write(orders.repartition(4), root, mode="error")
    doomed = (
        spark.read.parquet(f"{root}/*.parquet")
        .where("o_orderkey % 10 = 0")
        .select(
            F.col("_metadata.file_path").alias("fp"),
            F.col("_metadata.row_index").alias("ri"),
        )
        .collect()
    )
    by_file: dict = {}
    for r in doomed:
        by_file.setdefault(r["fp"].split("/")[-1], []).append(r["ri"])
    actions = []
    for fname, positions in sorted(by_file.items()):
        blob = dvmod.dv_serialize(sorted(positions))
        fbytes, spans = dvmod.dv_file_bytes([blob])
        u = _uuid.uuid4()
        with open(f"{root}/deletion_vector_{u}.bin", "wb") as f:
            f.write(fbytes)
        desc = {
            "storageType": "u",
            "pathOrInlineDv": dvmod.z85_encode(u.bytes),
            "offset": spans[0][0],
            "sizeInBytes": spans[0][1],
            "cardinality": len(positions),
        }
        actions.append({"remove": {"path": fname, "deletionTimestamp": 1, "dataChange": True}})
        actions.append(
            {
                "add": {
                    "path": fname,
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                    "deletionVector": desc,
                }
            }
        )
    with open(f"{root}/_delta_log/{1:020d}.json", "w") as f:
        for a in actions:
            f.write(_json.dumps(a) + "\n")
    got = lakehouse.read_table(spark, "delta", root)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


DELTA_DV_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_orderkey % 10 <> 0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_interop_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10: jar-free ICEBERG READ interop
    (``sources.iceberg_reader`` — the public iceberg.apache.org/spec
    is the only contract; Avro manifests are decoded through the
    REFERENCE ``org.apache.avro`` implementation already on Spark's
    classpath). The query builds a spec-conformant two-snapshot table
    in-query — metadata JSON with ``version-hint.text``, an Avro
    manifest LIST per snapshot, Avro manifests whose entries include a
    DELETED-status tombstone that must be excluded — then reads the
    current snapshot through the ``lakehouse.read_table`` front door
    (which falls back to metadata replay when the jar is absent) and
    aggregates. The oracle is the same aggregate over raw parquet, so
    a value-hash match pins manifest-list replay, status filtering,
    and schema mapping end-to-end."""
    import glob as _glob
    import json as _json
    import os as _os
    import shutil as _shutil
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse

    tune(spark)
    root = tempfile.mkdtemp(prefix="sdw-ice-") + "/orders_ice"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def land(df, dest):
        tmp = dest + ".__tmp__"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        _os.makedirs(_os.path.dirname(dest), exist_ok=True)
        _shutil.move(part, dest)
        _shutil.rmtree(tmp)

    land(orders.where("o_orderkey % 2 = 0"), f"{root}/data/even.parquet")
    land(orders.where("o_orderkey % 2 = 1"), f"{root}/data/odd.parquet")
    land(orders.limit(1), f"{root}/data/ghost.parquet")  # DELETED entry

    jvm = spark._jvm
    entry_schema = jvm.org.apache.avro.Schema.Parser().parse(
        _json.dumps(
            {
                "type": "record",
                "name": "manifest_entry",
                "fields": [
                    {"name": "status", "type": "int"},
                    {
                        "name": "data_file",
                        "type": {
                            "type": "record",
                            "name": "r2",
                            "fields": [
                                {"name": "file_path", "type": "string"},
                                {"name": "file_format", "type": "string"},
                                {"name": "record_count", "type": "long"},
                            ],
                        },
                    },
                ],
            }
        )
    )
    list_schema = jvm.org.apache.avro.Schema.Parser().parse(
        _json.dumps(
            {
                "type": "record",
                "name": "manifest_file",
                "fields": [
                    {"name": "manifest_path", "type": "string"},
                    {"name": "manifest_length", "type": "long"},
                ],
            }
        )
    )

    def avro(path, schema, rows):
        w = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
        fw = jvm.org.apache.avro.file.DataFileWriter(w)
        fw.create(schema, jvm.java.io.File(path))
        for r in rows:
            fw.append(r)
        fw.close()

    def entry(p, status=1):
        rec = jvm.org.apache.avro.generic.GenericData.Record(entry_schema)
        d = jvm.org.apache.avro.generic.GenericData.Record(
            entry_schema.getField("data_file").schema()
        )
        d.put("file_path", p)
        d.put("file_format", "PARQUET")
        d.put("record_count", jvm.java.lang.Long(1))
        rec.put("status", status)
        rec.put("data_file", d)
        return rec

    def mf(p):
        rec = jvm.org.apache.avro.generic.GenericData.Record(list_schema)
        rec.put("manifest_path", p)
        rec.put("manifest_length", jvm.java.lang.Long(1))
        return rec

    md = f"{root}/metadata"
    _os.makedirs(md, exist_ok=True)
    avro(f"{md}/m0.avro", entry_schema, [entry(f"{root}/data/even.parquet")])
    avro(
        f"{md}/m1.avro",
        entry_schema,
        [
            entry(f"{root}/data/odd.parquet"),
            entry(f"{root}/data/ghost.parquet", status=2),
        ],
    )
    avro(f"{md}/ml-1.avro", list_schema, [mf(f"{md}/m0.avro")])
    avro(f"{md}/ml-2.avro", list_schema, [mf(f"{md}/m0.avro"), mf(f"{md}/m1.avro")])
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": root,
        "last-column-id": 3,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "o_orderkey", "required": False, "type": "long"},
                    {"id": 2, "name": "o_orderstatus", "required": False, "type": "string"},
                    {"id": 3, "name": "o_totalprice", "required": False, "type": "double"},
                ],
            }
        ],
        "current-schema-id": 0,
        "snapshots": [
            {"snapshot-id": 1, "manifest-list": f"{md}/ml-1.avro"},
            {"snapshot-id": 2, "manifest-list": f"{md}/ml-2.avro"},
        ],
        "current-snapshot-id": 2,
    }
    with open(f"{md}/v1.metadata.json", "w") as f:
        _json.dump(meta, f)
    with open(f"{md}/version-hint.text", "w") as f:
        f.write("1")

    got = lakehouse.read_table(spark, "iceberg", root)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_INTEROP_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 second half: jar-free ICEBERG WRITE interop
    (``sources.iceberg_writer`` — the public iceberg.apache.org/spec is
    the only contract). High-value orders are written as a NEW
    spec-conformant v1 table IDENTITY-PARTITIONED on
    ``o_orderpriority`` (parquet data files with ``PARQUET:field_id``
    footers, Avro manifest + manifest list written through the
    REFERENCE ``org.apache.avro`` implementation, versioned
    ``metadata/v<N>.metadata.json`` + ``version-hint.text``); the
    remaining orders APPEND as a second snapshot whose manifest list
    REUSES the first manifest. The read side goes through the
    ``lakehouse.read_table`` front door (metadata/manifest replay when
    the jar is absent). The oracle is the same aggregate over raw
    parquet, so a value-hash match pins the whole
    write→manifest→replay→read loop."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-iceberg-w-") + "/orders_ice"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    iceberg_write(
        orders.where("o_totalprice > 150000"),
        path,
        mode="error",
        partition_by=["o_orderpriority"],
    )
    iceberg_write(orders.where("o_totalprice <= 150000"), path, mode="append")
    got = lakehouse.read_table(spark, "iceberg", path)
    return (
        got.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


ICEBERG_WRITE_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def delta_idmode_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 second half: Delta COLUMN MAPPING ``id`` MODE read —
    the jar-free reader's last refusal tier, now supported via Spark's
    native parquet field-id resolution (the scan schema carries each
    field's ``delta.columnMapping.id`` as ``parquet.field.id``
    metadata). The in-query fixture is ADVERSARIAL: the data files'
    physical column names are rotated relative to the logical schema
    (physical ``col-2`` holds logical ``o_orderkey`` etc. — ids are
    the only truth), so any by-name resolution reads the wrong column
    and the value-hash catches it. The oracle is the same aggregate
    over raw parquet."""
    import json as _json
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse

    tune(spark)
    root = tempfile.mkdtemp(prefix="sdw-deltaid-") + "/orders_idmap"
    _os.makedirs(root)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    phys = orders.select(
        F.col("o_orderkey").alias("col-2", metadata={"parquet.field.id": 1}),
        F.col("o_totalprice").alias("col-3", metadata={"parquet.field.id": 2}),
        F.col("o_orderstatus").alias("col-1", metadata={"parquet.field.id": 3}),
    )
    phys.coalesce(2).write.mode("overwrite").parquet(f"{root}/.stage")
    adds = []
    for i, f in enumerate(sorted(_glob.glob(f"{root}/.stage/part-*.parquet"))):
        dest = f"{root}/f{i}.parquet"
        _shutil.move(f, dest)
        adds.append(
            {
                "add": {
                    "path": f"f{i}.parquet",
                    "partitionValues": {},
                    "size": _os.path.getsize(dest),
                    "modificationTime": 1,
                    "dataChange": True,
                }
            }
        )
    _shutil.rmtree(f"{root}/.stage")

    def fld(name, typ, fid, physname):
        return {
            "name": name,
            "type": typ,
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": fid,
                "delta.columnMapping.physicalName": physname,
            },
        }

    schema_string = _json.dumps(
        {
            "type": "struct",
            "fields": [
                fld("o_orderkey", "long", 1, "col-2"),
                fld("o_totalprice", "double", 2, "col-3"),
                fld("o_orderstatus", "string", 3, "col-1"),
            ],
        }
    )
    _os.makedirs(f"{root}/_delta_log")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as fh:
        for action in [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "idmode-driver-query",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_string,
                    "partitionColumns": [],
                    "configuration": {"delta.columnMapping.mode": "id"},
                    "createdTime": 1,
                }
            },
            *adds,
        ]:
            fh.write(_json.dumps(action) + "\n")
    got = lakehouse.read_table(spark, "delta", root)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


DELTA_IDMODE_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def delta_dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 second half: jar-free Delta COPY-ON-WRITE DML
    (``delta_writer.delta_delete`` / ``delta_update``): orders land as
    a partitioned Delta table, low-value orders DELETE, one priority
    band's prices UPDATE (×1.1) — each as a spec-conformant remove+add
    commit that rewrites ONLY the affected files — and the result reads
    back through the front-door fallback. The oracle replays the same
    DML as a WHERE + CASE over raw parquet, so the value hash pins the
    whole write→delete→update→replay→read loop."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_update,
        delta_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-deltadml-") + "/orders_dml"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    delta_write(orders, path, mode="error", partition_by=["o_orderstatus"])
    delta_delete(spark, path, "o_totalprice < 50000")
    delta_update(
        spark,
        path,
        {"o_totalprice": "o_totalprice * 1.1"},
        "o_orderpriority = '1-URGENT'",
    )
    got = lakehouse.read_table(spark, "delta", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


DELTA_DML_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(
         (CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 1.1
               ELSE o_totalprice END) * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_totalprice >= 50000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11: jar-free Iceberg v2 row-level DELETE
    (``iceberg_writer.iceberg_delete`` — VERDICT r10 #3): orders land
    as a v2 table (sequence-numbered snapshots), two stacked DELETEs
    publish position-delete snapshots (merge-on-read: the original data
    files never rewrite, delete cost ∝ matching rows), an append lands
    AFTER them, and the result reads back through the front-door
    fallback (position deletes applied as packed masks or a distributed
    anti-join per ``iceberg_reader``). The oracle replays the same edits
    as WHERE + UNION over raw parquet."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-icedml-") + "/orders_icedml"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    iceberg_write(orders, path, mode="error")
    iceberg_delete(spark, path, "o_totalprice < 50000")
    iceberg_delete(spark, path, "o_orderpriority = '5-LOW'")
    iceberg_write(
        orders.where("o_orderkey % 100 = 0").withColumn(
            "o_totalprice", F.col("o_totalprice") + 1.0
        ),
        path,
        mode="append",
    )
    got = lakehouse.read_table(spark, "iceberg", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_DML_SQL = """
WITH kept AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders
  WHERE o_totalprice >= 50000 AND o_orderpriority <> '5-LOW'
  UNION ALL
  SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 100 = 0
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM kept
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_update_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 continuation: jar-free Iceberg v2 UPDATE
    (``iceberg_writer.iceberg_update``) — merge-on-read, the v2 runtime
    shape: ONE snapshot carries a position-delete file (old row
    versions die) AND new data files (updated versions land), so the
    edit is atomic and cost ∝ matching rows with no data-file
    rewrites. Here urgent orders get a 10% surcharge, then a stacked
    DELETE prunes on the UPDATED prices (ordering matters: rows pushed
    over the threshold by the update must survive), and the result
    reads back through the front-door fallback. The oracle replays
    UPDATE as CASE and DELETE as WHERE over raw parquet."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_update,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-iceupd-") + "/orders_iceupd"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    iceberg_write(orders, path, mode="error")
    iceberg_update(
        spark,
        path,
        {"o_totalprice": "o_totalprice * 1.1"},
        "o_orderpriority = '1-URGENT'",
    )
    iceberg_delete(spark, path, "o_totalprice < 100000")
    got = lakehouse.read_table(spark, "iceberg", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_UPDATE_SQL = """
WITH upd AS (
  SELECT o_orderkey,
         CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 1.1
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM upd
WHERE o_totalprice >= 100000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 continuation: jar-free Iceberg v2 MERGE
    (``iceberg_writer.iceberg_merge_upsert`` — delete-insert upsert,
    same deterministic contract as ``delta_merge_upsert``: result =
    target anti-join source ON keys UNION source), published as ONE
    merge-on-read snapshot: a position-delete file kills the matched
    target rows and new data files carry every source row — no
    data-file rewrites, cost ∝ matched + source rows. The table is
    identity-partitioned so updated rows must land under their Hive
    partition directories and record partition values in the
    manifest. The oracle replays the anti-join+union in DuckDB."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_merge_upsert,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-icemrg-") + "/orders_icemrg"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    iceberg_write(orders, path, mode="error", partition_by=["o_orderstatus"])
    src = (
        orders.where("o_orderkey % 7 = 0")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(
            orders.where("o_orderkey % 1000 = 0").withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
            )
        )
    )
    iceberg_merge_upsert(spark, path, src, on=["o_orderkey"])
    got = lakehouse.read_table(spark, "iceberg", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_MERGE_SQL = """
WITH src AS (
  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 1000 = 0
), merged AS (
  SELECT o.o_orderkey, o.o_totalprice, o.o_orderstatus
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = o.o_orderkey)
  UNION ALL
  SELECT * FROM src
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 continuation: Iceberg metadata-only SCHEMA EVOLUTION
    (``iceberg_add_column`` / ``iceberg_rename_column`` /
    ``iceberg_drop_column`` — spec "Schema Evolution"): a column ADDs
    with a fresh field id (pre-evolution files read NULL), the price
    column RENAMEs (the id stays; pre-rename files resolve BY FIELD ID
    — the reader detects the rename from the schema history and
    switches the whole scan to id resolution), an append lands under
    the new name, row-level DML runs against the evolved table, and a
    DROP removes the added column again. Data files never rewrite at
    any step. The oracle replays the same edits relationally."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_add_column,
        iceberg_delete,
        iceberg_drop_column,
        iceberg_rename_column,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-icesev-") + "/orders_icesev"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    iceberg_write(orders.where("o_orderkey % 2 = 0"), path, mode="error")
    iceberg_add_column(spark, path, "o_band", "string")
    iceberg_rename_column(spark, path, "o_totalprice", "price")
    iceberg_write(
        orders.where("o_orderkey % 2 = 1")
        .withColumnRenamed("o_totalprice", "price")
        .withColumn("o_band", F.lit("late")),
        path,
        mode="append",
    )
    iceberg_delete(spark, path, "price < 50000")
    iceberg_drop_column(spark, path, "o_band")
    got = lakehouse.read_table(spark, "iceberg", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("price")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_SCHEMA_EVOLUTION_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_totalprice >= 50000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 continuation: Iceberg COMPACTION
    (``iceberg_writer.iceberg_compact`` — the rewrite-data-files
    maintenance action; Delta has OPTIMIZE, Hudi has MoR compaction):
    after a DELETE publishes position deletes and an UPDATE stacks
    more, compaction rewrites the LIVE view into fresh data files and
    publishes a REPLACE snapshot referencing NO delete files — values
    unchanged, subsequent scans pure parquet. The aggregate reads the
    compacted table; the oracle replays the edits relationally."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_reader import (
        _snapshot_files_and_deletes,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_compact,
        iceberg_delete,
        iceberg_update,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-icecmp-") + "/orders_icecmp"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    iceberg_write(orders, path, mode="error")
    iceberg_delete(spark, path, "o_totalprice < 80000")
    iceberg_update(
        spark, path, {"o_totalprice": "o_totalprice + 7.0"}, "o_orderkey % 3 = 0"
    )
    iceberg_compact(spark, path)
    # the compacted snapshot must carry zero delete files
    _data, dels, _schema = _snapshot_files_and_deletes(spark, path)
    assert not dels, f"compaction left delete files referenced: {dels}"
    got = lakehouse.read_table(spark, "iceberg", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_COMPACT_SQL = """
WITH kept AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 7.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders
  WHERE o_totalprice >= 80000
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM kept
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def delta_dv_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 (VERDICT r10 #6): Delta DELETE via WRITTEN deletion
    vectors (``delta_delete(strategy="dv")``) — merge-on-read: one
    roaring-serialized sidecar marks the matching rows dead, the data
    files stay byte-identical, and the commit upgrades the protocol to
    the deletionVectors feature. A second stacked DV delete merges
    positions, then a copy-on-write UPDATE consumes the DV-masked view
    (the round-11 DML-on-DV lift). Read back through the front-door
    fallback; oracle = the same edits as WHERE + CASE over raw
    parquet."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_update,
        delta_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-deltadvw-") + "/orders_dvw"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    delta_write(orders.repartition(16), path, mode="error")
    delta_delete(spark, path, "o_totalprice < 30000", strategy="dv")
    delta_delete(spark, path, "o_orderpriority = '5-LOW'", strategy="dv")
    # explicitly copy-on-write: this query pins the CoW-consumes-the-
    # DV-masked-view scenario (the MoR update has its own query,
    # delta_dv_dml_roundtrip), and auto's probe would be wasted here
    delta_update(
        spark,
        path,
        {"o_totalprice": "o_totalprice * 2.0"},
        "o_orderpriority = '1-URGENT'",
        strategy="rewrite",
    )
    got = lakehouse.read_table(spark, "delta", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


DELTA_DV_WRITE_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(
         (CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 2.0
               ELSE o_totalprice END) * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_totalprice >= 30000 AND o_orderpriority <> '5-LOW'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def delta_dv_dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 continuation: Delta UPDATE and MERGE as MERGE-ON-READ
    (``delta_update(strategy="dv")`` / ``delta_merge_upsert(
    strategy="dv")`` — the shape real Delta runtimes commit on
    DV-enabled tables): ONE commit deletion-vector-masks the old row
    versions AND appends new files with the updated/source rows, so
    wide sparse edits cost rows instead of rewritten file bytes. The
    UPDATE doubles urgent order prices; the MERGE then re-prices every
    13th order (over the DV-masked view — already-updated rows must
    merge from their UPDATED values) and inserts shifted keys. Read
    back through the front-door fallback; oracle = CASE + anti-join +
    union over raw parquet."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_merge_upsert,
        delta_update,
        delta_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-dvdml-") + "/orders_dvdml"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    delta_write(orders, path, mode="error")
    delta_update(
        spark,
        path,
        {"o_totalprice": "o_totalprice * 2.0"},
        "o_orderpriority = '1-URGENT'",
        strategy="dv",
    )
    upd_view = lakehouse.read_table(spark, "delta", path)
    src = (
        upd_view.where("o_orderkey % 13 = 0")
        .withColumn("o_totalprice", F.col("o_totalprice") + 5.0)
        .unionByName(
            upd_view.where("o_orderkey % 5000 = 0").withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(20_000_000)
            )
        )
    )
    delta_merge_upsert(spark, path, src, on=["o_orderkey"], strategy="dv")
    got = lakehouse.read_table(spark, "delta", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


DELTA_DV_DML_SQL = """
WITH upd AS (
  SELECT o_orderkey,
         CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 2.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders
), src AS (
  SELECT o_orderkey, o_totalprice + 5.0 AS o_totalprice, o_orderstatus
  FROM upd WHERE o_orderkey % 13 = 0
  UNION ALL
  SELECT o_orderkey + 20000000 AS o_orderkey, o_totalprice, o_orderstatus
  FROM upd WHERE o_orderkey % 5000 = 0
), merged AS (
  SELECT u.o_orderkey, u.o_totalprice, u.o_orderstatus
  FROM upd u
  WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = u.o_orderkey)
  UNION ALL
  SELECT * FROM src
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def delta_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 continuation: OPTIMIZE ZORDER + data skipping together
    (``delta_optimize(zorder_by=...)`` then ``delta_read(filters=...)``):
    orders land SCATTERED (hash repartition — no column clusters), the
    Morton-curve rewrite re-clusters on (o_orderkey, o_totalprice), and
    a range filter on EACH clustered column then prunes files via the
    rewritten per-file min/max stats (asserted in-query). The z-order
    commit is dataChange=false; values never change — the oracle is a
    plain WHERE."""
    import tempfile

    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_optimize,
        delta_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-zord-") + "/orders_zord"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    delta_write(orders.repartition(8), path, mode="error")
    delta_optimize(
        spark,
        path,
        small_file_bytes=32 * 1024,  # several z-ordered outputs even at sf0.01
        zorder_by=["o_orderkey", "o_totalprice"],
    )
    n_full = len(delta_read(spark, path).inputFiles())
    # a SELECTIVE box over both clustered dims is the z-curve's home
    # turf: it must hit strictly fewer files than the full scan
    box = [("o_orderkey", "<", 30000), ("o_totalprice", ">", 400000.0)]
    n_box = len(delta_read(spark, path, filters=box).inputFiles())
    assert n_box < n_full, f"zorder gave no pruning ({n_box}/{n_full})"
    flt = delta_read(
        spark, path, filters=[("o_orderkey", "<", 30000)]
    )
    return (
        flt.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


DELTA_ZORDER_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_orderkey < 30000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 continuation: Iceberg WRITE-AUDIT-PUBLISH
    (``iceberg_write(stage_only=True)`` + ``iceberg_cherry_pick``):
    a staged append commits into the log WITHOUT moving
    current-snapshot-id; the audit reads it via snapshot-id time
    travel (in-query assert: the staged rows are invisible to plain
    reads until publish); cherry-pick publishes metadata-only. A
    second BAD batch stays staged forever (never published) — the
    oracle sees base + the one published batch only."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_cherry_pick,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-iwap-") + "/orders_wap"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    iceberg_write(orders.where("o_orderkey % 3 != 0"), path, mode="error")
    good = iceberg_write(
        orders.where("o_orderkey % 3 = 0"), path, mode="append",
        stage_only=True,
    )
    # audit: staged rows invisible until publish
    n_before = lakehouse.read_table(spark, "iceberg", path).count()
    iceberg_cherry_pick(spark, path, good)
    # a bad batch stages and is never published
    iceberg_write(
        orders.withColumn("o_totalprice", F.col("o_totalprice") * -1),
        path,
        mode="append",
        stage_only=True,
    )
    got = lakehouse.read_table(spark, "iceberg", path)
    assert n_before < got.count(), "staged rows leaked before publish"
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_WAP_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def delta_skipping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 continuation: DRIVER-SIDE DATA SKIPPING on the jar-free
    Delta reader (``delta_read(filters=...)``): the log's per-add
    min/max stats and exact partitionValues prove misses, so pruned
    files are never even scheduled — the Delta engine's skipping,
    metadata-sized. Orders land range-clustered by key and partitioned
    by status; the filtered read must (a) scan strictly fewer files
    than the full read (asserted in-query) and (b) equal the oracle's
    plain WHERE."""
    import tempfile

    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import delta_write

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-skip-") + "/orders_skip"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    delta_write(
        orders.repartitionByRange(8, "o_orderkey"),
        path,
        mode="error",
        partition_by=["o_orderstatus"],
    )
    filters = [("o_orderstatus", "==", "F"), ("o_orderkey", "<", 300000)]
    flt = delta_read(spark, path, filters=filters)
    n_full = len(delta_read(spark, path).inputFiles())
    n_flt = len(flt.inputFiles())
    assert n_flt < n_full, f"no files pruned ({n_flt} vs {n_full})"
    return (
        flt.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


DELTA_SKIPPING_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_orderstatus = 'F' AND o_orderkey < 300000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 continuation: Iceberg SCAN PLANNING on the jar-free
    reader (``iceberg_read(filters=...)``): each data file's manifest
    partition record proves identity-partition misses driver-side, so
    pruned files never schedule; a stacked position delete still
    applies on the survivors. In-query assert: fewer files scanned;
    oracle = plain WHERE over raw parquet."""
    import tempfile

    from simple_data_workflow_spark.sources.iceberg_reader import (
        iceberg_read,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-iprn-") + "/orders_iprn"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    iceberg_write(orders, path, mode="error", partition_by=["o_orderstatus"])
    iceberg_delete(spark, path, "o_orderkey % 50 = 1")
    filters = [("o_orderstatus", "in", ["F", "P"])]
    flt = iceberg_read(spark, path, filters=filters)
    n_full = len(iceberg_read(spark, path).inputFiles())
    n_flt = len(flt.inputFiles())
    assert n_flt < n_full, f"no files pruned ({n_flt} vs {n_full})"
    return (
        flt.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_PRUNED_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_orderstatus IN ('F', 'P') AND o_orderkey % 50 <> 1
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def delta_restore_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 continuation: Delta RESTORE TO VERSION
    (``delta_writer.delta_restore``): after a DV DELETE and a CoW
    UPDATE mutate the table, RESTORE flips the file set back to v0 in
    ONE metadata-sized commit (history preserved — the restore is a new
    version), then a fresh DELETE applies to the restored state. The
    oracle sees only the post-restore edit: the restored table IS the
    original orders."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_restore,
        delta_update,
        delta_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-rst-") + "/orders_rst"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    delta_write(orders, path, mode="error")  # v0
    delta_delete(spark, path, "o_totalprice < 120000", strategy="dv")
    delta_update(spark, path, {"o_totalprice": "o_totalprice * 9"}, "o_orderkey % 2 = 0")
    delta_restore(spark, path, 0)  # back to pristine orders
    delta_delete(spark, path, "o_orderkey % 10 = 3")
    got = lakehouse.read_table(spark, "delta", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


DELTA_RESTORE_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_orderkey % 10 <> 3
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_rollback_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 continuation: Iceberg ROLLBACK
    (``iceberg_writer.iceberg_rollback`` — the spec's
    set-current-snapshot, metadata-only): a corrupting append and a
    DELETE land after the good snapshot, rollback moves
    current-snapshot-id back (nothing rewrites; sequence numbers stay
    monotonic), and a post-rollback DELETE edits the restored state.
    The oracle sees the original orders with only the final edit."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_rollback,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-irb-") + "/orders_irb"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    good = iceberg_write(orders, path, mode="error")
    iceberg_write(  # corrupting append: duplicate rows under shifted keys
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(50_000_000)),
        path,
        mode="append",
    )
    iceberg_delete(spark, path, "o_totalprice > 100")  # corrupting delete
    iceberg_rollback(spark, path, good)
    iceberg_delete(spark, path, "o_orderkey % 10 = 7")
    got = lakehouse.read_table(spark, "iceberg", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_ROLLBACK_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_orderkey % 10 <> 7
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def delta_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 second half: jar-free Delta MERGE
    (``delta_writer.delta_merge_upsert`` — delete-insert upsert, the
    deterministic SQL-replayable contract: result = target anti-join
    source ON keys UNION source). The source updates every 7th order
    (price ×2) and inserts shifted new keys; only files containing
    matched keys rewrite, and rewrites + inserts publish as ONE atomic
    commit. The oracle replays the anti-join+union in DuckDB."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_merge_upsert,
        delta_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-deltamrg-") + "/orders_merge"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    delta_write(orders, path, mode="error", partition_by=["o_orderstatus"])
    src = (
        orders.where("o_orderkey % 7 = 0")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(
            orders.where("o_orderkey % 1000 = 0").withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
            )
        )
    )
    delta_merge_upsert(spark, path, src, on=["o_orderkey"])
    got = lakehouse.read_table(spark, "delta", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


DELTA_MERGE_SQL = """
WITH src AS (
  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 1000 = 0
), merged AS (
  SELECT o.o_orderkey, o.o_totalprice, o.o_orderstatus
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = o.o_orderkey)
  UNION ALL
  SELECT * FROM src
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def hudi_interop_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 second half: jar-free HUDI copy-on-write read
    (``sources.hudi_reader`` — the public hudi.apache.org layout spec
    is the only contract). The in-query fixture is ADVERSARIAL the way
    a real upsert history is: the low-key orders land at instant 001
    with CORRUPTED prices (doubled), get REWRITTEN correctly at 002
    (the same file group — copy-on-write), and an INFLIGHT instant 003
    leaves a garbage base file that must never surface. Only the
    latest-committed-slice rule yields the oracle's aggregate over raw
    parquet; reading any extra or stale slice fails the value hash."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse

    tune(spark)
    root = tempfile.mkdtemp(prefix="sdw-hudi-") + "/orders_hudi"
    import glob as _glob
    import os as _os
    import shutil as _shutil

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    low = orders.where("o_orderkey % 2 = 0")
    high = orders.where("o_orderkey % 2 = 1")

    def stage(df, dest):
        tmp = dest + ".__tmp__"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        _os.makedirs(_os.path.dirname(dest), exist_ok=True)
        _shutil.move(part, dest)
        _shutil.rmtree(tmp)

    # instant 001: group A corrupted (doubled prices), group B correct
    stage(
        low.withColumn("o_totalprice", F.col("o_totalprice") * 2),
        f"{root}/fgA_0-1-2_001.parquet",
    )
    stage(high, f"{root}/fgB_0-1-2_001.parquet")
    # instant 002: copy-on-write upsert rewrites group A correctly
    stage(low, f"{root}/fgA_0-3-4_002.parquet")
    # instant 003: INFLIGHT garbage that must not surface
    stage(
        orders.limit(100).withColumn("o_totalprice", F.lit(1e9)),
        f"{root}/fgC_0-5-6_003.parquet",
    )
    _os.makedirs(f"{root}/.hoodie", exist_ok=True)
    with open(f"{root}/.hoodie/hoodie.properties", "w") as fh:
        fh.write(
            "hoodie.table.name=orders_hudi\n"
            "hoodie.table.type=COPY_ON_WRITE\n"
        )
    for name in ("001.commit", "002.commit", "003.commit.inflight"):
        with open(f"{root}/.hoodie/{name}", "w") as fh:
            fh.write("{}")
    got = lakehouse.read_table(spark, "hudi", root)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


HUDI_INTEROP_SQL = DELTA_IDMODE_SQL


def hudi_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 second half: jar-free HUDI copy-on-write WRITE
    (``sources.hudi_writer``): high-value orders create a
    Hive-partitioned CoW table (spec file-group names, ``_hoodie_*``
    meta columns, partition metadata markers, timeline commit as the
    atomic publish point), the rest APPEND as new file groups, and the
    result reads back through the front-door fallback. The oracle is
    the same aggregate over raw parquet — all three lakehouse formats
    now WRITE jar-free too."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.hudi_writer import hudi_write

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-hudi-w-") + "/orders_hudi_w"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    hudi_write(
        orders.where("o_totalprice > 150000"),
        path,
        mode="error",
        record_key="o_orderkey",
        partition_by=["o_orderpriority"],
    )
    hudi_write(
        orders.where("o_totalprice <= 150000"),
        path,
        mode="append",
        record_key="o_orderkey",
    )
    got = lakehouse.read_table(spark, "hudi", path)
    return (
        got.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


HUDI_WRITE_SQL = ICEBERG_WRITE_SQL


def iceberg_pos_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 second half: Iceberg v2 POSITION-DELETE read — the
    reader's biggest refusal tier upgraded to support (mirrors
    ``delta_dv_read``). The fixture writes orders with the jar-free
    writer, then hand-publishes a spec-shaped v2 snapshot whose delete
    manifest points at a position-delete parquet dropping every row
    whose position ≡ 0 (mod 10) per file; the masked read through the
    front door must match the oracle's aggregate over the kept rows.
    Position deletes key by EXACT file path, so the mask is
    per-target-file — the same ``_metadata.row_index`` Arrow mask the
    Delta DV scan uses."""
    import glob as _glob
    import json as _json
    import os as _os
    import tempfile

    import pyarrow.parquet as _pq

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_reader import (
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        _write_avro,
        iceberg_write,
    )

    tune(spark)
    root = tempfile.mkdtemp(prefix="sdw-icepd-") + "/orders_pd"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    # deterministic row positions: ONE file, sorted within it (a global
    # orderBy + coalesce would rely on partition concatenation order)
    iceberg_write(
        orders.repartition(1).sortWithinPartitions("o_orderkey"),
        root,
        mode="error",
    )
    meta = load_table_metadata(spark, root)
    snap0 = meta["snapshots"][0]
    data_file = _glob.glob(f"{root}/data/*.parquet")[0]
    n_rows = _pq.ParquetFile(data_file).metadata.num_rows
    # the delete rows are driver-generated (positions ≡ 0 mod 10), so
    # write the one-file fixture with pyarrow directly: the pickled-list
    # createDataFrame → coalesce(1) → Spark write path costs ~6 s of
    # pure Python-RDD evaluation for 15k rows (guide §4 — don't route
    # driver data through the JVM↔Python boundary); file contents are
    # identical (same two columns, same row order)
    import pyarrow as _pa

    positions = list(range(0, n_rows, 10))
    dpath = f"{root}/data/pos-deletes.parquet"
    _pq.write_table(
        _pa.table(
            {
                "file_path": _pa.array(
                    [data_file] * len(positions), _pa.string()
                ),
                "pos": _pa.array(positions, _pa.int64()),
            }
        ),
        dpath,
        compression="snappy",
    )
    entry_schema = _json.dumps(
        {
            "type": "record",
            "name": "manifest_entry",
            "fields": [
                {"name": "status", "type": "int", "field-id": 0},
                {
                    "name": "data_file",
                    "type": {
                        "type": "record",
                        "name": "r2",
                        "fields": [
                            {"name": "content", "type": "int", "field-id": 134},
                            {"name": "file_path", "type": "string", "field-id": 100},
                            {"name": "file_format", "type": "string", "field-id": 101},
                            {"name": "record_count", "type": "long", "field-id": 103},
                            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                        ],
                    },
                    "field-id": 2,
                },
            ],
        }
    )
    dmanifest = f"{root}/metadata/delete-m0.avro"
    dlen = _write_avro(
        spark,
        dmanifest,
        entry_schema,
        [
            {
                "status": 1,
                "data_file": {
                    "content": 1,
                    "file_path": dpath,
                    "file_format": "PARQUET",
                    "record_count": (n_rows + 9) // 10,
                    "file_size_in_bytes": _os.path.getsize(dpath),
                },
            }
        ],
        meta={"content": "deletes"},
    )
    mlist_schema = _json.dumps(
        {
            "type": "record",
            "name": "manifest_file",
            "fields": [
                {"name": "manifest_path", "type": "string", "field-id": 500},
                {"name": "manifest_length", "type": "long", "field-id": 501},
                {"name": "partition_spec_id", "type": "int", "field-id": 502},
                {"name": "content", "type": "int", "field-id": 517},
            ],
        }
    )
    from simple_data_workflow_spark.sources.iceberg_reader import (
        _avro_records,
        _get,
        _j2py,
    )

    old = list(_avro_records(spark, snap0["manifest-list"]))
    mlist2 = f"{root}/metadata/snap-777-1-pd.avro"
    _write_avro(
        spark,
        mlist2,
        mlist_schema,
        [
            {
                "manifest_path": _j2py(_get(old[0], "manifest_path")),
                "manifest_length": int(_get(old[0], "manifest_length")),
                "partition_spec_id": 0,
                "content": 0,
            },
            {
                "manifest_path": dmanifest,
                "manifest_length": dlen,
                "partition_spec_id": 0,
                "content": 1,
            },
        ],
    )
    meta2 = dict(meta)
    meta2["format-version"] = 2
    meta2["last-sequence-number"] = 2
    meta2["snapshots"] = meta["snapshots"] + [
        {
            "snapshot-id": 777,
            "timestamp-ms": snap0["timestamp-ms"] + 1,
            "summary": {"operation": "delete"},
            "manifest-list": mlist2,
            "schema-id": 0,
        }
    ]
    meta2["current-snapshot-id"] = 777
    with open(f"{root}/metadata/v2.metadata.json", "w") as f:
        _json.dump(meta2, f)
    crc = f"{root}/metadata/.version-hint.text.crc"
    if _os.path.exists(crc):
        _os.remove(crc)
    with open(f"{root}/metadata/version-hint.text", "w") as f:
        f.write("2")
    got = lakehouse.read_table(spark, "iceberg", root)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_POS_DELETE_SQL = """
WITH kept AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS pos
  FROM orders
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM kept
WHERE pos % 10 <> 0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_eq_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11: Iceberg v2 EQUALITY-DELETE read (VERDICT r10 #2 — the
    refusal tier narrowed to v3+ only). The fixture writes orders with
    the jar-free writer (data files at sequence 0), hand-publishes a
    spec-shaped v2 snapshot whose delete manifest carries an equality
    delete at sequence 1 on ``equality_ids=[1]`` (= ``o_orderkey``)
    naming every key divisible by 7, AND a second data file at
    sequence 2 that re-inserts the keys divisible by 14 with doubled
    price — pinning the spec's STRICTLY-smaller sequence rule: the
    re-inserted rows must survive the delete that precedes them.
    Application is a sequence-classed NULL-safe anti-join
    (``iceberg_reader.iceberg_read``) — fully distributed, nothing
    data-sized on the driver."""
    import glob as _glob
    import json as _json
    import os as _os
    import shutil as _shutil
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_reader import (
        _avro_records,
        _get,
        _j2py,
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        _write_avro,
        iceberg_write,
    )

    tune(spark)
    root = tempfile.mkdtemp(prefix="sdw-iceeq-") + "/orders_eq"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    iceberg_write(orders, root, mode="error")
    meta = load_table_metadata(spark, root)
    snap0 = meta["snapshots"][0]

    def _one_file(df, dest):
        tmp = dest + ".__tmp__"
        df.coalesce(1).write.parquet(tmp)
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        _shutil.move(part, dest)
        _shutil.rmtree(tmp)

    # equality-delete file: one column, the equality_ids field values
    epath = f"{root}/data/eq-deletes.parquet"
    _one_file(orders.where("o_orderkey % 7 = 0").select("o_orderkey"), epath)
    # re-insert file at a HIGHER sequence: doubled price for keys % 14
    rpath = f"{root}/data/reinsert.parquet"
    _one_file(
        orders.where("o_orderkey % 14 = 0").withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        ),
        rpath,
    )
    entry_schema = _json.dumps(
        {
            "type": "record",
            "name": "manifest_entry",
            "fields": [
                {"name": "status", "type": "int", "field-id": 0},
                {
                    "name": "data_file",
                    "type": {
                        "type": "record",
                        "name": "r2",
                        "fields": [
                            {"name": "content", "type": "int", "field-id": 134},
                            {"name": "file_path", "type": "string", "field-id": 100},
                            {"name": "file_format", "type": "string", "field-id": 101},
                            {"name": "record_count", "type": "long", "field-id": 103},
                            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                            {
                                "name": "equality_ids",
                                "type": ["null", {"type": "array", "items": "int"}],
                                "default": None,
                                "field-id": 135,
                            },
                        ],
                    },
                    "field-id": 2,
                },
            ],
        }
    )
    dmanifest = f"{root}/metadata/eqdel-m0.avro"
    dlen = _write_avro(
        spark, dmanifest, entry_schema,
        [{"status": 1, "data_file": {
            "content": 2, "file_path": epath, "file_format": "PARQUET",
            "record_count": 1, "file_size_in_bytes": _os.path.getsize(epath),
            "equality_ids": [1]}}],
        meta={"content": "deletes"},
    )
    rmanifest = f"{root}/metadata/reins-m0.avro"
    rlen = _write_avro(
        spark, rmanifest, entry_schema,
        [{"status": 1, "data_file": {
            "content": 0, "file_path": rpath, "file_format": "PARQUET",
            "record_count": 1, "file_size_in_bytes": _os.path.getsize(rpath),
            "equality_ids": None}}],
        meta={"content": "data"},
    )
    mlist_schema = _json.dumps(
        {
            "type": "record",
            "name": "manifest_file",
            "fields": [
                {"name": "manifest_path", "type": "string", "field-id": 500},
                {"name": "manifest_length", "type": "long", "field-id": 501},
                {"name": "partition_spec_id", "type": "int", "field-id": 502},
                {"name": "content", "type": "int", "field-id": 517},
                {"name": "sequence_number", "type": ["null", "long"],
                 "default": None, "field-id": 515},
            ],
        }
    )
    old = list(_avro_records(spark, snap0["manifest-list"]))
    mlist2 = f"{root}/metadata/snap-911-1-eq.avro"
    _write_avro(
        spark, mlist2, mlist_schema,
        [
            {"manifest_path": _j2py(_get(old[0], "manifest_path")),
             "manifest_length": int(_get(old[0], "manifest_length")),
             "partition_spec_id": 0, "content": 0, "sequence_number": 0},
            {"manifest_path": dmanifest, "manifest_length": dlen,
             "partition_spec_id": 0, "content": 1, "sequence_number": 1},
            {"manifest_path": rmanifest, "manifest_length": rlen,
             "partition_spec_id": 0, "content": 0, "sequence_number": 2},
        ],
    )
    meta2 = dict(meta)
    meta2["format-version"] = 2
    meta2["last-sequence-number"] = 2
    meta2["snapshots"] = meta["snapshots"] + [
        {"snapshot-id": 911, "timestamp-ms": snap0["timestamp-ms"] + 1,
         "sequence-number": 2, "summary": {"operation": "overwrite"},
         "manifest-list": mlist2, "schema-id": 0}
    ]
    meta2["current-snapshot-id"] = 911
    with open(f"{root}/metadata/v2.metadata.json", "w") as f:
        _json.dump(meta2, f)
    crc = f"{root}/metadata/.version-hint.text.crc"
    if _os.path.exists(crc):
        _os.remove(crc)
    with open(f"{root}/metadata/version-hint.text", "w") as f:
        f.write("2")
    got = lakehouse.read_table(spark, "iceberg", root)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_EQ_DELETE_SQL = """
WITH kept AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 7 <> 0
  UNION ALL
  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 14 = 0
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM kept
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_eq_delete_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11: equality-delete WRITE
    (``iceberg_writer.iceberg_equality_delete`` — the CDC-writer
    shape: delete cost ∝ key rows, NO table scan). Same edit sequence
    as ``iceberg_eq_delete_read`` but produced entirely by this repo's
    writer instead of a hand-published snapshot: v2 orders, an
    equality delete on keys divisible by 7, then an APPEND re-inserting
    the keys divisible by 14 at doubled price — the re-inserts carry a
    HIGHER sequence number, so the reader's strictly-smaller rule must
    keep them. Same oracle as the read twin."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_equality_delete,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-iceeqw-") + "/orders_eqw"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    iceberg_write(orders, path, mode="error")
    iceberg_equality_delete(
        spark,
        path,
        orders.where("o_orderkey % 7 = 0").select("o_orderkey"),
    )
    iceberg_write(
        orders.where("o_orderkey % 14 = 0").withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        ),
        path,
        mode="append",
    )
    got = lakehouse.read_table(spark, "iceberg", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


def hudi_upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 second half: jar-free Hudi CoW UPSERT
    (``hudi_writer.hudi_upsert`` — delete-insert by record key via ONE
    atomic replacecommit; only matched file groups rewrite). Same
    source shape as ``delta_merge_roundtrip`` (every 7th order updated
    ×2, shifted new keys inserted), same anti-join+union oracle."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.hudi_writer import (
        hudi_upsert,
        hudi_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-hudi-u-") + "/orders_hudi_u"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    hudi_write(
        orders,
        path,
        mode="error",
        record_key="o_orderkey",
        partition_by=["o_orderstatus"],
    )
    src = (
        orders.where("o_orderkey % 7 = 0")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(
            orders.where("o_orderkey % 1000 = 0").withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
            )
        )
    )
    hudi_upsert(spark, path, src)
    got = lakehouse.read_table(spark, "hudi", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


def hudi_mor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 (VERDICT r10 #4): Hudi MERGE-ON-READ end-to-end — the
    read matrix's last refusal lifted. Orders land as an MoR table
    (deltacommit base), a log-file UPSERT updates every 7th key (×2
    price, one spec-shaped Avro data block per file group, written
    executor-side) and inserts shifted keys as new base groups, and a
    log-file DELETE block drops low-price rows. The snapshot read
    merges base + logs per file group entirely on the executors
    (``binaryFile`` scan + the ``sources.hudi_log`` codec, newest
    instant per record key wins) — the oracle replays the same edits
    as CASE + UNION + WHERE over raw parquet."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.hudi_writer import (
        hudi_delta_delete,
        hudi_delta_upsert,
        hudi_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-hudi-mor-") + "/orders_mor"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    hudi_write(
        orders,
        path,
        mode="error",
        record_key="o_orderkey",
        partition_by=["o_orderstatus"],
        table_type="MERGE_ON_READ",
    )
    src = (
        orders.where("o_orderkey % 7 = 0")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(
            orders.where("o_orderkey % 1000 = 0").withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
            )
        )
    )
    hudi_delta_upsert(spark, path, src)
    hudi_delta_delete(spark, path, "o_totalprice < 10000")
    got = lakehouse.read_table(spark, "hudi", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


HUDI_MOR_SQL = """
WITH upserted AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 1000 = 0
), kept AS (
  SELECT * FROM upserted WHERE o_totalprice >= 10000
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM kept
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def delta_stream_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 (VERDICT r10 #7): STREAMING reads of the jar-free Delta
    log (``streaming/delta_source.py``, ``format("deltalog")``).
    Orders land in TWO Delta append commits (parity split); the stream
    replays them with availableNow (batch boundaries == commit
    versions, rows tagged ``_commit_version``) into a parquet sink,
    and the aggregate over the streamed output must match the oracle's
    parity-reconstructed aggregate over raw parquet — pinning both the
    streamed CONTENTS and the per-commit provenance."""
    import tempfile

    from simple_data_workflow_spark.sources.delta_writer import delta_write
    from simple_data_workflow_spark.streaming.delta_source import (
        DeltaLogStreamDataSource,
    )

    tune(spark)
    spark.dataSource.register(DeltaLogStreamDataSource)
    root = tempfile.mkdtemp(prefix="sdw-dstream-")
    path = f"{root}/orders_delta"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    delta_write(orders.where("o_orderkey % 2 = 0"), path, mode="error")
    delta_write(orders.where("o_orderkey % 2 = 1"), path, mode="append")
    out_dir, ckpt = f"{root}/out", f"{root}/ckpt"
    q = (
        spark.readStream.format("deltalog")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = spark.read.parquet(out_dir)
    return (
        streamed.groupBy("o_orderstatus", "_commit_version")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus", "_commit_version")
    )


DELTA_STREAM_SQL = """
SELECT o_orderstatus,
       CAST(o_orderkey % 2 AS BIGINT) AS _commit_version,
       COUNT(*) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
GROUP BY o_orderstatus, o_orderkey % 2
ORDER BY o_orderstatus, _commit_version
"""


def delta_optimize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11: Delta table maintenance end-to-end — a 16-file orders
    table takes a DV DELETE (merge-on-read), OPTIMIZE compacts the
    small files and MATERIALIZES the deletion vectors (masked rows
    rewrite, DVs drop, dataChange=false), VACUUM reaps the
    unreferenced originals + sidecar, and the post-maintenance read
    must still match the oracle's WHERE twin — pinning that compaction
    and GC change bytes, never rows."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_optimize,
        delta_vacuum,
        delta_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-dopt-") + "/orders_opt"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    delta_write(orders.repartition(16), path, mode="error")
    delta_delete(spark, path, "o_totalprice < 40000", strategy="dv")
    delta_optimize(spark, path)
    delta_vacuum(spark, path, retention_hours=0)
    got = lakehouse.read_table(spark, "delta", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


DELTA_OPTIMIZE_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_totalprice >= 40000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def hudi_compact_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11: Hudi MoR COMPACTION end-to-end — the hudi_mor_read
    edit sequence (log upsert + insert, log delete) followed by
    ``hudi_compact``: every logged file group rewrites its MERGED rows
    as a new base slice under a completed commit, after which the
    READ-OPTIMIZED view (base files only — no merge) must equal the
    oracle's replay of the full edit history. Same oracle as
    hudi_mor_read: compaction changes bytes, never rows."""
    import tempfile

    from simple_data_workflow_spark.sources.hudi_reader import hudi_read
    from simple_data_workflow_spark.sources.hudi_writer import (
        hudi_compact,
        hudi_delta_delete,
        hudi_delta_upsert,
        hudi_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-hudi-c-") + "/orders_morc"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    hudi_write(
        orders,
        path,
        mode="error",
        record_key="o_orderkey",
        partition_by=["o_orderstatus"],
        table_type="MERGE_ON_READ",
    )
    src = (
        orders.where("o_orderkey % 7 = 0")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(
            orders.where("o_orderkey % 1000 = 0").withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
            )
        )
    )
    hudi_delta_upsert(spark, path, src)
    hudi_delta_delete(spark, path, "o_totalprice < 10000")
    hudi_compact(spark, path)
    # read-optimized: base files only — compaction must have folded
    # every log edit into the new base slices
    got = hudi_read(spark, path, query_type="read_optimized")
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


def iceberg_stream_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11: STREAMING reads of jar-free Iceberg v2 tables
    (``streaming/iceberg_source.py``, ``format("iceberglog")`` —
    sequence numbers as offsets, manifests decoded by the pure-Python
    Avro OCF reader cross-pinned against the reference Java
    implementation). Orders land in TWO append snapshots (parity
    split); the stream replays them with availableNow into a parquet
    sink, rows tagged ``_snapshot_id``; the oracle reconstructs the
    per-snapshot provenance from the same parity split (snapshot ids
    are random, so the tag maps to the parity via MIN(o_orderkey)
    ordering)."""
    import tempfile

    from pyspark.sql import functions as _F

    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_write,
    )
    from simple_data_workflow_spark.streaming.iceberg_source import (
        IcebergLogStreamDataSource,
    )

    tune(spark)
    spark.dataSource.register(IcebergLogStreamDataSource)
    root = tempfile.mkdtemp(prefix="sdw-istream-")
    path = f"{root}/orders_ice"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    iceberg_write(orders.where("o_orderkey % 2 = 0"), path, mode="error")
    iceberg_write(orders.where("o_orderkey % 2 = 1"), path, mode="append")
    out_dir, ckpt = f"{root}/out", f"{root}/ckpt"
    q = (
        spark.readStream.format("iceberglog")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = spark.read.parquet(out_dir)
    # snapshot ids are random — normalize to a stable 0/1 batch ordinal
    # via each snapshot's key parity (even batch first)
    ordinal = streamed.withColumn(
        "_batch", (F.col("o_orderkey") % 2).cast("long")
    )
    return (
        ordinal.groupBy("o_orderstatus", "_batch")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus", "_batch")
    )


ICEBERG_STREAM_SQL = """
SELECT o_orderstatus,
       CAST(o_orderkey % 2 AS BIGINT) AS _batch,
       COUNT(*) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
GROUP BY o_orderstatus, o_orderkey % 2
ORDER BY o_orderstatus, _batch
"""


def hudi_stream_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11: STREAMING reads of jar-free Hudi tables
    (``streaming/hudi_source.py``, ``format("hudilog")`` — completed
    timeline instants as offsets, Hudi's own incremental-query
    cursor). Orders land in TWO commits (parity split); the
    change-feed stream replays them with availableNow (rows tagged
    ``_instant`` + ``_change_type``); the oracle reconstructs the
    per-commit provenance from the same parity split."""
    import tempfile

    from simple_data_workflow_spark.sources.hudi_writer import hudi_write
    from simple_data_workflow_spark.streaming.hudi_source import (
        HudiLogStreamDataSource,
    )

    tune(spark)
    spark.dataSource.register(HudiLogStreamDataSource)
    root = tempfile.mkdtemp(prefix="sdw-hstream-")
    path = f"{root}/orders_hudi"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    hudi_write(
        orders.where("o_orderkey % 2 = 0"), path,
        mode="error", record_key="o_orderkey",
    )
    hudi_write(
        orders.where("o_orderkey % 2 = 1"), path,
        mode="append", record_key="o_orderkey",
    )
    out_dir, ckpt = f"{root}/out", f"{root}/ckpt"
    q = (
        spark.readStream.format("hudilog")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = spark.read.parquet(out_dir)
    # instants are wall-clock — normalize to the stable 0/1 parity
    ordinal = streamed.where("_change_type = 'insert'").withColumn(
        "_batch", (F.col("o_orderkey") % 2).cast("long")
    )
    return (
        ordinal.groupBy("o_orderstatus", "_batch")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus", "_batch")
    )


def hudi_1x_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12 (VERDICT r11 #5): Hudi 1.x (table version 8) reads —
    the timeline moves to ``.hoodie/timeline/`` with
    ``<requested>_<completion>.<action>`` names, and MoR DELETE blocks
    carry KRYO-serialized payloads in BOTH runtime shapes:
    ``HoodieKey[]`` (0.x/1.x writers) and — round 13, VERDICT r12 #10 —
    ``DeleteRecord[]`` with nested HoodieKey + orderingValue, the 1.x
    STOCK payload-class shape (OverwriteWithLatestAvroPayload /
    DefaultHoodieRecordPayload: both latest-wins, so the key set IS
    the delete). The fixture builds a MERGE_ON_READ orders table,
    upserts one band, appends one delete block of EACH payload shape,
    converts the whole timeline to the 1.x layout in place, and reads
    the merged snapshot back. The oracle replays upsert + delete as
    CASE + WHERE over raw parquet."""
    import os as _os
    import re as _re
    import shutil as _shutil
    import tempfile

    from simple_data_workflow_spark.sources import hudi_log as hlog
    from simple_data_workflow_spark.sources.hudi_reader import (
        _resolve_groups,
        hudi_read,
    )
    from simple_data_workflow_spark.sources.hudi_writer import (
        hudi_delta_upsert,
        hudi_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-h1x-") + "/orders_h1x"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    hudi_write(
        orders,
        path,
        mode="error",
        record_key="o_orderkey",
        table_type="MERGE_ON_READ",
    )
    t1 = hudi_delta_upsert(
        spark,
        path,
        orders.where("o_orderkey % 50 = 0").withColumn(
            "o_totalprice", F.col("o_totalprice") + 1.0
        ),
    )
    # a runtime-writer-shaped KRYO delete block per file group
    del_keys = sorted(
        str(r["o_orderkey"])
        for r in orders.where("o_orderkey % 97 = 0")
        .select("o_orderkey")
        .collect()
    )  # metadata-sized: ~1% of the keys
    groups, logs, _c, _r = _resolve_groups(spark, path)
    inst2 = str(int(t1) + 1)
    half = len(del_keys) // 2
    for (part, fid), (binst, base) in groups.items():
        vers = [v for v, _p in logs.get((part, fid), [])]
        nxt = (max(vers) + 1) if vers else 1
        # one block per payload shape: HoodieKey[] (0.x/1.x runtime
        # writers) AND DeleteRecord[] (1.x STOCK payload classes —
        # round 13, VERDICT r12 #10)
        blk = hlog.encode_block(
            hlog.DELETE_BLOCK,
            {hlog.INSTANT_TIME: inst2},
            hlog.encode_kryo_delete_payload(
                [(part, k) for k in del_keys[:half]]
            ),
        )
        with open(
            f"{_os.path.dirname(base)}/.{fid}_{binst}.log.{nxt}_0-1-1", "wb"
        ) as f:
            f.write(blk)
        blk2 = hlog.encode_block(
            hlog.DELETE_BLOCK,
            {hlog.INSTANT_TIME: inst2},
            hlog.encode_kryo_delete_records(
                [(part, k) for k in del_keys[half:]],
                ordering=[str(i) for i in range(len(del_keys) - half)],
            ),
        )
        with open(
            f"{_os.path.dirname(base)}/.{fid}_{binst}.log.{nxt + 1}_0-1-1",
            "wb",
        ) as f:
            f.write(blk2)
    # publish the delete + convert the timeline to the 1.x layout
    hd = f"{path}/.hoodie"
    _os.makedirs(f"{hd}/timeline", exist_ok=True)
    with open(
        f"{hd}/timeline/{inst2}_{int(inst2) + 1}.deltacommit", "w"
    ) as f:
        f.write("{}")
    moved = 0
    for n in sorted(_os.listdir(hd)):
        m = _re.match(r"^(\d+)\.(commit|deltacommit|replacecommit)$", n)
        if m:
            _shutil.move(
                f"{hd}/{n}",
                f"{hd}/timeline/{m.group(1)}_{int(m.group(1)) + 1}"
                f".{m.group(2)}",
            )
            moved += 1
    assert moved >= 2, "fixture must exercise the 1.x timeline layout"
    crc = f"{hd}/.hoodie.properties.crc"
    if _os.path.exists(crc):
        _os.remove(crc)
    with open(f"{hd}/hoodie.properties", "a") as f:
        f.write("hoodie.table.version=8\n")
    got = hudi_read(spark, path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


HUDI_1X_SQL = """
WITH kept AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 50 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE o_orderkey % 97 <> 0
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM kept
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_spec_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12 continuation: Iceberg PARTITION EVOLUTION end-to-end —
    orders land partitioned by o_orderstatus (spec 0), the default
    spec evolves to o_orderpriority (metadata-only, NO data rewrites —
    asserted in-query by file-count identity), a second wave appends
    under the NEW layout, and a DELETE spans both layouts. Reads prune
    by whichever spec each file carries (old-spec files are
    conservatively scanned for new-spec predicates and vice versa).
    The oracle twin replays wave + delete arithmetic over raw
    parquet."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_reader import (
        iceberg_files_table,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_update_spec,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-icespec-") + "/orders_spec"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    iceberg_write(
        orders.where("o_orderkey % 2 = 0"),
        path,
        mode="error",
        partition_by=["o_orderstatus"],
    )
    files_before = iceberg_files_table(spark, path).count()
    new_spec = iceberg_update_spec(spark, path, ["o_orderpriority"])
    assert new_spec == 1
    files_after = iceberg_files_table(spark, path).count()
    assert files_after == files_before, "spec evolution rewrote data files"

    iceberg_write(orders.where("o_orderkey % 2 = 1"), path, mode="append")
    iceberg_delete(spark, path, "o_totalprice < 15000")
    got = lakehouse.read_table(spark, "iceberg", path)
    return (
        got.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


ICEBERG_SPEC_EVOLUTION_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_totalprice >= 15000
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
"""


def delta_column_ddl_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12 continuation: Delta column-mapping DDL end-to-end —
    orders upgrade to name-mode mapping (physicalName = the current
    name, so pre-upgrade files keep reading), RENAME COLUMN moves the
    logical name metadata-only, ADD COLUMN appends a NULL-reading
    field, a post-rename APPEND stages under PHYSICAL names (the gap
    this query pinned: un-physicalized appends silently mis-read), and
    a DELETE runs across pre- and post-rename files. The oracle twin
    replays the same arithmetic under the NEW names."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_add_column,
        delta_delete,
        delta_enable_column_mapping,
        delta_rename_column,
        delta_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-dddl-") + "/orders_ddl"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    delta_write(orders.where("o_orderkey % 2 = 0"), path, mode="error")
    delta_enable_column_mapping(spark, path)
    delta_rename_column(spark, path, "o_totalprice", "price")
    delta_add_column(spark, path, "note", "string")
    delta_write(
        orders.where("o_orderkey % 2 = 1").select(
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            "o_orderstatus",
            F.lit("late").alias("note"),
        ),
        path,
        mode="append",
    )
    delta_delete(spark, path, "price < 10000")
    got = lakehouse.read_table(spark, "delta", path)
    return (
        got.groupBy("o_orderstatus", "note")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("price")).alias("total_price"),
        )
        .orderBy("o_orderstatus", "note")
    )


DELTA_COLUMN_DDL_SQL = """
WITH kept AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice AS price,
         CASE WHEN o_orderkey % 2 = 1 THEN 'late' END AS note
  FROM orders
  WHERE o_totalprice >= 10000
)
SELECT o_orderstatus, note, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(price*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM kept
GROUP BY o_orderstatus, note
ORDER BY o_orderstatus, note
"""


def iceberg_orc_mixed_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 13 (VERDICT r12 #7): a MIXED parquet + ORC Iceberg v2
    table — even-key orders land as the writer's parquet files, odd-key
    orders as an ORC data file published through the same DML snapshot
    machinery (manifest entry ``file_format: ORC``), then an EQUALITY
    DELETE (applies across both formats by the strictly-smaller
    sequence rule) removes low-priced orders. The read must route each
    file to the right Spark scan and match the plain relational
    oracle."""
    import glob as _glob
    import os as _os
    import tempfile

    from simple_data_workflow_spark.sources.iceberg_reader import (
        iceberg_read,
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        _publish_dml_snapshot,
        iceberg_equality_delete,
        iceberg_write,
    )

    tune(spark)
    base = tempfile.mkdtemp(prefix="sdw-orcmix-")
    path = base + "/orders_orcmix"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    iceberg_write(
        orders.where("o_orderkey % 2 = 0").repartition(4), path, mode="error"
    )
    orc_dir = base + "/orc_stage"
    orders.where("o_orderkey % 2 = 1").coalesce(2).write.orc(orc_dir)
    meta = load_table_metadata(spark, path)
    staged = [
        {
            "path": p,
            "record_count": 0,  # informational here; scan reads the file
            "size": _os.path.getsize(p),
            "partition_values": {},
            "file_format": "ORC",
        }
        for p in sorted(_glob.glob(f"{orc_dir}/part-*.orc"))
    ]
    _publish_dml_snapshot(spark, path, meta, staged, [], "append", [])
    iceberg_equality_delete(
        spark,
        path,
        orders.where("o_totalprice < 5000").select("o_orderkey"),
    )
    got = iceberg_read(spark, path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_ORC_MIXED_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_totalprice >= 5000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_v3_native_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 13 (VERDICT r12 #4): NATIVE format-version 3 — the table
    CREATES at v3 (no upgrade hop; ``next-row-id`` seeds at 0 and
    row-lineage ``first-row-id`` stamps every snapshot), a column with
    a v3 DEFAULT is added (pre-existing rows read ``initial-default``,
    not NULL), new rows append carrying the column explicitly, and a
    deletion-vector DELETE (v3's mandated row-delete form) prunes
    cheap orders. In-query invariants: format-version == 3 and
    next-row-id equals the total rows ever added. The oracle replays
    the default/append/delete arithmetic exactly."""
    import tempfile

    from simple_data_workflow_spark.sources.iceberg_reader import (
        iceberg_read,
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_add_column,
        iceberg_dv_delete,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-v3n-") + "/orders_v3n"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    n_even = orders.where("o_orderkey % 2 = 0").count()
    n_odd = orders.where("o_orderkey % 2 = 1").count()
    iceberg_write(
        orders.where("o_orderkey % 2 = 0").repartition(4),
        path,
        mode="error",
        format_version=3,
    )
    iceberg_add_column(spark, path, "band", "string", default="legacy")
    iceberg_write(
        orders.where("o_orderkey % 2 = 1").select(
            "o_orderkey",
            "o_totalprice",
            "o_orderstatus",
            F.lit("new").alias("band"),
        ),
        path,
        mode="append",
    )
    iceberg_dv_delete(spark, path, "o_totalprice < 5000")
    meta = load_table_metadata(spark, path)
    assert int(meta["format-version"]) == 3, meta["format-version"]
    assert int(meta.get("next-row-id", -1)) == n_even + n_odd, (
        meta.get("next-row-id"),
        n_even + n_odd,
    )
    got = iceberg_read(spark, path)
    return (
        got.groupBy("o_orderstatus", "band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus", "band")
    )


ICEBERG_V3_NATIVE_SQL = """
WITH t AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus,
         CASE WHEN o_orderkey % 2 = 0 THEN 'legacy' ELSE 'new' END AS band
  FROM orders
  WHERE o_totalprice >= 5000
)
SELECT o_orderstatus, band, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM t
GROUP BY o_orderstatus, band
ORDER BY o_orderstatus, band
"""


def delta_mapped_cdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 13 (VERDICT r12 #3): CHANGE DATA FEED x COLUMN MAPPING —
    orders upgrade to name-mode mapping, RENAME COLUMN moves
    ``o_totalprice`` to ``price`` metadata-only, CDF enables, then a
    DELETE and an UPDATE run against the MAPPED table (change files
    store physical column names exactly like data files), and an
    OPTIMIZE compacts the mapped table (round-13 capability;
    ``dataChange=false``, so it must contribute ZERO change rows).
    ``table_changes`` reads the whole DML range back under the
    post-rename logical names; the oracle replays the same
    insert/update/delete arithmetic."""
    import tempfile

    from simple_data_workflow_spark.sources.delta_reader import (
        delta_table_changes,
    )
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_enable_column_mapping,
        delta_optimize,
        delta_rename_column,
        delta_set_properties,
        delta_update,
        delta_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-mcdf-") + "/orders_mcdf"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    delta_write(orders.repartition(4), path, mode="error")        # v0
    delta_enable_column_mapping(spark, path)                      # v1
    delta_rename_column(spark, path, "o_totalprice", "price")     # v2
    delta_set_properties(
        spark, path, {"delta.enableChangeDataFeed": "true"}
    )                                                             # v3
    delta_delete(spark, path, "price < 5000")                     # v4
    delta_update(
        spark,
        path,
        {"price": "price * 2.0"},
        "o_orderstatus = 'F' AND price >= 200000",
    )                                                             # v5
    v_opt = delta_optimize(spark, path, small_file_bytes=256 * 1024 * 1024)
    ch = delta_table_changes(spark, path, starting_version=4)
    if v_opt is not None:
        # OPTIMIZE republishes bytes with dataChange=false — the CDF
        # range must carry no rewrite noise
        n_opt = ch.where(F.col("_commit_version") == v_opt).count()
        assert n_opt == 0, f"OPTIMIZE leaked {n_opt} change rows"
    return (
        ch.groupBy("_change_type", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("price")).alias("total_price"),
        )
        .orderBy("_change_type", "o_orderstatus")
    )


DELTA_MAPPED_CDF_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice AS price FROM orders
),
changes AS (
  SELECT 'delete' AS _change_type, o_orderstatus, o_orderkey, price
  FROM base WHERE price < 5000
  UNION ALL
  SELECT 'update_preimage', o_orderstatus, o_orderkey, price
  FROM base WHERE o_orderstatus = 'F' AND price >= 200000
  UNION ALL
  SELECT 'update_postimage', o_orderstatus, o_orderkey, price * 2.0
  FROM base WHERE o_orderstatus = 'F' AND price >= 200000
)
SELECT _change_type, o_orderstatus, COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(price*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM changes
GROUP BY _change_type, o_orderstatus
ORDER BY _change_type, o_orderstatus
"""


def hudi_cluster_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12 continuation: Hudi sort-based CLUSTERING — orders land
    as 16 scattered file groups, one ``replacecommit`` rewrites them
    range-partitioned + sorted by ``o_totalprice`` (the only global
    movement is the range shuffle), and the read must match the plain
    aggregate oracle. In-query asserts: clustering produced NO record
    versions (the incremental query over the clustering commit is
    empty — record commit times carry over) and the pre-cluster
    snapshot still time-travels. The layout payoff (disjoint per-file
    value ranges → row-group skipping for range predicates) is pinned
    by the unit test's footer check."""
    import tempfile

    from simple_data_workflow_spark.sources.hudi_reader import (
        hudi_read,
        hudi_table_changes,
    )
    from simple_data_workflow_spark.sources.hudi_writer import (
        hudi_cluster,
        hudi_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-hclu-") + "/orders_clu"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    t1 = hudi_write(
        orders.repartition(16), path, mode="error", record_key="o_orderkey"
    )
    t2 = hudi_cluster(spark, path, sort_by=["o_totalprice"])
    n_inc = hudi_table_changes(spark, path, t1, t2).count()
    assert n_inc == 0, f"clustering re-emitted {n_inc} record versions"
    n_pre = hudi_read(spark, path, as_of=t1).count()
    got = hudi_read(spark, path)
    assert got.count() == n_pre, "clustering changed the row count"
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


HUDI_CLUSTER_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def delta_v2_checkpoint_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12 continuation: V2 CHECKPOINTS end-to-end — orders take a
    deletion-vector DELETE (feature-carrying protocol), a V2 checkpoint
    cuts (manifest + ``_delta_log/_sidecars/`` sidecar, protocol
    upgraded with the ``v2Checkpoint`` reader feature), every
    pre-checkpoint JSON commit is DELETED (the manifest is the only
    source of truth left — asserted in-query), a post-checkpoint append
    lands, and the read must still match the oracle's WHERE twin —
    pinning manifest+sidecar replay, DV survival through the
    checkpoint, and checkpoint-seeded appends."""
    import glob as _glob
    import os as _os
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_checkpoint,
        delta_delete,
        delta_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-dv2cp-") + "/orders_v2cp"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    delta_write(
        orders.where("o_orderkey % 3 != 2").repartition(8), path, mode="error"
    )
    delta_delete(spark, path, "o_totalprice < 20000", strategy="dv")
    v = delta_checkpoint(spark, path, format="v2")
    assert _glob.glob(f"{path}/_delta_log/_sidecars/*.parquet"), "no sidecar"
    removed = 0
    for j in _glob.glob(f"{path}/_delta_log/0*.json"):
        if int(_os.path.basename(j)[:-5]) <= v:
            _os.remove(j)
            removed += 1
    assert removed >= 3, f"only {removed} pre-checkpoint commits existed"
    delta_write(orders.where("o_orderkey % 3 = 2"), path, mode="append")
    got = lakehouse.read_table(spark, "delta", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


DELTA_V2_CHECKPOINT_SQL = """
WITH kept AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE (o_orderkey % 3 <> 2 AND o_totalprice >= 20000)
     OR o_orderkey % 3 = 2
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM kept
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def delta_clone_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12 continuation: SHALLOW CLONE end-to-end — orders take a
    deletion-vector DELETE, the table clones (metadata-only: absolute-
    path add actions, DV descriptors re-anchored 'p'), and the clone
    diverges with its own UPDATE while the source stays byte-identical
    (asserted in-query against the pre-clone aggregate). The returned
    frame aggregates the DIVERGED CLONE and must match the oracle's
    WHERE + CASE twin — a clone that leaked the update into the source
    or misapplied the source's DVs breaks the hash."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_clone,
        delta_delete,
        delta_update,
        delta_write,
    )

    tune(spark)
    root = tempfile.mkdtemp(prefix="sdw-dclone-")
    src, dst = f"{root}/orders_src", f"{root}/orders_clone"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    delta_write(orders.repartition(8), src, mode="error")
    delta_delete(spark, src, "o_totalprice < 20000", strategy="dv")
    delta_clone(spark, src, dst)
    src_before = lakehouse.read_table(spark, "delta", src).count()
    delta_update(
        spark, dst, {"o_totalprice": "o_totalprice * 3"},
        "o_orderkey % 4 = 0", strategy="rewrite",
    )
    src_after = lakehouse.read_table(spark, "delta", src).count()
    assert src_after == src_before, "clone DML leaked into the source"
    got = lakehouse.read_table(spark, "delta", dst)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


DELTA_CLONE_SQL = """
WITH cloned AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice * 3
              ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE o_totalprice >= 20000
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM cloned
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def delta_constraint_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12 continuation: Delta CHECK constraints end-to-end —
    ADD CONSTRAINT validates the current rows and bumps the writer
    protocol; a violating append, a violating UPDATE (deletion-vector
    engine), and a NULL-producing UPDATE (Delta counts NULL as a
    violation) must all REFUSE with DeltaConstraintViolation and leave
    the table byte-identical; a legal UPDATE commits. The returned
    aggregate must match the oracle's arithmetic twin — wrong rows
    from any refused-but-leaked write break the hash."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_writer import (
        DeltaConstraintViolation,
        delta_add_constraint,
        delta_update,
        delta_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-dchk-") + "/orders_chk"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    delta_write(orders, path, mode="error")
    delta_add_constraint(spark, path, "price_pos", "o_totalprice > 0.0")

    def must_refuse(fn, what):
        try:
            fn()
        except DeltaConstraintViolation:
            return
        raise AssertionError(f"{what} should have violated price_pos")

    must_refuse(
        lambda: delta_write(
            orders.limit(10).withColumn(
                "o_totalprice", F.col("o_totalprice") * -1
            ),
            path,
            mode="append",
        ),
        "negative-price append",
    )
    must_refuse(
        lambda: delta_update(
            spark, path, {"o_totalprice": "-o_totalprice"},
            "o_orderkey % 7 = 0", strategy="dv",
        ),
        "negating UPDATE",
    )
    must_refuse(
        lambda: delta_update(
            spark, path, {"o_totalprice": "CAST(NULL AS DOUBLE)"},
            "o_orderkey % 11 = 0", strategy="rewrite",
        ),
        "NULL-producing UPDATE",
    )
    # a legal UPDATE commits under the constraint
    delta_update(
        spark, path, {"o_totalprice": "o_totalprice * 2"},
        "o_orderkey % 10 = 0", strategy="rewrite",
    )
    got = lakehouse.read_table(spark, "delta", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


DELTA_CONSTRAINT_SQL = """
WITH final AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice
  FROM orders
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM final
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def iceberg_branch_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12 continuation: Iceberg NAMED REFERENCES end-to-end —
    tag, branch, ref reads, fast-forward publish, ref-pinned retention.
    Evens land first and get TAG ``v1`` (immutable bookmark); odds
    append to main; an audit wave (key-shifted rows) stages WAP-style
    and becomes BRANCH ``audit``; snapshot expiry must NOT collect the
    tagged snapshot (refs pin their snapshots); main publishes the
    audited branch via fast-forward (ancestry-checked — a non-linear
    move refuses). In-query asserts pin the tag view (evens only) and
    the pre-publish main view; the returned frame aggregates the
    post-publish table and must match the oracle's UNION twin."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_expire_snapshots,
        iceberg_fast_forward,
        iceberg_set_ref,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-iceref-") + "/orders_refs"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    evens = orders.where("o_orderkey % 2 = 0")
    s1 = iceberg_write(evens, path, mode="error")
    iceberg_set_ref(spark, path, "v1", snapshot_id=s1, ref_type="tag")
    iceberg_write(orders.where("o_orderkey % 2 = 1"), path, mode="append")
    staged = iceberg_write(
        orders.where("o_orderkey % 1000 = 0").withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
        ),
        path,
        mode="append",
        stage_only=True,
    )
    iceberg_set_ref(spark, path, "audit", snapshot_id=staged)

    # refs pin their snapshots: expire to the minimum and the tag must
    # still read — then the views themselves
    iceberg_expire_snapshots(spark, path, keep_last=1)
    n_tag = lakehouse.read_table(spark, "iceberg", path, ref="v1").count()
    n_evens = evens.count()
    assert n_tag == n_evens, f"tag read {n_tag}, want {n_evens}"
    n_main_pre = lakehouse.read_table(spark, "iceberg", path).count()
    n_all = orders.count()
    assert n_main_pre == n_all, f"pre-publish main {n_main_pre}, want {n_all}"

    iceberg_fast_forward(spark, path, "main", "audit")
    got = lakehouse.read_table(spark, "iceberg", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_BRANCH_SQL = """
WITH final AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 1000 = 0
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM final
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def hudi_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12 continuation: the jar-free Hudi INCREMENTAL query
    (``hoodie.datasource.query.type=incremental`` semantics — begin
    exclusive, end inclusive, record-level ``_hoodie_commit_time``),
    completing the ``lakehouse.table_changes`` trio (delta CDF +
    iceberg changelog + hudi incremental). Orders land as a
    partitioned CoW table; upsert wave 1 doubles every 5th key's
    price; wave 2 bumps every 20th key again. The incremental read
    over ``(t1, t3]`` must contain EXACTLY the touched keys at their
    final in-range values, labeled by the wave that last changed them
    — rewritten-but-unchanged remainder rows keep their original
    commit time (the meta-field preservation the CoW upsert
    guarantees), so none of them leak in. A second ranged read
    ``(t2, t3]`` is pinned in-query to the wave-2 key count. Reference
    parity: the reference's pandas pipeline re-reads full snapshots;
    incremental pull is the capability that replaces that at scale."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.hudi_writer import (
        hudi_upsert,
        hudi_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-hudi-inc-") + "/orders_inc"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    t1 = hudi_write(
        orders,
        path,
        mode="error",
        record_key="o_orderkey",
        partition_by=["o_orderstatus"],
    )
    wave1 = orders.where("o_orderkey % 5 = 0").withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    t2 = hudi_upsert(spark, path, wave1)
    wave2 = orders.where("o_orderkey % 20 = 0").withColumn(
        "o_totalprice", F.col("o_totalprice") * 2 + F.lit(7.0)
    )
    t3 = hudi_upsert(spark, path, wave2)

    inc = lakehouse.table_changes(spark, "hudi", path, t1, t3)
    # in-query invariant: the narrower range (t2, t3] is exactly wave 2
    n_w2 = lakehouse.table_changes(spark, "hudi", path, t2, t3).count()
    want_w2 = wave2.count()
    assert n_w2 == want_w2, f"(t2,t3] returned {n_w2}, want {want_w2}"

    labeled = inc.withColumn(
        "changed_at",
        F.when(F.col("_hoodie_commit_time") == t2, F.lit("first_wave"))
        .when(F.col("_hoodie_commit_time") == t3, F.lit("second_wave"))
        .otherwise(F.lit("UNEXPECTED_INSTANT")),
    )
    return (
        labeled.groupBy("o_orderstatus", "changed_at")
        .agg(
            F.count(F.lit(1)).alias("n_changed"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus", "changed_at")
    )


HUDI_INCREMENTAL_SQL = """
WITH changed AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 20 = 0 THEN o_totalprice * 2 + 7.0
              ELSE o_totalprice * 2 END AS o_totalprice,
         CASE WHEN o_orderkey % 20 = 0 THEN 'second_wave'
              ELSE 'first_wave' END AS changed_at
  FROM orders
  WHERE o_orderkey % 5 = 0
)
SELECT o_orderstatus, changed_at, COUNT(*) AS n_changed,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM changed
GROUP BY o_orderstatus, changed_at
ORDER BY o_orderstatus, changed_at
"""


def iceberg_changelog_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12 continuation: the jar-free Iceberg CHANGELOG
    (``iceberg_reader.iceberg_table_changes`` — the
    ``create_changelog_view`` row shape). Orders land as a v2 table,
    an append adds a band, a DELETE publishes position deletes, an
    UPDATE publishes delete+insert in one snapshot, and a compaction
    (replace — byte movement, no logical change) must contribute
    NOTHING; the changelog emits every row-level change with
    ``_change_type``/``_change_ordinal``. Aggregated per (ordinal,
    change type); the oracle reconstructs the same change sets from
    raw parquet."""
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_compact,
        iceberg_delete,
        iceberg_update,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-icechlog-") + "/orders_chlog"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    iceberg_write(orders.where("o_orderkey % 3 != 0"), path, mode="error")
    iceberg_write(
        orders.where("o_orderkey % 3 = 0"), path, mode="append"
    )
    iceberg_delete(spark, path, "o_totalprice < 30000")
    iceberg_update(
        spark,
        path,
        {"o_totalprice": "o_totalprice + 5.0"},
        "o_orderkey % 100 = 0 AND o_totalprice >= 30000",
    )
    iceberg_compact(spark, path)  # replace: MUST add no changes
    ch = lakehouse.table_changes(spark, "iceberg", path)
    return (
        ch.groupBy("_change_ordinal", "_change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("_change_ordinal", "_change_type")
    )


ICEBERG_CHANGELOG_SQL = """
WITH ch AS (
  SELECT 0 AS _change_ordinal, 'insert' AS _change_type,
         o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey % 3 <> 0
  UNION ALL
  SELECT 1, 'insert', o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT 2, 'delete', o_orderkey, o_totalprice
  FROM orders WHERE o_totalprice < 30000
  UNION ALL
  SELECT 3, 'delete', o_orderkey, o_totalprice
  FROM orders
  WHERE o_orderkey % 100 = 0 AND o_totalprice >= 30000
  UNION ALL
  SELECT 3, 'insert', o_orderkey, o_totalprice + 5.0
  FROM orders
  WHERE o_orderkey % 100 = 0 AND o_totalprice >= 30000
)
SELECT CAST(_change_ordinal AS INT) AS _change_ordinal, _change_type,
       COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM ch
GROUP BY _change_ordinal, _change_type
ORDER BY _change_ordinal, _change_type
"""


def delta_cdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12 (VERDICT r11 #4): jar-free Delta CHANGE DATA FEED.
    Orders land as a Delta table, ``delta_set_properties`` enables
    ``delta.enableChangeDataFeed`` (protocol upgrades with the
    changeDataFeed writer feature), a DELETE and an UPDATE each emit
    ``_change_data/`` parquet + ``cdc`` actions in their commits, and
    ``delta_table_changes`` reads the range back as exact row-level
    changes (delete / update_preimage / update_postimage). The result
    aggregates per change type; the oracle reconstructs the same
    changes from raw parquet with WHERE + CASE. An in-query invariant
    pins the on-disk shape (change files exist under _change_data/)."""
    import glob as _glob
    import tempfile

    from simple_data_workflow_spark.sources.delta_reader import (
        delta_table_changes,
    )
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_set_properties,
        delta_update,
        delta_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-cdf-") + "/orders_cdf"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    delta_write(orders, path, mode="error")  # v0
    delta_set_properties(
        spark, path, {"delta.enableChangeDataFeed": "true"}
    )  # v1
    delta_delete(spark, path, "o_totalprice < 20000")  # v2
    delta_update(
        spark,
        path,
        {"o_totalprice": "o_totalprice * 1.1"},
        "o_orderpriority = '1-URGENT'",
    )  # v3
    assert _glob.glob(f"{path}/_change_data/*.parquet"), (
        "CDF DML must stage change files"
    )
    changes = delta_table_changes(spark, path, 2, 3)
    return (
        changes.groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("_change_type")
    )


DELTA_CDF_SQL = """
WITH ch AS (
  SELECT 'delete' AS _change_type, o_orderkey, o_totalprice
  FROM orders WHERE o_totalprice < 20000
  UNION ALL
  SELECT 'update_preimage', o_orderkey, o_totalprice
  FROM orders
  WHERE o_totalprice >= 20000 AND o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT 'update_postimage', o_orderkey, o_totalprice * 1.1
  FROM orders
  WHERE o_totalprice >= 20000 AND o_orderpriority = '1-URGENT'
)
SELECT _change_type, COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM ch
GROUP BY _change_type
ORDER BY _change_type
"""


def iceberg_v3_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12 (VERDICT r11 #3): Iceberg FORMAT-VERSION 3 deletion
    vectors, write AND read, jar-free. Orders land as a v2 table,
    ``iceberg_upgrade_format`` raises it to v3 (metadata-only), two
    stacked DELETEs publish Puffin deletion-vector snapshots
    (``sources/puffin.py`` — ``deletion-vector-v1`` blobs, the roaring
    format shared with Delta DVs, addressed by the manifest's
    referenced_data_file/content_offset/content_size_in_bytes), an
    UPDATE stacks a DV + new data files in one snapshot, and the read
    applies the DVs as broadcast masks. In-query invariants pin the v3
    shape: a ``.puffin`` file exists, NO new parquet position-delete
    file was written, and the table metadata says format-version 3.
    The oracle replays the same edits as WHERE + CASE over raw
    parquet."""
    import glob as _glob
    import tempfile

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_reader import (
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_update,
        iceberg_upgrade_format,
        iceberg_write,
    )

    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-icev3-") + "/orders_v3"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    iceberg_write(orders.repartition(4), path, mode="error")
    assert iceberg_upgrade_format(spark, path, 3) == 3
    # v3 routes DELETE through deletion vectors (stacked: the second
    # DV must supersede/union the first for co-affected files)
    iceberg_delete(spark, path, "o_totalprice < 50000")
    iceberg_delete(spark, path, "o_orderpriority = '5-LOW'")
    iceberg_update(
        spark,
        path,
        {"o_totalprice": "o_totalprice + 1.0"},
        "o_orderpriority = '1-URGENT'",
    )
    assert _glob.glob(f"{path}/data/dv-*.puffin"), "v3 DML must write Puffin DVs"
    assert not _glob.glob(f"{path}/data/delete-*.parquet"), (
        "v3 tables must not grow new position-delete files"
    )
    assert load_table_metadata(spark, path)["format-version"] == 3
    got = lakehouse.read_table(spark, "iceberg", path)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            rel.dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


ICEBERG_V3_DV_SQL = """
WITH kept AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderpriority = '1-URGENT'
              THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE o_totalprice >= 50000 AND o_orderpriority <> '5-LOW'
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM kept
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def tablelog_rename_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 9: METADATA-ONLY column mapping end-to-end
    (``table_rename_column`` — Delta column mapping's shape). Even-key
    orders commit under ``o_totalprice``; the column renames to
    ``price`` with ONE log entry (zero data bytes move at any table
    size); odd-key orders append under the NEW logical name (landing
    under the stable physical); the snapshot is read back through the
    session-free ``format("tablelog")`` reader with a pushed filter on
    the renamed column — which must translate logical→physical to
    probe the physical-keyed file stats, then present the data under
    the logical name. The oracle aggregates raw parquet with a plain
    alias, so a value-hash match proves files written before AND after
    the rename surface the same column correctly (the silent-NULL
    failure mode this round's fix closed)."""
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_rename_column,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    tune(spark)
    spark.dataSource.register(TablelogStreamDataSource)
    path = tempfile.mkdtemp(prefix="sdw-tlren-") + "/orders_ren"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    table_commit(orders.where("o_orderkey % 2 = 0").repartition(4), path)
    table_rename_column(spark, path, "o_totalprice", "price")
    table_commit(
        orders.where("o_orderkey % 2 = 1")
        .withColumnRenamed("o_totalprice", "price")
        .repartition(4),
        path,
    )
    snap = (
        spark.read.format("tablelog")
        .option("path", path)
        .load()
        .where("price >= 100000.0")  # pushed; translates to physical stats
    )
    return (
        snap.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rel.dsum(F.col("price")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


TABLELOG_RENAME_SQL = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 AS total_price
FROM orders
WHERE o_totalprice >= 100000.0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def tablelog_cdf_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8: the materialized view folds DML commits EXACTLY via the
    row-level change feed (``table_changes_rowlevel``: DELETE preimages
    surface as ``_change_type='delete'`` and fold with negative sign).
    Sequence: commit even-key orders → refresh → file-granular DELETE
    of cheap orders → append odd-key orders → refresh (one refresh
    folding a delete AND an append). The oracle is the one-shot
    aggregate over the equivalent final state, so a value-hash match
    proves signed folding neither loses nor double-counts rows —
    closing the loop between the CDC surface and the storage layer."""
    import tempfile

    from simple_data_workflow_spark.sources.matview import refresh_aggregate_view
    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_delete_where,
        table_read,
    )

    tune(spark)
    d = tempfile.mkdtemp(prefix="sdw-cdf-")
    src, view = f"{d}/orders_tbl", f"{d}/orders_by_priority"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    table_commit(orders.where("o_orderkey % 2 = 0").repartition(4), src)
    refresh_aggregate_view(
        spark, src, view, ["o_orderpriority"], sum_cols=["cents"]
    )
    table_delete_where(spark, src, "cents < 5000000")
    table_commit(orders.where("o_orderkey % 2 = 1").repartition(4), src)
    refresh_aggregate_view(
        spark, src, view, ["o_orderpriority"], sum_cols=["cents"]
    )
    return (
        table_read(spark, view)
        .select(
            "o_orderpriority",
            F.col("cnt").cast("long").alias("cnt"),
            "sum_cents",
        )
        .orderBy("o_orderpriority")
    )


TABLELOG_CDF_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderpriority, COUNT(*) AS cnt,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM base
WHERE (o_orderkey % 2 = 1) OR cents >= 5000000
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""



# ---------------------------------------------------------------------------
# LLM-data queries (SURVEY.md §2.3): dedup / similarity / text analysis
# ---------------------------------------------------------------------------


def perplexity_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram LM quality scoring (round 8, ``llmdata.lm``): train an
    add-k bigram model ON the documents corpus (two grouped
    aggregates) and score every document's cross-entropy under it —
    the CCNet/Gopher perplexity-filter signal, jar-free. Scoring is a
    shuffle join against the corpus-derived LM tables (never a
    broadcast — vocab scales with the data). Each bigram's −log₂p is
    rounded and summed as exact integers, so the per-doc number is
    order-free and engine-portable; the oracle replays the identical
    formula in SQL."""
    from simple_data_workflow_spark.llmdata import lm

    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return (
        lm.perplexity_scores(docs)
        .select("doc_id", "n_bigrams", "cross_entropy")
        .orderBy("doc_id")
    )


PERPLEXITY_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE len(string_split(text, ' ')) >= 2
), gx AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> {'w1': w[i], 'w2': w[i + 1]})) AS g
  FROM toks
), grams AS (
  SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM gx
), uni AS (
  SELECT w1, COUNT(*) AS c1
  FROM (SELECT unnest(w) AS w1 FROM toks) GROUP BY w1
), vocab AS (
  SELECT COUNT(*) AS v FROM uni
), terms AS (
  SELECT g.doc_id,
         CAST(ROUND(-log2((b.c12 + 0.5) / (u.c1 + 0.5 * vocab.v))
                    * 1000000.0) AS BIGINT) AS t
  FROM grams g
  JOIN (SELECT w1, w2, COUNT(*) AS c12 FROM grams GROUP BY w1, w2) b
    USING (w1, w2)
  JOIN uni u USING (w1)
  CROSS JOIN vocab
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(t) AS DOUBLE) / (1000000.0 * COUNT(*)), 6)
         AS cross_entropy
FROM terms GROUP BY doc_id ORDER BY doc_id
"""


def perplexity_heldout_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 9 (VERDICT r8 #8): HELD-OUT perplexity — train the bigram
    model on even-doc_id documents only, score the odd-doc_id half
    under it. This pins the unseen-token path with an oracle: a
    held-out bigram (or even a first token) the training half never
    saw must flow through the LEFT joins as ``coalesce(count, 0)`` and
    still produce the exact add-k number — the formula CCNet-style
    filtering depends on when scoring web text under a Wikipedia
    model. Training uses ``persist=True`` (round-9 split), so the
    scoring plan reads materialized count tables instead of
    re-tokenizing the training half inside the join."""
    from simple_data_workflow_spark.llmdata import lm

    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    model = lm.bigram_lm_counts(
        docs.where(F.col("doc_id") % 2 == 0), persist=True
    )
    return (
        lm.perplexity_scores(docs.where(F.col("doc_id") % 2 == 1), lm=model)
        .select("doc_id", "n_bigrams", "cross_entropy")
        .orderBy("doc_id")
    )


PERPLEXITY_HELDOUT_SQL = """
WITH toks_train AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id % 2 = 0
    AND len(string_split(text, ' ')) >= 2
), toks_score AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id % 2 = 1
    AND len(string_split(text, ' ')) >= 2
), uni AS (
  SELECT w1, COUNT(*) AS c1
  FROM (SELECT unnest(w) AS w1 FROM toks_train) GROUP BY w1
), big AS (
  SELECT g.w1, g.w2, COUNT(*) AS c12 FROM (
    SELECT unnest(list_transform(range(1, len(w)),
                  i -> {'w1': w[i], 'w2': w[i + 1]})) AS g
    FROM toks_train
  ) GROUP BY g.w1, g.w2
), vocab AS (
  SELECT COUNT(*) AS v FROM uni
), grams AS (
  SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w)),
                  i -> {'w1': w[i], 'w2': w[i + 1]})) AS g
    FROM toks_score
  )
), terms AS (
  SELECT g.doc_id,
         CAST(ROUND(-log2((COALESCE(b.c12, 0) + 0.5)
                          / (COALESCE(u.c1, 0) + 0.5 * vocab.v))
                    * 1000000.0) AS BIGINT) AS t
  FROM grams g
  LEFT JOIN big b ON g.w1 = b.w1 AND g.w2 = b.w2
  LEFT JOIN uni u ON g.w1 = u.w1
  CROSS JOIN vocab
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(t) AS DOUBLE) / (1000000.0 * COUNT(*)), 6)
         AS cross_entropy
FROM terms GROUP BY doc_id ORDER BY doc_id
"""


def trigram_perplexity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 9: GENERAL n-gram LM scoring (``llmdata.lm.ngram_*``,
    n=3 — CCNet's production filter is a 5-gram; the same code path).
    The context normalizer is derived from the full counts (one rollup
    instead of a second corpus pass) and training persists both count
    tables, so scoring joins materialized aggregates. The oracle
    replays the identical add-k formula over DuckDB trigrams —
    value-hash equality pins context construction (space-joined
    (n−1)-token prefixes), the Σ-over-continuations normalizer, and
    the exact-integer term summing, cross-engine."""
    from simple_data_workflow_spark.llmdata import lm

    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return (
        lm.ngram_perplexity_scores(docs, n=3)
        .select("doc_id", "n_grams", "cross_entropy")
        .orderBy("doc_id")
    )


TRIGRAM_PERPLEXITY_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE len(string_split(text, ' ')) >= 3
), grams AS (
  SELECT doc_id, g.ctx AS ctx, g.wn AS wn FROM (
    SELECT doc_id,
           unnest(list_transform(range(3, len(w) + 1),
                  j -> {'ctx': w[j - 2] || ' ' || w[j - 1], 'wn': w[j]})) AS g
    FROM toks
  )
), fullc AS (
  SELECT ctx, wn, COUNT(*) AS c_full FROM grams GROUP BY ctx, wn
), ctxc AS (
  SELECT ctx, SUM(c_full) AS c_ctx FROM fullc GROUP BY ctx
), vocab AS (
  SELECT COUNT(DISTINCT u) AS v FROM (SELECT unnest(w) AS u FROM toks)
), terms AS (
  SELECT g.doc_id,
         CAST(ROUND(-log2((COALESCE(f.c_full, 0) + 0.5)
                          / (COALESCE(c.c_ctx, 0) + 0.5 * vocab.v))
                    * 1000000.0) AS BIGINT) AS t
  FROM grams g
  LEFT JOIN fullc f ON g.ctx = f.ctx AND g.wn = f.wn
  LEFT JOIN ctxc c ON g.ctx = c.ctx
  CROSS JOIN vocab
)
SELECT doc_id, COUNT(*) AS n_grams,
       ROUND(CAST(SUM(t) AS DOUBLE) / (1000000.0 * COUNT(*)), 6)
         AS cross_entropy
FROM terms GROUP BY doc_id ORDER BY doc_id
"""


def fivegram_perplexity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 (VERDICT r9 #6): 5-GRAM LM scoring with COUNT PRUNING
    — CCNet's production configuration (a pruned 5-gram KenLM). The
    full n-gram table keeps only grams seen ≥ 2 times (at order 5 the
    table is ~95% singletons on this corpus, so pruning shrinks it
    ~20×), while the context normalizer keeps the TRUE pre-prune
    denominator so a pruned gram scores exactly like an unseen one —
    the oracle replays both halves (HAVING on the full counts, SUM
    over the UNPRUNED counts for the normalizer) and pins them by
    value hash. Scoring is size-aware (VERDICT r9 #1): the pruned
    tables count small here and broadcast, turning the scoring joins
    into map-side lookups; corpus-sized models shuffle as before."""
    from simple_data_workflow_spark.llmdata import lm

    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return (
        lm.ngram_perplexity_scores(docs, n=5, min_count=2)
        .select("doc_id", "n_grams", "cross_entropy")
        .orderBy("doc_id")
    )


FIVEGRAM_PERPLEXITY_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE len(string_split(text, ' ')) >= 5
), grams AS (
  SELECT doc_id, g.ctx AS ctx, g.wn AS wn FROM (
    SELECT doc_id,
           unnest(list_transform(range(5, len(w) + 1),
                  j -> {'ctx': w[j - 4] || ' ' || w[j - 3] || ' ' ||
                               w[j - 2] || ' ' || w[j - 1],
                        'wn': w[j]})) AS g
    FROM toks
  )
), full_all AS (
  SELECT ctx, wn, COUNT(*) AS c_full FROM grams GROUP BY ctx, wn
), ctxc AS (
  SELECT ctx, SUM(c_full) AS c_ctx FROM full_all GROUP BY ctx
), fullc AS (
  SELECT * FROM full_all WHERE c_full >= 2
), vocab AS (
  SELECT COUNT(DISTINCT u) AS v FROM (SELECT unnest(w) AS u FROM toks)
), terms AS (
  SELECT g.doc_id,
         CAST(ROUND(-log2((COALESCE(f.c_full, 0) + 0.5)
                          / (COALESCE(c.c_ctx, 0) + 0.5 * vocab.v))
                    * 1000000.0) AS BIGINT) AS t
  FROM grams g
  LEFT JOIN fullc f ON g.ctx = f.ctx AND g.wn = f.wn
  LEFT JOIN ctxc c ON g.ctx = c.ctx
  CROSS JOIN vocab
)
SELECT doc_id, COUNT(*) AS n_grams,
       ROUND(CAST(SUM(t) AS DOUBLE) / (1000000.0 * COUNT(*)), 6)
         AS cross_entropy
FROM terms GROUP BY doc_id ORDER BY doc_id
"""


def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: representative (min) doc_id per distinct text."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, key_cols=["text"], id_col="doc_id").select(
        "doc_id", "text"
    )


DEDUP_EXACT_SQL = "SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text"


def ngram_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram shingle Jaccard pairs ≥ 0.02 (all-pairs at oracle scale;
    MinHash-LSH candidates above the guard — same contract)."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.02, k=3)


NGRAM_JACCARD_SQL = """
WITH s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
            i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                 || ' ' || string_split(text,' ')[i+2])) AS sh
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.02
"""


def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (llmdata.dedup.decontaminate): corpus
    docs whose normalized fingerprint appears in a held-out benchmark
    slice (doc_id < 50) are dropped via broadcast anti-join."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    benchmark = docs.where(F.col("doc_id") < 50)
    return dedup.decontaminate(docs, benchmark).select("doc_id", "lang", "n_chars").orderBy("doc_id")


DECONTAMINATE_SQL = r"""
WITH fp AS (
  SELECT doc_id, lang, n_chars,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
  FROM documents
), bench AS (SELECT DISTINCT f FROM fp WHERE doc_id < 50)
SELECT doc_id, lang, n_chars FROM fp
WHERE NOT EXISTS (SELECT 1 FROM bench WHERE bench.f = fp.f)
ORDER BY doc_id
"""


def cluster_near_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER consolidation (llmdata.dedup.cluster_pairs):
    connected components over the 3-gram Jaccard pair list — A~B, B~C
    collapse to one cluster labeled by the component's min doc_id even
    when (A, C) was never an emitted pair. Spark side is min-label
    propagation to a fixpoint (localCheckpoint per round); the oracle is
    a recursive CTE computing the same min-reachable-id labels."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.02, k=3, mode="exact")
    return (
        dedup.cluster_pairs(pairs)
        .select(F.col("id").alias("doc_id"), "cluster_id")
        .orderBy("doc_id")
    )


CLUSTER_SQL = """
WITH RECURSIVE s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
            i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                 || ' ' || string_split(text,' ')[i+2])) AS sh
  FROM documents
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.02
), e AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM p
), reach(id, r) AS (
  SELECT src, src FROM e
  UNION
  SELECT e2.src, rr.r FROM e e2 JOIN reach rr ON rr.id = e2.dst
)
SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id ORDER BY doc_id
"""


def dedup_near_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-consolidated dedup (llmdata.dedup.dedup_by_cluster): keep
    ONE doc per near-dup cluster (the min-id member) plus every never-
    paired doc — the kept-set the pair list alone cannot express."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.02, k=3, mode="exact")
    return (
        dedup.dedup_by_cluster(docs, pairs)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


DEDUP_CLUSTER_SQL = """
WITH RECURSIVE s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
            i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                 || ' ' || string_split(text,' ')[i+2])) AS sh
  FROM documents
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.02
), e AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM p
), reach(id, r) AS (
  SELECT src, src FROM e
  UNION
  SELECT e2.src, rr.r FROM e e2 JOIN reach rr ON rr.id = e2.dst
), doomed AS (
  SELECT id FROM (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
  WHERE id != cluster_id
)
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id NOT IN (SELECT id FROM doomed)
ORDER BY doc_id
"""


def ngram_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap decontamination (llmdata.dedup.ngram_decontaminate): drop
    corpus docs sharing any distinct 8-gram md5 fingerprint with the
    benchmark slice (doc_id < 50) — catches partial inclusions the
    exact-fingerprint decontaminate misses. Benchmark grams broadcast;
    the corpus never shuffles."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    benchmark = docs.where(F.col("doc_id") < 50)
    return (
        dedup.ngram_decontaminate(docs, benchmark, n=8)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


_G8 = " || ' ' || ".join(f"w[i+{o}]" for o in range(8))
NGRAM_DECONTAMINATE_SQL = f"""
WITH g AS (
  SELECT doc_id, substr(md5(gram), 1, 16) AS fp
  FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(1, len(w) - 6), i -> {_G8}))) AS gram
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  )
), bench AS (
  SELECT DISTINCT fp FROM g WHERE doc_id < 50
), contaminated AS (
  SELECT DISTINCT doc_id FROM g WHERE fp IN (SELECT fp FROM bench)
)
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
ORDER BY doc_id
"""


def bloom_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination (llmdata.dedup.
    bloom_decontaminate): same contract as ngram_decontaminate_docs —
    the Bloom bitmap (broadcast bits instead of broadcast gram strings,
    ~13x smaller at 10 bits/gram) prefilters candidates and the exact
    confirm restores bit-equality, so the oracle is the SAME SQL."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    benchmark = docs.where(F.col("doc_id") < 50)
    return (
        dedup.bloom_decontaminate(docs, benchmark, n=8)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


def boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal (llmdata.dedup.
    drop_boilerplate_lines): the corpus is single-line word salad, so
    each doc is deterministically re-lined (10-token lines) and salted
    with a footer line on every doc and a header line on even ids; both
    engines must delete exactly the lines occurring in ≥2 distinct docs
    and reassemble survivors in order. md5 of the cleaned text keeps the
    comparison compact."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(w) / F.lit(10.0)).cast("int")
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.concat_ws(" ", F.slice(w, i * 10 + 1, 10)),
        ),
        "\n",
    )
    built = F.concat(
        F.when(
            F.col("doc_id") % 2 == 0, F.lit("cookie banner header\n")
        ).otherwise(F.lit("")),
        body,
        F.lit("\nsubscribe to our newsletter footer"),
    )
    docs2 = docs.select("doc_id", built.alias("text"))
    return (
        dedup.drop_boilerplate_lines(docs2, min_docs=2)
        .select("doc_id", F.md5(F.col("text")).alias("clean_hash"))
        .orderBy("doc_id")
    )


BOILERPLATE_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), built AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'cookie banner header' || chr(10) ELSE '' END)
    || array_to_string(
         list_transform(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT)),
                        i -> array_to_string(w[(i*10+1):(i*10+10)], ' ')),
         chr(10))
    || chr(10) || 'subscribe to our newsletter footer' AS text
  FROM w
), ls AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM built
), lines AS (
  SELECT doc_id, r.i AS pos, ls[r.i] AS line
  FROM ls, unnest(range(1, len(ls) + 1)) AS r(i)
), boiler AS (
  SELECT line FROM (
    SELECT line, COUNT(DISTINCT doc_id) AS c FROM lines GROUP BY 1
  ) WHERE c >= 2
), kept AS (
  SELECT doc_id, pos, line FROM lines
  WHERE line NOT IN (SELECT line FROM boiler)
), reb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id, md5(coalesce(reb.text, '')) AS clean_hash
FROM built b LEFT JOIN reb USING (doc_id) ORDER BY b.doc_id
"""


def cap_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cap + quality selection (llmdata.dedup.cap_per_group):
    keep the 40 longest docs per source (ties broken md5(doc_id), then
    doc_id) — the heavy-tail bound of a pretraining mixture. One window
    shuffled on source only; DuckDB QUALIFY twin."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    capped = dedup.cap_per_group(docs, "source", "doc_id", 40, score_col="n_chars")
    return capped.select("doc_id", "source", "n_chars").orderBy("doc_id")


CAP_PER_SOURCE_SQL = """
SELECT doc_id, source, n_chars
FROM documents
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY source
  ORDER BY n_chars DESC, md5(CAST(doc_id AS VARCHAR)), doc_id
) <= 40
ORDER BY doc_id
"""


def mixture_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing (llmdata.dedup.mixture_sample): per-source keep
    fractions — en 0.8 / fr 0.5 / de 0.25, everything else 0.1 — via the
    engine-portable md5(stratum|id) uniform draw. A pure stateless
    filter; per-lang counts keep the compare compact."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    mixed = dedup.mixture_sample(
        docs, "lang", "doc_id", rates={"en": 0.8, "fr": 0.5, "de": 0.25}, default_rate=0.1
    )
    return mixed.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept")).orderBy("lang")


MIXTURE_SQL = """
SELECT lang, COUNT(*) AS n_kept
FROM documents
WHERE ('0x' || substr(md5(coalesce(lang, chr(0) || 'null') || '|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      / 4294967296.0
      < CASE coalesce(lang, chr(0) || 'null')
          WHEN 'en' THEN 0.8 WHEN 'fr' THEN 0.5 WHEN 'de' THEN 0.25 ELSE 0.1 END
GROUP BY lang ORDER BY lang
"""


def token_budget_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked budget selection (llmdata.packing.
    select_by_token_budget): keep the best docs by vocabulary-diversity
    score (distinct/total token ratio) until 15k tokens are filled —
    exact global (score DESC, id) prefix semantics computed without a
    global sort (uniform score buckets + driver walk + window inside the
    boundary bucket only)."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        (F.size(F.array_distinct(w)).cast("double") / F.size(w)).alias("__q"),
    )
    return (
        packing.select_by_token_budget(
            scored, budget=15_000, score_col="__q", token_col="n_tokens"
        )
        .select("doc_id", "n_tokens")
        .orderBy("doc_id")
    )


TOKEN_BUDGET_SQL = """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS q
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY q DESC, doc_id) AS cum
  FROM t
)
SELECT doc_id, n_tokens FROM c WHERE cum <= 15000 ORDER BY doc_id
"""


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified 1-in-5 downsample per language
    (llmdata.dedup.stratified_sample): md5(lang|id)-modulus selection —
    a pure filter, reproducible under any partitioning, and decorrelated
    from raw id structure so the keep ratio holds per stratum."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    sampled = dedup.stratified_sample(docs, "lang", "doc_id", keep_of=5, keep=1)
    return (
        sampled.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("lang")
    )


STRATIFIED_SQL = """
SELECT lang, COUNT(*) AS n_sampled
FROM documents
WHERE ('0x' || substr(md5(coalesce(lang, chr(0) || 'null') || '|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 5 < 1
GROUP BY lang ORDER BY lang
"""



def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery over the embedding column: dimension, L2
    norm, element mean/min/max via sequential codegen folds (identical
    left-to-right accumulation to the oracle's list functions)."""
    tune(spark)
    from simple_data_workflow_spark.functions.vectors import norm

    emb = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    total = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(v).cast("long").alias("dim"),
        F.round(norm(v), 6).alias("l2_norm"),
        F.round(total / F.size(v), 6).alias("mean_elem"),
        F.round(F.array_min(v).cast("double"), 6).alias("min_elem"),
        F.round(F.array_max(v).cast("double"), 6).alias("max_elem"),
    ).orderBy("vec_id")


EMBEDDING_STATS_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id,
       CAST(len(v) AS BIGINT) AS dim,
       ROUND(sqrt(list_dot_product(v, v)), 6) AS l2_norm,
       ROUND(list_sum(v) / len(v), 6) AS mean_elem,
       ROUND(list_min(v), 6) AS min_elem,
       ROUND(list_max(v), 6) AS max_elem
FROM e ORDER BY vec_id
"""


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline — the end-to-end LLM-data flow: length
    filter → exact dedup (min doc_id per text) → benchmark
    decontamination (doc_id < 25 slice) → deterministic 1-in-2
    stratified downsample per language → per-language accounting."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    sampled = curation.curate_corpus(
        docs,
        benchmark=docs.where(F.col("doc_id") < 25),
        min_chars=100,
        max_chars=2000,
        strata_col="lang",
        keep_of=2,
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


CORPUS_CURATION_SQL = r"""
WITH fp AS (
  SELECT doc_id, lang, n_chars, text,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
  FROM documents
  WHERE n_chars BETWEEN 100 AND 2000
), keep AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY text),
bench AS (
  SELECT DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
  FROM documents WHERE doc_id < 25
), clean AS (
  SELECT fp.* FROM fp
  JOIN keep USING (doc_id)
  WHERE NOT EXISTS (SELECT 1 FROM bench WHERE bench.f = fp.f)
), sampled AS (
  SELECT * FROM clean
  WHERE ('0x' || substr(md5(coalesce(lang, chr(0) || 'null') || '|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2 < 1
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM sampled GROUP BY lang ORDER BY lang
"""



def minhash_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs verified by exact Jaccard — the scale
    path itself (banding shuffle ∝ collisions). Hash-seeded internals are
    engine-specific → rows-only check."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    # bands=8 → 4 rows/band: collision probability s⁴ per band — tuned for
    # a low-similarity corpus (observed shingle jaccard ≤ ~0.05) so the
    # candidate set stays ∝ near-dups, not n²
    cand = dedup.minhash_lsh_candidates(docs, num_hashes=32, bands=8)
    return cand.orderBy("id_a", "id_b")


def minhash_md5_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dups with the engine-portable md5 hash family
    (llmdata.dedup.minhash_md5_near_dups): the FULL LSH pipeline —
    shingle → signature → banding → candidate join → exact-Jaccard
    verify — reproduced bit-for-bit by the DuckDB oracle (the xxhash64
    variant stays rows-only; this closes that gap). The checked config
    runs 8 streams / 4 bands — same 2 rows/band selectivity shape as the
    16/8 default at half the oracle's per-shingle work (the portability
    proof doesn't need the production stream count; recall tuning lives
    with the perf-path benchmarks)."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_md5_near_dups(
        docs, num_hashes=8, bands=4, threshold=0.5
    ).orderBy("id_a", "id_b")


# per-stream universal-hash constants, md5-derived (decorrelated streams);
# MUST mirror llmdata.dedup.minhash_md5_coeffs — embedded as literals so
# the SQL is self-contained
_MH_VALUES = ", ".join(
    f"({s}, {a}, {b})" for s, (a, b) in enumerate(dedup.minhash_md5_coeffs(8))
)

MINHASH_MD5_SQL = f"""
WITH s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
            i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                 || ' ' || string_split(text,' ')[i+2])) AS sh
  FROM documents
  WHERE len(string_split(text,' ')) >= 3
), gh AS (
  SELECT doc_id, ('0x' || substr(md5(g.gram), 1, 8))::BIGINT AS h
  FROM s, unnest(s.sh) AS g(gram)
), mh AS (
  SELECT doc_id, st.seed,
         MIN(((h % 2147483647) * st.a + st.b) % 2147483647) AS mh
  FROM gh, (VALUES {_MH_VALUES}) st(seed, a, b)
  GROUP BY 1, 2
), sig AS (
  SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY 1
), bd AS (
  SELECT doc_id, bb.b,
         sig[2*bb.b + 1]::VARCHAR || '|' || sig[2*bb.b + 2]::VARCHAR AS bucket
  FROM sig, (SELECT unnest(range(4)) AS b) bb
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bd a JOIN bd b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
), pairs AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS i,
         CAST(len(sa.sh) + len(sb.sh) AS DOUBLE) AS sz
  FROM cand
  JOIN s sa ON sa.doc_id = cand.id_a
  JOIN s sb ON sb.doc_id = cand.id_b
)
SELECT id_a, id_b, ROUND(i / nullif(sz - i, 0), 6) AS jaccard
FROM pairs WHERE i / nullif(sz - i, 0) >= 0.5
ORDER BY id_a, id_b
"""


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures + near-dup pairs within hamming ≤ 3
    (4 derived bands of 16 bits → recall 1 by pigeonhole; exact
    bit_count(xor) filter after). xxhash64-based → rows-only check."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_dups(docs, max_hamming=3).orderBy("id_a", "id_b")


def simhash_md5_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups with the engine-portable 60-bit md5 hash
    (llmdata.dedup.simhash_md5_near_dups): voting, banding, and the
    exact bit_count(xor) filter all reproduced by the DuckDB oracle —
    the oracle-checkable twin of simhash_docs."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_md5_near_dups(docs, max_hamming=3).orderBy("id_a", "id_b")


SIMHASH_MD5_SQL = """
WITH t AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
), h AS (
  SELECT doc_id, ('0x' || substr(md5(tok.t), 1, 15))::BIGINT AS h
  FROM t, unnest(toks) AS tok(t)
), v AS (
  SELECT doc_id, bb.b,
         SUM(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM h, (SELECT unnest(range(60)) AS b) bb
  GROUP BY 1, 2
), sig AS (
  SELECT doc_id,
         SUM(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END) AS sig
  FROM v GROUP BY 1
), bd AS (
  SELECT doc_id, sig, bb.b, (sig >> (bb.b * 15)) & 32767 AS chunk
  FROM sig, (SELECT unnest(range(4)) AS b) bb
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
  FROM bd a JOIN bd b ON a.b = b.b AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
ORDER BY id_a, id_b
"""


def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis battery: token counts, BPE-ish counts, stopword &
    punctuation ratios, quality score, language guess, md5 fingerprint."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return text.analyze_documents(docs).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        "stopword_ratio",
        "punct_ratio",
        "quality",
        "lang_guess",
        "fingerprint",
    )


DOC_STATS_SQL = r"""
WITH t AS (
  SELECT doc_id, text, lower(text) AS lt,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
         len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is|it)\b')) AS n_stop,
         len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
  FROM documents
), s AS (
  SELECT doc_id, n_tokens, n_bpe_tokens,
         CAST(n_stop AS DOUBLE)/n_tokens AS stop_ratio,
         CAST(n_punct AS DOUBLE)/len(text) AS p_ratio,
         len(regexp_extract_all(lt, '\b(der|die|und|das|ist)\b')) AS s_de,
         len(regexp_extract_all(lt, '\b(the|and|of|to|a)\b')) AS s_en,
         len(regexp_extract_all(lt, '\b(el|la|de|que|y)\b')) AS s_es,
         len(regexp_extract_all(lt, '\b(le|la|et|les|des)\b')) AS s_fr,
         len(regexp_extract_all(lt, '\b(的|是|了|在|我)\b')) AS s_zh,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
  FROM t
)
SELECT doc_id, n_tokens, n_bpe_tokens,
       ROUND(stop_ratio, 6) AS stopword_ratio,
       ROUND(p_ratio, 6) AS punct_ratio,
       ROUND((CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
            + CASE WHEN p_ratio <= 0.2 THEN 1.0 ELSE 0.0 END
            + CASE WHEN stop_ratio BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END) / 3.0, 6) AS quality,
       CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
            WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
            WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
            WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
            WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
            ELSE 'zh' END AS lang_guess,
       fingerprint
FROM s
"""


def scrub_pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking (llmdata.text.scrub_pii): the corpus text is word
    salad, so each doc is salted with deterministic synthetic PII (an
    email, an IPv4 and a phone number derived from its id) and both
    engines must mask all three identically — patterns live in the
    Java-regex ∩ RE2 common subset. md5 of the scrubbed text keeps the
    comparison compact."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call +1 415 "),
            (F.col("doc_id") % 900 + 100).cast("string"),
            F.lit(" 0199"),
        ).alias("t"),
    )
    return salted.select(
        "doc_id", F.md5(text.scrub_pii(F.col("t"))).alias("scrubbed_hash")
    ).orderBy("doc_id")


# the oracle applies the SAME pattern text (generated from PII_PATTERNS so
# the two sides cannot drift) with DuckDB's explicit global flag
_PII_EXPR = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.7 call +1 415 '"
    " || CAST(doc_id % 900 + 100 AS VARCHAR) || ' 0199'"
)
for _pat, _repl in text.PII_PATTERNS:
    _PII_EXPR = f"regexp_replace({_PII_EXPR}, '{_pat}', '{_repl}', 'g')"

SCRUB_PII_SQL = f"""
SELECT doc_id, md5({_PII_EXPR}) AS scrubbed_hash
FROM documents ORDER BY doc_id
"""


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals
    (llmdata.text.repetition_stats): duplicate-token fraction and
    top-bigram share per document — the degenerate-text filters a
    pre-training pipeline runs after dedup."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return text.repetition_stats(docs).orderBy("doc_id")


REPETITION_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), base AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         ROUND(1 - len(list_distinct(w)) / CAST(nullif(len(w), 0) AS DOUBLE), 6) AS dup_token_frac
  FROM w
), bg AS (
  SELECT doc_id, w[r.i] || ' ' || w[r.i + 1] AS gram
  FROM w, unnest(range(1, len(w))) AS r(i)
), bgc AS (
  SELECT doc_id, gram, COUNT(*) AS c FROM bg GROUP BY 1, 2
), share AS (
  SELECT doc_id, ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_bigram_share
  FROM bgc GROUP BY 1
)
SELECT base.doc_id, n_tokens, dup_token_frac, share.top_bigram_share
FROM base LEFT JOIN share ON base.doc_id = share.doc_id
ORDER BY base.doc_id
"""


def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pretokenizer counts (llmdata.text.bpe_token_count): the
    corpus is letters-only word salad, so each doc is salted with a
    deterministic contraction/digit/punctuation suffix and both engines
    must count the same tokens under the shared pattern (Java ∩ RE2
    subset). Whitespace count alongside shows the budget divergence."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" it's v"),
            F.col("doc_id").cast("string"),
            F.lit(".0, (ok)! we'll see..."),
        ).alias("t"),
    )
    return salted.select(
        "doc_id",
        text.bpe_token_count(F.col("t")).alias("n_bpe"),
        F.size(F.split(F.col("t"), " ")).alias("n_ws"),
    ).orderBy("doc_id")


_BPE_PAT_SQL = text.BPE_TOKEN_PATTERN.replace("'", "''")
BPE_COUNT_SQL = f"""
WITH s AS (
  SELECT doc_id,
         text || ' it''s v' || CAST(doc_id AS VARCHAR) || '.0, (ok)! we''ll see...' AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_BPE_PAT_SQL}')) AS INT) AS n_bpe,
       CAST(len(string_split(t, ' ')) AS INT) AS n_ws
FROM s ORDER BY doc_id
"""


def winnow_fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (llmdata.text.winnow_fingerprints, the
    MOSS algorithm): every (doc, selected k-gram hash) row — two docs
    sharing a ≥ k+window−1 token run share a fingerprint. md5 hashing
    keeps the selected minima engine-portable."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return text.winnow_fingerprints(docs, k=5, window=4).orderBy(
        "doc_id", "fingerprint"
    )


_G5 = " || ' ' || ".join(f"w[i+{o}]" for o in range(5))
WINNOW_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id,
         list_transform(range(1, len(w) - 3), i -> {_G5}) AS grams
  FROM w
), h AS (
  SELECT doc_id,
         list_transform(grams, gr -> ('0x' || substr(md5(gr), 1, 8))::BIGINT) AS h
  FROM g
), sel AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(h) - 2), j -> list_min(h[j:(j+3)]))) AS fps
  FROM h
)
SELECT doc_id, unnest(fps) AS fingerprint
FROM sel ORDER BY doc_id, fingerprint
"""


def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style chunking (llmdata.text.chunk_documents): overlapping
    64-token windows, stride 48; chunk text emitted as an md5 hash so
    the comparison stays compact. Pure flatMap — no shuffle."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    out = text.chunk_documents(docs, chunk_tokens=64, overlap=16)
    return out.select(
        "doc_id",
        "chunk_id",
        F.md5("chunk_text").alias("chunk_hash"),
        "chunk_n_tokens",
    ).orderBy("doc_id", "chunk_id")


CHUNK_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS n
  FROM documents
), s AS (
  SELECT doc_id, ws, n, st.s,
         CAST(st.s / 48 AS BIGINT) AS chunk_id
  FROM t, unnest(range(0, greatest(n, 1), 48)) AS st(s)
  WHERE st.s = 0 OR st.s < n - 16
)
SELECT doc_id, chunk_id,
       md5(array_to_string(ws[s + 1 : s + 64], ' ')) AS chunk_hash,
       CAST(least(n - s, 64) AS BIGINT) AS chunk_n_tokens
FROM s ORDER BY doc_id, chunk_id
"""


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-5 cosine neighbors for every 10th vector
    (oracle-parity cosine formula; the LSH variant is the scale path)."""
    tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 10 == 0)
    return similarity.brute_force_topk(q, emb, k=5, prenormalize=False).orderBy(
        "query_id", "rank"
    )


COSINE_TOPK_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id % 10 = 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
  FROM q JOIN e c ON q.vec_id <> c.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


def ivf_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors (llmdata.similarity.ivf_topk):
    coarse quantizer + per-list inverted search with n_probe lists per
    query. Round 12 (VERDICT r11 #9): the quantizer here is the
    DETERMINISTIC k-lowest-id centroid set (the 16 lowest vec_ids'
    vectors, passed as explicit centroids — a legal IVF coarse
    quantizer, and one an ANSI-SQL oracle can reproduce exactly), so
    this entry is now FULLY oracle-checked: the twin replays the
    squared-L2 assignment (stable ties → lower list id), the 4-list
    probe, and the rounded-cosine top-5 in SQL. The MLlib-trained
    quantizer stays covered by ivf_index_topk / the PQ entries."""
    tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(16).collect()
    ]
    q = emb.where(F.col("vec_id") % 10 == 0)
    return similarity.ivf_topk(
        q, emb, k=5, n_lists=16, n_probe=4, centroids=cents
    ).orderBy("query_id", "rank")


IVF_TOPK_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS list_id, v AS c
  FROM e ORDER BY vec_id LIMIT 16
),
cd AS (
  SELECT e.vec_id, e.v, cents.list_id,
         list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, cents.c)
           + list_dot_product(cents.c, cents.c) AS d2
  FROM e CROSS JOIN cents
),
corpus_assign AS (
  SELECT vec_id, v, list_id FROM (
    SELECT vec_id, v, list_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
    FROM cd
  ) WHERE rn = 1
),
probe AS (
  SELECT vec_id AS query_id, v AS qv, list_id FROM (
    SELECT vec_id, v, list_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
    FROM cd WHERE vec_id % 10 = 0
  ) WHERE rn <= 4
),
pairs AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
         ROUND(list_dot_product(p.qv, a.v)
               / (sqrt(list_dot_product(p.qv, p.qv))
                  * sqrt(list_dot_product(a.v, a.v))), 6) AS cosine
  FROM probe p JOIN corpus_assign a USING (list_id)
  WHERE p.query_id <> a.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
         ) AS rank
  FROM pairs
)
WHERE rank <= 5
ORDER BY query_id, rank
"""



IVF_INDEX_TOPK_SQL = IVF_TOPK_SQL.replace("vec_id % 10", "vec_id % 50")


def pq_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 9: product-quantization ANN
    (``llmdata.similarity.fit_pq_codebooks/pq_encode/pq_topk``) — the
    FAISS ``PQ8 + refine`` shape. 64-dim float vectors encode to 8
    uint8 codes (32× smaller: the representation a 100 TB embedding
    corpus actually scans); search reads each query's m×256
    lookup table once and scores every code row with m codegen table
    lookups (asymmetric distance), then exact-rescoring ONLY the ADC
    shortlist recovers recall. Codebook training is seeded iterative
    k-means → rows-only check, but the recall claim is asserted
    IN-QUERY against the exact brute-force twin — ≥ 0.9 at
    rerank=50 — so the driver run fails loudly if quantization ever
    degrades (same pattern as the bloom prune assert)."""
    tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 50 == 0)
    # m=16 (4-dim subspaces, 16 B/vector = 16×) and a shortlist that
    # scales at 5% of the corpus: measured recall ≥ 0.99 at both
    # sf0.01 (500 vecs) and sf0.1 (2000 vecs) — the m=8/fixed-50
    # config cleared 0.9 only on the easier small corpus (0.83 at
    # sf0.1), exactly the scale-dependence the assert exists to catch
    n = emb.count()
    cbs = similarity.fit_pq_codebooks(emb, m=16)
    codes = similarity.pq_encode(emb, cbs)
    # persisted for the query's lifetime: the recall assertion collects
    # the search once and the RETURNED frame re-reads the cache instead
    # of re-encoding the corpus + re-running ADC + re-rank (guide §5;
    # same entry-level posture as semdedup_kmeans/pq_index_topk,
    # cleared by the caller's clearCache). The brute-force twin
    # collects concurrently (guide §2.6 — independent jobs).
    out = similarity.pq_topk(
        q, codes, cbs, k=5, rerank=max(50, n // 20), corpus=emb
    ).persist()
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        exact_fut = pool.submit(
            lambda: similarity.brute_force_topk(q, emb, k=5).collect()
        )
        got_fut = pool.submit(out.collect)
        exact = {(r["query_id"], r["neighbor_id"]) for r in exact_fut.result()}
        got = {(r["query_id"], r["neighbor_id"]) for r in got_fut.result()}
    assert len(got & exact) / max(len(exact), 1) >= 0.9
    return out.orderBy("query_id", "rank")


def cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs at cosine ≥ 0.38 (all-pairs at oracle
    scale; LSH buckets above the guard)."""
    tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_near_dup_pairs(
        emb, threshold=0.38, prenormalize=False
    ).orderBy("id_a", "id_b")


COSINE_NEAR_DUP_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.38
ORDER BY id_a, id_b
"""


def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: embedding-cosine near-dup
    pairs (≥ 0.38) → connected components (min-label pointer jumping) →
    keep ONE vector per semantic cluster (the min-id member) plus every
    unpaired vector. The embedding-space sibling of
    ``dedup_near_dup_docs``: same cluster/keep machinery
    (llmdata.dedup.cluster_pairs / dedup_by_cluster), different pair
    emitter (similarity.cosine_near_dup_pairs — all-pairs at oracle
    scale, LSH-bucketed above the guard, so at 100 TB the pair volume is
    collision-bounded). Oracle: brute-force pair SQL + the recursive-CTE
    min-reachable-id labels."""
    tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_near_dup_pairs(emb, threshold=0.38, prenormalize=False)
    return (
        dedup.dedup_by_cluster(emb, pairs, id_col="vec_id")
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


SEMANTIC_DEDUP_SQL = """
WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.38
), ed AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM p
), reach(id, r) AS (
  SELECT src, src FROM ed
  UNION
  SELECT e2.src, rr.r FROM ed e2 JOIN reach rr ON rr.id = e2.dst
), doomed AS (
  SELECT id FROM (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
  WHERE id != cluster_id
)
SELECT vec_id, label FROM embeddings
WHERE vec_id NOT IN (SELECT id FROM doomed)
ORDER BY vec_id
"""


def semdedup_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup proper (Abbas et al. 2023, arXiv:2303.09540 — round 10,
    ``llmdata.clustering.semantic_dedup``): k-means clusters bound the
    near-dup candidate search (the paper's trick that replaces the
    O(n²) all-pairs scan ``semantic_dedup_embeddings`` oracles at small
    scale), then within-cluster cosine pairs → min-label connected
    components → one representative kept per component. Rows-only
    (k-means is iterative float), but SELF-VALIDATING in-query:
    (a) kept + dropped partitions the corpus exactly, and (b) every
    dropped vector is provably redundant — it appears in ≥1
    within-cluster pair at the threshold (bounded-count asserts; no
    data-sized collect). Returns the per-cluster keep summary."""
    from simple_data_workflow_spark.llmdata.clustering import (
        assign_clusters,
        kmeans_fit,
        semantic_dedup,
        semantic_pairs,
    )

    tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    C = kmeans_fit(emb, k=8, iters=5)
    # the pair list is the expensive step (cluster-keyed self-join);
    # materialize it ONCE and reuse it for both the dedup and the
    # orphan audit — localCheckpoint so the second consumer doesn't
    # replay the join (storage reclaimed by the ContextCleaner)
    # assign ONCE and persist: the pair self-join reads it twice, the
    # dedup anti-join once, the audit once, the final summary once —
    # previously each was a fresh parquet scan + assign-UDF pass
    assigned = assign_clusters(emb, C).persist()
    pairs = semantic_pairs(
        emb, C, threshold=0.38, assigned=assigned
    ).localCheckpoint(eager=True)
    kept = semantic_dedup(emb, C, threshold=0.38, pairs=pairs, assigned=assigned)
    n_total = assigned.count()
    n_kept = kept.count()
    assert 0 < n_kept <= n_total
    participants = pairs.select(F.col("id_a").alias("vec_id")).unionByName(
        pairs.select(F.col("id_b").alias("vec_id"))
    ).distinct()
    dropped = assigned.select("vec_id").join(
        kept.select("vec_id"), "vec_id", "left_anti"
    )
    orphans = dropped.join(participants, "vec_id", "left_anti").count()
    assert orphans == 0, f"{orphans} dropped vectors have no near-dup pair"
    return (
        assigned
        .join(kept.select("vec_id", F.lit(1).alias("__k")), "vec_id", "left")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.coalesce("__k", F.lit(0))).alias("n_kept"),
        )
        .orderBy("cluster_id")
    )


def dup_ngram_fraction_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplication diagnostic (round 10,
    ``llmdata.dedup.dup_ngram_fraction`` — Lee et al. 2022,
    arXiv:2107.06499): per doc, the fraction of its 8-gram instances
    whose gram occurs in ≥1 OTHER document. Gram build is the codegen
    zip_with chain; per-(doc,gram) counts collapse map-side before the
    corpus-wide doc-frequency join (gram-keyed, never broadcast — the
    LM posture). Oracle replays grams/instances/frequency in DuckDB
    list SQL."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return dedup.dup_ngram_fraction(docs, n=8).orderBy("doc_id")


_DUPG8 = " || ' ' || ".join(f"w[i+{o}]" for o in range(8))
DUP_NGRAM_FRACTION_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w) - 6), i -> {_DUPG8})) AS gram
  FROM t WHERE len(w) >= 8
), inst AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, gram
), freq AS (
  SELECT gram, COUNT(*) AS nd FROM inst GROUP BY gram
), per AS (
  SELECT i.doc_id,
         CAST(SUM(i.cnt) AS BIGINT) AS n_gram_insts,
         CAST(SUM(CASE WHEN f.nd > 1 THEN i.cnt ELSE 0 END) AS BIGINT) AS dup_gram_insts
  FROM inst i JOIN freq f USING (gram) GROUP BY i.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_gram_insts, 0) AS n_gram_insts,
       COALESCE(p.dup_gram_insts, 0) AS dup_gram_insts,
       ROUND(CAST(p.dup_gram_insts AS DOUBLE)
             / NULLIF(CAST(p.n_gram_insts AS DOUBLE), 0), 6) AS dup_fraction
FROM documents d LEFT JOIN per p USING (doc_id)
ORDER BY doc_id
"""


def gopher_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule filter (round 10, ``llmdata.text.
    gopher_quality`` — Rae et al. 2021 §A1.1): per-doc word count,
    mean word length, symbol/alpha-word ratios and stopword hits, plus
    the conjunctive pass verdict (``min_words`` lowered to 20 for the
    synthetic ~30-word docs so both verdicts appear). Pure codegen
    expressions over the token array — one scan, no shuffle; the
    oracle replays every rule in DuckDB list-lambda SQL."""
    from simple_data_workflow_spark.llmdata.text import gopher_quality

    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    g = gopher_quality(docs, min_words=20)
    return g.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "mean_word_len",
        "symbol_ratio",
        "alpha_word_ratio",
        F.col("stopword_hits").cast("long").alias("stopword_hits"),
        "passes",
    ).orderBy("doc_id")


GOPHER_QUALITY_SQL = """
WITH m AS (
  SELECT doc_id,
         len(w) AS n_words,
         ROUND(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
               / NULLIF(CAST(len(w) AS DOUBLE), 0), 6) AS mean_word_len,
         ROUND(CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
               / NULLIF(CAST(len(w) AS DOUBLE), 0), 6) AS symbol_ratio,
         ROUND(CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
               / NULLIF(CAST(len(w) AS DOUBLE), 0), 6) AS alpha_word_ratio,
         len(list_filter(w, x -> lower(x) IN ('the','a','of','and','to','in','is','it'))) AS stopword_hits
  FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio, stopword_hits,
       (n_words >= 20 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio <= 0.1 AND alpha_word_ratio >= 0.8
        AND stopword_hits >= 2) AS passes
FROM m
ORDER BY doc_id
"""


def c4_clean_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rule set (round 10 second half, ``llmdata.text.
    c4_clean`` — Raffel et al. 2020 §2.2), the other canonical
    pretraining filter next to Gopher: line-level retention (terminal
    punctuation, ≥5 words, no "javascript") plus page-level verdicts
    (≥3 sentences, no "lorem ipsum", no ``{``, no bad words). The
    synthetic docs are single-line word salad, so the query first
    builds a deterministic multi-line PAGE per doc (sentence breaks at
    ' table ', plus doc_id-keyed injections of each page-level hazard)
    with the identical construction replayed in the DuckDB oracle —
    every rule fires both ways across the corpus."""
    from simple_data_workflow_spark.llmdata.text import c4_clean

    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    page = F.concat(
        F.regexp_replace(F.col("text"), " table ", ".\n"),
        F.lit("."),
        F.when(F.col("doc_id") % 17 == 0, F.lit("\nlorem ipsum dolor sit amet.")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 23 == 0, F.lit("\nif (x) { y(); }")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.lit("\nplease enable javascript to continue reading this page."),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.lit("\nthis line mentions an obscenity for the filter to catch."),
        ).otherwise(F.lit("")),
    )
    pages = docs.select("doc_id", page.alias("text"))
    out = c4_clean(pages)
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_kept_lines").cast("long").alias("n_kept_lines"),
        F.col("n_sentences").cast("long").alias("n_sentences"),
        "has_lorem_ipsum",
        "has_brace",
        "has_bad_word",
        "cleaned_text",
        "passes",
    ).orderBy("doc_id")


C4_CLEAN_SQL = r"""
WITH p AS (
  SELECT doc_id,
         concat(
           regexp_replace(text, ' table ', e'.\n', 'g'), '.',
           CASE WHEN doc_id % 17 = 0 THEN e'\nlorem ipsum dolor sit amet.' ELSE '' END,
           CASE WHEN doc_id % 23 = 0 THEN e'\nif (x) { y(); }' ELSE '' END,
           CASE WHEN doc_id % 11 = 0 THEN e'\nplease enable javascript to continue reading this page.' ELSE '' END,
           CASE WHEN doc_id % 13 = 0 THEN e'\nthis line mentions an obscenity for the filter to catch.' ELSE '' END
         ) AS text
  FROM documents
), s AS (
  SELECT doc_id, text,
         string_split(text, e'\n') AS lines,
         list_filter(string_split(text, e'\n'),
           l -> regexp_matches(l, '[.!?"]\s*$')
                AND len(string_split(trim(l), ' ')) >= 5
                AND NOT contains(lower(l), 'javascript')) AS kept
  FROM p
), m AS (
  SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(kept) AS BIGINT) AS n_kept_lines,
         CAST(len(regexp_extract_all(array_to_string(kept, e'\n'), '[.!?]')) AS BIGINT) AS n_sentences,
         contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
         contains(text, '{') AS has_brace,
         len(list_filter(regexp_split_to_array(lower(text), '[\s\n]+'),
             x -> x IN ('obscenity', 'slur'))) > 0 AS has_bad_word,
         array_to_string(kept, e'\n') AS cleaned_text
  FROM s
)
SELECT doc_id, n_lines, n_kept_lines, n_sentences, has_lorem_ipsum, has_brace,
       has_bad_word, cleaned_text,
       (n_sentences >= 3 AND NOT has_lorem_ipsum AND NOT has_brace
        AND NOT has_bad_word) AS passes
FROM m
ORDER BY doc_id
"""


def bm25_scores_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 lexical retrieval (round 10 second half,
    ``llmdata.text.bm25_scores`` — Robertson & Zaragoza 2009, Lucene
    idf variant): one query's relevance scores over the corpus, the
    baseline that sits next to embedding search in every RAG/curation
    stack. The explode stream filters to the query's terms BEFORE the
    per-(doc,term) map-side collapse, so nothing corpus-sized
    shuffles; N/avgdl are two scalars. The DuckDB oracle replays tf,
    df and the full scoring formula."""
    from simple_data_workflow_spark.llmdata.text import bm25_scores

    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    out = bm25_scores(docs, ["table", "spark", "merge", "vector"])
    return out.select("doc_id", "n_terms_hit", "score").orderBy("doc_id")


BM25_SQL = """
WITH d AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
), base AS (
  SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
         list_filter(w, x -> x IN ('table', 'spark', 'merge', 'vector')) AS qt
  FROM d
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM base
), tf AS (
  SELECT doc_id, dl, t AS term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, dl, UNNEST(qt) AS t FROM base)
  GROUP BY doc_id, dl, t
), dfq AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
)
SELECT tf.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
       ROUND(SUM(
         ln(1 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
         * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl))
       ), 6) AS score
FROM tf JOIN dfq USING (term) CROSS JOIN stats s
GROUP BY tf.doc_id
ORDER BY tf.doc_id
"""


def dedup_substring_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup (round 10 second half,
    ``llmdata.dedup.remove_dup_substrings`` — Lee et al. 2022's
    ExactSubstr re-expressed relationally): every duplicated word
    8-gram instance is removed corpus-wide except its canonical
    (minimal ``(doc_id, pos)``) occurrence, and each doc's text is
    rebuilt from the surviving token positions — tokens never leave
    their document row; only gram keys shuffle. The DuckDB oracle
    replays the whole edit (window canonicalization, coverage
    expansion, ordered re-aggregation)."""
    from simple_data_workflow_spark.llmdata.dedup import (
        remove_dup_substrings,
    )

    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    out = remove_dup_substrings(docs, n=8)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_removed_positions").cast("long").alias("n_removed_positions"),
        "dedup_text",
    ).orderBy("doc_id")


DEDUP_SUBSTRING_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), inst AS (
  SELECT t.doc_id, i - 1 AS pos, array_to_string(w[i:i+7], ' ') AS g
  FROM t, UNNEST(range(1, len(w) - 8 + 2)) AS u(i)
  WHERE len(w) >= 8
), marked AS (
  SELECT doc_id, pos,
         COUNT(*) OVER (PARTITION BY g) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
  FROM inst
), covered AS (
  SELECT DISTINCT doc_id, tp
  FROM (
    SELECT doc_id, UNNEST(range(pos, pos + 8)) AS tp
    FROM marked WHERE cnt > 1 AND rn > 1
  )
), toks AS (
  SELECT t.doc_id, i - 1 AS tp, w[i] AS tok
  FROM t, UNNEST(range(1, len(w) + 1)) AS u(i)
), kept AS (
  SELECT toks.doc_id, string_agg(tok, ' ' ORDER BY toks.tp) AS dedup_text
  FROM toks LEFT JOIN covered
    ON toks.doc_id = covered.doc_id AND toks.tp = covered.tp
  WHERE covered.tp IS NULL
  GROUP BY toks.doc_id
), rmcount AS (
  SELECT doc_id, COUNT(*) AS n_removed FROM covered GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed_positions,
       COALESCE(k.dedup_text, '') AS dedup_text
FROM documents d
LEFT JOIN kept k ON d.doc_id = k.doc_id
LEFT JOIN rmcount r ON d.doc_id = r.doc_id
ORDER BY d.doc_id
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column plumbing: synthesize binary+metadata from text,
    extract features via Arrow-batched mapInPandas (deterministic fake
    decode). Python-UDF path → rows-only check."""
    tune(spark)
    from simple_data_workflow_spark.llmdata.multimodal import (
        attach_fake_media,
        extract_features,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    feats = extract_features(media, fake_decode=True)
    # The typed array<float> API lives in extract_features; the registered
    # query serializes it because the driver's canonicalizer (pandas
    # sort_values over all columns) cannot hash numpy arrays.
    return feats.select(
        "doc_id",
        "mime",
        "n_bytes",
        F.concat_ws(
            ",", F.transform("features", lambda x: F.format_string("%.6f", x))
        ).alias("features_csv"),
    ).orderBy("doc_id")


def media_header_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 (VERDICT r9 #8): stdlib image-header metadata — mime +
    dimensions parsed from the BYTES of real PNG (zlib-built IHDR/IDAT)
    / JPEG (SOI-APP0-DQT-SOF0 walk) / GIF / BMP blobs synthesized
    deterministically per doc_id, via
    ``llmdata.multimodal.extract_media_meta`` (Arrow-batched
    mapInPandas, no decoder library). The query asserts in-line that
    every sniffed (mime, width, height, n_bytes) equals the dims/size
    the blob was built with — the NotImplementedError tier now covers
    only actual pixel decode. Round 12: because (mime, width, height)
    are closed-form in doc_id (the blob round-trip is what the sniffer
    must survive), the returned frame is fully oracle-checkable — the
    SQL twin recomputes the expected metadata arithmetically, so a
    sniffer that mis-parses ANY header fails the hash."""
    import struct
    import zlib
    from collections.abc import Iterator

    import pandas as pd

    from simple_data_workflow_spark.llmdata.multimodal import (
        extract_media_meta,
    )

    tune(spark)

    def png(w, h):
        def chunk(tag, data):
            c = struct.pack(">I", len(data)) + tag + data
            return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    def jpeg(w, h):
        app0 = (
            b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x01\x00\x00\x48\x00\x48\x00\x00"
        )
        sof0 = (
            b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", h, w)
            + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        )
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"

    def bmp(w, h):
        return (
            b"BM" + bytes(12) + struct.pack("<I", 40)
            + struct.pack("<ii", w, h) + bytes(8)
        )

    makers = [("image/png", png), ("image/jpeg", jpeg),
              ("image/gif", gif), ("image/bmp", bmp)]

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, mimes, ws, hs = [], [], [], []
            for d in pdf["doc_id"]:
                mime, mk = makers[int(d) % 4]
                w, h = 16 + int(d) % 640, 8 + int(d) % 480
                blobs.append(mk(w, h))
                mimes.append(mime)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": blobs,
                 "want_mime": mimes, "want_w": ws, "want_h": hs}
            )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(
        synth,
        "doc_id long, media binary, want_mime string, want_w int, want_h int",
    )
    sniffed = extract_media_meta(media).join(
        media.select(
            "doc_id", "want_mime", "want_w", "want_h",
            F.length("media").alias("want_bytes"),
        ),
        "doc_id",
    )
    bad = sniffed.where(
        (F.col("mime") != F.col("want_mime"))
        | (F.col("width") != F.col("want_w"))
        | (F.col("height") != F.col("want_h"))
        | (F.col("n_bytes") != F.col("want_bytes"))
    ).count()
    assert bad == 0, f"{bad} blobs sniffed wrong"
    return (
        sniffed.select("doc_id", "mime", "width", "height")
        .orderBy("doc_id")
    )


MEDIA_HEADER_META_SQL = """
SELECT doc_id,
       CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN 'image/png'
            WHEN 1 THEN 'image/jpeg'
            WHEN 2 THEN 'image/gif'
            ELSE 'image/bmp' END AS mime,
       CAST(16 + doc_id % 640 AS INT) AS width,
       CAST(8 + doc_id % 480 AS INT) AS height
FROM documents
ORDER BY doc_id
"""


def impute_cc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete-case drop (wrangle_na 'cc') over synthetically-masked
    events; row identity preserved via event_id."""
    tune(spark)
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") < 1, F.lit(None)).otherwise(F.col("value")).alias("v"),
        F.when(F.get_json_object("props", "$.k").cast("long") % 7 == 0, F.lit(None))
        .otherwise(F.get_json_object("props", "$.k").cast("long"))
        .alias("k"),
    )
    return wrangle_na(ev, strategy="cc", cols=["v", "k"]).orderBy("event_id")


IMPUTE_CC_SQL = """
WITH t AS (
  SELECT event_id,
         CASE WHEN value < 1 THEN NULL ELSE value END AS v,
         CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) % 7 = 0 THEN NULL
              ELSE CAST(json_extract(props, '$.k') AS BIGINT) END AS k
  FROM events
)
SELECT event_id, v, k FROM t WHERE v IS NOT NULL AND k IS NOT NULL ORDER BY event_id
"""


def impute_fii_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in + NA-pattern indicator columns (wrangle_na 'fii'):
    one boolean column per observed row-wise NA pattern (bit order =
    column order v,k; all-zeros dropped), mean/median fills computed with
    exact engine-portable sums."""
    tune(spark)
    from simple_data_workflow_spark.operators.na import na_indicator_columns

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") < 1, F.lit(None)).otherwise(F.col("value")).alias("v"),
        F.when(F.get_json_object("props", "$.k").cast("long") % 7 == 0, F.lit(None))
        .otherwise(F.get_json_object("props", "$.k").cast("long"))
        .alias("k"),
    )
    with_ind, names = na_indicator_columns(ev, ["v", "k"])
    stats = ev.agg(
        _dsum_scaled(F.col("v")).alias("s"),
        F.count("v").alias("n"),
        F.percentile(F.col("k"), F.lit(0.5)).alias("kmed"),
    ).first()
    v_fill = stats["s"] / stats["n"]
    k_fill = int(stats["kmed"]) if float(stats["kmed"]).is_integer() else stats["kmed"]
    # stable output schema across scale factors: a pattern that never
    # occurs (e.g. '11' at sf0.001) becomes a constant-False indicator
    ind_cols = [
        (F.col(p) if p in names else F.lit(False)).alias(p)
        for p in ("na_01", "na_10", "na_11")
    ]
    return with_ind.fillna({"v": v_fill, "k": k_fill}).select(
        "event_id", F.round("v", 6).alias("v"), "k", *ind_cols
    ).orderBy("event_id")


IMPUTE_FII_SQL = """
WITH t AS (
  SELECT event_id,
         CASE WHEN value < 1 THEN NULL ELSE value END AS v,
         CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) % 7 = 0 THEN NULL
              ELSE CAST(json_extract(props, '$.k') AS BIGINT) END AS k
  FROM events
), m AS (
  SELECT CAST(SUM(CAST(ROUND(v*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0/COUNT(v) AS vmu,
         CAST(MEDIAN(k) AS BIGINT) AS kmed
  FROM t
)
SELECT event_id,
       ROUND(COALESCE(v, vmu), 6) AS v,
       COALESCE(k, kmed) AS k,
       (v IS NOT NULL AND k IS NULL) AS na_01,
       (v IS NULL AND k IS NOT NULL) AS na_10,
       (v IS NULL AND k IS NULL) AS na_11
FROM t, m ORDER BY event_id
"""


def impute_gm_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand-model imputation (wrangle_na 'gm'): fii + the full
    feature × NA-indicator interaction set with patsy-compatible names
    (reference src/tasks.py:424-441; naming golden pinned at reference
    test_tasks.py:431-459)."""
    tune(spark)
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") < 1, F.lit(None)).otherwise(F.col("value")).alias("v"),
        F.when(F.get_json_object("props", "$.k").cast("long") % 7 == 0, F.lit(None))
        .otherwise(F.get_json_object("props", "$.k").cast("long"))
        .alias("k"),
    )
    out = wrangle_na(ev, strategy="gm", cols=["v", "k"])
    cols = [F.col("event_id"), F.round("v", 6).alias("v"), F.col("k")]
    for c in out.columns:
        if c.startswith("na_"):
            cols.append(F.col(f"`{c}`"))
        elif ":" in c:
            cols.append(F.round(F.col(f"`{c}`"), 6).alias(c))
    return out.select(*cols).orderBy("event_id")


IMPUTE_GM_SQL = """
WITH t AS (
  SELECT event_id,
         CASE WHEN value < 1 THEN NULL ELSE value END AS v,
         CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) % 7 = 0 THEN NULL
              ELSE CAST(json_extract(props, '$.k') AS BIGINT) END AS k
  FROM events
), m AS (
  SELECT AVG(v) AS vmu, CAST(MEDIAN(k) AS BIGINT) AS kmed FROM t
), f AS (
  SELECT event_id,
         COALESCE(v, vmu) AS v_f, COALESCE(k, kmed) AS k_f,
         (v IS NOT NULL AND k IS NULL) AS na_01,
         (v IS NULL AND k IS NOT NULL) AS na_10,
         (v IS NULL AND k IS NULL) AS na_11
  FROM t, m
)
SELECT event_id, ROUND(v_f, 6) AS v, k_f AS k, na_01, na_10, na_11,
       -- patsy redundancy: the FIRST indicator in each numeric bucket
       -- (na_01) is full-coded ([False]/[True]); later ones treatment-coded
       ROUND(v_f * (CASE WHEN NOT na_01 THEN 1.0 ELSE 0.0 END), 6) AS "Q(""v""):Q(""na_01"")[False]",
       ROUND(v_f * (CASE WHEN na_01 THEN 1.0 ELSE 0.0 END), 6) AS "Q(""v""):Q(""na_01"")[True]",
       ROUND(v_f * (CASE WHEN na_10 THEN 1.0 ELSE 0.0 END), 6) AS "Q(""v""):Q(""na_10"")[T.True]",
       ROUND(v_f * (CASE WHEN na_11 THEN 1.0 ELSE 0.0 END), 6) AS "Q(""v""):Q(""na_11"")[T.True]",
       ROUND(k_f * (CASE WHEN NOT na_01 THEN 1.0 ELSE 0.0 END), 6) AS "Q(""k""):Q(""na_01"")[False]",
       ROUND(k_f * (CASE WHEN na_01 THEN 1.0 ELSE 0.0 END), 6) AS "Q(""k""):Q(""na_01"")[True]",
       ROUND(k_f * (CASE WHEN na_10 THEN 1.0 ELSE 0.0 END), 6) AS "Q(""k""):Q(""na_10"")[T.True]",
       ROUND(k_f * (CASE WHEN na_11 THEN 1.0 ELSE 0.0 END), 6) AS "Q(""k""):Q(""na_11"")[T.True]"
FROM f ORDER BY event_id
"""



def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 12 BPE merges learned from the documents corpus
    (llmdata.bpe.bpe_train — word-frequency formulation: one corpus
    scan, then |vocab|-sized merge iterations). Deterministic merge
    order (count desc, pair asc) but iterative, so no SQL oracle —
    correctness is pinned by the pure-Python golden in
    tests/test_llmdata.py::test_bpe_train_matches_reference."""
    tune(spark)
    from simple_data_workflow_spark.llmdata.bpe import bpe_train

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=12)
    from simple_data_workflow_spark.smalldf import small_df

    return small_df(
        spark,
        [(i + 1, p, int(c)) for i, (p, c) in enumerate(merges)],
        "merge_no int, pair string, count long",
    ).orderBy("merge_no")


def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE ENCODING with the trained merges
    (llmdata.bpe.bpe_encode): each distinct word is encoded once
    (Arrow-batched UDF over the vocabulary table) and joined back to
    the corpus — cost ∝ |vocab|, not corpus tokens. Iterative training
    + engine-seeded segmentation ⇒ rows-only; exactness vs the naive
    per-document encoding is pinned in
    tests/test_llmdata.py::test_bpe_encode_matches_per_word_segment."""
    tune(spark)
    from simple_data_workflow_spark.llmdata.bpe import bpe_encode, bpe_train

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=12)
    return (
        bpe_encode(docs, merges)
        .select("doc_id", "n_tokens")
        .orderBy("doc_id")
    )



def ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent IVF-ANN index on the table format
    (llmdata.ann_index): corpus committed range-clustered by inverted
    list, search reads through table_scan's stats pruning so unprobed
    lists' files are never opened. Round 13 (VERDICT r12 #5): the
    index builds over the DETERMINISTIC k-lowest-id coarse quantizer
    (the same legal-IVF trick that made ivf_topk_embeddings
    hash-checked in r12), so the PERSISTED-index path is now fully
    oracle-checked too — the twin replays squared-L2 assignment,
    4-list probe and rounded-cosine top-5 in ANSI SQL. The MLlib
    TRAINED quantizer stays covered by the PQ entries and
    tests/test_llmdata.py (exact parity with in-memory ivf_topk,
    file-pruning pinned)."""
    import tempfile

    from simple_data_workflow_spark.llmdata.ann_index import (
        build_ivf_index,
        ivf_index_search,
    )

    tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(16).collect()
    ]
    path = tempfile.mkdtemp(prefix="sdw-ivf-") + "/idx"
    build_ivf_index(emb, path, n_lists=16, centroids=cents)
    q = emb.where(F.col("vec_id") % 50 == 0)
    return ivf_index_search(spark, path, q, k=5, n_probe=4).orderBy(
        "query_id", "rank"
    )


def pq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 (VERDICT r9 #2): PERSISTED product-quantization index
    (``llmdata.ann_index.build_pq_index``/``pq_index_search``) built
    IVF-PQ — FAISS's production ``IVF16,PQ16`` shape. The codes table
    commits range-partitioned on ``list_id`` so a serving batch scans
    only the probed lists' files (driver-side stats pruning) and reads
    16 uint8 codes per surviving vector instead of 64 floats — the two
    IO cuts compose; codebooks/centroids live in bounded companion
    tables; exact re-rank of the ADC shortlist recovers recall, which
    is asserted IN-QUERY against the brute-force twin (≥ 0.8 with 8/16
    lists probed — IVF probing bounds recall by construction, unlike
    the flat ``pq_topk_embeddings``'s 0.9). Engine-seeded k-means ⇒
    rows-only; flat-index parity with in-memory ``pq_topk`` and the
    file-pruning behavior are pinned in tests/test_llmdata.py."""
    import tempfile

    from simple_data_workflow_spark.llmdata.ann_index import (
        build_pq_index,
        pq_index_search,
    )

    tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    path = tempfile.mkdtemp(prefix="sdw-pqidx-") + "/idx"
    build_pq_index(emb, path, m=16, n_lists=16)
    q = emb.where(F.col("vec_id") % 50 == 0)
    # persisted for the query's lifetime: the recall assertion collects
    # the search once and the RETURNED frame re-reads the cache instead
    # of re-running the whole index scan + ADC + re-rank (guide §5 —
    # reuse justifies the cache; same entry-level posture as
    # semdedup_kmeans, cleared by the caller's clearCache)
    out = pq_index_search(
        spark, path, q, k=5, n_probe=8, rerank=max(50, n // 10), corpus=emb
    ).persist()
    # the brute-force twin and the indexed search are independent jobs —
    # collect them on two threads so neither waits on the other's tail
    # (guide §2.6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        exact_fut = pool.submit(
            lambda: similarity.brute_force_topk(q, emb, k=5).collect()
        )
        got_fut = pool.submit(out.collect)
        exact = {(r["query_id"], r["neighbor_id"]) for r in exact_fut.result()}
        got = {(r["query_id"], r["neighbor_id"]) for r in got_fut.result()}
    assert len(got & exact) / max(len(exact), 1) >= 0.8
    return out.orderBy("query_id", "rank")


def cluster_balanced_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic cluster balancing (``llmdata.clustering``): distributed
    k-means over the embedding corpus (assign = one vectorized Arrow
    scan per iteration; update = ONE grouped aggregate collecting
    exactly k×dim cells — nothing data-sized at the driver), then a
    per-cluster cap via the stateless hash-rank window — the mixing
    lever that stops one embedding neighborhood from dominating a
    training token budget. Iterative ⇒ rows-only; the distributed fit
    is pinned EXACTLY equal to a driver-side numpy Lloyd twin in
    ``tests/test_llmdata.py::test_kmeans_matches_numpy_lloyd``. Returns
    per-cluster kept/total counts; the cap invariant is asserted
    in-query."""
    from simple_data_workflow_spark.llmdata.clustering import (
        assign_clusters,
        cluster_balanced_sample,
        kmeans_fit,
    )

    tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    cap = max(20, n // 16)  # scale the quota with the corpus
    cents = kmeans_fit(emb, k=8, iters=5)
    kept = (
        cluster_balanced_sample(emb, cents, cap_per_cluster=cap)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    total = (
        assign_clusters(emb, cents)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_total"))
    )
    out = (
        total.join(kept, "cluster_id", "left")
        .select(
            "cluster_id",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "n_total",
        )
        .orderBy("cluster_id")
    )
    rows = out.collect()
    assert all(r["n_kept"] <= cap for r in rows)
    assert all(r["n_kept"] == min(r["n_total"], cap) for r in rows)
    from simple_data_workflow_spark.smalldf import small_df

    return small_df(spark, [tuple(r) for r in rows], out.schema)


def quality_classifier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-regression quality classifier
    (``llmdata.classify.train_logreg`` / ``logreg_score``) — the
    fastText/CCNet-shaped pretraining gate. Features are cheap codegen
    text statistics (stopword ratio, punctuation ratio, log token
    count); the weak label marks documents longer than 400 chars.
    Training is IRLS where each Newton step is ONE map-side-combined
    aggregate (k sums + k(k+1)/2 Hessian cells) and a 4×4 driver
    solve — the same scan count on 100 TB. Iterative ⇒ rows-only; the
    distributed fit is pinned equal to a driver-side numpy IRLS twin
    in ``tests/test_llmdata.py::test_logreg_matches_numpy_irls``."""
    from simple_data_workflow_spark.llmdata.classify import (
        logreg_score,
        train_logreg,
    )

    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        text.stopword_ratio(F.col("text")).alias("stop_r"),
        text.punct_ratio(F.col("text")).alias("punct_r"),
        F.log1p(text.token_count(F.col("text"))).alias("log_toks"),
        (F.length("text") > 400).cast("double").alias("label"),
    ).persist()
    # the string-heavy feature projection is scanned by every one of
    # the 8 IRLS aggregates AND the final scoring pass — persist it
    # once (doc_id + 4 doubles, far smaller than the text it derives
    # from; guide §5 reuse-justifies-cache, entry-level like
    # semdedup_kmeans, cleared by the caller's clearCache)
    beta = train_logreg(
        feats, ["stop_r", "punct_r", "log_toks"], "label", iters=8
    )
    return (
        logreg_score(feats, beta, ["stop_r", "punct_r", "log_toks"])
        .select("doc_id", F.round("quality_prob", 4).alias("quality_prob"))
        .orderBy(F.desc("quality_prob"), "doc_id")
        .limit(50)
    )


def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-name pairs within Levenshtein distance 1 via SymSpell
    deletion-variant blocking (llmdata.dedup.fuzzy_pairs) — equi-join on
    codegen deletion variants + exact levenshtein verify, linear in
    total characters instead of the oracle's n² cross join."""
    tune(spark)
    cust = _t(spark, sf_dir, "customer")
    # no output orderBy: the correctness gate hashes order-insensitively
    # and nothing else consumes row order, so the global range sort of
    # the (large) pair set was pure presentational cost (guide §2.4 —
    # "an orderBy used only to make output deterministic"); the result
    # MULTISET is unchanged
    return dedup.fuzzy_pairs(
        cust, id_col="c_custkey", text_col="c_name", max_edit=1
    )


FUZZY_NAME_SQL = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a, customer b
WHERE a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1
ORDER BY id_a, id_b
"""


def fuzzy_edit2_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 (VERDICT r9 #5): fuzzy matching at Levenshtein distance
    ≤ 2 — SymSpell order-2 deletion-variant blocking
    (llmdata.dedup.fuzzy_pairs(max_edit=2)): candidates come from an
    equi-join on {s} ∪ del1(s) ∪ del2(s) (~len²/2 codegen variants per
    row, linear in rows vs the oracle's n² cross join), then the exact
    levenshtein verify keeps only true ≤2 pairs. The oracle IS the
    brute-force twin, so the value hash pins the SymSpell d=2 blocking
    guarantee: no pair within two edits escapes the variant join."""
    tune(spark)
    cust = _t(spark, sf_dir, "customer")
    # no output orderBy — same reasoning as fuzzy_name_matches; on the
    # 4.08M-pair sf0.1 output the sort alone measured ~5-8 s, roughly
    # DOUBLING the query
    return dedup.fuzzy_pairs(
        cust, id_col="c_custkey", text_col="c_name", max_edit=2
    )


FUZZY_EDIT2_SQL = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a, customer b
WHERE a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 2
ORDER BY id_a, id_b
"""


def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus terms via per-partition Misra-Gries summaries +
    exact candidate re-count (llmdata.text.heavy_hitters) — bounded
    executor memory regardless of vocabulary size; reported counts are
    exact, the sketch only bounds which terms are considered."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return text.heavy_hitters(docs, k=20)


HEAVY_HITTERS_SQL = """
WITH toks AS (
  SELECT t.term FROM documents, unnest(string_split(lower(text), ' ')) AS t(term)
  WHERE len(t.term) >= 1
)
SELECT term, COUNT(*) AS n_occurrences
FROM toks GROUP BY term
ORDER BY n_occurrences DESC, term LIMIT 20
"""


def tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF term per document (llmdata.text.tfidf_top_terms):
    explode -> tf/df aggregates -> broadcast join -> per-doc window."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return text.tfidf_top_terms(docs, k=1).orderBy("doc_id")


TFIDF_SQL = """
WITH n AS (SELECT COUNT(*) AS c FROM documents),
tf AS (
  SELECT doc_id, t.term, COUNT(*) AS tf
  FROM documents, unnest(string_split(text, ' ')) AS t(term)
  GROUP BY 1, 2
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT doc_id, tf.term,
         tf * ln((SELECT c FROM n) * 1.0 / df.df) AS score
  FROM tf JOIN df ON tf.term = df.term
),
r AS (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
  FROM scored
)
SELECT doc_id, term, ROUND(score, 6) AS score, rk FROM r WHERE rk = 1 ORDER BY doc_id
"""


def bigram_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 bigrams by document frequency (n-gram generation)."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return text.bigram_doc_freq(docs, top_n=20)


BIGRAM_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, t.gram
  FROM w, unnest(list_distinct(list_transform(range(1, len(ws)),
             i -> ws[i] || ' ' || ws[i+1]))) AS t(gram)
  WHERE len(ws) >= 2
)
SELECT gram, COUNT(*) AS n_docs
FROM g GROUP BY 1
ORDER BY n_docs DESC, gram ASC
LIMIT 20
"""



def pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (llmdata.packing.pack_sequences): documents
    ordered by doc_id form one token stream cut into 256-token context
    windows; per-doc placement (start offset, window id, windows
    spanned) via a distributed range-sharded prefix sum — never a
    global-order window."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return packing.pack_sequences(docs, budget=256).select(
        "doc_id", "n_tokens", "start_token", "bin_id", "n_bins"
    ).orderBy("doc_id")


PACK_SQL = """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
  FROM t
)
SELECT doc_id, n_tokens, start_token,
       start_token // 256 AS bin_id,
       (start_token + GREATEST(n_tokens, 1) - 1) // 256 - start_token // 256 + 1 AS n_bins
FROM c ORDER BY doc_id
"""


def train_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware split (llmdata.packing.split_train_holdout): the side
    is a hash of the SOURCE alone, so a source's documents never straddle
    the split (no near-dup leakage). Pure stateless filter."""
    tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return packing.split_train_holdout(docs, "source", holdout_pct=20).select(
        "doc_id", "source", "split"
    ).orderBy("doc_id")


SPLIT_SQL = """
SELECT doc_id, source,
       CASE WHEN ('0x' || substr(md5('split|' || coalesce(source, chr(0) || 'null')), 1, 8))::BIGINT % 100 < 20
            THEN 'holdout' ELSE 'train' END AS split
FROM documents ORDER BY doc_id
"""


def quantize_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization with reconstruction-error
    audit (llmdata.similarity.quantize_embeddings) — the 4× memory/IO
    reduction before index build; qvec emitted as CSV text (the driver
    hash compares scalar reprs)."""
    tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.quantize_embeddings(emb)
    return out.select(
        "vec_id",
        "scale",
        F.array_join("qvec", ",").alias("qvec_csv"),
        "max_abs_err",
        "mse",
    ).orderBy("vec_id")


QUANTIZE_SQL = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings
), s AS (
  SELECT vec_id, ve, list_max(list_transform(ve, x -> abs(x))) / 127.0 AS scale
  FROM v
), q AS (
  SELECT vec_id, ve, scale,
         list_transform(ve, x ->
           CAST(COALESCE(round(x / nullif(scale, 0.0)), 0) AS INTEGER)) AS qv
  FROM s
), e AS (
  SELECT vec_id, scale, qv,
         list_transform(ve, x ->
           abs(CAST(COALESCE(round(x / nullif(scale, 0.0)), 0) AS INTEGER) * scale - x)) AS err,
         len(ve) AS n
  FROM q
)
SELECT vec_id,
       ROUND(scale, 6) AS scale,
       array_to_string(qv, ',') AS qvec_csv,
       ROUND(list_max(err), 6) AS max_abs_err,
       ROUND(list_sum(list_transform(err, x -> x * x)) / n, 6) AS mse
FROM e ORDER BY vec_id
"""


def overlapping_incident_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (operators.joins.interval_overlap_join):
    10-minute windows opened by high-value error events overlapped
    against 30-minute windows opened by purchase events — pairs meet on
    a shared time-grid chunk and are kept only in the canonical chunk of
    the intersection start (no dedup pass). Counts overlapping purchase
    windows per error window."""
    tune(spark)
    ev = _t(spark, sf_dir, "events")
    errors = ev.where((F.col("event_type") == "error") & (F.col("value") > 18)).select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("e_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e_end"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("p_end"),
    )
    joined = joins.interval_overlap_join(
        errors, purchases, "e_start", "e_end", "p_start", "p_end", chunk_seconds=600
    )
    return (
        joined.groupBy("error_id")
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
        .orderBy("error_id")
    )


OVERLAP_WINDOWS_SQL = """
WITH e AS (
  SELECT event_id AS error_id, ts AS e_start, ts + INTERVAL 10 MINUTE AS e_end
  FROM events WHERE event_type = 'error' AND value > 18
), p AS (
  SELECT event_id AS purchase_id, ts AS p_start, ts + INTERVAL 30 MINUTE AS p_end
  FROM events WHERE event_type = 'purchase'
)
SELECT e.error_id, COUNT(*) AS n_overlaps
FROM e JOIN p ON GREATEST(e.e_start, p.p_start) < LEAST(e.e_end, p.p_end)
GROUP BY e.error_id ORDER BY e.error_id
"""


def error_window_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join (operators.joins.interval_join): click
    events matched into 5-minute windows opened by high-value error
    events — time-grid bucketed equi-join + exact range filter, never
    the O(L·R) nested-loop a bare range predicate produces."""
    tune(spark)
    ev = _t(spark, sf_dir, "events")
    errors = ev.where((F.col("event_type") == "error") & (F.col("value") > 18)).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("w_end"),
    )
    clicks = ev.where(F.col("event_type") == "click").select("ts", "value")
    joined = joins.interval_join(clicks, errors, "ts", "w_start", "w_end", chunk_seconds=300)
    return (
        joined.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.round(_dsum_scaled(F.col("value")), 6).alias("click_value"),
        )
        .orderBy("window_id")
    )


ERROR_WINDOW_SQL = """
WITH e AS (
  SELECT event_id AS window_id, ts AS w_start, ts + INTERVAL 5 MINUTE AS w_end
  FROM events WHERE event_type = 'error' AND value > 18
), c AS (
  SELECT ts, value FROM events WHERE event_type = 'click'
)
SELECT window_id,
       COUNT(*) AS n_clicks,
       ROUND(CAST(SUM(CAST(ROUND(value * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0, 6) AS click_value
FROM e JOIN c ON c.ts >= e.w_start AND c.ts < e.w_end
GROUP BY window_id ORDER BY window_id
"""


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_std_revenue(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    q = {
        "hudi_incremental_read": _wrap(hudi_incremental_read),
        "iceberg_branch_read": _wrap(iceberg_branch_read),
        "delta_constraint_roundtrip": _wrap(delta_constraint_roundtrip),
        "delta_clone_read": _wrap(delta_clone_read),
        "delta_v2_checkpoint_read": _wrap(delta_v2_checkpoint_read),
        "hudi_cluster_read": _wrap(hudi_cluster_read),
        "delta_column_ddl_read": _wrap(delta_column_ddl_read),
        "delta_mapped_cdf_roundtrip": _wrap(delta_mapped_cdf_roundtrip),
        "iceberg_v3_native_roundtrip": _wrap(iceberg_v3_native_roundtrip),
        "iceberg_orc_mixed_read": _wrap(iceberg_orc_mixed_read),
        "iceberg_spec_evolution_read": _wrap(iceberg_spec_evolution_read),
        "tablelog_wap_publish": _wrap(tablelog_wap_publish),
        "tablelog_tag_read": _wrap(tablelog_tag_read),
        "tablelog_metadata_tables": _wrap(tablelog_metadata_tables),
        "salted_skew_join": _wrap(salted_skew_join),
        "tablelog_partitioned_scan": _wrap(tablelog_partitioned_scan),
        "tablelog_cdf_view": _wrap(tablelog_cdf_view),
        "tablelog_batch_format_scan": _wrap(tablelog_batch_format_scan),
        "tablelog_clone_timetravel": _wrap(tablelog_clone_timetravel),
        "tablelog_mor_delete": _wrap(tablelog_mor_delete),
        "tablelog_mor_dml": _wrap(tablelog_mor_dml),
        "tablelog_bloom_lookup": _wrap(tablelog_bloom_lookup),
        "perplexity_score_docs": _wrap(perplexity_score_docs),
        "perplexity_heldout_docs": _wrap(perplexity_heldout_docs),
        "tablelog_rename_scan": _wrap(tablelog_rename_scan),
        "tablelog_schema_evolution": _wrap(tablelog_schema_evolution),
        "delta_interop_roundtrip": _wrap(delta_interop_roundtrip),
        "iceberg_interop_read": _wrap(iceberg_interop_read),
        "iceberg_write_roundtrip": _wrap(iceberg_write_roundtrip),
        "iceberg_pos_delete_read": _wrap(iceberg_pos_delete_read),
        "iceberg_eq_delete_read": _wrap(iceberg_eq_delete_read),
        "iceberg_dml_roundtrip": _wrap(iceberg_dml_roundtrip),
        "iceberg_update_roundtrip": _wrap(iceberg_update_roundtrip),
        "iceberg_merge_roundtrip": _wrap(iceberg_merge_roundtrip),
        "iceberg_schema_evolution": _wrap(iceberg_schema_evolution),
        "iceberg_compact_roundtrip": _wrap(iceberg_compact_roundtrip),
        "delta_dv_write_roundtrip": _wrap(delta_dv_write_roundtrip),
        "hudi_mor_read": _wrap(hudi_mor_read),
        "delta_stream_read": _wrap(delta_stream_read),
        "delta_optimize_roundtrip": _wrap(delta_optimize_roundtrip),
        "hudi_compact_read": _wrap(hudi_compact_read),
        "iceberg_stream_read": _wrap(iceberg_stream_read),
        "iceberg_eq_delete_write": _wrap(iceberg_eq_delete_write),
        "iceberg_v3_dv_read": _wrap(iceberg_v3_dv_read),
        "delta_cdf_roundtrip": _wrap(delta_cdf_roundtrip),
        "hudi_1x_read": _wrap(hudi_1x_read),
        "iceberg_changelog_read": _wrap(iceberg_changelog_read),
        "hudi_stream_read": _wrap(hudi_stream_read),
        "delta_idmode_read": _wrap(delta_idmode_read),
        "delta_dv_read": _wrap(delta_dv_read),
        "tablelog_hidden_partition_scan": _wrap(tablelog_hidden_partition_scan),
        "trigram_perplexity_docs": _wrap(trigram_perplexity_docs),
        "fivegram_perplexity_docs": _wrap(fivegram_perplexity_docs),
        "funnel_conversion": _wrap(rel.funnel_conversion),
        "listagg_priorities_by_segment": _wrap(rel.listagg_priorities_by_segment),
        "tablelog_dml_roundtrip": _wrap(tablelog_dml_roundtrip),
        "tablelog_scan_pruned": _wrap(tablelog_scan_pruned),
        "tablelog_incremental_view": _wrap(tablelog_incremental_view),
        "ivf_index_topk": _wrap(ivf_index_topk),
        "pq_index_topk": _wrap(pq_index_topk),
        "multimodal_features": _wrap(multimodal_features),
        "media_header_meta": _wrap(media_header_meta),
        "bloom_decontaminate_docs": _wrap(bloom_decontaminate_docs),
        "asof_next_order": _wrap(rel.asof_next_order),
        "cap_docs_per_source": _wrap(cap_docs_per_source),
        "overlapping_incident_windows": _wrap(overlapping_incident_windows),
        # round-6 registrations (TPC-H shapes + batteries, formerly dead code)
        "q6_forecast_revenue": _wrap(rel.q6_forecast_revenue),
        "q4_priority_exists": _wrap(rel.q4_priority_exists),
        "q10_returned_items": _wrap(rel.q10_returned_items),
        "q14_promo_effect": _wrap(rel.q14_promo_effect),
        "q19_disjunctive_revenue": _wrap(rel.q19_disjunctive_revenue),
        "stats_moments_battery": _wrap(rel.stats_moments_battery),
        "window_nav_battery": _wrap(rel.window_nav_battery),
        # round-6 CDC/temporal/incremental-maintenance operators (new)
        "scd2_customer_status": _wrap(rel.scd2_customer_status),
        "temporal_status_of_clicks": _wrap(rel.temporal_status_of_clicks),
        "incremental_agg_orders": _wrap(rel.incremental_agg_orders),
        "ewma_customer_orders": _wrap(rel.ewma_customer_orders),
        "heavy_hitter_terms": _wrap(heavy_hitter_terms),
        "weighted_median_price": _wrap(rel.weighted_median_price),
        "fuzzy_name_matches": _wrap(fuzzy_name_matches),
        "fuzzy_edit2_matches": _wrap(fuzzy_edit2_matches),
        "quality_classifier_docs": _wrap(quality_classifier_docs),
        "cluster_balanced_embeddings": _wrap(cluster_balanced_embeddings),
        "bpe_train_merges": _wrap(bpe_train_merges),
        "bpe_encode_docs": _wrap(bpe_encode_docs),
        "profile_orders": _wrap(rel.profile_orders),
        "cohort_retention": _wrap(rel.cohort_retention),
        # round-6 TPC-H completions + semantic dedup (never driver-checked)
        "q7_volume_shipping": _wrap(rel.q7_volume_shipping),
        "q8_market_share": _wrap(rel.q8_market_share),
        "q9_product_profit": _wrap(rel.q9_product_profit),
        "q11_important_parts": _wrap(rel.q11_important_parts),
        "q12_shipdelay_priority": _wrap(rel.q12_shipdelay_priority),
        "q15_top_supplier": _wrap(rel.q15_top_supplier),
        "q16_supplier_variety": _wrap(rel.q16_supplier_variety),
        "q17_small_quantity_revenue": _wrap(rel.q17_small_quantity_revenue),
        "q22_dormant_customers": _wrap(rel.q22_dormant_customers),
        "semantic_dedup_embeddings": _wrap(semantic_dedup_embeddings),
        "semdedup_kmeans_embeddings": _wrap(semdedup_kmeans_embeddings),
        "dup_ngram_fraction_docs": _wrap(dup_ngram_fraction_docs),
        "gopher_quality_docs": _wrap(gopher_quality_docs),
        "c4_clean_docs": _wrap(c4_clean_docs),
        "dedup_substring_docs": _wrap(dedup_substring_docs),
        "bm25_scores_docs": _wrap(bm25_scores_docs),
        "hudi_interop_read": _wrap(hudi_interop_read),
        "hudi_write_roundtrip": _wrap(hudi_write_roundtrip),
        "hudi_upsert_roundtrip": _wrap(hudi_upsert_roundtrip),
        "delta_dml_roundtrip": _wrap(delta_dml_roundtrip),
        "delta_merge_roundtrip": _wrap(delta_merge_roundtrip),
        "delta_dv_dml_roundtrip": _wrap(delta_dv_dml_roundtrip),
        "delta_restore_roundtrip": _wrap(delta_restore_roundtrip),
        "iceberg_rollback_roundtrip": _wrap(iceberg_rollback_roundtrip),
        "delta_skipping_scan": _wrap(delta_skipping_scan),
        "iceberg_pruned_scan": _wrap(iceberg_pruned_scan),
        "iceberg_wap_publish": _wrap(iceberg_wap_publish),
        "delta_zorder_scan": _wrap(delta_zorder_scan),
        # relational/OLAP coverage (SURVEY.md §2.2) — local-green only
        "q1_pricing_summary": _wrap(rel.q1_pricing_summary),
        "q3_top_orders": _wrap(rel.q3_top_orders),
        "q5_region_revenue": _wrap(rel.q5_region_revenue),
        "top3_orders_per_segment": _wrap(rel.top3_orders_per_segment),
        "revenue_by_year": _wrap(rel.revenue_by_year),
        "rollup_flag_status": _wrap(rel.rollup_flag_status),
        "segment_without_recent_orders": _wrap(rel.segment_without_recent_orders),
        "nations_with_both": _wrap(rel.nations_with_both),
        "events_json_kpi": _wrap(rel.events_json_kpi),
        "sessionize_events": _wrap(rel.sessionize_events),
        "windowed_event_counts": _wrap(rel.windowed_event_counts),
        "asof_last_signup": _wrap(rel.asof_last_signup),
        "cube_year_flag": _wrap(rel.cube_year_flag),
        "pivot_segment_by_year": _wrap(rel.pivot_segment_by_year),
        "distinct_parts_per_flag": _wrap(rel.distinct_parts_per_flag),
        "quantiles_by_segment": _wrap(rel.quantiles_by_segment),
        "large_parts_except_cheap": _wrap(rel.large_parts_except_cheap),
        "asof_purchase_order": _wrap(rel.asof_purchase_order),
        # --- position 50: driver window ends here --- (the 20 entries
        # below slid out when the CDC/TPC-H/heavy-hitter/UDAF/fuzzy/BPE/
        # profiling/cohort blocks took their slots; all have local-oracle
        # evidence and queue for the r7 rotation)
        "sql_grouping_sets": _wrap(rel.sql_grouping_sets),
        "customers_above_segment_avg": _wrap(rel.customers_above_segment_avg),
        "unpivot_flag_metrics": _wrap(rel.unpivot_flag_metrics),
        "approx_sketches": _wrap(rel.approx_sketches),
        "sliding_window_counts": _wrap(rel.sliding_window_counts),
        "running_customer_revenue": _wrap(rel.running_customer_revenue),
        "events_props_map": _wrap(rel.events_props_map),
        "order_count_distribution": _wrap(rel.order_count_distribution),
        "big_orders": _wrap(rel.big_orders),
        # LLM-data extensions — local-green only
        "impute_cc_events": _wrap(impute_cc_events),
        "impute_fii_events": _wrap(impute_fii_events),
        "impute_gm_events": _wrap(impute_gm_events),
        "tfidf_top_term": _wrap(tfidf_top_term),
        "bigram_doc_freq": _wrap(bigram_doc_freq),
        "dedup_exact_docs": _wrap(dedup_exact_docs),
        "decontaminate_docs": _wrap(decontaminate_docs),
        "stratified_sample_docs": _wrap(stratified_sample_docs),
        "embedding_stats": _wrap(embedding_stats),
        # driver-green in r1-r5 on current testdata (rotated out of window)
        "corpus_curation": _wrap(corpus_curation),
        "order_rank_metrics": _wrap(rel.order_rank_metrics),
        "string_fn_battery": _wrap(rel.string_fn_battery),
        "date_fn_battery": _wrap(rel.date_fn_battery),
        "cheapest_supplier_per_nation": _wrap(rel.cheapest_supplier_per_nation),
        "conditional_agg_battery": _wrap(rel.conditional_agg_battery),
        "weighted_avg_price": _wrap(rel.weighted_avg_price),
        "regexp_extract_brands": _wrap(rel.regexp_extract_brands),
        "rollup_with_grouping_id": _wrap(rel.rollup_with_grouping_id),
        "ngram_jaccard_near_dups": _wrap(ngram_jaccard_near_dups),
        "minhash_lsh_near_dups": _wrap(minhash_lsh_near_dups),
        "minhash_md5_near_dups": _wrap(minhash_md5_near_dups),
        "simhash_docs": _wrap(simhash_docs),
        "simhash_md5_docs": _wrap(simhash_md5_docs),
        "doc_text_stats": _wrap(doc_text_stats),
        "scrub_pii_docs": _wrap(scrub_pii_docs),
        "doc_repetition_stats": _wrap(doc_repetition_stats),
        "cluster_near_dup_docs": _wrap(cluster_near_dup_docs),
        "dedup_near_dup_docs": _wrap(dedup_near_dup_docs),
        "ngram_decontaminate_docs": _wrap(ngram_decontaminate_docs),
        "boilerplate_docs": _wrap(boilerplate_docs),
        "mixture_sample_docs": _wrap(mixture_sample_docs),
        "token_budget_select": _wrap(token_budget_select_docs),
        "bpe_token_counts": _wrap(bpe_token_counts),
        "winnow_fingerprint_docs": _wrap(winnow_fingerprint_docs),
        "chunk_documents": _wrap(chunk_documents_q),
        "cosine_topk": _wrap(cosine_topk),
        "cosine_near_dups": _wrap(cosine_near_dups),
        "ivf_topk_embeddings": _wrap(ivf_topk_embeddings),
        "pq_topk_embeddings": _wrap(pq_topk_embeddings),
        "stats_corr_battery": _wrap(rel.stats_corr_battery),
        "trailing_30d_revenue": _wrap(rel.trailing_30d_revenue),
        "pack_documents": _wrap(pack_documents),
        "train_holdout_split": _wrap(train_holdout_split),
        "quantize_embeddings": _wrap(quantize_embeddings_q),
        "error_window_clicks": _wrap(error_window_clicks),
        # reference-operator surface (SURVEY.md §2.1) — driver-green r5
        "flagship_std_revenue": _wrap(flagship_std_revenue),
        "gelman_standardize_lineitem": _wrap(gelman_standardize_lineitem),
        "transform_math": _wrap(transform_math),
        "clean_text_priority": _wrap(clean_text_priority),
        "replace_na_status": _wrap(replace_na_status),
        "one_hot_mktsegment": _wrap(one_hot_mktsegment),
        "ordinal_encode_priority": _wrap(ordinal_encode_priority),
        "impute_mean_value": _wrap(impute_mean_value),
        "impute_median_psize": _wrap(impute_median_psize),
        "impute_mode_priority": _wrap(impute_mode_priority),
        "ols_simple": _wrap(ols_simple),
        "ols_multivariate_ci": _wrap(ols_multivariate_ci),
        "mice_impute_lineitem": _wrap(mice_impute_lineitem),
        "merge_upsert_customers": _wrap(merge_upsert_customers),
    }
    # Round-13 driver window (VERDICT r12 #8, stalest-first): the three
    # NEW r13 queries (CDF x column-mapping, native Iceberg v3 with
    # column defaults, mixed parquet+ORC) plus ivf_index_topk (newly
    # hash-checked this round — its oracle twin is new evidence), then
    # everything last driver-checked in r8 (window_nav_battery) and the
    # r9 block: the tablelog family (wap_publish / metadata tables /
    # hidden-partition / tag / rename), the llmdata dedup+decontam
    # battery, relational batteries, and ANN brute-force twins.
    # Staleness computed from CORRECTNESS_r01..r12 window membership.
    # ZERO rows-only entries in the window — every head entry is
    # hash-checked against its oracle twin.
    head = [
        "delta_mapped_cdf_roundtrip",
        "iceberg_v3_native_roundtrip",
        "iceberg_orc_mixed_read",
        "ivf_index_topk",
        "window_nav_battery",
        "big_orders",
        "bigram_doc_freq",
        "boilerplate_docs",
        "bpe_token_counts",
        "cheapest_supplier_per_nation",
        "chunk_documents",
        "cluster_near_dup_docs",
        "conditional_agg_battery",
        "corpus_curation",
        "cosine_near_dups",
        "cosine_topk",
        "customers_above_segment_avg",
        "date_fn_battery",
        "decontaminate_docs",
        "dedup_exact_docs",
        "dedup_near_dup_docs",
        "doc_repetition_stats",
        "doc_text_stats",
        "embedding_stats",
        "events_props_map",
        "minhash_md5_near_dups",
        "mixture_sample_docs",
        "ngram_decontaminate_docs",
        "ngram_jaccard_near_dups",
        "order_count_distribution",
        "order_rank_metrics",
        "perplexity_heldout_docs",
        "regexp_extract_brands",
        "rollup_with_grouping_id",
        "running_customer_revenue",
        "salted_skew_join",
        "scrub_pii_docs",
        "simhash_md5_docs",
        "sliding_window_counts",
        "sql_grouping_sets",
        "stats_corr_battery",
        "stratified_sample_docs",
        "string_fn_battery",
        "tablelog_hidden_partition_scan",
        "tablelog_metadata_tables",
        "tablelog_rename_scan",
        "tablelog_tag_read",
        "tablelog_wap_publish",
        "tfidf_top_term",
        "token_budget_select",
    ]
    assert len(head) == 50 and all(k in q for k in head)
    return {**{k: q[k] for k in head}, **{k: v for k, v in q.items() if k not in head}}


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_std_revenue": FLAGSHIP_SQL,
        "gelman_standardize_lineitem": GELMAN_ROWS_SQL,
        "transform_math": TRANSFORM_SQL,
        "clean_text_priority": CLEAN_TEXT_SQL,
        "replace_na_status": REPLACE_NA_SQL,
        "one_hot_mktsegment": ONE_HOT_SQL,
        "ordinal_encode_priority": ORDINAL_SQL,
        "impute_mean_value": IMPUTE_MEAN_SQL,
        "impute_median_psize": IMPUTE_MEDIAN_SQL,
        "impute_mode_priority": IMPUTE_MODE_SQL,
        "ols_simple": OLS_SIMPLE_SQL,
        "merge_upsert_customers": MERGE_UPSERT_SQL,
        # ols_multivariate_ci: matrix solve, not SQL-expressible → rows-only
        "q6_forecast_revenue": rel.Q6_SQL,
        "q4_priority_exists": rel.Q4_SQL,
        "q10_returned_items": rel.Q10_SQL,
        "q14_promo_effect": rel.Q14_SQL,
        "q19_disjunctive_revenue": rel.Q19_SQL,
        "stats_moments_battery": rel.STATS_MOMENTS_SQL,
        "window_nav_battery": rel.WINDOW_NAV_SQL,
        "scd2_customer_status": rel.SCD2_CUSTOMER_STATUS_SQL,
        "temporal_status_of_clicks": rel.TEMPORAL_STATUS_SQL,
        "incremental_agg_orders": rel.INCREMENTAL_AGG_SQL,
        "ewma_customer_orders": rel.EWMA_SQL,
        "heavy_hitter_terms": HEAVY_HITTERS_SQL,
        "weighted_median_price": rel.WEIGHTED_MEDIAN_SQL,
        "fuzzy_name_matches": FUZZY_NAME_SQL,
        "fuzzy_edit2_matches": FUZZY_EDIT2_SQL,
        "profile_orders": rel.PROFILE_ORDERS_SQL,
        "cohort_retention": rel.COHORT_RETENTION_SQL,
        "funnel_conversion": rel.FUNNEL_SQL,
        "tablelog_dml_roundtrip": TABLELOG_DML_SQL,
        "tablelog_scan_pruned": TABLELOG_SCAN_SQL,
        "tablelog_incremental_view": TABLELOG_MATVIEW_SQL,
        "tablelog_wap_publish": TABLELOG_WAP_SQL,
        "tablelog_tag_read": TABLELOG_TAG_SQL,
        "tablelog_metadata_tables": TABLELOG_META_SQL,
        "salted_skew_join": SALTED_JOIN_SQL,
        "tablelog_partitioned_scan": TABLELOG_PART_SQL,
        "tablelog_cdf_view": TABLELOG_CDF_SQL,
        "tablelog_batch_format_scan": TABLELOG_BATCH_SQL,
        "tablelog_clone_timetravel": TABLELOG_CLONE_SQL,
        "tablelog_mor_delete": TABLELOG_MOR_SQL,
        "tablelog_mor_dml": TABLELOG_MOR_DML_SQL,
        "tablelog_bloom_lookup": TABLELOG_BLOOM_SQL,
        "perplexity_score_docs": PERPLEXITY_SQL,
        "perplexity_heldout_docs": PERPLEXITY_HELDOUT_SQL,
        "tablelog_rename_scan": TABLELOG_RENAME_SQL,
        "tablelog_schema_evolution": TABLELOG_SCHEMA_EVOLUTION_SQL,
        "delta_interop_roundtrip": DELTA_INTEROP_SQL,
        "iceberg_interop_read": ICEBERG_INTEROP_SQL,
        "iceberg_write_roundtrip": ICEBERG_WRITE_SQL,
        "iceberg_pos_delete_read": ICEBERG_POS_DELETE_SQL,
        "iceberg_eq_delete_read": ICEBERG_EQ_DELETE_SQL,
        "iceberg_dml_roundtrip": ICEBERG_DML_SQL,
        "iceberg_update_roundtrip": ICEBERG_UPDATE_SQL,
        "iceberg_merge_roundtrip": ICEBERG_MERGE_SQL,
        "iceberg_schema_evolution": ICEBERG_SCHEMA_EVOLUTION_SQL,
        "delta_dv_dml_roundtrip": DELTA_DV_DML_SQL,
        "iceberg_compact_roundtrip": ICEBERG_COMPACT_SQL,
        "delta_restore_roundtrip": DELTA_RESTORE_SQL,
        "iceberg_rollback_roundtrip": ICEBERG_ROLLBACK_SQL,
        "delta_skipping_scan": DELTA_SKIPPING_SQL,
        "iceberg_pruned_scan": ICEBERG_PRUNED_SQL,
        "iceberg_wap_publish": ICEBERG_WAP_SQL,
        "delta_zorder_scan": DELTA_ZORDER_SQL,
        "delta_dv_write_roundtrip": DELTA_DV_WRITE_SQL,
        "hudi_mor_read": HUDI_MOR_SQL,
        "delta_stream_read": DELTA_STREAM_SQL,
        "delta_optimize_roundtrip": DELTA_OPTIMIZE_SQL,
        "hudi_compact_read": HUDI_MOR_SQL,
        "iceberg_stream_read": ICEBERG_STREAM_SQL,
        "iceberg_eq_delete_write": ICEBERG_EQ_DELETE_SQL,
        "iceberg_v3_dv_read": ICEBERG_V3_DV_SQL,
        "delta_cdf_roundtrip": DELTA_CDF_SQL,
        "hudi_1x_read": HUDI_1X_SQL,
        "hudi_incremental_read": HUDI_INCREMENTAL_SQL,
        "iceberg_branch_read": ICEBERG_BRANCH_SQL,
        "delta_constraint_roundtrip": DELTA_CONSTRAINT_SQL,
        "delta_clone_read": DELTA_CLONE_SQL,
        "delta_v2_checkpoint_read": DELTA_V2_CHECKPOINT_SQL,
        "hudi_cluster_read": HUDI_CLUSTER_SQL,
        "delta_column_ddl_read": DELTA_COLUMN_DDL_SQL,
        "delta_mapped_cdf_roundtrip": DELTA_MAPPED_CDF_SQL,
        "iceberg_v3_native_roundtrip": ICEBERG_V3_NATIVE_SQL,
        "iceberg_orc_mixed_read": ICEBERG_ORC_MIXED_SQL,
        "iceberg_spec_evolution_read": ICEBERG_SPEC_EVOLUTION_SQL,
        "iceberg_changelog_read": ICEBERG_CHANGELOG_SQL,
        "ivf_topk_embeddings": IVF_TOPK_SQL,
        "ivf_index_topk": IVF_INDEX_TOPK_SQL,
        "hudi_stream_read": ICEBERG_STREAM_SQL,
        "delta_idmode_read": DELTA_IDMODE_SQL,
        "delta_dv_read": DELTA_DV_SQL,
        "tablelog_hidden_partition_scan": TABLELOG_HIDDEN_SQL,
        "trigram_perplexity_docs": TRIGRAM_PERPLEXITY_SQL,
        "fivegram_perplexity_docs": FIVEGRAM_PERPLEXITY_SQL,
        "listagg_priorities_by_segment": rel.LISTAGG_SQL,
        "q1_pricing_summary": rel.Q1_SQL,
        "q3_top_orders": rel.Q3_SQL,
        "q5_region_revenue": rel.Q5_SQL,
        "top3_orders_per_segment": rel.TOP3_SQL,
        "revenue_by_year": rel.REVENUE_BY_YEAR_SQL,
        "rollup_flag_status": rel.ROLLUP_SQL,
        "segment_without_recent_orders": rel.ANTI_JOIN_SQL,
        "nations_with_both": rel.INTERSECT_SQL,
        "events_json_kpi": rel.EVENTS_JSON_SQL,
        "sessionize_events": rel.SESSIONIZE_SQL,
        "windowed_event_counts": rel.WINDOWED_COUNTS_SQL,
        "asof_last_signup": rel.ASOF_SQL,
        "cube_year_flag": rel.CUBE_SQL,
        "pivot_segment_by_year": rel.PIVOT_SQL,
        "distinct_parts_per_flag": rel.DISTINCT_SQL,
        "quantiles_by_segment": rel.QUANTILES_SQL,
        "large_parts_except_cheap": rel.EXCEPT_SQL,
        "asof_purchase_order": rel.ASOF_JOIN_SQL,
        "sql_grouping_sets": rel.GROUPING_SETS_SQL,
        "customers_above_segment_avg": rel.CORRELATED_SQL,
        "unpivot_flag_metrics": rel.UNPIVOT_SQL,
        # approx_sketches: engine-specific HLL/t-digest -> rows-only
        "sliding_window_counts": rel.SLIDING_WINDOW_SQL,
        "running_customer_revenue": rel.RUNNING_SQL,
        "events_props_map": rel.PROPS_MAP_SQL,
        "order_count_distribution": rel.Q13_SQL,
        "big_orders": rel.Q18_SQL,
        "impute_cc_events": IMPUTE_CC_SQL,
        "impute_fii_events": IMPUTE_FII_SQL,
        "impute_gm_events": IMPUTE_GM_SQL,
        "tfidf_top_term": TFIDF_SQL,
        "bigram_doc_freq": BIGRAM_SQL,
        "dedup_exact_docs": DEDUP_EXACT_SQL,
        "decontaminate_docs": DECONTAMINATE_SQL,
        "stratified_sample_docs": STRATIFIED_SQL,
        "embedding_stats": EMBEDDING_STATS_SQL,
        "corpus_curation": CORPUS_CURATION_SQL,
        "q7_volume_shipping": rel.Q7_SQL,
        "q8_market_share": rel.Q8_SQL,
        "q9_product_profit": rel.Q9_SQL,
        "q11_important_parts": rel.Q11_SQL,
        "q12_shipdelay_priority": rel.Q12_SQL,
        "q15_top_supplier": rel.Q15_SQL,
        "q16_supplier_variety": rel.Q16_SQL,
        "q17_small_quantity_revenue": rel.Q17_SQL,
        "q22_dormant_customers": rel.Q22_SQL,
        "semantic_dedup_embeddings": SEMANTIC_DEDUP_SQL,
        "dup_ngram_fraction_docs": DUP_NGRAM_FRACTION_SQL,
        "gopher_quality_docs": GOPHER_QUALITY_SQL,
        "c4_clean_docs": C4_CLEAN_SQL,
        "dedup_substring_docs": DEDUP_SUBSTRING_SQL,
        "bm25_scores_docs": BM25_SQL,
        "hudi_interop_read": HUDI_INTEROP_SQL,
        "hudi_write_roundtrip": HUDI_WRITE_SQL,
        "hudi_upsert_roundtrip": DELTA_MERGE_SQL,
        "delta_dml_roundtrip": DELTA_DML_SQL,
        "delta_merge_roundtrip": DELTA_MERGE_SQL,
        "order_rank_metrics": rel.RANK_METRICS_SQL,
        "string_fn_battery": rel.STRING_BATTERY_SQL,
        "date_fn_battery": rel.DATE_BATTERY_SQL,
        "cheapest_supplier_per_nation": rel.Q2_SHAPE_SQL,
        "conditional_agg_battery": rel.CONDITIONAL_AGG_SQL,
        "weighted_avg_price": rel.WEIGHTED_AVG_SQL,
        "regexp_extract_brands": rel.REGEXP_EXTRACT_SQL,
        "rollup_with_grouping_id": rel.GROUPING_ID_SQL,
        "ngram_jaccard_near_dups": NGRAM_JACCARD_SQL,
        "minhash_md5_near_dups": MINHASH_MD5_SQL,
        "simhash_md5_docs": SIMHASH_MD5_SQL,
        # minhash_lsh_near_dups / simhash_docs: engine-seeded hashing → rows-only
        "doc_text_stats": DOC_STATS_SQL,
        "scrub_pii_docs": SCRUB_PII_SQL,
        "doc_repetition_stats": REPETITION_SQL,
        "cluster_near_dup_docs": CLUSTER_SQL,
        "dedup_near_dup_docs": DEDUP_CLUSTER_SQL,
        "ngram_decontaminate_docs": NGRAM_DECONTAMINATE_SQL,
        # bloom prefilter + exact confirm == the exact path, same oracle
        "bloom_decontaminate_docs": NGRAM_DECONTAMINATE_SQL,
        "asof_next_order": rel.ASOF_FORWARD_SQL,
        "cap_docs_per_source": CAP_PER_SOURCE_SQL,
        "overlapping_incident_windows": OVERLAP_WINDOWS_SQL,
        "boilerplate_docs": BOILERPLATE_SQL,
        "mixture_sample_docs": MIXTURE_SQL,
        "token_budget_select": TOKEN_BUDGET_SQL,
        "bpe_token_counts": BPE_COUNT_SQL,
        "winnow_fingerprint_docs": WINNOW_SQL,
        "chunk_documents": CHUNK_SQL,
        "cosine_topk": COSINE_TOPK_SQL,
        "cosine_near_dups": COSINE_NEAR_DUP_SQL,
        # multimodal_features: pandas-UDF decode → rows-only
        # media_header_meta: blob metadata is closed-form in doc_id, so the
        # sniff round-trip IS hash-checkable (the in-query assert pins the
        # byte-level parse; the twin pins the returned frame)
        "media_header_meta": MEDIA_HEADER_META_SQL,
        "stats_corr_battery": rel.STATS_CORR_SQL,
        "trailing_30d_revenue": rel.TRAILING_30D_SQL,
        "pack_documents": PACK_SQL,
        "train_holdout_split": SPLIT_SQL,
        "quantize_embeddings": QUANTIZE_SQL,
        "error_window_clicks": ERROR_WINDOW_SQL,
    }
