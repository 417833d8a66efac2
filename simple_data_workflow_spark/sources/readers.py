"""Sources — scans for parquet and delimiter-separated text.

Spark-first equivalent of the reference's ``retrieve_data`` task
(reference src/tasks.py:61-97): read delimiter-separated text with an
optional row limit, dropping pandas-style ``Unnamed*`` index columns.
Retry semantics (reference ``max_retries=3, retry_delay=10s``) map to
Spark task retries (`spark.task.maxFailures`) plus the app-level
retry loop here for driver-side listing errors.
"""

from __future__ import annotations

import os
import tempfile
import time
import urllib.request

from pyspark.sql import DataFrame, SparkSession


def _fetch_if_url(path: str) -> str:
    """The reference reads http(s) URLs directly (pd.read_csv(url),
    src/tasks.py:94); Spark's csv reader wants a filesystem path, so
    http(s) sources are staged to a local temp file driver-side. Large
    remote datasets belong on distributed storage instead — this is the
    convenience path for the reference's small-file use case."""
    if path.startswith(("http://", "https://")):
        fd, tmp = tempfile.mkstemp(suffix=".csv", prefix="sdw-dl-")
        os.close(fd)
        urllib.request.urlretrieve(path, tmp)  # noqa: S310 — user-supplied source URL
        return tmp
    return path

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan with predicate pushdown / column pruning for free."""
    return spark.read.parquet(path)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` column to a proper session-TZ TIMESTAMP
    regardless of how the parquet writer encoded it. Observed encodings
    across testdata generations:

    - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it;
      with the ``nanosAsLong`` legacy conf it arrives as epoch-nanos
      bigint → ``timestamp_micros(ts div 1000)`` (integer div, no double
      round-trip; the testdata has zero sub-microsecond remainder).
    - parquet timestamp[us] with isAdjustedToUTC=false: Spark reads
      TIMESTAMP_NTZ → plain cast to TIMESTAMP. The session TZ is pinned
      UTC (session.py), so the wall-clock reinterpretation is the
      identity and epoch arithmetic matches the DuckDB oracle's
      ``epoch(ts)``.
    - already TIMESTAMP: pass through.

    Downstream code (sessionize, interval_join, streaming watermarks)
    can then assume one type instead of being defensive per call site.
    """
    from pyspark.sql import functions as F

    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif t == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """events scan with timestamp-encoding normalization (see
    :func:`normalize_events_ts` for the per-generation encodings)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    return normalize_events_ts(spark.read.parquet(path))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Table loader for the driver testdata (events gets nanos handling)."""
    if name == "events":
        return load_events(spark, f"{sf_dir}/events.parquet")
    return scan_parquet(spark, f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Load the driver testdata star schema as a dict of DataFrames."""
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_delim(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    nrows: int | None = None,
    max_retries: int = 3,
    retry_delay: float = 10.0,
) -> DataFrame:
    """Read a delimiter-separated file (reference src/tasks.py:61-97).

    - ``sep`` → csv ``sep`` option (the reference's pandas C-engine note is
      moot: Spark's csv reader is JVM-side and splittable).
    - ``nrows`` → ``limit`` (pushed into the scan by Catalyst, mirroring the
      reference's partial read at src/tasks.py:64,94).
    - pandas round-trip index columns ``Unnamed: 0`` are dropped
      (reference src/tasks.py:96).
    """
    last: Exception | None = None
    for attempt in range(max_retries):
        try:
            read_path = _fetch_if_url(path)
            df = (
                spark.read.option("sep", sep)
                .option("header", True)
                .option("inferSchema", True)
                .csv(read_path)
            )
            break
        except Exception as exc:  # driver-side fetch/listing failure
            last = exc
            if attempt == max_retries - 1:
                raise
            time.sleep(retry_delay)
    else:  # pragma: no cover
        raise last  # type: ignore[misc]
    unnamed = [c for c in df.columns if "Unnamed" in c or c.startswith("_c")]
    if unnamed:
        df = df.drop(*unnamed)
    if nrows is not None:
        df = df.limit(nrows)
    return df


def read_json_lines(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """Newline-delimited JSON reader (the common crawl-dump / API-export
    interchange format). Pass an explicit ``schema`` DDL string in
    production — schema inference is a full extra pass over the data,
    fine for exploration, wasteful at scale. ``multiline=True`` parses
    whole-file JSON arrays (NOT splittable: one file = one task — keep
    files small or convert to NDJSON)."""
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet
    (predicate pushdown + column pruning reach the reader)."""
    return spark.read.orc(path)


def read_evolved_parquet(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read parquet directories whose schemas have DRIFTED across
    writes (columns added/dropped, ints widened) into one DataFrame on
    the widened common schema — the lake-reader counterpart of a 100 TB
    table that gained columns over years of daily partitions.

    Spark's ``mergeSchema`` handles added columns but refuses
    int-vs-long / float-vs-double conflicts at scan time; this reader
    resolves them the way engines with real schema evolution do:

    1. one schema-only pass per path (footer read, no data scan),
    2. compute the widened target per column (numeric promotion
       int→long→double; anything else must match exactly — a
       string-vs-long drift is a data bug and raises loudly),
    3. scan each path with its own native schema (full predicate
       pushdown preserved), cast to the target, add missing columns as
       typed NULLs, and ``unionByName``.

    Each branch stays an independent parquet scan, so partition
    pruning, pushed filters, and column pruning apply per-branch; the
    union is plan-level (no shuffle).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    rank = {
        T.ByteType(): 0, T.ShortType(): 1, T.IntegerType(): 2,
        T.LongType(): 3, T.FloatType(): 4, T.DoubleType(): 5,
    }
    widen_order = [
        T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
        T.FloatType(), T.DoubleType(),
    ]
    dfs = [spark.read.parquet(p) for p in paths]
    target: dict[str, T.DataType] = {}
    order: list[str] = []
    for df in dfs:
        for f in df.schema.fields:
            if f.name not in target:
                target[f.name] = f.dataType
                order.append(f.name)
            elif target[f.name] != f.dataType:
                a, b = target[f.name], f.dataType
                if a in rank and b in rank:
                    hi = widen_order[max(rank[a], rank[b])]
                    # integral × fractional drift promotes to double:
                    # a long doesn't fit a float's 24-bit mantissa
                    if {rank[a] >= 4, rank[b] >= 4} == {True, False}:
                        hi = T.DoubleType()
                    target[f.name] = hi
                else:
                    raise TypeError(
                        f"column {f.name!r}: incompatible drift "
                        f"{a.simpleString()} vs {b.simpleString()}"
                    )
    aligned = []
    for df in dfs:
        have = {f.name: f.dataType for f in df.schema.fields}
        cols = []
        for name in order:
            if name in have:
                c = F.col(name)
                if have[name] != target[name]:
                    c = c.cast(target[name])
                cols.append(c.alias(name))
            else:
                cols.append(F.lit(None).cast(target[name]).alias(name))
        aligned.append(df.select(*cols))
    out = aligned[0]
    for df in aligned[1:]:
        out = out.unionByName(df)
    return out
