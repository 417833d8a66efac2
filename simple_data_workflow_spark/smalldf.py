"""Metadata-sized local DataFrames via the Arrow path.

``spark.createDataFrame(list_of_tuples)`` routes through a pickled
Python RDD: EVERY evaluation of the frame (and these metadata maps are
re-evaluated by every job that consumes them) pays one Python-worker
round trip per parallelize slice — ~0.4 s per evaluation on local[32]
for a 60-row map, vs ~0.08 s through the pandas/Arrow conversion
(guide §4 — keep driver data off the row-pickle boundary). Values are
identical; the Arrow path falls back to the classic converter when a
type cannot convert (Spark's built-in fallback).

Use for small driver-built frames on hot paths (path→group maps,
spellmaps, version maps). Empty row lists keep the classic path — the
pandas detour buys nothing there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def small_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` through pandas/Arrow.

    ``rows``: list of tuples (one per output row). ``schema``: DDL
    string or StructType — passed to Spark verbatim, so the result's
    schema is exactly what the classic path would produce.
    """
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    ncols = len(rows[0])
    # dtype=object: pandas would otherwise coerce an int column that
    # contains None to float64, silently rounding int64-sized values
    # (e.g. 2^62-range snapshot ids); object columns convert to Arrow
    # EXACTLY under the declared schema
    pdf = pd.DataFrame(rows, columns=list(range(ncols)), dtype=object)
    # positional column names: Spark applies the declared schema by
    # POSITION for pandas input, so the frame needs matching arity only
    names = _schema_names(spark, schema)
    if names is not None and len(names) == ncols:
        pdf.columns = names
    return spark.createDataFrame(pdf, schema=schema)


def _schema_names(spark: SparkSession, schema) -> list[str] | None:
    try:
        from pyspark.sql import types as T

        if isinstance(schema, T.StructType):
            return [f.name for f in schema.fields]
        if isinstance(schema, str):
            parsed = T._parse_datatype_string(schema)
            if isinstance(parsed, T.StructType):
                return [f.name for f in parsed.fields]
    except Exception:
        pass
    return None
