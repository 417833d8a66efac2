"""smalldf.small_df: Arrow-path metadata frames must be value-identical
to the classic pickled-list createDataFrame, including the edge cases
the fast path could plausibly break (int64-range values in columns
containing NULLs, map/array types, empty input)."""

import pytest

from simple_data_workflow_spark.smalldf import small_df


def test_int64_exact_with_nulls(spark):
    # pandas would coerce an int column containing None to float64 and
    # round 2^62-range values; dtype=object keeps them exact
    big = 4611686018427387904 + 123456789  # > 2^53 float precision
    rows = [(big, None), (big + 7, big)]
    got = small_df(spark, rows, "a long, b long").collect()
    ref = spark.createDataFrame(rows, "a long, b long").collect()
    assert got == ref
    assert got[0]["a"] == big and got[1]["b"] == big


def test_map_array_and_empty(spark):
    schema = (
        "file string, rows bigint, partitions map<string, array<string>>"
    )
    rows = [("f1", 10, {"a": ["1", "2"]}), ("f2", 20, None)]
    got = small_df(spark, rows, schema).collect()
    ref = spark.createDataFrame(rows, schema).collect()
    assert got == ref
    assert small_df(spark, [], schema).collect() == []


def test_struct_type_schema(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    rows = [("x", 1.5), ("y", None)]
    got = small_df(spark, rows, schema).collect()
    ref = spark.createDataFrame(rows, schema).collect()
    assert got == ref
