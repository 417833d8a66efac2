"""NA engine — goldens from reference test_tasks.py:340-462 (F5)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from simple_data_workflow_spark.operators.na import na_indicator_columns, wrangle_na

F5_SCHEMA = StructType(
    [
        StructField("row_id", LongType()),
        StructField("int_x", LongType()),
        StructField("float_x", DoubleType()),
        StructField("cat_x", StringType()),
        StructField("bool_x", BooleanType()),
    ]
)

F5_ROWS = [
    (0, 1, 1.5, "A", False),
    (1, 2, None, "A", True),
    (2, None, 2.5, "B", False),
    (3, 4, 2.0, None, None),
]


@pytest.fixture()
def f5(spark):
    return spark.createDataFrame(F5_ROWS, F5_SCHEMA)


def test_cc_drop(f5):
    out = wrangle_na(f5, strategy="cc")
    # rows with any NA dropped; row identity preserved via explicit row_id
    assert [r["row_id"] for r in out.orderBy("row_id").collect()] == [0]


def test_fi_golden(f5):
    out = wrangle_na(f5, strategy="fi", cols=["int_x", "float_x", "cat_x", "bool_x"])
    rows = {r["row_id"]: r for r in out.collect()}
    assert rows[2]["int_x"] == 2  # median of [1,2,4] = 2
    assert rows[1]["float_x"] == 2.0  # mean of [1.5,2.5,2.0]
    assert rows[3]["cat_x"] == "A"  # mode
    assert rows[3]["bool_x"] is False  # mode (2×False vs 1×True)


def test_fii_indicators(f5):
    out, names = na_indicator_columns(f5, ["int_x", "float_x", "cat_x", "bool_x"])
    # patterns observed: 0100 (row1), 1000 (row2), 0011 (row3); all-zeros dropped
    assert sorted(names) == ["na_0011", "na_0100", "na_1000"]
    rows = {r["row_id"]: r for r in out.collect()}
    assert rows[1]["na_0100"] and not rows[1]["na_1000"]
    assert rows[2]["na_1000"]
    assert rows[3]["na_0011"]


def test_fii_golden_exact_frame(f5):
    """Reference test_wrangle_na_fii (test_tasks.py:379-408) pinned 1:1:
    imputed features + one boolean indicator per observed NA pattern."""
    out = wrangle_na(f5, strategy="fii", cols=["int_x", "float_x", "cat_x", "bool_x"])
    rows = out.orderBy("row_id").collect()
    got = {c: [r[c] for r in rows] for c in out.columns if c != "row_id"}
    expected = {
        "int_x": [1, 2, 2, 4],
        "float_x": [1.5, 2.0, 2.5, 2.0],
        "cat_x": ["A", "A", "B", "A"],
        "bool_x": [False, True, False, False],
        "na_0011": [False, False, False, True],
        "na_0100": [False, True, False, False],
        "na_1000": [False, False, True, False],
    }
    assert sorted(got) == sorted(expected)
    for c in expected:
        assert got[c] == expected[c], c
    types = dict(out.dtypes)
    assert types["int_x"] == "bigint" and types["bool_x"] == "boolean"
    assert {types[n] for n in ("na_0011", "na_0100", "na_1000")} == {"boolean"}


def test_gm_golden_exact_frame(f5):
    """The reference's 48-line gm golden (test_tasks.py:411-462) pinned
    1:1 — patsy's per-bucket redundancy codings included: the FIRST
    indicator a bucket meets is full-coded ([False]/[True]), later ones
    treatment-coded ([T.True]); the first categorical feature is
    full-coded, later ones reduced."""
    out = wrangle_na(f5, strategy="gm", cols=["int_x", "float_x", "cat_x", "bool_x"])
    rows = out.orderBy("row_id").collect()
    got = {c: [r[c] for r in rows] for c in out.columns if c != "row_id"}
    expected = {
        "int_x": [1, 2, 2, 4],
        "float_x": [1.5, 2.0, 2.5, 2.0],
        "cat_x": ["A", "A", "B", "A"],
        "bool_x": [False, True, False, False],
        "na_1000": [False, False, True, False],
        "na_0100": [False, True, False, False],
        "na_0011": [False, False, False, True],
        'Q("cat_x")[A]:Q("na_0011")[False]': [1.0, 1.0, 0.0, 0.0],
        'Q("cat_x")[B]:Q("na_0011")[False]': [0.0, 0.0, 1.0, 0.0],
        'Q("cat_x")[A]:Q("na_0011")[True]': [0.0, 0.0, 0.0, 1.0],
        'Q("cat_x")[B]:Q("na_0011")[True]': [0.0, 0.0, 0.0, 0.0],
        'Q("cat_x")[A]:Q("na_0100")[T.True]': [0.0, 1.0, 0.0, 0.0],
        'Q("cat_x")[B]:Q("na_0100")[T.True]': [0.0, 0.0, 0.0, 0.0],
        'Q("cat_x")[A]:Q("na_1000")[T.True]': [0.0, 0.0, 0.0, 0.0],
        'Q("cat_x")[B]:Q("na_1000")[T.True]': [0.0, 0.0, 1.0, 0.0],
        'Q("bool_x")[T.True]:Q("na_0011")[False]': [0.0, 1.0, 0.0, 0.0],
        'Q("bool_x")[T.True]:Q("na_0011")[True]': [0.0, 0.0, 0.0, 0.0],
        'Q("bool_x")[T.True]:Q("na_0100")[T.True]': [0.0, 1.0, 0.0, 0.0],
        'Q("bool_x")[T.True]:Q("na_1000")[T.True]': [0.0, 0.0, 0.0, 0.0],
        'Q("int_x"):Q("na_0011")[False]': [1.0, 2.0, 2.0, 0.0],
        'Q("int_x"):Q("na_0011")[True]': [0.0, 0.0, 0.0, 4.0],
        'Q("int_x"):Q("na_0100")[T.True]': [0.0, 2.0, 0.0, 0.0],
        'Q("int_x"):Q("na_1000")[T.True]': [0.0, 0.0, 2.0, 0.0],
        'Q("float_x"):Q("na_0011")[False]': [1.5, 2.0, 2.5, 0.0],
        'Q("float_x"):Q("na_0011")[True]': [0.0, 0.0, 0.0, 2.0],
        'Q("float_x"):Q("na_0100")[T.True]': [0.0, 2.0, 0.0, 0.0],
        'Q("float_x"):Q("na_1000")[T.True]': [0.0, 0.0, 2.5, 0.0],
    }
    assert sorted(got) == sorted(expected)
    for c in expected:
        assert got[c] == expected[c], c


def test_no_na_early_return(spark):
    df = spark.createDataFrame([(1, 1.0)], ["a", "b"])
    out = wrangle_na(df, strategy="fi")
    assert out.collect() == df.collect()
