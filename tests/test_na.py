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


def test_fii_fills_too(f5):
    out = wrangle_na(f5, strategy="fii", cols=["int_x", "float_x", "cat_x", "bool_x"])
    assert "na_1000" in out.columns
    assert out.where(F.col("int_x").isNull()).count() == 0


def test_gm_interactions(f5):
    out = wrangle_na(f5, strategy="gm", cols=["int_x", "float_x", "cat_x", "bool_x"])
    inter = [c for c in out.columns if ":" in c]
    # 2 numeric feats × 3 indicators + (2 cat levels + 2 bool levels) × 3
    assert len(inter) == 2 * 3 + (2 + 2) * 3
    assert 'Q("int_x"):Q("na_1000")[T.True]' in inter
    assert 'Q("cat_x")[A]:Q("na_0100")[T.True]' in inter


def test_no_na_early_return(spark):
    df = spark.createDataFrame([(1, 1.0)], ["a", "b"])
    out = wrangle_na(df, strategy="fi")
    assert out.collect() == df.collect()
