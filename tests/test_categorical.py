"""Categorical subsystem — goldens from reference test_tasks.py:177-337 (F9)."""

from pyspark.sql import functions as F

from simple_data_workflow_spark.operators.categorical import encode_data, factor_wrangler


def test_dummy_detection(spark):
    df = spark.createDataFrame(
        [(0, 1, 1, 2), (1, 1, 0, 3), (0, 1, 1, 4)], ["war", "ones", "also", "notdummy"]
    )
    out, reg = factor_wrangler(df, str_to_cat=False, dummy_to_bool=True)
    types = dict(out.dtypes)
    assert types["war"] == "boolean"
    assert types["also"] == "boolean"
    # reference quirk: all-ones column {1} sums to 1 → dummy too
    assert types["ones"] == "boolean"
    assert types["notdummy"] == "bigint"


def test_category_domain_enforcement_f9(spark):
    df = spark.createDataFrame([(-1,), (0,), (1,), (2,), (3,)], ["non_neg"])
    out, reg = factor_wrangler(
        df, categories={"non_neg": [0, 1, 2, 3]}, str_to_cat=False, dummy_to_bool=False
    )
    vals = [r["non_neg"] for r in out.orderBy(F.col("non_neg").asc_nulls_first()).collect()]
    assert vals == [None, 0, 1, 2, 3]
    assert reg.levels["non_neg"] == [0, 1, 2, 3]


def test_category_domain_strings_ordered(spark):
    df = spark.createDataFrame([("A#",), ("B",), ("C",), ("D",), ("10",)], ["only_alpha"])
    out, reg = factor_wrangler(
        df,
        categories={"only_alpha": ["D", "C", "B", "A"]},
        ordered_cols=["only_alpha"],
        str_to_cat=False,
    )
    vals = {r["only_alpha"] for r in out.collect()}
    assert vals == {None, "B", "C", "D"}  # A# and 10 out-of-domain → NULL
    assert reg.is_ordered("only_alpha")
    assert reg.levels["only_alpha"] == ["D", "C", "B", "A"]  # given order kept


def test_one_hot_encode(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B"), (3, None)], ["id", "seg"])
    typed, reg = factor_wrangler(df, str_to_cat=True, dummy_to_bool=False)
    out = encode_data(typed, reg)
    assert out.columns == ["id", "seg_A", "seg_B"]
    rows = {r["id"]: (r["seg_A"], r["seg_B"]) for r in out.collect()}
    assert rows[1] == (True, False)
    assert rows[2] == (False, True)
    # pandas get_dummies parity: NULL → all-False (reference src/tasks.py:293 quirk)
    assert rows[3] == (False, False)


def test_ordinal_codes(spark):
    df = spark.createDataFrame([("lo",), ("hi",), (None,), ("mid",)], ["lvl"])
    typed, reg = factor_wrangler(
        df,
        categories={"lvl": ["lo", "mid", "hi"]},
        ordered_cols=["lvl"],
        str_to_cat=False,
    )
    out = encode_data(typed, reg)
    vals = [r["lvl"] for r in out.collect()]
    # cat.codes parity: NULL → -1, codes follow the explicit level order
    assert sorted(vals) == [-1, 0, 1, 2]


def test_attach_registry_metadata_merges_existing(spark):
    """Registry stamping must MERGE with pre-existing column metadata
    (comments, ML attributes), not clobber it — withMetadata alone
    replaces the whole map."""
    from simple_data_workflow_spark.operators.categorical import (
        CategoryRegistry,
        attach_registry_metadata,
        registry_from_schema,
    )

    df = spark.createDataFrame([("A",)], ["seg"]).withMetadata(
        "seg", {"comment": "segment code"}
    )
    r = CategoryRegistry()
    r.add("seg", ["A", "B"], ordered=False)
    out = attach_registry_metadata(df, r)
    meta = out.schema["seg"].metadata
    assert meta["comment"] == "segment code"  # survived the stamp
    assert registry_from_schema(out).levels == {"seg": ["A", "B"]}


def test_registry_roundtrip(tmp_path):
    from simple_data_workflow_spark.operators.categorical import CategoryRegistry

    r = CategoryRegistry()
    r.add("seg", ["A", "B"], ordered=False)
    r.add("prio", ["lo", "mid", "hi"], ordered=True)
    p = str(tmp_path / "_categories.json")
    r.save(p)
    back = CategoryRegistry.load(p)
    assert back.levels == r.levels
    assert back.is_ordered("prio") and not back.is_ordered("seg")
