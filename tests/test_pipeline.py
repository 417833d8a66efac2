"""End-to-end pipeline (reference src/flow.py e2e_pipeline parity)."""

import pytest

from simple_data_workflow_spark.plans import e2e_pipeline


def test_e2e_pipeline_stages(spark):
    df = spark.createDataFrame(
        [
            (1.5, 0, "A", 1.0),
            (None, 1, "A", 2.0),
            (2.5, 1, "B", 3.0),
            (2.0, 0, None, 4.0),
        ],
        ["  cOL One ", "war", "seg", "y"],
    )
    res = e2e_pipeline(spark, df=df, na_strategy="fi", endog="y", exog=["col_one", "war"])
    assert set(res.stages) == {
        "retrieve",
        "clean",
        "encode",
        "wrangle_na",
        "transform",
        "standardize",
    }
    assert res.stages["clean"].columns == ["col_one", "war", "seg", "y"]
    assert "seg_A" in res.stages["encode"].columns
    assert res.stages["wrangle_na"].where("col_one IS NULL").count() == 0
    assert res.model is not None
    assert res.model.regressors == ["col_one", "war"]
    assert res.conf_int.count() == 4  # 2 regressors × lower/upper


def test_e2e_requires_exactly_one_source(spark):
    with pytest.raises(ValueError):
        e2e_pipeline(spark)


def test_entry_contract(spark):
    import __spark_entry__ as em

    out = em.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert set(em.oracle_sql()) <= set(em.queries())
