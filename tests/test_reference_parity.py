"""End-to-end parity on the reference's own fixtures (SURVEY.md §5, F1/F2).

These run the full clean → encode → impute → standardize pipeline over
the reference test corpus data (inline CSV fixtures from
reference src/tests/test_tasks.py:49-106) and assert the pandas-semantics
outcomes the reference's tests pin: dummy→bool typing, categorical
encoding column sets, index preservation on complete-case drop, and
Gelman moments.
"""

import io

import pandas as pd
import pytest
from pyspark.sql import functions as F

from simple_data_workflow_spark.plans import e2e_pipeline

US_CONSUMP_1940S = """year,income,expenditure,war
1940,241,226,0
1941,280,240,1
1942,319,235,1
1943,331,245,1
1944,345,255,1
1945,340,265,1
1946,332,295,0
1947,320,300,0
1948,339,305,0
1949,330,315,0
"""

IRAQ_VOTE = """y,state.abb,name,rep,state.name,gorevote
1,AL,SESSIONS (R AL),TRUE,Alabama,41.59
1,AL,SHELBY (R AL),TRUE,Alabama,41.59
0,AK,MURKOWSKI (R AK),TRUE,Alaska,27.67
0,AK,STEVENS (R AK),TRUE,Alaska,27.67
1,AZ,KYL (R AZ),TRUE,Arizona,44.67
1,AZ,MCCAIN (R AZ),TRUE,Arizona,44.67
1,AR,HUTCHINSON (R AR),TRUE,Arkansas,45.86
1,AR,LINCOLN (D AR),FALSE,Arkansas,45.86
1,CA,BOXER (D CA),FALSE,California,53.45
0,CA,FEINSTEIN (D CA),FALSE,California,53.45
"""


def _spark_df(spark, csv_text):
    pdf = pd.read_csv(io.StringIO(csv_text))
    return spark.createDataFrame(pdf)


def test_us_consump_pipeline(spark):
    df = _spark_df(spark, US_CONSUMP_1940S)
    res = e2e_pipeline(spark, df=df, na_strategy="cc", endog="expenditure", exog=["income", "war"])
    clean = res.stages["clean"]
    # war is a 0/1 dummy → BooleanType (reference test_tasks.py:260-272)
    assert dict(clean.dtypes)["war"] == "boolean"
    std = res.stages["standardize"].toPandas()
    pdf = pd.read_csv(io.StringIO(US_CONSUMP_1940S))
    # numeric: (x - mean)/(2*std_ddof1); boolean war: mean-centered only
    exp = (pdf["income"] - pdf["income"].mean()) / (2 * pdf["income"].std(ddof=1))
    assert std["income"].tolist() == pytest.approx(exp.tolist())
    assert std["war"].tolist() == pytest.approx((pdf["war"] - pdf["war"].mean()).tolist())
    # OLS tail runs and picks both regressors
    assert res.model.regressors == ["income", "war"]


def test_iraq_vote_pipeline(spark):
    df = _spark_df(spark, IRAQ_VOTE)
    res = e2e_pipeline(spark, df=df, na_strategy="cc", endog="y", exog=["gorevote"])
    clean = res.stages["clean"]
    types = dict(clean.dtypes)
    # y is a 0/1 dummy → boolean; rep was already boolean; '.' in names
    # survives sanitation (no whitespace — reference F2 note)
    assert types["y"] == "boolean"
    assert types["rep"] == "boolean"
    assert "state.abb" in clean.columns
    # string columns became categoricals with sorted observed levels
    assert res.registry.levels["state.abb"] == ["AK", "AL", "AR", "AZ", "CA"]
    # one-hot encoding produced {col}_{level} boolean dummies
    enc_cols = set(res.stages["encode"].columns)
    assert {"state.abb_AK", "state.abb_CA", "state.name_Alabama"} <= enc_cols
    # 10 rows survive cc (no NAs in the fixture)
    assert res.stages["wrangle_na"].count() == 10


def test_cc_preserves_row_identity(spark):
    """Reference pins surviving index [0,1,2,6,7,8] on airquality-style
    NAs (test_tasks.py:345-349) — with an explicit row_id the same
    surviving-identity contract holds."""
    rows = [
        (0, 41.0, 190.0), (1, 36.0, 118.0), (2, 12.0, 149.0),
        (3, None, 313.0), (4, None, None), (5, 28.0, None),
        (6, 23.0, 299.0), (7, 19.0, 99.0), (8, 8.0, 19.0),
    ]
    df = spark.createDataFrame(rows, "row_id long, ozone double, solar double")
    from simple_data_workflow_spark.operators.na import wrangle_na

    out = wrangle_na(df, strategy="cc", cols=["ozone", "solar"])
    assert [r["row_id"] for r in out.orderBy("row_id").collect()] == [0, 1, 2, 6, 7, 8]
