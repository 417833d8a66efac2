"""Name/string sanitation — goldens from reference test_tasks.py:150-162 (F8)."""


from simple_data_workflow_spark.operators.strings import (
    clean_text,
    clean_text_col,
    column_wrangler,
    sanitize_col_names,
)


def test_clean_text_scalar():
    assert clean_text("  cOLUmn3 ") == "column3"
    assert clean_text(" column  4 ") == "column_4"
    assert clean_text("column1") == "column1"


def test_sanitize_col_names_f8():
    names = ["column1", "cOLUmn2", "    cOLUmn3 ", " column  4 "]
    assert sanitize_col_names(names) == ["column1", "column2", "column3", "column_4"]


def test_column_wrangler(spark):
    df = spark.createDataFrame([(1, 2, 3, 4)], ["column1", "cOLUmn2", "    cOLUmn3 ", " column  4 "])
    assert column_wrangler(df).columns == ["column1", "column2", "column3", "column_4"]


def test_clean_text_col(spark):
    df = spark.createDataFrame([("  A b  C ",)], ["x"])
    assert df.select(clean_text_col("x").alias("y")).first()["y"] == "a_b_c"


def test_sanitize_string_iteration_quirk():
    """Reference quirk (src/tasks.py:55-56): a bare string argument is
    iterated character-by-character — preserved deliberately."""
    assert sanitize_col_names("ab") == ["a", "b"]


def test_clean_text_space_only_collapse_parity(spark):
    """Reference collapses SPACE runs only (re.sub(' +', ...) at
    src/tasks.py:46): interior tabs/newlines survive; ends are stripped
    of all whitespace (Python strip()). Scalar and column forms agree."""
    raw = "\t A b\tC  d \n"
    # strip() removes the '\t ' / ' \n' ends; each interior SPACE run
    # becomes one '_'; the interior tab survives
    expect = "a_b\tc_d"
    assert clean_text(raw) == expect
    df = spark.createDataFrame([(raw,)], ["x"])
    assert df.select(clean_text_col("x").alias("y")).first()["y"] == expect
