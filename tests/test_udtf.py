"""Python UDTF surface: lateral table function == codegen explode twin."""

from pyspark.sql import functions as F


def test_udtf_lateral_matches_posexplode(spark):
    from simple_data_workflow_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "a b. c d. e"), (2, "solo"), (3, None)], "doc_id long, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    got = {
        (r["doc_id"], r["pos"]): r["sentence"]
        for r in spark.sql(
            "SELECT d.doc_id, s.pos, s.sentence "
            "FROM udtf_docs d, LATERAL split_sentences(d.text) s"
        ).collect()
    }
    # the codegen twin the engine actually recommends
    want = {
        (r["doc_id"], r["pos"]): r["sentence"]
        for r in df.select(
            "doc_id", F.posexplode(F.split("text", r"\. ")).alias("pos", "sentence")
        )
        .where(F.col("sentence") != "")
        .collect()
    }
    assert got == want and len(got) == 4
