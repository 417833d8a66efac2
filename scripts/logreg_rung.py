"""Round-9 scale rung: logistic-regression quality-classifier training
cost vs corpus size. The claim llmdata.classify.train_logreg makes for
100 TB: each IRLS iteration is ONE map-side-combined aggregate (k
gradient sums + k(k+1)/2 Hessian cells) and a k x k driver solve, so
training cost is iters x (one scan) — LINEAR in corpus bytes with a
tiny constant, nothing data-sized at the driver. The rung trains the
same 3-feature model (8 iterations) on the documents table at
1x/8x/128x rows; near-linear wall growth proves the shape. Scoring is
one codegen expression and is benched separately (bench.py).

One JSON line per rung: {rung, rows, train_sec, score_sec}.
Usage: python scripts/logreg_rung.py [out.jsonl]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simple_data_workflow_spark.llmdata import text  # noqa: E402
from simple_data_workflow_spark.llmdata.classify import (  # noqa: E402
    logreg_score,
    train_logreg,
)
from simple_data_workflow_spark.session import get_spark  # noqa: E402
from simple_data_workflow_spark.sources.readers import load_table  # noqa: E402

RUNGS = [
    ("1x", "/root/testdata/sf0.1"),
    ("8x", "/root/repo/scaledata/sf0.8"),
    ("128x", "/root/repo/scaledata/sf12.8_docs"),
]
FEATS = ["stop_r", "punct_r", "log_toks"]


def featurize(docs):
    return docs.select(
        text.stopword_ratio(F.col("text")).alias("stop_r"),
        text.punct_ratio(F.col("text")).alias("punct_r"),
        F.log1p(text.token_count(F.col("text"))).alias("log_toks"),
        (F.length("text") > 400).cast("double").alias("label"),
    )


def main() -> None:
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "evidence/logreg_rung_r9.jsonl"
    )
    spark = get_spark(app_name="logreg-rung")
    spark.sparkContext.setLogLevel("ERROR")
    with open(out_path, "w") as out:
        for rung, sf_dir in RUNGS:
            feats = featurize(load_table(spark, sf_dir, "documents"))
            rows = feats.count()  # warms the scan outside the timing
            t0 = time.time()
            beta = train_logreg(feats, FEATS, "label", iters=8)
            train_sec = time.time() - t0
            t0 = time.time()
            logreg_score(feats, beta, FEATS).write.format("noop").mode(
                "overwrite"
            ).save()
            score_sec = time.time() - t0
            row = {
                "rung": rung,
                "rows": rows,
                "train_sec": round(train_sec, 3),
                "score_sec": round(score_sec, 3),
            }
            out.write(json.dumps(row) + "\n")
            out.flush()
            print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
