"""Scale-rung evidence for the round-10 second-half operators: exact
substring dedup, C4 cleaning, BM25 scoring, and the optimized SemDeDup
— one JSON line per (query, rung), wall seconds for the full plan into
a noop sink. Rungs: testdata/sf0.1 (1x), scaledata/sf0.8 (8x),
scaledata/sf3.2 (32x); the docs-only ops also run the 128x docs rung.

SemDeDup follows its documented scaling rule (k ∝ N keeps expected
cluster size — and the per-cluster self-join — constant); everything
else runs unchanged, which is the claim under test: linear in rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simple_data_workflow_spark.session import get_spark, tune  # noqa: E402
from simple_data_workflow_spark.sources.readers import load_table  # noqa: E402
from simple_data_workflow_spark.llmdata import clustering, dedup, text  # noqa: E402

RUNGS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf0.8", "/root/repo/scaledata/sf0.8"),
    ("sf3.2", "/root/repo/scaledata/sf3.2"),
]
DOCS_ONLY_RUNG = ("sf12.8_docs", "/root/repo/scaledata/sf12.8_docs")


def substring_dedup(spark, d):
    return dedup.remove_dup_substrings(load_table(spark, d, "documents"), n=8)


def c4(spark, d):
    return text.c4_clean(load_table(spark, d, "documents"))


def bm25(spark, d):
    return text.bm25_scores(
        load_table(spark, d, "documents"),
        ["table", "spark", "merge", "vector"],
    )


def semdedup(spark, d):
    emb = load_table(spark, d, "embeddings")
    n = emb.count()
    k = max(8, n // 625)  # the documented k ∝ N rule
    C = clustering.kmeans_fit(emb, k=k, iters=5)
    return clustering.semantic_dedup(emb, C, threshold=0.38)


OPS = {
    "dedup_substring": (substring_dedup, True),
    "c4_clean": (c4, True),
    "bm25_scores": (bm25, True),
    "semdedup": (semdedup, False),
}


def main() -> int:
    spark = get_spark()
    tune(spark)
    rungs = list(RUNGS)
    for label, d in rungs + [DOCS_ONLY_RUNG]:
        docs_only = label.endswith("_docs")
        n_docs = load_table(spark, d, "documents").count()
        for name, (fn, is_docs_op) in OPS.items():
            if docs_only and not is_docs_op:
                continue
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            rec = {
                "query": name,
                "rung": label,
                "n_docs": n_docs,
                "sec": round(time.time() - t0, 3),
            }
            print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
