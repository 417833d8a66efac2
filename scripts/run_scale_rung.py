"""Run the scale-sensitive operator set on a scaling rung and print one
JSON line per (query, rung) — the evidence table behind the 100 TB
design claims (VERDICT r5 "Next round" #6).

Usage: python scripts/run_scale_rung.py [sf_dir ...]
Defaults to the three local rungs: testdata/sf0.1 (1x), scaledata/sf0.8
(8x), scaledata/sf3.2 (32x).

The set is chosen for where scaling can break, not where it is easy:
- bloom vs exact decontamination (broadcast-regime crossover),
- LSH top-k under the plane-scaling rule (bucket occupancy constancy),
- near-dup clustering (pointer-jumping round count grows with diameter),
- sequence packing (prefix-sum shard count grows with rows),
- exact grouped aggregation (the pure-shuffle yardstick).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simple_data_workflow_spark.session import get_spark  # noqa: E402
from simple_data_workflow_spark.sources.readers import load_table  # noqa: E402
from simple_data_workflow_spark.llmdata import dedup, packing, similarity  # noqa: E402
from simple_data_workflow_spark.plans import relational as rel  # noqa: E402

sys.path.insert(0, "/root/repo")
from bench import _scaled_planes  # noqa: E402

DEFAULT_RUNGS = [
    "/root/testdata/sf0.1",
    "/root/repo/scaledata/sf0.8",
    "/root/repo/scaledata/sf3.2",
]


def q1(spark, sf):
    return rel.q1_pricing_summary(spark, sf)


def bloom(spark, sf):
    docs = load_table(spark, sf, "documents")
    return dedup.bloom_decontaminate(docs, docs.where(F.col("doc_id") < 50), n=8)


def exact(spark, sf):
    docs = load_table(spark, sf, "documents")
    return dedup.ngram_decontaminate(docs, docs.where(F.col("doc_id") < 50), n=8)


def lsh(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") % 10 == 0)
    n = emb.count()
    planes = _scaled_planes(n, target_bucket=80)
    return similarity.lsh_topk(q, emb, k=5, n_planes=planes, dim=64, probe_bits=0)


def cluster(spark, sf):
    docs = load_table(spark, sf, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, mode="lsh")
    return dedup.cluster_pairs(pairs)


def pack(spark, sf):
    docs = load_table(spark, sf, "documents")
    return packing.pack_sequences(docs, budget=2048)


def funnel(spark, sf):
    return rel.funnel_conversion(spark, sf)


def scd2(spark, sf):
    return rel.scd2_customer_status(spark, sf)


def hh(spark, sf):
    from simple_data_workflow_spark.llmdata import text

    docs = load_table(spark, sf, "documents")
    return text.heavy_hitters(docs, k=20)


SET = {
    "q1_pricing_summary": q1,
    "bloom_decontaminate": bloom,
    "exact_decontaminate": exact,
    "lsh_topk_scaled_planes": lsh,
    "cluster_near_dups": cluster,
    "pack_documents": pack,
    "funnel_conversion": funnel,
    "scd2_customer_status": scd2,
    "heavy_hitter_terms": hh,
}


def main() -> None:
    rungs = sys.argv[1:] or DEFAULT_RUNGS
    # RUNG_QUERIES=a,b restricts the set (e.g. the 128x documents-only
    # rung, where the relational queries have no fact tables to read)
    only = os.environ.get("RUNG_QUERIES")
    queries = (
        {k: SET[k] for k in only.split(",")} if only else SET
    )
    spark = get_spark(app_name="scale-rung")
    spark.sparkContext.setLogLevel("ERROR")
    # warm once at the smallest testdata so JIT/codegen is off the clock
    for fn in queries.values():
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    for sf in rungs:
        try:
            rows = load_table(spark, sf, "lineitem").count()
        except Exception:
            rows = load_table(spark, sf, "documents").count()
        for name, fn in queries.items():
            best = None
            err = None
            for _ in range(2):
                try:
                    t0 = time.time()
                    fn(spark, sf).write.format("noop").mode("overwrite").save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                except Exception as exc:  # keep the sweep alive
                    err = f"{type(exc).__name__}: {exc}"[:300]
                    break
            print(
                json.dumps(
                    {
                        "rung": os.path.basename(sf.rstrip("/")),
                        "query": name,
                        "sec": round(best, 3) if best is not None else None,
                        "lineitem_rows": rows,
                        "err": err,
                        "loadavg": round(os.getloadavg()[0], 2),
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
