"""Round-8 scale rungs for the two serving-shaped components
(VERDICT r7 "Next round" #4 and #8), one JSON line per measurement:

1. **Matview refresh** — build the view over an N× source, then append
   a FIXED-size commit and time the refresh. The claim is cost ∝ new
   data: refresh wall time must stay ~flat while the source grows 8×
   and 32× (a refresh that re-read the source would scale with it).
2. **Persistent IVF-ANN search** — build the index over an N× corpus
   (untimed, amortized), then time search-only at fixed n_probe.
   Probed lists cover a fixed FRACTION of the corpus (n_probe/n_lists),
   so search should scale well below linearly in corpus size thanks to
   driver-side file pruning of unprobed lists.

Usage: python scripts/matview_ivf_rung.py [out.jsonl]
Rungs: testdata/sf0.1 (1x), scaledata/sf0.8 (8x), scaledata/sf3.2 (32x).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simple_data_workflow_spark.session import get_spark  # noqa: E402
from simple_data_workflow_spark.sources.readers import load_table  # noqa: E402
from simple_data_workflow_spark.sources.matview import (  # noqa: E402
    refresh_aggregate_view,
)
from simple_data_workflow_spark.llmdata.ann_index import (  # noqa: E402
    build_ivf_index,
    ivf_index_search,
)
from simple_data_workflow_spark.sources.tablelog import table_commit  # noqa: E402

RUNGS = [
    ("/root/testdata/sf0.1", 1),
    ("/root/repo/scaledata/sf0.8", 8),
    ("/root/repo/scaledata/sf3.2", 32),
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    out = open(out_path, "w") if out_path else sys.stdout
    spark = get_spark(app_name="mv-ivf-rung")
    spark.sparkContext.setLogLevel("ERROR")

    # the fixed-size new commit: the SAME rows at every rung (sf0.1
    # orders, keys shifted out of any rung's range so it is a pure add)
    fixed = (
        load_table(spark, "/root/testdata/sf0.1", "orders")
        .select(
            (F.col("o_orderkey") + F.lit(10_000_000_000)).alias("o_orderkey"),
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .cache()
    )
    fixed.count()

    for sf_dir, mult in RUNGS:
        d = tempfile.mkdtemp(prefix=f"sdw-rung-{mult}x-")
        src, view = f"{d}/src", f"{d}/view"
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        n_src = orders.count()
        table_commit(orders.repartition(16), src)
        # initial refresh folds the whole source — NOT the claim under
        # test, but recorded for contrast (it SHOULD scale with source)
        t0 = time.time()
        refresh_aggregate_view(spark, src, view, ["o_orderpriority"], sum_cols=["cents"])
        t_initial = time.time() - t0
        # the measured claim: fixed-size append, refresh cost ∝ new data
        table_commit(fixed, src)
        t0 = time.time()
        refresh_aggregate_view(spark, src, view, ["o_orderpriority"], sum_cols=["cents"])
        t_incr = time.time() - t0
        out.write(
            json.dumps(
                {
                    "component": "matview_refresh",
                    "rung": f"{mult}x",
                    "src_rows": n_src,
                    "initial_refresh_sec": round(t_initial, 3),
                    "incremental_refresh_sec": round(t_incr, 3),
                }
            )
            + "\n"
        )
        out.flush()

    for sf_dir, mult in RUNGS:
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        path = tempfile.mkdtemp(prefix=f"sdw-ivfr-{mult}x-") + "/idx"
        t0 = time.time()
        build_ivf_index(emb, path, n_lists=16, files_per_index=8)
        t_build = time.time() - t0
        q = emb.where(F.col("vec_id") % 997 == 0).limit(32)
        # warm one search (centroid read, codegen), then best-of-2
        ivf_index_search(spark, path, q, k=5, n_probe=4).write.format(
            "noop"
        ).mode("overwrite").save()
        best = None
        for _ in range(2):
            t0 = time.time()
            ivf_index_search(spark, path, q, k=5, n_probe=4).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out.write(
            json.dumps(
                {
                    "component": "ivf_index_search",
                    "rung": f"{mult}x",
                    "corpus_rows": n,
                    "build_sec": round(t_build, 3),
                    "search_sec": round(best, 3),
                    "n_probe": 4,
                    "n_lists": 16,
                }
            )
            + "\n"
        )
        out.flush()
    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
