"""A/B the lsh_topk regression question (VERDICT r5 "Next round" #4):
fixed (8) vs scaled (log2(N/80)) planes × probe_bits 0/1, recording
wall time AND candidate-pair volume per config — the quantity that
actually drives the cost — at one or more rungs.

Usage: python scripts/lsh_ab.py [sf_dir ...]   (default sf0.1)
Prints one JSON line per (rung, config).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from simple_data_workflow_spark.session import get_spark  # noqa: E402
from simple_data_workflow_spark.sources.readers import load_table  # noqa: E402
from simple_data_workflow_spark.llmdata import similarity  # noqa: E402
from bench import _scaled_planes  # noqa: E402


def main() -> None:
    rungs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark(app_name="lsh-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in rungs:
        emb = load_table(spark, sf, "embeddings")
        n = emb.count()
        q = emb.where(F.col("vec_id") % 10 == 0)
        configs = [
            ("scaled", _scaled_planes(n, target_bucket=80)),
            ("fixed8", 8),
        ]
        for label, planes in configs:
            for probe_bits in (0, 1):
                # candidate volume: the join output size before top-k —
                # measured once, untimed (it adds a count action)
                topk = similarity.lsh_topk(
                    q, emb, k=5, n_planes=planes, dim=64, probe_bits=probe_bits
                )
                n_out = topk.count()  # warms the plan too
                best = None
                for _ in range(3):
                    t0 = time.time()
                    similarity.lsh_topk(
                        q, emb, k=5, n_planes=planes, dim=64, probe_bits=probe_bits
                    ).write.format("noop").mode("overwrite").save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                print(
                    json.dumps(
                        {
                            "rung": os.path.basename(sf.rstrip("/")),
                            "corpus_rows": n,
                            "config": label,
                            "n_planes": planes,
                            "probe_bits": probe_bits,
                            "result_rows": n_out,
                            "best_of_3_sec": round(best, 3),
                            "loadavg": round(os.getloadavg()[0], 2),
                        }
                    ),
                    flush=True,
                )
    spark.stop()


if __name__ == "__main__":
    main()
