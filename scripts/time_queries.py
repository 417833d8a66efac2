"""Interleaved-A/B timing helper: bench-methodology timing of named
queries in one fresh process.

Usage: python scripts/time_queries.py <tag> <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SDW_AB_REPS (default 3)

Each query warms once at sf0.001 then runs SDW_AB_REPS times at the
target sf with the noop sink (bench.py's exact loop, cache cleared
between reps); prints ONE JSON line {"tag": ..., "queries": {name:
[rep_secs...]}} so the caller can interleave runs of two checkouts and
compare mins.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
REPS = int(os.environ.get("SDW_AB_REPS", "3"))


def main() -> None:
    import bench

    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = bench.get_spark(app_name=f"ab-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, list[float]] = {}
    for name in names:
        fn = bench.QUERIES[name]
        try:
            fn(spark, WARM).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"[warm {name}] {type(exc).__name__}: {exc}", file=sys.stderr)
        spark.catalog.clearCache()
        reps = []
        for _ in range(REPS):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = reps
    print(json.dumps({"tag": tag, "sf_dir": SF_DIR, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
