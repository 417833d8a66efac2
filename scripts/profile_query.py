"""Profile one or more bench entries: wall time + driver-side cProfile.

Usage: python scripts/profile_query.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Each query is warmed once at sf0.001 (JIT/codegen), then run once at the
target sf under cProfile with the noop sink — the same methodology as
bench.py, plus a driver-side breakdown so driver-bound time (numpy fits,
py4j metadata chatter, log replay) separates from cluster time.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    import bench

    spark = bench.get_spark(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:]
    for name in names:
        fn = bench.QUERIES[name]
        try:
            fn(spark, WARM).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"[warm {name}] {type(exc).__name__}: {exc}", flush=True)
        spark.catalog.clearCache()
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        pr.disable()
        wall = time.time() - t0
        spark.catalog.clearCache()
        s = io.StringIO()
        st = pstats.Stats(pr, stream=s)
        st.sort_stats("cumulative").print_stats(45)
        print(f"===== {name}: wall {wall:.2f}s =====")
        print("\n".join(s.getvalue().splitlines()[:70]), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
