"""Round-8 scale rung: merge-on-read vs copy-on-write DELETE under the
adversarial shape — a SCATTERED small delete (few rows, every file
touched). Copy-on-write must rewrite every touched file, so its cost
scales with TABLE bytes; deletion vectors write only position sidecars,
so their cost scales with DELETED rows. One JSON line per (mode, rung)
with wall seconds and bytes written under data/.

Usage: python scripts/dv_rung.py [out.jsonl]
Rungs: lineitem at testdata/sf0.1 (1x), scaledata/sf0.8 (8x),
scaledata/sf3.2 (32x) — same rungs as the r7 DELETE measurement, which
used a RANGE predicate (touched files bounded); this one is the shape
that predicate-bounded rewrites cannot save.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from simple_data_workflow_spark.session import get_spark  # noqa: E402
from simple_data_workflow_spark.sources.readers import load_table  # noqa: E402
from simple_data_workflow_spark.sources.tablelog import (  # noqa: E402
    table_commit,
    table_delete_where,
    table_read,
)

RUNGS = [
    ("1x", "/root/testdata/sf0.1"),
    ("8x", "/root/repo/scaledata/sf0.8"),
    ("32x", "/root/repo/scaledata/sf3.2"),
]
# ~one matching row per 50k: a few hundred rows even at 32x, scattered
# uniformly so EVERY file contains at least one at realistic file counts
PRED = "l_orderkey % 50000 = 7"


def _dir_bytes(d: str) -> int:
    total = 0
    for name in os.listdir(d):
        p = os.path.join(d, name)
        if os.path.isfile(p):
            total += os.path.getsize(p)
    return total


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdout"
    spark = get_spark(app_name="dv-rung")
    spark.sparkContext.setLogLevel("ERROR")
    lines = []
    for rung, sf in RUNGS:
        li = load_table(spark, sf, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
        )
        n = li.count()
        for mode in ("cow", "mor"):
            t = tempfile.mkdtemp(prefix=f"sdw-dvrung-{rung}-{mode}-") + "/li"
            table_commit(li.repartition(16), t)
            before = _dir_bytes(f"{t}/data")
            t0 = time.time()
            table_delete_where(spark, t, PRED, mode=mode)
            wall = time.time() - t0
            written = _dir_bytes(f"{t}/data") - before
            deleted = n - table_read(spark, t).count()
            row = {
                "component": "scattered_delete",
                "mode": mode,
                "rung": rung,
                "table_rows": n,
                "deleted_rows": int(deleted),
                "wall_sec": round(wall, 3),
                "bytes_written": int(written),
            }
            lines.append(row)
            print(json.dumps(row), flush=True)
    if out_path != "/dev/stdout":
        with open(out_path, "w") as f:
            for row in lines:
                f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
