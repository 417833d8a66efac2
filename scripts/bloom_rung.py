"""Round-9 scale rung: per-file Bloom-index pruning ratio vs
rows-per-file density. The round-8 defect was a FIXED 8192-bit bitmap
that saturated the moment files got dense (sf0.1: ~9.4k values/file ⇒
FPR ≈ 96% ⇒ zero pruning and a crashed bench assert); the round-9
auto-sizer grows each file's bitmap with its observed distinct count
(~10 bits/value), so the pruning ratio must hold FLAT across density
rungs. Each rung commits orders into 16 files (the driver query's
shape) at 1×/8×/32× rows-per-file and probes a 3-value IN-list:
survivors ≈ 3 at every rung is the pass condition — and the per-file
bitmap size line shows WHY (it grows with density).

Usage: python scripts/bloom_rung.py [out.jsonl]
Rungs: orders at testdata/sf0.1 (1x), scaledata/sf0.8 (8x),
scaledata/sf3.2 (32x) — same corpora as the DV rung.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from simple_data_workflow_spark.session import get_spark  # noqa: E402
from simple_data_workflow_spark.sources.readers import load_table  # noqa: E402
from simple_data_workflow_spark.sources.tablelog import (  # noqa: E402
    _bloom_prune,
    _resolve_state,
    _stats_prune,
    table_commit,
    table_scan,
)

RUNGS = [
    ("1x", "/root/testdata/sf0.1"),
    ("8x", "/root/repo/scaledata/sf0.8"),
    ("32x", "/root/repo/scaledata/sf3.2"),
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "evidence/bloom_rung_r9.jsonl"
    spark = get_spark(app_name="bloom-rung")
    spark.sparkContext.setLogLevel("ERROR")
    lines = []
    for rung, sf_dir in RUNGS:
        if not os.path.isdir(sf_dir):
            continue
        orders = load_table(spark, sf_dir, "orders").selectExpr(
            "o_orderkey", "md5(CAST(o_orderkey AS STRING)) AS tag"
        )
        path = tempfile.mkdtemp(prefix=f"sdw-bloomrung-{rung}-") + "/t"
        t0 = time.time()
        table_commit(orders.repartition(16), path, bloom_cols=["tag"])
        build_s = time.time() - t0
        st = _resolve_state(spark, path, None)
        tags = [hashlib.md5(str(k).encode()).hexdigest() for k in (1, 5, 7)]
        filt = [("tag", "in", tags)]
        survivors = _bloom_prune(
            st["stats"], _stats_prune(st["stats"], st["files"], filt), filt
        )
        t0 = time.time()
        n = table_scan(spark, path, filters=filt).count()
        scan_s = time.time() - t0
        sizes = sorted(
            st["stats"][f]["__bloom"]["tag"]["m"] for f in st["files"]
        )
        rows = sum(st["stats"][f]["__rows"] for f in st["files"])
        rec = {
            "rung": rung,
            "rows": rows,
            "rows_per_file": rows // len(st["files"]),
            "n_files": len(st["files"]),
            "survivors": len(survivors),
            "bloom_m_min": sizes[0],
            "bloom_m_max": sizes[-1],
            "matched_rows": n,
            "commit_s": round(build_s, 3),
            "pruned_scan_s": round(scan_s, 3),
        }
        print(json.dumps(rec), flush=True)
        lines.append(rec)
    with open(out_path, "w") as f:
        for rec in lines:
            f.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
