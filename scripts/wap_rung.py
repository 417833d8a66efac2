"""Round-9 scale rung: WRITE-AUDIT-PUBLISH publication cost vs table
size. The claim table_publish_from makes for 100 TB: staging is one
metadata commit (shallow clone), and PUBLICATION moves no data bytes —
the stage's new files hard-link into the target and one overwrite
entry lands — so publish cost scales with the AUDITED CHANGE (links +
one JSON write), not with table bytes. The rung holds the change
constant (one appended batch + one MoR delete) while the production
table grows 1x/8x/32x; flat publish seconds and near-zero new bytes
under prod/data beyond the linked batch prove the claim.

One JSON line per rung: {rung, prod_rows, stage_sec, audit_sec,
publish_sec, publish_new_bytes, linked_files}.

Usage: python scripts/wap_rung.py [out.jsonl]
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
    table_clone,
    table_commit,
    table_delete_where,
    table_publish_from,
    table_read,
)

RUNGS = [
    ("1x", "/root/testdata/sf0.1"),
    ("8x", "/root/repo/scaledata/sf0.8"),
    ("32x", "/root/repo/scaledata/sf3.2"),
]


def _dir_stat(d: str) -> tuple[int, set]:
    total, names = 0, set()
    for name in os.listdir(d):
        p = os.path.join(d, name)
        if os.path.isfile(p):
            total += os.path.getsize(p)
            names.add(name)
    return total, names


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "evidence/wap_rung_r9.jsonl"
    spark = get_spark(app_name="wap-rung")
    spark.sparkContext.setLogLevel("ERROR")
    with open(out_path, "w") as out:
        for rung, sf_dir in RUNGS:
            d = tempfile.mkdtemp(prefix=f"wap-rung-{rung}-")
            prod, stage = f"{d}/prod", f"{d}/stage"
            orders = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderstatus", "o_totalprice"
            )
            table_commit(orders.where("o_orderkey % 97 != 0"), prod)
            prod_rows = table_read(spark, prod).count()

            t0 = time.time()
            table_clone(spark, prod, stage)
            stage_sec = time.time() - t0

            # the CONSTANT-SIZE audited change: one appended batch
            # (~1% of 1x) + one scattered MoR delete
            t0 = time.time()
            table_commit(
                orders.where("o_orderkey % 97 = 0").coalesce(2), stage
            )
            table_delete_where(
                spark, stage, "o_orderkey % 9700 = 194", mode="mor"
            )
            audit_sec = time.time() - t0

            pre_bytes, pre_names = _dir_stat(f"{prod}/data")
            t0 = time.time()
            table_publish_from(spark, prod, stage)
            publish_sec = time.time() - t0
            post_bytes, post_names = _dir_stat(f"{prod}/data")
            # hard links share inodes: "new bytes" counts the linked
            # names' sizes — the on-disk cost is 0 extra, this is the
            # UPPER BOUND the directory listing can see
            row = {
                "rung": rung,
                "prod_rows": prod_rows,
                "stage_sec": round(stage_sec, 3),
                "audit_sec": round(audit_sec, 3),
                "publish_sec": round(publish_sec, 3),
                "publish_new_bytes": post_bytes - pre_bytes,
                "linked_files": len(post_names - pre_names),
            }
            out.write(json.dumps(row) + "\n")
            out.flush()
            print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
