"""Dump the Iceberg position-delete STAGING write plan (r14 evidence).

VERDICT r13 #3: commit 019b5f1 replaced the staging frame's global
``.sort("file_path", "pos")`` (an ``Exchange rangepartitioning`` plus
its range-sampling pass) with ``repartition(file_path)`` +
``sortWithinPartitions`` — but the r13 plan dumps only captured the
ENTRY plan, which never contains the internal staging write. This
script builds the exact ``iceberg_dml_roundtrip`` fixture, takes the
first DELETE's matches, and explains the staged frame BOTH ways:

- ``iceberg_delete_staging_before.txt``: the pre-019b5f1 shape
  (global sort) on the same matches;
- ``iceberg_delete_staging_after.txt``: the shipped
  ``_position_delete_frame`` (hash clustering + in-partition sort).

Usage: python scripts/dump_staging_plans_r14.py <outdir>
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from simple_data_workflow_spark.session import get_spark, tune  # noqa: E402
from simple_data_workflow_spark.sources.readers import load_table  # noqa: E402
from simple_data_workflow_spark.sources.iceberg_writer import (  # noqa: E402
    _live_lineage_scan,
    _position_delete_frame,
    iceberg_write,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _dump(df, out_path: str) -> None:
    df.write.format("noop").mode("overwrite").save()  # finalize AQE
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {out_path}", flush=True)


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dump-staging-plans-r14")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)
    path = tempfile.mkdtemp(prefix="sdw-iceplan-") + "/orders_icedml"
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    iceberg_write(orders, path, mode="error")
    view, data, _schema = _live_lineage_scan(spark, path)
    matches = view.where("o_totalprice < 50000").select("__fp", "__ri")
    files = [f for f, _seq in data]
    after = _position_delete_frame(spark, matches, files)
    _dump(after, os.path.join(outdir, "iceberg_delete_staging_after.txt"))
    # pre-019b5f1 shape: same lineage-mapped rows, GLOBAL sort (range
    # exchange). Rebuilt from the raw matches (not on top of `after`)
    # so the plan carries ONLY the old shape's exchange.
    from simple_data_workflow_spark.sources.delta_reader import (
        _scan_spelling,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        _local_path,
    )

    key_rows = {}
    for f in files:
        loc = _local_path(f)
        key_rows[loc] = f
        key_rows[_scan_spelling(loc)] = f
    before = (
        matches.join(
            F.broadcast(
                spark.createDataFrame(
                    sorted(key_rows.items()),
                    "__fp string, file_path string",
                )
            ),
            "__fp",
        )
        .select("file_path", F.col("__ri").alias("pos"))
        .sort("file_path", "pos")
    )
    _dump(before, os.path.join(outdir, "iceberg_delete_staging_before.txt"))
    spark.stop()


if __name__ == "__main__":
    main()
