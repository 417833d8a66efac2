"""Round-11 scale-rung evidence (VERDICT r10 #1 and #9).

Part A — Iceberg position-delete sweep: one v2 orders table; delete
snapshots at 1x/8x/64x position counts; per rung record the read wall
time AND the DRIVER-side bytes the delete application allocates
(tracemalloc around snapshot resolution + the masked read's planning,
peak traced bytes). The top rung also re-reads with the mask threshold
forced to 0 so the distributed anti-join path's driver bytes are
measured at the SAME delete count — the claim under test: driver
memory no longer grows with delete count once the anti-join engages
(pre-r11, boxed collect_list positions grew ~30 B/position without
bound).

Part B — lakehouse write+DML rung: Delta / Iceberg / Hudi-MoR at
8x/32x/128x rows; per rung record the write wall, a row-level DML
wall, and a NO-MATCH DML wall (= the pure metadata resolve+commit
path). The claim: the no-op/metadata path stays flat while data
staging scales with the writer.

Output: evidence/r11_rung.jsonl, one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import tracemalloc

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simple_data_workflow_spark.session import get_spark, tune  # noqa: E402

OUT = "/root/repo/evidence/r11_rung.jsonl"


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def part_a_iceberg_deletes(spark):
    import simple_data_workflow_spark.sources.iceberg_reader as ir
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_write,
    )

    n_rows = 1_300_000
    base = tempfile.mkdtemp(prefix="sdw-r11a-")
    df = spark.range(n_rows).select(
        F.col("id"),
        (F.col("id") % 97).cast("double").alias("v"),
        (F.col("id") % 5).cast("string").alias("g"),
    )
    for frac, label in [(128, "1x"), (16, "8x"), (2, "64x")]:
        # fresh table per rung so each read applies exactly ONE delete
        # population (id % frac == 0 → n_rows/frac positions)
        root = f"{base}/t_{label}"
        iceberg_write(df.repartition(16), root, mode="error")
        iceberg_delete(spark, root, f"id % {frac} = 0")
        n_del = (n_rows + frac - 1) // frac  # ids 0, frac, 2*frac, ...
        for path_label, threshold in [
            ("mask", ir._POS_DELETE_MASK_MAX),
            ("antijoin", 0),
        ]:
            if path_label == "antijoin" and label != "64x":
                continue  # one same-count comparison point is enough
            import pyarrow as pa

            old = ir._POS_DELETE_MASK_MAX
            ir._POS_DELETE_MASK_MAX = threshold
            try:
                arrow0 = pa.total_allocated_bytes()
                tracemalloc.start()
                t0 = time.monotonic()
                got = ir.iceberg_read(spark, root)
                n = got.count()
                sec = time.monotonic() - t0
                _cur, peak = tracemalloc.get_traced_memory()
                tracemalloc.stop()
                arrow_delta = pa.total_allocated_bytes() - arrow0
            finally:
                ir._POS_DELETE_MASK_MAX = old
            emit(
                {
                    "part": "A",
                    "rung": label,
                    "path": path_label,
                    "n_rows": n_rows,
                    "n_deletes": n_del,
                    "rows_read": n,
                    "sec": round(sec, 3),
                    "driver_peak_bytes": peak,
                    "arrow_live_delta_bytes": arrow_delta,
                }
            )
            assert n == n_rows - n_del, (n, n_rows, n_del)
    shutil.rmtree(base, ignore_errors=True)


def part_b_write_rung(spark):
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_write,
    )
    from simple_data_workflow_spark.sources.hudi_writer import (
        hudi_delta_delete,
        hudi_write,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_write,
    )

    base_rows = 50_000
    for mult in (8, 32, 128):
        n = base_rows * mult
        df = spark.range(n).select(
            F.col("id"),
            (F.col("id") % 1000).cast("double").alias("v"),
            (F.col("id") % 4).cast("string").alias("g"),
        )
        root = tempfile.mkdtemp(prefix=f"sdw-r11b-{mult}x-")
        for fmt, write, dml, noop in [
            (
                "delta",
                lambda p: delta_write(df.repartition(16), p, mode="error"),
                lambda p: delta_delete(
                    spark, p, "id = 7", strategy="rewrite"
                ),
                lambda p: delta_delete(spark, p, "id = -1"),
            ),
            (
                "iceberg",
                lambda p: iceberg_write(df.repartition(16), p, mode="error"),
                lambda p: iceberg_delete(spark, p, "id = 7"),
                lambda p: iceberg_delete(spark, p, "id = -1"),
            ),
            (
                "hudi_mor",
                lambda p: hudi_write(
                    df.repartition(16),
                    p,
                    mode="error",
                    record_key="id",
                    table_type="MERGE_ON_READ",
                ),
                lambda p: hudi_delta_delete(spark, p, "id = 7"),
                lambda p: hudi_delta_delete(spark, p, "id = -1"),
            ),
        ]:
            path = f"{root}/{fmt}"
            t0 = time.monotonic()
            write(path)
            w = time.monotonic() - t0
            t0 = time.monotonic()
            dml(path)
            d = time.monotonic() - t0
            t0 = time.monotonic()
            noop(path)
            nop = time.monotonic() - t0
            emit(
                {
                    "part": "B",
                    "fmt": fmt,
                    "mult": f"{mult}x",
                    "n_rows": n,
                    "write_sec": round(w, 3),
                    "dml_sec": round(d, 3),
                    "noop_dml_sec": round(nop, 3),
                }
            )
        shutil.rmtree(root, ignore_errors=True)


def part_c_mor_update_rung(spark):
    """Round-11 continuation: merge-on-read row-level UPDATE rung.
    A FIXED 400-row update (spread thin across all 16 files — the
    wide+sparse shape) against tables of 8x/32x/128x rows:

    - delta UPDATE strategy="dv" (DV-mask + append new rows) vs
      strategy="rewrite" (CoW rewrites every affected file). The claim:
      the rewrite wall grows with TABLE bytes (all 16 files rewrite to
      touch ~25 rows each) while the DV wall stays near the hit-scan
      cost — edit cost ∝ edited rows, not affected-file bytes.
    - iceberg UPDATE (position-delete + append, MoR by construction)
      for the same shape.
    """
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_update,
        delta_write,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_update,
        iceberg_write,
    )

    base_rows = 50_000
    for mult in (8, 32, 128):
        n = base_rows * mult
        df = spark.range(n).select(
            F.col("id"),
            (F.col("id") % 1000).cast("double").alias("v"),
            (F.col("id") % 4).cast("string").alias("g"),
        )
        pred = "id < 400"  # constant match count, spread over all files
        root = tempfile.mkdtemp(prefix=f"sdw-r11c-{mult}x-")
        # best-of-2 per strategy (fresh table per attempt — DML mutates)
        # to shed JIT/GC noise from the back-to-back 16-file builds
        def best2(build, run):
            walls = []
            for i in range(2):
                p = f"{root}/t{i}-{len(walls)}-{time.monotonic_ns()}"
                build(p)
                t0 = time.monotonic()
                run(p)
                walls.append(time.monotonic() - t0)
            return min(walls)

        dv = best2(
            lambda p: delta_write(df.repartition(16), p, mode="error"),
            lambda p: delta_update(
                spark, p, {"v": "v + 1"}, pred, strategy="dv"
            ),
        )
        cow = best2(
            lambda p: delta_write(df.repartition(16), p, mode="error"),
            lambda p: delta_update(
                spark, p, {"v": "v + 1"}, pred, strategy="rewrite"
            ),
        )
        ice = best2(
            lambda p: iceberg_write(df.repartition(16), p, mode="error"),
            lambda p: iceberg_update(spark, p, {"v": "v + 1"}, pred),
        )
        emit(
            {
                "part": "C",
                "mult": f"{mult}x",
                "n_rows": n,
                "matched_rows": 400,
                "delta_dv_update_sec": round(dv, 3),
                "delta_rewrite_update_sec": round(cow, 3),
                "iceberg_mor_update_sec": round(ice, 3),
            }
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    only_c = "--part-c-only" in sys.argv
    if os.path.exists(OUT) and "--part-a-only" not in sys.argv and not only_c:
        os.remove(OUT)
    spark = get_spark()
    tune(spark)
    if not only_c:
        part_a_iceberg_deletes(spark)
        if "--part-a-only" not in sys.argv:
            part_b_write_rung(spark)
    if "--part-a-only" not in sys.argv:
        part_c_mor_update_rung(spark)
    print("done")
