"""Round-12 scale-rung evidence (VERDICT r11 #1, #8, #10).

Part A — Delta DV DML driver-bytes sweep: fresh tables, deletion-vector
DELETEs at 1x/8x/64x matched rows; per rung record the DML wall and the
DRIVER-side allocation peaks (tracemalloc for Python objects + pyarrow
allocator delta for Arrow buffers) on BOTH position paths:

- packed  (_DV_EXEC_SIDECAR_MIN forced above the sweep): ONE packed
  Arrow transfer, ~8 B/position — grows linearly but shallowly;
- executor (_DV_EXEC_SIDECAR_MIN forced to 0): executors write the
  per-file sidecars; the driver collects one descriptor row per file —
  the claim under test: driver bytes FLAT across the 64x sweep.

Part B — OPTIMIZE ZORDER rung at 8x/32x/128x rows: randomized (x, y)
tables, ZORDER on both columns, then a box filter's file-skipping
ratio from the log stats (the same evidence delta_read(filters=) uses).
Claim: the pruned fraction HOLDS as the table grows (the Morton shuffle
is the only global movement) and the optimize wall scales ~linearly.

Part C — sf1 spot-bench: the 10 slowest bench entries once at an sf1
synthesized from sf0.1 (10 key-shifted copies; document text and
embedding vectors deterministically perturbed per copy so dedup/ANN
structure scales instead of degenerating into exact clones). Records
wall + driver peak RSS per query — the first empirical point on the
100x curve.

Part D — round-12 continuation surfaces (hudi incremental, delta
shallow clone, iceberg refs) across a 64x table-size sweep with a
FIXED change volume.

Output: evidence/r12_rung.jsonl (one JSON line per measurement).
Part E — clustering + V2-checkpoint scale posture.

Usage: python scripts/r12_rung.py [a|b|c|d|e|all]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time
import tracemalloc

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simple_data_workflow_spark.session import get_spark, tune  # noqa: E402

OUT = "/root/repo/evidence/r12_rung.jsonl"


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def part_a_dv_driver_bytes(spark):
    import pyarrow as pa

    import simple_data_workflow_spark.sources.delta_writer as dw
    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_write,
    )

    n_rows = 2_600_000
    base = tempfile.mkdtemp(prefix="sdw-r12a-")
    df = spark.range(n_rows).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v")
    )
    for frac, label in [(128, "1x"), (16, "8x"), (2, "64x")]:
        n_match = (n_rows + frac - 1) // frac  # ids 0, frac, 2*frac, ...
        for path_label, threshold in [
            ("packed", 10**12),
            ("executor", 0),
        ]:
            root = f"{base}/t_{label}_{path_label}"
            delta_write(df.repartition(16), root, mode="error")
            old = dw._DV_EXEC_SIDECAR_MIN
            dw._DV_EXEC_SIDECAR_MIN = threshold
            try:
                arrow0 = pa.total_allocated_bytes()
                tracemalloc.start()
                t0 = time.time()
                delta_delete(spark, root, f"id % {frac} = 0", strategy="dv")
                wall = time.time() - t0
                _cur, py_peak = tracemalloc.get_traced_memory()
                tracemalloc.stop()
                arrow_delta = pa.total_allocated_bytes() - arrow0
            finally:
                dw._DV_EXEC_SIDECAR_MIN = old
            kept = delta_read(spark, root).count()
            assert kept == n_rows - n_match, (kept, n_rows, n_match)
            emit(
                {
                    "part": "A",
                    "rung": label,
                    "path": path_label,
                    "matched_rows": n_match,
                    "dml_wall_s": round(wall, 3),
                    "driver_py_peak_mb": round(py_peak / 1e6, 3),
                    "driver_arrow_delta_mb": round(arrow_delta / 1e6, 3),
                    "rows_after": kept,
                }
            )


def part_b_zorder_rung(spark):
    from simple_data_workflow_spark.sources.delta_reader import (
        _delta_stats_map,
        delta_read,
        delta_snapshot_files,
    )
    from simple_data_workflow_spark.sources.delta_writer import (
        _replay_full,
        delta_optimize,
        delta_write,
    )
    from simple_data_workflow_spark.sources.tablelog import _stats_prune

    base = tempfile.mkdtemp(prefix="sdw-r12b-")
    for n_rows, label in [(100_000, "8x"), (400_000, "32x"), (1_600_000, "128x")]:
        root = f"{base}/z_{label}"
        side = 1000
        df = spark.range(n_rows).select(
            F.col("id"),
            (F.hash(F.col("id")) % side).alias("x"),
            (F.hash(F.col("id") + 7) % side).alias("y"),
        )
        delta_write(df.repartition(32), root, mode="error")
        t0 = time.time()
        delta_optimize(
            spark, root, small_file_bytes=128 * 1024, zorder_by=["x", "y"]
        )
        z_wall = time.time() - t0
        files, _dvs, schema, _pc = delta_snapshot_files(spark, root)
        _a, _m, _p, cur_v, _t = _replay_full(spark, root)
        smap = _delta_stats_map(spark, root, cur_v, schema)
        # a 10%-per-side box → 1% of the plane
        filters = [
            ("x", ">=", -100), ("x", "<=", 0),
            ("y", ">=", -100), ("y", "<=", 0),
        ]
        kept = _stats_prune(smap, sorted(files), filters)
        ratio = 1.0 - len(kept) / max(len(files), 1)
        t0 = time.time()
        n = delta_read(spark, root, filters=filters).count()
        scan_wall = time.time() - t0
        emit(
            {
                "part": "B",
                "rung": label,
                "rows": n_rows,
                "zorder_wall_s": round(z_wall, 3),
                "files_total": len(files),
                "files_kept": len(kept),
                "pruned_fraction": round(ratio, 4),
                "box_scan_wall_s": round(scan_wall, 3),
                "box_rows": n,
            }
        )
        assert ratio >= 0.4, f"zorder pruning collapsed at {label}: {ratio}"


_SF1_DIR = "/tmp/sdw-sf1"


def build_sf1(spark):
    """Synthesize sf1 as 10 key-shifted copies of sf0.1 (dimension
    tables copied as-is; document text / embedding vectors perturbed
    per copy so content-sensitive operators scale instead of seeing
    exact clones)."""
    src = "/root/testdata/sf0.1"
    os.makedirs(_SF1_DIR, exist_ok=True)
    shifts = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    lift: dict[str, int] = {}
    for t in ("region", "nation"):
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{_SF1_DIR}/{t}.parquet")
    # key domains (o_custkey lifts with customer's domain, lineitem FKs
    # with their parents')
    dom = {
        "c_custkey": "customer", "s_suppkey": "supplier",
        "p_partkey": "part", "o_orderkey": "orders",
        "o_custkey": "customer", "l_orderkey": "orders",
        "l_partkey": "part", "l_suppkey": "supplier",
        "event_id": "events", "user_id": "events",
        "doc_id": "documents", "vec_id": "embeddings",
    }
    pk = {
        "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
        "orders": "o_orderkey", "events": "event_id",
        "documents": "doc_id", "embeddings": "vec_id",
    }
    for t, col in pk.items():
        lift[t] = (
            spark.read.parquet(f"{src}/{t}.parquet")
            .agg(F.max(col)).first()[0]
            + 1
        )
    lift["events_user"] = (
        spark.read.parquet(f"{src}/events.parquet")
        .agg(F.max("user_id")).first()[0]
        + 1
    )
    for t, cols in shifts.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        copies = []
        for i in range(10):
            c = df
            for col in cols:
                k = (
                    lift["events_user"]
                    if col == "user_id"
                    else lift[dom[col]]
                )
                c = c.withColumn(col, F.col(col) + F.lit(i * k))
            if t == "customer":
                # regenerate the name from the SHIFTED key (the
                # generator's own format) — cloning names 10x would
                # blow fuzzy-pair volume quadratically instead of
                # scaling it like a true sf1
                c = c.withColumn(
                    "c_name",
                    F.format_string("Customer#%09d", F.col("c_custkey")),
                )
            if t == "supplier":
                c = c.withColumn(
                    "s_name",
                    F.format_string("Supplier#%09d", F.col("s_suppkey")),
                )
            if t == "documents" and "text" in df.columns:
                c = c.withColumn(
                    "text",
                    F.when(
                        F.lit(i) > 0,
                        F.concat(F.col("text"), F.lit(f" v{i}")),
                    ).otherwise(F.col("text")),
                )
            if t == "embeddings":
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x: (x + F.lit(i * 1e-4)).cast("float"),
                    ),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{_SF1_DIR}/{t}.parquet")
    print("sf1 built at", _SF1_DIR, flush=True)


_SLOWEST_10 = [
    "pq_index_topk",
    "fuzzy_edit2_matches",
    "pq_topk_embeddings",
    "hudi_compact_read",
    "semdedup_kmeans_embeddings",
    "hudi_mor_read",
    "iceberg_pos_delete_read",
    "tablelog_metadata_tables",
    "delta_dv_write_roundtrip",
    "delta_optimize_roundtrip",
]


def part_c_sf1(spark):
    import __spark_entry__ as em

    build_sf1(spark)
    rows = {
        t: spark.read.parquet(f"{_SF1_DIR}/{t}.parquet").count()
        for t in ("lineitem", "orders", "documents", "embeddings")
    }
    emit({"part": "C", "rung": "sf1-tables", **rows})
    qmap = em.queries()
    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            r = json.loads(line)
            if r.get("part") == "C" and r.get("rung") == "sf1":
                done.add(r.get("query"))
    for name in _SLOWEST_10:
        if name in done:
            continue  # resume: already measured this round
        fn = qmap[name]
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        t0 = time.time()
        try:
            fn(spark, _SF1_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.time() - t0
            err = None
        except Exception as exc:  # record, keep going
            wall = time.time() - t0
            err = f"{type(exc).__name__}: {exc}"[:300]
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        emit(
            {
                "part": "C",
                "rung": "sf1",
                "query": name,
                "wall_s": round(wall, 3),
                "driver_maxrss_mb": round(rss1 / 1024, 1),
                "driver_rss_growth_mb": round((rss1 - rss0) / 1024, 1),
                "err": err,
            }
        )


def part_d_continuation(spark):
    """Round-12 continuation rung: the new surfaces' 100x posture.

    - hudi incremental: CoW table at 1x/8x/64x rows, a FIXED two-wave
      change set — the incremental read's wall should track the CHANGE
      volume, not the table volume (the commit-time range predicate
      stats-prunes untouched files), and driver RSS stays flat.
    - delta shallow clone: wall vs table size — metadata-only, so the
      wall tracks FILE COUNT (fixed here), not rows.
    - iceberg refs: set/fast-forward/read-through-ref walls — all
      metadata-sized, flat in table rows.
    """
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_clone,
        delta_write,
    )
    from simple_data_workflow_spark.sources.hudi_reader import (
        hudi_table_changes,
    )
    from simple_data_workflow_spark.sources.hudi_writer import (
        hudi_upsert,
        hudi_write,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_fast_forward,
        iceberg_set_ref,
        iceberg_write,
    )
    from simple_data_workflow_spark.sources.iceberg_reader import (
        iceberg_read,
    )

    base = tempfile.mkdtemp(prefix="sdw-r12d-")
    n0 = 200_000
    n_changed = 4_000  # FIXED change volume across the sweep
    for mult, label in [(1, "1x"), (8, "8x"), (64, "64x")]:
        n = n0 * mult
        df = spark.range(n).select(
            F.col("id"), (F.col("id") % 1013).cast("double").alias("v")
        )
        # --- hudi incremental ------------------------------------------
        hroot = f"{base}/hudi_{label}"
        t1 = hudi_write(
            df.repartition(16), hroot, mode="error", record_key="id"
        )
        wave = spark.range(n_changed).select(
            (F.col("id") * (n // n_changed)).alias("id"),
            F.lit(-1.0).alias("v"),
        )
        t2 = hudi_upsert(spark, hroot, wave)
        t0 = time.time()
        got = hudi_table_changes(spark, hroot, t1, t2).count()
        wall = time.time() - t0
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        assert got == n_changed, (got, n_changed)
        emit({"part": "d-hudi-incremental", "rows": n, "label": label,
              "changed": n_changed, "inc_read_s": round(wall, 3),
              "driver_rss_mb": rss})
        # --- delta shallow clone ---------------------------------------
        droot = f"{base}/delta_{label}"
        delta_write(df.repartition(16), droot, mode="error")
        t0 = time.time()
        delta_clone(spark, droot, f"{droot}_clone")
        clone_wall = time.time() - t0
        t0 = time.time()
        from simple_data_workflow_spark.sources.delta_reader import delta_read
        nc = delta_read(spark, f"{droot}_clone").count()
        read_wall = time.time() - t0
        assert nc == n
        emit({"part": "d-delta-clone", "rows": n, "label": label,
              "clone_s": round(clone_wall, 3),
              "clone_read_s": round(read_wall, 3)})
        # --- iceberg refs ----------------------------------------------
        iroot = f"{base}/ice_{label}"
        s1 = iceberg_write(df.repartition(16), iroot, mode="error")
        staged = iceberg_write(
            spark.range(5).select(
                (F.col("id") + n).alias("id"), F.lit(0.0).alias("v")
            ),
            iroot, mode="append", stage_only=True,
        )
        t0 = time.time()
        iceberg_set_ref(spark, iroot, "audit", snapshot_id=staged)
        iceberg_set_ref(spark, iroot, "v1", snapshot_id=s1, ref_type="tag")
        nref = iceberg_read(spark, iroot, ref="v1").count()
        iceberg_fast_forward(spark, iroot, "main", "audit")
        wall = time.time() - t0
        assert nref == n
        emit({"part": "d-iceberg-refs", "rows": n, "label": label,
              "refs_ops_plus_tag_read_s": round(wall, 3)})


def part_e_cluster_checkpoint(spark):
    """Clustering + V2-checkpoint scale posture.

    - hudi_cluster at 1x/8x/64x rows: wall should scale ~linearly
      (ONE range shuffle — the only global movement) and the
      clustered layout's file-pruning payoff should HOLD or improve
      (disjoint ranges shrink as files grow).
    - delta v2 checkpoint: checkpoint wall + post-checkpoint replay
      wall vs commit count — replay from the manifest is flat in the
      number of pre-checkpoint commits it replaces.
    """
    import pyarrow.parquet as _pq

    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_checkpoint,
        delta_write,
    )
    from simple_data_workflow_spark.sources.hudi_reader import hudi_read
    from simple_data_workflow_spark.sources.hudi_writer import (
        hudi_cluster,
        hudi_write,
    )

    base = tempfile.mkdtemp(prefix="sdw-r12e-")
    n0 = 200_000
    for mult, label in [(1, "1x"), (8, "8x"), (64, "64x")]:
        n = n0 * mult
        df = spark.range(n).select(
            F.col("id"), (F.col("id") % 9973).cast("double").alias("v")
        )
        root = f"{base}/h_{label}"
        hudi_write(df.repartition(16), root, mode="error", record_key="id")
        t0 = time.time()
        t_clu = hudi_cluster(spark, root, sort_by=["v"], n_file_groups=16)
        wall = time.time() - t0
        # pruning payoff: fraction of clustered files a 1%-range
        # predicate could skip via footer min/max
        import glob as _glob

        spans = []
        for f in _glob.glob(f"{root}/*_{t_clu}.parquet"):  # LIVE slices
            # (the retired pre-cluster files stay on disk until
            # hudi_clean — they must not count against the layout)
            md = _pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            vi = names.index("v")
            st = md.row_group(0).column(vi).statistics
            lo, hi = st.min, st.max
            for g in range(1, md.num_row_groups):
                s = md.row_group(g).column(vi).statistics
                lo, hi = min(lo, s.min), max(hi, s.max)
            spans.append((lo, hi))
        live = [s for s in spans]
        qlo, qhi = 0.0, 99.73  # 1% of the v domain
        kept = sum(1 for lo, hi in live if hi >= qlo and lo <= qhi)
        emit({"part": "e-hudi-cluster", "rows": n, "label": label,
              "cluster_s": round(wall, 3), "files": len(live),
              "files_kept_for_1pct_range": kept})
        # --- delta v2 checkpoint: many small commits, one checkpoint
        droot = f"{base}/d_{label}"
        n_commits = 4 * (1 if mult == 1 else (3 if mult == 8 else 6))
        delta_write(df.repartition(8), droot, mode="error")
        for i in range(n_commits):
            delta_write(
                spark.range(100).select(
                    (F.col("id") + n + i * 100).alias("id"),
                    F.lit(0.0).alias("v"),
                ),
                droot, mode="append",
            )
        t0 = time.time()
        v = delta_checkpoint(spark, droot, format="v2")
        cp_wall = time.time() - t0
        t0 = time.time()
        got = delta_read(spark, droot).count()
        read_wall = time.time() - t0
        assert got == n + n_commits * 100
        emit({"part": "e-delta-v2cp", "rows": n, "label": label,
              "commits": n_commits + 1, "checkpoint_s": round(cp_wall, 3),
              "replay_read_s": round(read_wall, 3)})


def main():
    which = (sys.argv[1] if len(sys.argv) > 1 else "all").lower()
    spark = get_spark(app_name="r12-rung")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)
    if which in ("a", "all"):
        part_a_dv_driver_bytes(spark)
    if which in ("b", "all"):
        part_b_zorder_rung(spark)
    if which in ("c", "all"):
        part_c_sf1(spark)
    if which in ("d", "all"):
        part_d_continuation(spark)
    if which in ("e", "all"):
        part_e_cluster_checkpoint(spark)


if __name__ == "__main__":
    main()
