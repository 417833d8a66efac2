"""Generate a larger local bench rung from the sf0.1 testdata.

Usage: python scripts/gen_scale_rung.py [copies] [out_dir] [tables]

``tables`` is an optional comma-list restricting which FACT tables are
generated (e.g. ``documents`` for the 128x decontamination/clustering
rung, where orders/lineitem would cost gigabytes for nothing);
dimension tables are always copied.

Unions ``copies`` remapped copies of each FACT table (dimension tables
stay fixed — like a higher TPC-H scale factor, growth lives in facts):

- orders/lineitem: order keys shifted per copy (join keys stay aligned);
- events: event/user ids shifted per copy so sessions don't merge;
- documents: ids shifted; every 5th token salted per copy so copies are
  NOT near-duplicates of each other (a duplicated corpus would inflate
  the near-dup pair count quadratically and make LSH scaling look
  artificially bad — a bigger real corpus has more clusters, not denser
  ones);
- embeddings: ids shifted; per-copy deterministic sign-flip of the
  vector components (preserves norms and intra-copy geometry, kills
  cross-copy cosine) for the same reason.

Copy 0 is byte-identical to sf0.1, so the rung strictly contains the
smaller scale. All remapping is deterministic; reruns reproduce the
same tables.
"""

from __future__ import annotations

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from simple_data_workflow_spark.session import get_spark  # noqa: E402
from simple_data_workflow_spark.sources.readers import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/root/repo/scaledata/sf{0.1 * copies:g}"
    )
    facts = (
        sys.argv[3].split(",")
        if len(sys.argv) > 3
        else ["orders", "lineitem", "events", "documents", "embeddings"]
    )
    spark = get_spark(app_name="gen-scale-rung")
    spark.sparkContext.setLogLevel("ERROR")

    # one offset clear of every fact key space
    maxes = [
        load_table(spark, SRC, "orders").agg(F.max("o_orderkey")).first()[0],
        load_table(spark, SRC, "documents").agg(F.max("doc_id")).first()[0],
        load_table(spark, SRC, "embeddings").agg(F.max("vec_id")).first()[0],
        load_table(spark, SRC, "events").agg(
            F.greatest(F.max("event_id"), F.max("user_id"))
        ).first()[0],
    ]
    off = int(10 ** np.ceil(np.log10(max(maxes) + 1)))

    for name in DIMS:
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )

    def shifted(df, cols: list[str], i: int):
        for c in cols:
            df = df.withColumn(c, F.col(c) + F.lit(i * off))
        return df

    def stack(name: str, remap) -> None:
        base = load_table(spark, SRC, name)
        parts = [remap(base, i) for i in range(copies)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{name}.parquet")

    if "orders" in facts:
        stack("orders", lambda df, i: shifted(df, ["o_orderkey"], i))
    if "lineitem" in facts:
        stack("lineitem", lambda df, i: shifted(df, ["l_orderkey"], i))
    if "events" in facts:
        stack("events", lambda df, i: shifted(df, ["event_id", "user_id"], i))

    def remap_documents(df, i):
        df = shifted(df, ["doc_id"], i)
        if i == 0:
            return df
        salted = F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda t, j: F.when(
                    j % 5 == 4, F.concat(F.lit(f"cp{i}"), t)
                ).otherwise(t),
            ),
        )
        return df.withColumn("text", salted).withColumn(
            "n_chars", F.length("text")
        )

    if "documents" in facts:
        stack("documents", remap_documents)

    dim = len(load_table(spark, SRC, "embeddings").select("embedding").first()[0])

    def remap_embeddings(df, i):
        df = shifted(df, ["vec_id"], i)
        if i == 0:
            return df
        signs = np.random.default_rng(1000 + i).choice([-1.0, 1.0], size=dim)
        flipped = F.zip_with(
            F.col("embedding"),
            F.array(*[F.lit(float(s)) for s in signs]),
            lambda v, s: (v * s).cast("float"),
        )
        return df.withColumn("embedding", flipped)

    if "embeddings" in facts:
        stack("embeddings", remap_embeddings)

    for name in DIMS + facts:
        n = spark.read.parquet(f"{out}/{name}.parquet").count()
        print(f"{name}: {n} rows")
    print(f"wrote {copies}x rung to {out} (key offset {off})")
    spark.stop()


if __name__ == "__main__":
    main()
