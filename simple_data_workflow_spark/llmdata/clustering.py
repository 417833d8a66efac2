"""Distributed k-means over embedding columns + cluster-balanced
sampling — the semantic-diversity lever of a pretraining data mix:
cluster the corpus by embedding, then cap/quota documents per cluster
so no semantic neighborhood dominates the token budget.

Spark-first design: Lloyd's algorithm with the two halves placed where
they belong at 100 TB —

- **assign** is an Arrow-batched vectorized pandas UDF (one numpy
  ``batch × k × dim`` distance computation per batch; centroids ride
  pickled with the UDF — k·dim doubles, never data-sized);
- **update** is ONE grouped aggregate per iteration:
  ``posexplode(vec) → groupBy(cluster, pos) → SUM/COUNT`` with
  map-side combine, collecting exactly ``k × dim`` cells to the
  driver — cost independent of corpus rows beyond the scan.

Initialization is deterministic (the k lowest-id vectors), so the fit
reproduces anywhere and the unit test pins the distributed iteration
EXACTLY equal to a driver-side numpy Lloyd twin. Empty clusters keep
their previous centroid (the standard fix; deterministic).

``cluster_balanced_sample`` then caps each cluster with the same
stateless xxhash64-rank window ``llmdata.dedup.cap_per_key`` uses — no
global sort, one shuffle on cluster_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _assign_udf(centroids: np.ndarray):
    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        from simple_data_workflow_spark.blasctl import pin_worker_blas

        pin_worker_blas()
        X = np.asarray(list(vs), dtype=np.float64)
        # ||x-c||² = ||x||² − 2x·c + ||c||²; ||x||² constant per row
        d = -2.0 * X @ C.T + (C * C).sum(axis=1)[None, :]
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return assign


def kmeans_fit(
    df: DataFrame,
    k: int,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Fit k centroids; returns them as a ``k × dim`` nested list.
    Deterministic: init = the k lowest-``id_col`` vectors; each Lloyd
    iteration is ONE Arrow ``mapInPandas`` scan emitting k×(dim+1)
    partial sums per partition (assign + accumulate fused in numpy —
    MLlib's treeAggregate shape), reduced driver-side. Nothing
    shuffles; the driver sees partitions × k tiny rows per iteration
    (the earlier assign-UDF + grouped-aggregate form paid a full
    shuffle and a fresh codegen compile every iteration — measured
    ~2× slower at sf0.1)."""
    seed_rows = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} rows, found {len(seed_rows)}")
    C = np.asarray([r["v"] for r in seed_rows], dtype=np.float64)
    dim = C.shape[1]
    k_n = C.shape[0]
    # persist the projected+cast vectors for the duration of the fit:
    # every Lloyd iteration is a full pass, and without this each pass
    # re-reads the parquet and re-casts (guide §5 — reuse justifies the
    # cache; MEMORY_AND_DISK spills gracefully at scale). In-query only:
    # unpersisted before returning, recomputed from source every call.
    vecs = df.select(F.col(vec_col).cast("array<double>").alias("v")).persist()
    for _ in range(iters):
        C_iter = C.copy()

        def partials(batches, C_iter=C_iter):
            from simple_data_workflow_spark.blasctl import pin_worker_blas

            pin_worker_blas()
            S = np.zeros((k_n, dim))
            N = np.zeros(k_n, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.asarray(list(pdf["v"]), dtype=np.float64)
                # ||x-c||² = ||x||² − 2x·c + ||c||²; ||x||² constant/row
                d = -2.0 * X @ C_iter.T + (C_iter * C_iter).sum(axis=1)[None, :]
                a = d.argmin(axis=1)
                np.add.at(S, a, X)
                np.add.at(N, a, 1)
            yield pd.DataFrame(
                {
                    "c": np.arange(k_n, dtype=np.int32),
                    "n": N,
                    "s": [S[j].tolist() for j in range(k_n)],
                }
            )

        cells = vecs.mapInPandas(
            partials, "c int, n long, s array<double>"
        ).collect()
        new_C = C.copy()  # empty cluster keeps its previous centroid
        sums = np.zeros_like(C)
        counts = np.zeros(len(C))
        for r in cells:
            counts[r["c"]] += r["n"]
            sums[r["c"], :] += np.asarray(r["s"], dtype=np.float64)
        nonempty = counts > 0
        new_C[nonempty] = sums[nonempty] / counts[nonempty, None]
        if np.allclose(new_C, C, rtol=0, atol=1e-12):
            C = new_C
            break
        C = new_C
    vecs.unpersist()
    return [[float(x) for x in row] for row in C]


def assign_clusters(
    df: DataFrame,
    centroids: list,
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
) -> DataFrame:
    """Append each row's nearest-centroid id — one vectorized scan."""
    C = np.asarray(centroids, dtype=np.float64)
    return df.withColumn(
        out_col, _assign_udf(C)(F.col(vec_col).cast("array<double>"))
    )


def cluster_balanced_sample(
    df: DataFrame,
    centroids: list,
    cap_per_cluster: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "cluster-balance",
) -> DataFrame:
    """Keep at most ``cap_per_cluster`` rows per semantic cluster,
    chosen by a deterministic per-row hash rank (stateless, seedable
    via ``salt``; re-running selects the same rows). One shuffle on
    cluster_id; no global sort. The semantic twin of per-source
    capping: stops any one embedding neighborhood from dominating the
    training mix."""
    assigned = assign_clusters(df, centroids, vec_col=vec_col)
    rank = F.xxhash64(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy("cluster_id").orderBy(rank.asc(), F.col(id_col).asc())
    return (
        assigned.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap_per_cluster)
        .drop("__rn")
    )


def semantic_pairs(
    df: DataFrame,
    centroids: list,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Within-cluster cosine near-duplicate pairs — the candidate step
    of SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication", arXiv:2303.09540):
    instead of an O(n²) all-pairs scan, pairs are only scored INSIDE a
    k-means cluster. At 100 TB this is the whole trick: pick k ∝ N so
    expected cluster size stays constant and the per-cluster self-join
    stays bounded; a pathologically hot cluster is re-clusterable
    recursively (same function, its rows only). The join shuffles both
    sides once on ``cluster_id``; scoring is the Arrow-batched BLAS
    cosine (``functions.vectors.cosine_pd``) over the candidate stream
    — one ``einsum`` per batch instead of an interpreted per-element
    fold per pair (the zip_with/aggregate form measured ~3× slower on
    the ~1.5M-candidate sf0.1 stream; higher-order array functions do
    not participate in whole-stage codegen)."""
    from simple_data_workflow_spark.functions.vectors import cosine_pd

    # ``assigned=`` lets a caller that already holds (and typically
    # persisted) the assign_clusters result skip re-running the assign
    # scan + UDF for each side of the self-join
    if assigned is None:
        assigned = assign_clusters(df, centroids, vec_col=vec_col)
    base = assigned.select(
        F.col(id_col),
        "cluster_id",
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    a, b = base.alias("a"), base.alias("b")
    cos = cosine_pd()
    return (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.cluster_id").alias("cluster_id"),
            F.round(cos(F.col("a.__v"), F.col("b.__v")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup: drop semantic near-duplicates, keeping ONE
    representative per within-cluster near-dup connected component
    (the minimum id — this repo's dedup convention; deterministic and
    engine-portable, where the paper keeps the member farthest from
    the centroid). Composes the tested machinery end-to-end:
    ``semantic_pairs`` (cluster-bounded candidate scoring) →
    ``dedup.cluster_pairs`` (min-label propagation with path halving)
    → anti-join of the corpus against the non-canonical ids. Returns
    the kept rows with their ``cluster_id`` attached. Cost: one
    assign scan + one cluster-keyed self-join + O(log diameter)
    label-propagation rounds over the (tiny) pair list — nothing
    data-sized at the driver. Pass ``pairs=`` to reuse an
    already-materialized ``semantic_pairs`` result (a caller that also
    audits the pair list shouldn't pay the self-join twice)."""
    from simple_data_workflow_spark.llmdata.dedup import dedup_by_cluster

    if pairs is None:
        pairs = semantic_pairs(
            df,
            centroids,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            assigned=assigned,
        )
    if assigned is None:
        assigned = assign_clusters(df, centroids, vec_col=vec_col)
    return dedup_by_cluster(assigned, pairs, id_col=id_col)


def kmeans_fit_numpy(
    X: np.ndarray, k: int, iters: int = 10
) -> np.ndarray:
    """Driver-side Lloyd twin (same init: first k rows in given order;
    same empty-cluster rule) — the test oracle for ``kmeans_fit``."""
    C = X[:k].astype(np.float64).copy()
    for _ in range(iters):
        d = -2.0 * X @ C.T + (C * C).sum(axis=1)[None, :]
        a = d.argmin(axis=1)
        new_C = C.copy()
        for j in range(k):
            m = a == j
            if m.any():
                new_C[j] = X[m].mean(axis=0)
        if np.allclose(new_C, C, rtol=0, atol=1e-12):
            return new_C
        C = new_C
    return C
