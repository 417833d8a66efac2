"""Distributed logistic-regression quality classifier — the
fastText/CCNet-shaped pretraining gate: score every document's
P(high-quality) from cheap text features and keep the top slice.

Spark-first design (the same shape as ``operators/model.py``'s OLS —
reference parity target ``run_model``, /root/reference/src/tasks.py:561-580,
generalized to the logistic link): training is IRLS/Newton where each
iteration is ONE aggregate over the feature frame — the gradient's k
sums and the Hessian's k(k+1)/2 sums accumulate map-side (all codegen
arithmetic: the current β enters the plan as literals, σ(xβ) is a
built-in expression) and collect as a single tiny row; the k×k solve
runs driver-side in numpy. Nothing data-sized reaches the driver and
no per-row Python executes, so the identical plan trains on 100 TB of
documents: cost = ``iters`` scans, each a map-side-combined aggregate.

Scoring is pure codegen (one ``σ(Σ βᵢxᵢ)`` expression), so the gate
composes with every other llmdata filter at scan speed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid_expr(z: Column) -> Column:
    # numerically-stable split keeps exp() bounded for |z| large —
    # identical to the numpy twin the tests pin against
    return F.when(z >= 0, 1.0 / (1.0 + F.exp(-z))).otherwise(
        F.exp(z) / (1.0 + F.exp(z))
    )


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 10,
    ridge: float = 1e-6,
    intercept: bool = True,
) -> list[float]:
    """Fit logistic regression by IRLS; returns coefficients ordered as
    ``feature_cols`` (+ trailing intercept when ``intercept=True``).

    Per iteration: z = Xβ (β as plan literals), p = σ(z), w = p(1−p);
    gradient Xᵀ(y−p) and Hessian XᵀWX via one grouped-free aggregate
    (k + k(k+1)/2 sums, map-side combined); β ← β + (XᵀWX + λI)⁻¹ g on
    the driver. The ridge term keeps the solve defined under perfect
    separation (where the MLE diverges); iterations are deterministic,
    so the fit reproduces bit-for-bit on any cluster layout up to float
    summation order (partials are doubles; acceptable for a classifier
    gate — thresholding, not accounting)."""
    cols = [F.col(c).cast("double") for c in feature_cols]
    if intercept:
        cols = cols + [F.lit(1.0)]
    k = len(cols)
    y = F.col(label_col).cast("double")
    beta = np.zeros(k)
    for _ in range(iters):
        z = cols[0] * float(beta[0])
        for i in range(1, k):
            z = z + cols[i] * float(beta[i])
        p = _sigmoid_expr(z)
        w = p * (1.0 - p)
        aggs = [F.sum(cols[i] * (y - p)).alias(f"g{i}") for i in range(k)]
        for i in range(k):
            for j in range(i, k):
                aggs.append(
                    F.sum(cols[i] * cols[j] * w).alias(f"h{i}_{j}")
                )
        row = df.agg(*aggs).collect()[0]
        g = np.array([row[f"g{i}"] or 0.0 for i in range(k)])
        H = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                H[i, j] = H[j, i] = row[f"h{i}_{j}"] or 0.0
        H += ridge * np.eye(k)
        step = np.linalg.solve(H, g)
        beta = beta + step
        if float(np.max(np.abs(step))) < 1e-10:
            break
    return [float(b) for b in beta]


def logreg_score(
    df: DataFrame,
    beta: list[float],
    feature_cols: list[str],
    intercept: bool = True,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append ``P(label=1)`` under ``out_col`` — one codegen expression,
    no Python in the scan."""
    cols = [F.col(c).cast("double") for c in feature_cols]
    if intercept:
        cols = cols + [F.lit(1.0)]
    z = cols[0] * float(beta[0])
    for i in range(1, len(cols)):
        z = z + cols[i] * float(beta[i])
    return df.withColumn(out_col, _sigmoid_expr(z))


def quality_classifier_filter(
    docs: DataFrame,
    feature_cols: list[str],
    label_col: str,
    keep_above: float = 0.5,
    iters: int = 10,
) -> DataFrame:
    """Train on the labeled frame, gate the SAME frame: rows scoring
    ``P(high quality) > keep_above`` survive. For the production shape
    (train on a curated sample, score the full 100 TB corpus) call
    ``train_logreg`` on the sample and ``logreg_score`` on the corpus —
    the fit collapses to a β literal list that ships in the plan."""
    beta = train_logreg(docs, feature_cols, label_col, iters=iters)
    scored = logreg_score(docs, beta, feature_cols)
    return scored.where(F.col("quality_prob") > keep_above)


def train_logreg_numpy(
    X: np.ndarray,
    y: np.ndarray,
    iters: int = 10,
    ridge: float = 1e-6,
    intercept: bool = True,
) -> np.ndarray:
    """Driver-side twin of ``train_logreg`` (same math, same iteration
    count, same ridge) — the test oracle proving the distributed
    aggregates compute the textbook IRLS update."""
    if intercept:
        X = np.hstack([X, np.ones((X.shape[0], 1))])
    k = X.shape[1]
    beta = np.zeros(k)
    for _ in range(iters):
        z = X @ beta
        p = np.where(z >= 0, 1.0 / (1.0 + np.exp(-z)),
                     np.exp(z) / (1.0 + np.exp(z)))
        w = p * (1.0 - p)
        g = X.T @ (y - p)
        H = (X * w[:, None]).T @ X + ridge * np.eye(k)
        step = np.linalg.solve(H, g)
        beta = beta + step
        if float(np.max(np.abs(step))) < 1e-10:
            break
    return beta
