"""MICE chained-equation imputation (reference src/tasks.py:444-473)."""

import numpy as np
import pytest

from simple_data_workflow_spark.operators.na import wrangle_na


@pytest.fixture()
def na_frame(spark):
    rng = np.random.default_rng(0)
    n = 200
    x = rng.normal(10, 2, n)
    y = 2 * x + rng.normal(0, 1, n)
    rows = []
    for i in range(n):
        xi = None if i % 7 == 0 else float(x[i])
        yi = None if i % 11 == 0 else float(y[i])
        rows.append((i, xi, yi))
    return spark.createDataFrame(rows, "row_id long, x double, y double")


def test_mice_shape_and_completeness(na_frame):
    out = wrangle_na(
        na_frame,
        strategy="mice",
        cols=["x", "y"],
        n_burnin=2,
        n_imputations=3,
        n_spread=1,
        row_id="row_id",
    )
    assert set(out.columns) == {"iter", "row_id", "x", "y"}
    assert out.count() == 3 * 200  # n_imputations stacked copies
    assert out.where("x IS NULL OR y IS NULL").count() == 0
    assert [r["iter"] for r in out.select("iter").distinct().orderBy("iter").collect()] == [0, 1, 2]


def test_mice_preserves_observed_and_varies_imputed(na_frame):
    out = wrangle_na(
        na_frame,
        strategy="mice",
        cols=["x", "y"],
        n_burnin=2,
        n_imputations=2,
        n_spread=1,
        row_id="row_id",
    ).toPandas()
    # observed cells identical across imputations
    obs = out[out.row_id == 1].sort_values("iter")
    assert obs.x.nunique() == 1 and obs.y.nunique() == 1
    # imputed cells differ across imputations (stochastic draws)
    imp = out[out.row_id == 0].sort_values("iter")  # x was NA at row 0
    assert imp.x.nunique() == 2


def test_mice_distribution_reasonable(na_frame):
    """The reference's own acceptance criterion (its stub test): imputed
    marginals close to observed — check mean within a tolerance."""
    out = wrangle_na(
        na_frame,
        strategy="mice",
        cols=["x", "y"],
        n_burnin=3,
        n_imputations=2,
        n_spread=1,
        row_id="row_id",
    ).toPandas()
    pdf = na_frame.toPandas()
    observed_mean = pdf.x.dropna().mean()
    imputed_rows = out[out.row_id.isin(pdf[pdf.x.isna()].row_id)]
    assert abs(imputed_rows.x.mean() - observed_mean) < 2.0


@pytest.mark.parametrize("draw", ["normal", "pmm"])
def test_mice_kl_divergence_under_1(na_frame, draw):
    """The reference's stated (but stubbed) acceptance criterion
    (test_tasks.py:465-470): each imputed dataset from N draws has a
    KL divergence w.r.t. the original observed distribution below 1.

    Concretely: per column, 10 histogram bins spanning the observed
    range, Laplace (+1) smoothing on both sides, KL(imputed‖observed).
    Threshold 1.0 as the reference states; seed fixed at the operator
    default (42) so the draws are reproducible."""
    out = wrangle_na(
        na_frame,
        strategy="mice",
        cols=["x", "y"],
        n_burnin=3,
        n_imputations=3,
        n_spread=2,
        row_id="row_id",
        draw=draw,
    ).toPandas()
    pdf = na_frame.toPandas()
    for col in ("x", "y"):
        obs = pdf[col].dropna().to_numpy()
        bins = np.histogram_bin_edges(obs, bins=10)
        q_counts, _ = np.histogram(obs, bins=bins)
        q = (q_counts + 1) / (q_counts + 1).sum()
        for it in sorted(out["iter"].unique()):
            imp = out[out["iter"] == it][col].to_numpy()
            p_counts, _ = np.histogram(np.clip(imp, bins[0], bins[-1]), bins=bins)
            p = (p_counts + 1) / (p_counts + 1).sum()
            kl = float(np.sum(p * np.log(p / q)))
            assert 0.0 <= kl < 1.0, (draw, col, it, kl)


def test_mice_pmm_complete_even_in_donorless_buckets(na_frame):
    """A prediction-range bucket can hold only missing rows (no donors);
    those draws must fall back to a neighboring bucket's boundary donor
    rather than staying NULL. Small n_buckets vs rows makes donor-less
    buckets likely; assert total completeness on BOTH columns."""
    for nb in (4, 64, 512):
        out = wrangle_na(
            na_frame,
            strategy="mice",
            cols=["x", "y"],
            n_burnin=1,
            n_imputations=1,
            n_spread=1,
            row_id="row_id",
            draw="pmm",
            n_buckets=nb,
        )
        assert out.where("x IS NULL OR y IS NULL").count() == 0, nb


def test_mice_pmm_bucket_count_statistical_invariance(na_frame):
    """The bucket count is a parallelism knob, not a statistical one:
    across widely different n_buckets (same seed) every imputed cell is
    still an observed donor value and the imputed-column means agree to
    a tight tolerance. (Bitwise equality is NOT expected — a bucket edge
    moves which near donor a boundary row picks; PMM samples among near
    donors by design.)"""
    import numpy as np

    pdf = na_frame.toPandas()
    observed_x = set(pdf.x.dropna().round(9))
    means = []
    for nb in (8, 64, 256):
        out = wrangle_na(
            na_frame,
            strategy="mice",
            cols=["x", "y"],
            n_burnin=2,
            n_imputations=2,
            n_spread=1,
            row_id="row_id",
            draw="pmm",
            n_buckets=nb,
        ).toPandas()
        imputed = out[out.row_id.isin(pdf[pdf.x.isna()].row_id)]
        assert set(imputed.x.round(9)) <= observed_x, nb
        means.append(float(out.x.mean()))
    assert float(np.ptp(means)) < 0.25, means


def test_mice_pmm_draws_observed_values(na_frame):
    out = wrangle_na(
        na_frame,
        strategy="mice",
        cols=["x", "y"],
        n_burnin=2,
        n_imputations=2,
        n_spread=1,
        row_id="row_id",
        draw="pmm",
    ).toPandas()
    pdf = na_frame.toPandas()
    observed_x = set(pdf.x.dropna().round(9))
    imputed = out[out.row_id.isin(pdf[pdf.x.isna()].row_id)]
    # PMM property: every imputed cell is an actually-observed value
    assert set(imputed.x.round(9)) <= observed_x
    assert imputed.x.notna().all()
