"""OpenBLAS runtime thread control (blasctl): the r13 optimization that
pins BLAS pools around small seeded fits and inside executor UDFs.

The perf claim lives in OPTIMIZATION_r13.md; these tests pin the
correctness contract: control works (or degrades to a no-op), settings
restore, the worker pin is PID-guarded, and — the load-bearing one —
codebook fits are bit-identical across thread settings.
"""

from __future__ import annotations

import os

import numpy as np

from simple_data_workflow_spark import blasctl


def test_set_get_roundtrip_or_noop():
    cur = blasctl.get_threads()
    if cur is None:
        # BLAS without OpenBLAS control symbols: everything is a no-op
        assert blasctl.set_threads(2) is False
        return
    try:
        assert blasctl.set_threads(2) is True
        assert blasctl.get_threads() == 2
    finally:
        blasctl.set_threads(cur)
    assert blasctl.get_threads() == cur


def test_context_manager_restores():
    cur = blasctl.get_threads()
    with blasctl.blas_threads(1):
        if cur is not None:
            assert blasctl.get_threads() == 1
    assert blasctl.get_threads() == cur


def test_pin_worker_blas_pid_guarded(monkeypatch):
    calls = []
    monkeypatch.setattr(blasctl, "set_threads", lambda n: calls.append(n))
    monkeypatch.setattr(blasctl, "_worker_pinned_pid", None)
    blasctl.pin_worker_blas()
    blasctl.pin_worker_blas()
    assert calls == [1]  # second call short-circuits on the PID guard
    monkeypatch.setattr(blasctl, "_worker_pinned_pid", None)
    monkeypatch.setenv("SDW_WORKER_BLAS_THREADS", "3")
    blasctl.pin_worker_blas()
    assert calls == [1, 3]


def test_kmeans_fit_bit_identical_across_thread_counts():
    from simple_data_workflow_spark.llmdata.similarity import _kmeans_np

    if blasctl.get_threads() is None:
        return  # uncontrollable BLAS — nothing to compare
    rng = np.random.default_rng(7)
    X = rng.normal(size=(2000, 4))
    with blasctl.blas_threads(1):
        a = _kmeans_np(X, 64, seed=42)
    with blasctl.blas_threads(min(4, os.cpu_count() or 1)):
        b = _kmeans_np(X, 64, seed=42)
    assert np.array_equal(a, b)
