"""Runtime OpenBLAS thread-pool control.

numpy's bundled OpenBLAS defaults its pool to the machine's core count.
That is the right call for one large solve on an otherwise idle host and
exactly wrong for this engine's two numpy postures:

- the DRIVER runs many small seeded fits (PQ codebook k-means: 5k x 4
  GEMMs) where a 32-thread pool pays far more in dispatch + spin-wait
  than the multiply costs — measured 4x-20x slower AND wildly variable
  (4-45 s for the same 16 fits) vs a consistent ~1-2 s single-threaded;
- EXECUTOR Python workers run one Arrow batch at a time with a full
  complement of sibling workers already saturating every core, so each
  worker's private 32-thread BLAS pool is pure oversubscription.

Pinning the pool does NOT change results: OpenBLAS GEMM splits work by
output block, so every output cell is produced by one thread running the
same sequential K-loop — verified bit-identical across thread counts for
the shapes used here. Reductions (norm/argmin/bincount/einsum) never use
the BLAS pool at all.

Resolution is best-effort: when numpy links a BLAS without the OpenBLAS
control symbols (MKL, Accelerate), everything here is a no-op.
"""

from __future__ import annotations

import ctypes
import glob
import os

_lib = None  # None = unresolved, False = unavailable
_set = None
_get = None
_worker_pinned_pid: int | None = None


def _resolve():
    """Find the OpenBLAS shared object numpy loaded and bind its
    get/set thread functions (suffix varies with the 64-bit-int build)."""
    global _lib, _set, _get
    if _lib is not None:
        return _lib
    try:
        import numpy as np

        np_dir = os.path.dirname(np.__file__)
        roots = (
            os.path.join(np_dir, "..", "numpy.libs"),
            os.path.join(np_dir, ".libs"),
        )
        candidates = []
        for root in roots:
            candidates.extend(
                sorted(glob.glob(os.path.join(root, "libopenblas*.so*")))
            )
        # distro numpy links a SYSTEM libopenblas outside numpy's wheel
        # dirs (ADVICE r13) — probe the images already mapped into this
        # process before giving up, so the pin is not a silent no-op on
        # non-wheel installs
        try:
            with open("/proc/self/maps") as maps:
                seen = set()
                for line in maps:
                    p = line.rstrip("\n").rsplit(" ", 1)[-1]
                    if "libopenblas" in p and p not in seen:
                        seen.add(p)
                        candidates.append(p)
        except OSError:
            pass
        candidates.append("libopenblas.so.0")  # loader default as last resort
        for cand in candidates:
            try:
                lib = ctypes.CDLL(cand)
            except OSError:
                continue
            for suf in ("64_", "", "_64"):
                setter = getattr(lib, "openblas_set_num_threads" + suf, None)
                getter = getattr(lib, "openblas_get_num_threads" + suf, None)
                if setter is not None and getter is not None:
                    setter.argtypes = [ctypes.c_int]
                    setter.restype = None
                    getter.restype = ctypes.c_int
                    _lib, _set, _get = lib, setter, getter
                    return _lib
    except Exception:
        pass
    _lib = False
    import logging

    logging.getLogger(__name__).info(
        "blasctl: no controllable OpenBLAS found — thread pinning is a no-op"
    )
    return _lib


def get_threads() -> int | None:
    """Current OpenBLAS pool size, or None when uncontrollable."""
    if not _resolve():
        return None
    return int(_get())


def set_threads(n: int) -> bool:
    """Set the OpenBLAS pool size; returns False when uncontrollable."""
    if not _resolve():
        return False
    _set(int(n))
    return True


class blas_threads:
    """Context manager: pin the pool to ``n`` inside, restore on exit."""

    def __init__(self, n: int = 1):
        self.n = n
        self._prev: int | None = None

    def __enter__(self):
        self._prev = get_threads()
        if self._prev is not None:
            set_threads(self.n)
        return self

    def __exit__(self, *exc):
        if self._prev is not None:
            set_threads(self._prev)
        return False


def pin_worker_blas() -> None:
    """Pin THIS process's pool once (PID-guarded — fork-safe for reused
    pyspark workers). Call at the top of numpy-heavy UDF bodies so each
    executor Python worker computes with ``SDW_WORKER_BLAS_THREADS``
    (default 1) BLAS threads instead of a core-count pool per worker."""
    global _worker_pinned_pid
    pid = os.getpid()
    if _worker_pinned_pid == pid:
        return
    _worker_pinned_pid = pid
    set_threads(int(os.environ.get("SDW_WORKER_BLAS_THREADS", "1")))
