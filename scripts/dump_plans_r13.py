"""Dump per-query formatted plans for the r13 optimization evidence.

Usage: python scripts/dump_plans_r13.py <outdir> <suffix> <query> [query ...]

Writes <outdir>/<query>_<suffix>.txt with the executed (AQE-final)
`.explain("formatted")` output — same methodology as scripts/dump_plans.py
(noop-equivalent execution so isFinalPlan=true), at sf0.1.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from simple_data_workflow_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"plan-dump-r13-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        try:
            spark.sparkContext.setJobDescription(f"plan-dump {name}")
            df = qs[name](spark, sf_dir)
            df.collect()  # finalize AQE in place (diagnostic-only)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            body = buf.getvalue()
        except Exception as exc:  # pragma: no cover
            body = f"ERROR: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(body)
        print(f"wrote {name}_{suffix}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
