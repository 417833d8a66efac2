"""Custom aggregate (UDAF) surface — Arrow-batched GROUPED_AGG pandas
UDFs for aggregates Spark has no builtin for.

This is the engine's user-defined-aggregate escape hatch (SURVEY.md
§2.2 "UDF/UDAF surface"): the reference's extension point is "any
Python function becomes a pipeline node" (Prefect ``@task``,
/root/reference/src/tasks.py:50); here the equivalent is a pandas
GROUPED_AGG UDF — JVM-side grouping/shuffle, one Arrow transfer per
group, numpy math.

NOTE: no ``from __future__ import annotations`` in this module — the
GROUPED_AGG eval type is inferred from the ``pd.Series -> float``
signature hints, which must stay live objects (stringified annotations
make pandas_udf raise UNSUPPORTED_SIGNATURE).

Scale caveat, stated plainly: a GROUPED_AGG UDF materializes each
GROUP in executor memory (no partial aggregation). That is fine when
group counts are high and group sizes bounded (the usual analytics
shape), and wrong for a handful of giant groups — for those, prefer a
window/SQL formulation (each oracle twin in the query library doubles
as that formulation) or a two-level rewrite.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


def weighted_median_udaf():
    """Lower weighted median: sort by value, return the first value
    whose cumulative weight reaches half the total. Exact for integral
    weights (cumulative sums of <2^53 integers are exact doubles, so
    the threshold comparison is engine-portable — the oracle's window
    formulation crosses at the identical row)."""

    @pandas_udf("double")
    def weighted_median(v: pd.Series, w: pd.Series) -> float:
        if len(v) == 0:
            return None
        vals = v.to_numpy(dtype=np.float64)
        wts = w.to_numpy(dtype=np.float64)
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        idx = int(np.searchsorted(cum, cum[-1] / 2.0, side="left"))
        return float(vals[idx])

    return weighted_median
