"""MICE — multiple imputation by chained equations (reference src/tasks.py:444-473).

Placeholder this round; see SURVEY.md §7.2 M8. Design: per-column
linear fits via the one-pass normal-equations aggregate in
``operators.model``, iterated n_burnin times, emitting n_imputations
datasets as a UNION ALL keyed by an ``iter`` column + ``row_id``
(the reference's MultiIndex (iter, index), SURVEY.md §1.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def mice_impute(
    df: DataFrame,
    cols: Sequence[str],
    n_burnin: int = 20,
    n_imputations: int = 10,
    n_spread: int = 20,
) -> DataFrame:
    raise NotImplementedError("MICE lands in a later milestone (SURVEY.md §7.2 M8)")
