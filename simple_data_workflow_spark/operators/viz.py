"""Confidence-interval chart tail (reference plot_confidence_intervals,
src/tasks.py:585-608, themes src/styles.py).

The engine computes the CI frame distributedly (operators.model); the
Altair rendering is presentation-layer and gated behind an import probe
(altair is not shipped in this environment). The chart spec mirrors the
reference: 200×500 boxplot of ordinal regressor × quantitative estimate
from the long CI frame, rendered under the registered "streamlit" theme
(reference src/tasks.py:591-592).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from simple_data_workflow_spark.operators.themes import ggplot2_theme, streamlit_theme

try:  # pragma: no cover - environment-dependent
    import altair as alt

    HAS_ALTAIR = True
except Exception:  # pragma: no cover
    alt = None
    HAS_ALTAIR = False


def register_themes() -> None:
    """Register both reference themes with altair ("streamlit" enabled by
    ``confidence_interval_chart``, "ggplot2" opt-in)."""
    if not HAS_ALTAIR:  # pragma: no cover
        raise NotImplementedError("altair is not installed in this environment")
    alt.themes.register("streamlit", streamlit_theme)
    alt.themes.register("ggplot2", ggplot2_theme)


def confidence_interval_chart(ci: DataFrame):
    """Render the (regressor, interval, estimate) frame as a boxplot.

    Raises a clear gate error when altair is unavailable; the data side
    (``toPandas`` of the k×2-row CI frame) is always tiny."""
    if not HAS_ALTAIR:
        raise NotImplementedError(
            "altair is not installed in this environment; the CI frame from "
            "operators.model.confidence_intervals is chart-ready as-is"
        )
    register_themes()
    alt.themes.enable("streamlit")
    pdf = ci.toPandas()
    return (
        alt.Chart(pdf)
        .mark_boxplot()
        .encode(x="regressor:O", y="estimate:Q")
        .properties(width=200, height=500)
    )
