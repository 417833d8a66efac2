"""Theme + chart-spec parity (reference src/styles.py, test_tasks.py:653-670)."""

import pytest

from simple_data_workflow_spark.operators.themes import ggplot2_theme, streamlit_theme
from simple_data_workflow_spark.operators import viz

CATEGORY = ["#f63366", "#fffd80", "#0068c9", "#ff2b2b", "#09ab3b"]
DIVERGING = ["#850018", "#cd1549", "#f6618d", "#fbafc4", "#f5f5f5", "#93c5fe", "#5091e6", "#1d5ebd", "#002f84"]
SEQ = ["#ffb5d4", "#ff97b8", "#ff7499", "#fc4c78", "#ec245f", "#d2004b", "#b10034", "#91001f", "#720008"]
FONTS = {"titleFont": "IBM Plex Mono", "titleColor": "#262730", "titleFontSize": 12.8,
         "labelFont": "IBM Plex Mono", "labelColor": "#262730", "labelFontSize": 12.8}
MARKS = {"arc": {"fill": "#F63366"}, "area": {"fill": "#F63366"},
         "circle": {"fill": "#F63366", "stroke": "#262730", "strokeWidth": 0.5},
         "line": {"stroke": "#F63366"}, "path": {"stroke": "#F63366"},
         "point": {"stroke": "#F63366"}, "rect": {"fill": "#F63366"},
         "shape": {"stroke": "#F63366"}, "symbol": {"fill": "#F63366"}}
TITLE = {"font": "IBM Plex Mono", "color": "#262730", "fontSize": 20.0, "anchor": "start"}
HEADER = {"labelFont": "IBM Plex Mono", "titleFont": "IBM Plex Mono",
          "labelFontSize": 16, "titleFontSize": 16}
RANGE = {"category": CATEGORY, "diverging": DIVERGING, "heatmap": SEQ, "ramp": SEQ, "ordinal": SEQ}


def test_streamlit_theme_equals_reference():
    expected = {"config": {
        **MARKS,
        "title": TITLE,
        "axis": {**FONTS, "gridColor": "#f0f2f6", "domainColor": "#262730", "tickColor": "#fff"},
        "header": HEADER,
        "legend": FONTS,
        "range": RANGE,
    }}
    assert streamlit_theme() == expected


def test_ggplot2_theme_equals_reference():
    expected = {"config": {
        "view": {"fill": "#f0f2f6"},
        **MARKS,
        "title": TITLE,
        "axis": {**FONTS, "grid": True, "gridColor": "#fff", "gridOpacity": 1,
                 "domain": False, "tickColor": "#262730"},
        "header": HEADER,
        "legend": FONTS,
        "range": RANGE,
    }}
    assert ggplot2_theme() == expected


def test_themes_are_fresh_copies():
    a, b = streamlit_theme(), streamlit_theme()
    a["config"]["range"]["category"].append("#000000")
    assert b["config"]["range"]["category"] == CATEGORY


@pytest.mark.skipif(not viz.HAS_ALTAIR, reason="altair not installed")
def test_plot_confidence_intervals_spec(spark):
    """Mirror of reference test_tasks.py:653-670."""
    from simple_data_workflow_spark.operators.model import confidence_intervals, run_model

    df = spark.createDataFrame(
        [(float(i), float(2 * i + 1), float(3 - i)) for i in range(10)],
        ["y", "x1", "x2"],
    )
    res = run_model(df, y="y", X=["x1", "x2"])
    chart = viz.confidence_interval_chart(confidence_intervals(res))
    specs = chart.to_dict()
    assert specs["width"] == 200
    assert specs["height"] == 500
    assert specs["mark"] == "boxplot"
    assert specs["encoding"]["x"]["field"] == "regressor"
    assert specs["encoding"]["x"]["type"] == "ordinal"
    assert specs["encoding"]["y"]["field"] == "estimate"
    assert specs["encoding"]["y"]["type"] == "quantitative"
