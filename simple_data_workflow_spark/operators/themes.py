"""Altair theme configs — reference parity for src/styles.py:9-222.

The reference ships two Vega-Lite theme dicts ("streamlit" matching the
Streamlit site, "ggplot2" a Streamlit/ggplot2 hybrid). They share every
setting except the plot background and axis grid treatment, so the
shared body is built once and the two public functions layer their axis
variant on top — the returned dicts are value-equal to the reference's
(pinned in tests/test_viz.py).

These are pure config (no Spark, no altair import needed); the chart
side (operators.viz) registers them with altair when it is installed.
"""

from __future__ import annotations

from typing import Any

_FONT = "IBM Plex Mono"
_PRIMARY = "#F63366"
_FONT_COLOR = "#262730"
_GREY = "#f0f2f6"
_BASE_SIZE = 16
_LG_FONT = _BASE_SIZE * 1.25
_SM_FONT = _BASE_SIZE * 0.8

_CATEGORY = ["#f63366", "#fffd80", "#0068c9", "#ff2b2b", "#09ab3b"]
_DIVERGING = [
    "#850018",
    "#cd1549",
    "#f6618d",
    "#fbafc4",
    "#f5f5f5",
    "#93c5fe",
    "#5091e6",
    "#1d5ebd",
    "#002f84",
]
# heatmap / ramp / ordinal share one pink→maroon ramp in the reference
_SEQUENTIAL = [
    "#ffb5d4",
    "#ff97b8",
    "#ff7499",
    "#fc4c78",
    "#ec245f",
    "#d2004b",
    "#b10034",
    "#91001f",
    "#720008",
]


def _font_block(title_size: float, label_size: float) -> dict[str, Any]:
    return {
        "titleFont": _FONT,
        "titleColor": _FONT_COLOR,
        "titleFontSize": title_size,
        "labelFont": _FONT,
        "labelColor": _FONT_COLOR,
        "labelFontSize": label_size,
    }


def _shared_config(axis: dict[str, Any]) -> dict[str, Any]:
    return {
        "arc": {"fill": _PRIMARY},
        "area": {"fill": _PRIMARY},
        "circle": {"fill": _PRIMARY, "stroke": _FONT_COLOR, "strokeWidth": 0.5},
        "line": {"stroke": _PRIMARY},
        "path": {"stroke": _PRIMARY},
        "point": {"stroke": _PRIMARY},
        "rect": {"fill": _PRIMARY},
        "shape": {"stroke": _PRIMARY},
        "symbol": {"fill": _PRIMARY},
        "title": {
            "font": _FONT,
            "color": _FONT_COLOR,
            "fontSize": _LG_FONT,
            "anchor": "start",
        },
        "axis": {**_font_block(_SM_FONT, _SM_FONT), **axis},
        "header": {
            "labelFont": _FONT,
            "titleFont": _FONT,
            "labelFontSize": _BASE_SIZE,
            "titleFontSize": _BASE_SIZE,
        },
        "legend": _font_block(_SM_FONT, _SM_FONT),
        "range": {
            "category": list(_CATEGORY),
            "diverging": list(_DIVERGING),
            "heatmap": list(_SEQUENTIAL),
            "ramp": list(_SEQUENTIAL),
            "ordinal": list(_SEQUENTIAL),
        },
    }


def streamlit_theme() -> dict[str, Any]:
    """Streamlit-site theme (reference src/styles.py:9-112): grey grid on a
    white background, domain line in the font color."""
    return {
        "config": _shared_config(
            {"gridColor": _GREY, "domainColor": _FONT_COLOR, "tickColor": "#fff"}
        )
    }


def ggplot2_theme() -> dict[str, Any]:
    """Streamlit/ggplot2 hybrid (reference src/styles.py:115-222): grey
    panel with white gridlines, no domain line, ticks in the font color."""
    config = _shared_config(
        {
            "grid": True,
            "gridColor": "#fff",
            "gridOpacity": 1,
            "domain": False,
            "tickColor": _FONT_COLOR,
        }
    )
    return {"config": {"view": {"fill": _GREY}, **config}}
