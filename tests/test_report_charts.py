"""SVG chart artifacts: the twin of the reference's report images
(src/assets/images/*.png). Rendering is pure stdlib; data comes from
the registered query layer."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from data_engineering_challenge_spark.reporting.charts import (
    bar_chart_svg,
    create_report_charts,
    line_chart_svg,
)


def test_bar_chart_is_valid_svg_with_all_bars():
    svg = bar_chart_svg(["a", "b", "c"], [1.0, 5.0, 2.5], "t", "y")
    root = ET.fromstring(svg)
    assert root.tag.endswith("svg")
    rects = [e for e in root.iter() if e.tag.endswith("rect")]
    assert len(rects) == 3
    heights = [float(r.get("height")) for r in rects]
    assert heights[1] == max(heights)  # tallest bar = max value


def test_line_chart_is_valid_svg():
    svg = line_chart_svg(list(range(50)), [float(i % 7) for i in range(50)], "t")
    root = ET.fromstring(svg)
    polys = [e for e in root.iter() if e.tag.endswith("polyline")]
    assert len(polys) == 1
    assert len(polys[0].get("points").split()) == 50


def test_escaping_hostile_labels():
    svg = bar_chart_svg(['<script>"x"&', "b"], [1.0, 2.0], 't<&"')
    ET.fromstring(svg)  # parses ⇒ nothing broke out of the markup
    assert "<script>" not in svg


def test_create_report_charts(spark, sf_dir, tmp_path):
    paths = create_report_charts(spark, sf_dir, str(tmp_path))
    assert len(paths) == 4
    for p in paths:
        root = ET.fromstring(open(p).read())
        assert root.tag.endswith("svg")
