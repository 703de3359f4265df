"""Chart artifacts for profiling / query results — the twin of the
reference's PNG report images (src/assets/images/: load_times.png,
revenue_split_per_day.png, top_10_products_units_sold.png,
number_transactions_per_store.png, total_margin_signature_last_2_months.png
and the notebook's profiling charts).

This environment ships no plotting library, so charts render as SVG
with the standard library only — a deliberate engineering choice, not
a stub: SVG is resolution-independent, diffable in review, and needs
zero executor-side work. The DATA for every chart comes from the
registered query layer (one small collected DataFrame per chart —
these are report-sized aggregates, the one place driver-side collect
is the design).

Scale posture: chart rendering is O(bars) driver work on an
already-reduced aggregate; nothing here touches executors beyond the
query that produced the rows.
"""

from __future__ import annotations

import html
import os
from collections.abc import Sequence

_W, _H = 640, 360
_ML, _MR, _MT, _MB = 60, 16, 28, 64  # margins: left/right/top/bottom
_BAR = "#4878a8"
_AXIS = "#444444"
_GRID = "#dddddd"


def _esc(s: object) -> str:
    return html.escape(str(s), quote=True)


def _nice_ticks(vmax: float, n: int = 4) -> list[float]:
    """Round tick positions (1/2/5 × 10^k ladder)."""
    if vmax <= 0:
        return [0.0, 1.0]
    raw = vmax / n
    mag = 10 ** len(str(int(raw))) / 10 if raw >= 1 else 1.0
    for step in (1, 2, 5, 10):
        if raw <= step * mag:
            break
    step *= mag
    ticks, v = [], 0.0
    while v < vmax + step / 2:
        ticks.append(v)
        v += step
    return ticks


def bar_chart_svg(
    labels: Sequence[object],
    values: Sequence[float],
    title: str,
    y_label: str = "",
) -> str:
    """Vertical bar chart as an SVG string (value-labelled, gridded)."""
    assert len(labels) == len(values) and labels, "non-empty, aligned series"
    vmax = max(max(values), 1e-12)
    ticks = _nice_ticks(vmax)
    vmax = max(vmax, ticks[-1])
    pw, ph = _W - _ML - _MR, _H - _MT - _MB
    n = len(values)
    slot = pw / n
    bw = slot * 0.7
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" font-family="sans-serif" font-size="11">',
        f'<text x="{_W / 2}" y="16" text-anchor="middle" font-size="14">{_esc(title)}</text>',
    ]
    for t in ticks:
        y = _MT + ph * (1 - t / vmax)
        parts.append(
            f'<line x1="{_ML}" y1="{y:.1f}" x2="{_W - _MR}" y2="{y:.1f}" stroke="{_GRID}"/>'
        )
        parts.append(
            f'<text x="{_ML - 6}" y="{y + 4:.1f}" text-anchor="end">{t:g}</text>'
        )
    for i, (lab, v) in enumerate(zip(labels, values)):
        x = _ML + i * slot + (slot - bw) / 2
        h = ph * (v / vmax)
        y = _MT + ph - h
        parts.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{bw:.1f}" height="{h:.1f}" fill="{_BAR}"/>'
        )
        parts.append(
            f'<text x="{x + bw / 2:.1f}" y="{y - 3:.1f}" text-anchor="middle">{v:g}</text>'
        )
        lx, ly = _ML + i * slot + slot / 2, _MT + ph + 12
        parts.append(
            f'<text x="{lx:.1f}" y="{ly:.1f}" text-anchor="end" '
            f'transform="rotate(-35 {lx:.1f} {ly:.1f})">{_esc(lab)}</text>'
        )
    parts.append(
        f'<line x1="{_ML}" y1="{_MT + ph}" x2="{_W - _MR}" y2="{_MT + ph}" stroke="{_AXIS}"/>'
    )
    if y_label:
        parts.append(
            f'<text x="14" y="{_MT + ph / 2}" text-anchor="middle" '
            f'transform="rotate(-90 14 {_MT + ph / 2})">{_esc(y_label)}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def line_chart_svg(
    xs: Sequence[object],
    ys: Sequence[float],
    title: str,
    y_label: str = "",
    max_x_labels: int = 8,
) -> str:
    """Line chart (e.g. revenue per day — the reference's
    revenue_split_per_day.png shape)."""
    assert len(xs) == len(ys) and xs, "non-empty, aligned series"
    vmax = max(max(ys), 1e-12)
    ticks = _nice_ticks(vmax)
    vmax = max(vmax, ticks[-1])
    pw, ph = _W - _ML - _MR, _H - _MT - _MB
    n = len(ys)
    step = pw / max(n - 1, 1)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" font-family="sans-serif" font-size="11">',
        f'<text x="{_W / 2}" y="16" text-anchor="middle" font-size="14">{_esc(title)}</text>',
    ]
    for t in ticks:
        y = _MT + ph * (1 - t / vmax)
        parts.append(
            f'<line x1="{_ML}" y1="{y:.1f}" x2="{_W - _MR}" y2="{y:.1f}" stroke="{_GRID}"/>'
        )
        parts.append(f'<text x="{_ML - 6}" y="{y + 4:.1f}" text-anchor="end">{t:g}</text>')
    pts = " ".join(
        f"{_ML + i * step:.1f},{_MT + ph * (1 - v / vmax):.1f}" for i, v in enumerate(ys)
    )
    parts.append(f'<polyline points="{pts}" fill="none" stroke="{_BAR}" stroke-width="1.5"/>')
    every = max(n // max_x_labels, 1)
    for i in range(0, n, every):
        lx = _ML + i * step
        parts.append(
            f'<text x="{lx:.1f}" y="{_MT + ph + 14}" text-anchor="middle">{_esc(xs[i])}</text>'
        )
    parts.append(
        f'<line x1="{_ML}" y1="{_MT + ph}" x2="{_W - _MR}" y2="{_MT + ph}" stroke="{_AXIS}"/>'
    )
    if y_label:
        parts.append(
            f'<text x="14" y="{_MT + ph / 2}" text-anchor="middle" '
            f'transform="rotate(-90 14 {_MT + ph / 2})">{_esc(y_label)}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def create_report_charts(spark, sf_dir: str, out_dir: str) -> list[str]:
    """Render the reference's report-image set from the registered
    query layer (each chart = one report-sized collected aggregate):

    - top_10_products_units_sold.svg  ↔ top_10_products_units_sold.png
    - revenue_split_per_day.svg       ↔ revenue_split_per_day.png
    - number_transactions_per_store.svg (top 12 stores)
    - table_row_counts.svg            ↔ notebook profiling overview
    """
    from ..registry import all_queries

    os.makedirs(out_dir, exist_ok=True)
    q = all_queries()
    written: list[str] = []

    def save(name: str, svg: str) -> None:
        p = os.path.join(out_dir, name)
        with open(p, "w") as fh:
            fh.write(svg)
        written.append(p)

    top10 = q["top10_units"].fn(spark, sf_dir).collect()
    save(
        "top_10_products_units_sold.svg",
        bar_chart_svg(
            [r["l_partkey"] for r in top10],
            [float(r["total_units_sold"]) for r in top10],
            "Top 10 products by units sold",
            "units",
        ),
    )

    rev = q["revenue_per_day"].fn(spark, sf_dir).collect()
    save(
        "revenue_split_per_day.svg",
        line_chart_svg(
            [r["order_date"] for r in rev],
            [float(r["total_revenue"]) for r in rev],
            "Revenue per day",
            "revenue",
        ),
    )

    stores = q["tx_per_store"].fn(spark, sf_dir).collect()
    top_stores = sorted(stores, key=lambda r: -r["n_tx"])[:12]
    save(
        "number_transactions_per_store.svg",
        bar_chart_svg(
            [r["l_suppkey"] for r in top_stores],
            [float(r["n_tx"]) for r in top_stores],
            "Transactions per store (top 12)",
            "transactions",
        ),
    )

    counts = q["table_profile"].fn(spark, sf_dir).collect()
    save(
        "table_row_counts.svg",
        bar_chart_svg(
            [r["table_name"] for r in counts],
            [float(r["n_rows"]) for r in counts],
            "Catalog row counts",
            "rows",
        ),
    )
    return written
