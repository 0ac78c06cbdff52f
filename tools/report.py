"""Static HTML dashboard over the engine's registered aggregations — the
serving-layer analog of the reference's Kibana dashboards / Streamlit app
(README.md:26-27,43-44; app.py:58-191), reframed engine-side: the heavy
lifting is the registered Spark queries; this tool only renders their
(small) results as a self-contained HTML file with inline-SVG charts.
No dependencies, no server — open the file in any browser.

Usage: python tools/report.py [sf_dir] [out.html]
       (defaults: /root/testdata/sf0.001, ./report.html)

Chart design follows a validated palette (fixed categorical order,
single-hue series, text in ink tokens not series colors, light + dark
via prefers-color-scheme, per-mark hover tooltips, and a table view for
every chart).
"""

from __future__ import annotations

import html
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# Validated reference palette (light, dark) — categorical slot 1 + ink
# and surface tokens; single-series charts need exactly one hue.
CSS = """
.viz-root {
  color-scheme: light;
  --surface-1: #fcfcfb; --surface-2: #f4f3f1;
  --text-primary: #0b0b0b; --text-secondary: #52514e; --muted: #8a887f;
  --series-1: #2a78d6; --grid: #e4e2dd;
  font: 14px/1.45 system-ui, sans-serif;
  background: var(--surface-1); color: var(--text-primary);
  max-width: 960px; margin: 0 auto; padding: 24px;
}
@media (prefers-color-scheme: dark) {
  .viz-root {
    color-scheme: dark;
    --surface-1: #1a1a19; --surface-2: #242422;
    --text-primary: #ffffff; --text-secondary: #c3c2b7; --muted: #8a887f;
    --series-1: #3987e5; --grid: #38372f;
  }
}
.viz-root h1 { font-size: 20px; margin: 0 0 4px; }
.viz-root h2 { font-size: 15px; margin: 28px 0 8px; }
.viz-root .sub { color: var(--text-secondary); margin: 0 0 20px; }
.tiles { display: flex; gap: 12px; flex-wrap: wrap; margin: 20px 0; }
.tile { background: var(--surface-2); border-radius: 8px; padding: 12px 16px;
        min-width: 150px; }
.tile .v { font-size: 22px; font-weight: 600; }
.tile .k { color: var(--text-secondary); font-size: 12px; }
svg .bar { fill: var(--series-1); }
svg .bar:hover { opacity: .75; }
svg .line { stroke: var(--series-1); stroke-width: 2; fill: none; }
svg .dot { fill: var(--series-1); }
svg .dot:hover { r: 5; }
svg .gridline { stroke: var(--grid); stroke-width: 1; }
svg .axis { fill: var(--text-secondary); font-size: 11px; }
svg .dlabel { fill: var(--text-secondary); font-size: 11px; }
details { margin: 6px 0 0; }
details summary { color: var(--muted); cursor: pointer; font-size: 12px; }
table.data { border-collapse: collapse; margin-top: 8px; }
table.data th, table.data td { padding: 3px 10px; text-align: right;
  border-bottom: 1px solid var(--grid); font-size: 12px; }
table.data th { color: var(--text-secondary); font-weight: 600; }
table.data td:first-child, table.data th:first-child { text-align: left; }
"""

W, H, PAD_L, PAD_B, PAD_T = 880, 240, 60, 28, 10


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:,.2f}".rstrip("0").rstrip(".")
    if isinstance(v, int):
        return f"{v:,}"
    return str(v)


def _table(cols: list[str], rows: list[tuple]) -> str:
    head = "".join(f"<th>{html.escape(str(c))}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{html.escape(_fmt(v))}</td>" for v in r) + "</tr>"
        for r in rows
    )
    return (
        f'<details><summary>table view</summary><table class="data">'
        f"<tr>{head}</tr>{body}</table></details>"
    )


def _y_ticks(vmax: float, n: int = 4) -> list[float]:
    step = vmax / n if vmax else 1.0
    return [round(step * i, 6) for i in range(n + 1)]


def bar_chart(title: str, labels: list[str], values: list[float],
              cols: list[str], rows: list[tuple]) -> str:
    """Single-series vertical bars: rounded top data-ends anchored to the
    baseline, 2px gap between bars, direct value labels, per-mark
    <title> tooltip, recessive gridlines."""
    vmax = max(values) if values else 1.0
    plot_w, plot_h = W - PAD_L - 10, H - PAD_B - PAD_T
    n = len(values)
    bw = max(4.0, plot_w / max(n, 1) - 2)  # 2px surface gap
    parts = []
    for t in _y_ticks(vmax):
        y = PAD_T + plot_h * (1 - (t / vmax if vmax else 0))
        parts.append(
            f'<line class="gridline" x1="{PAD_L}" y1="{y:.1f}" '
            f'x2="{W - 10}" y2="{y:.1f}"/>'
            f'<text class="axis" x="{PAD_L - 6}" y="{y + 4:.1f}" '
            f'text-anchor="end">{_fmt(t)}</text>'
        )
    for i, (lb, v) in enumerate(zip(labels, values)):
        x = PAD_L + (plot_w / max(n, 1)) * i + 1
        bh = plot_h * (v / vmax if vmax else 0)
        y = PAD_T + plot_h - bh
        r = min(4, bw / 2, bh)  # rounded top corners only, baseline square
        parts.append(
            f'<path class="bar" d="M{x:.1f},{PAD_T + plot_h:.1f} '
            f"v{-(bh - r):.1f} q0,{-r:.1f} {r:.1f},{-r:.1f} "
            f"h{bw - 2 * r:.1f} q{r:.1f},0 {r:.1f},{r:.1f} "
            f'v{(bh - r):.1f} z"><title>{html.escape(str(lb))}: '
            f"{_fmt(v)}</title></path>"
        )
        parts.append(
            f'<text class="dlabel" x="{x + bw / 2:.1f}" y="{y - 4:.1f}" '
            f'text-anchor="middle">{_fmt(v)}</text>'
        )
        parts.append(
            f'<text class="axis" x="{x + bw / 2:.1f}" y="{H - 8}" '
            f'text-anchor="middle">{html.escape(str(lb))}</text>'
        )
    return (
        f"<h2>{html.escape(title)}</h2>"
        f'<svg viewBox="0 0 {W} {H}" role="img" '
        f'aria-label="{html.escape(title)}">{"".join(parts)}</svg>'
        + _table(cols, rows)
    )


def line_chart(title: str, labels: list[str], values: list[float],
               cols: list[str], rows: list[tuple]) -> str:
    """Single-series line with hoverable markers and sparse x labels."""
    vmax = max(values) if values else 1.0
    plot_w, plot_h = W - PAD_L - 10, H - PAD_B - PAD_T
    n = len(values)
    parts = []
    for t in _y_ticks(vmax):
        y = PAD_T + plot_h * (1 - (t / vmax if vmax else 0))
        parts.append(
            f'<line class="gridline" x1="{PAD_L}" y1="{y:.1f}" '
            f'x2="{W - 10}" y2="{y:.1f}"/>'
            f'<text class="axis" x="{PAD_L - 6}" y="{y + 4:.1f}" '
            f'text-anchor="end">{_fmt(t)}</text>'
        )
    pts = []
    for i, v in enumerate(values):
        x = PAD_L + plot_w * (i / max(n - 1, 1))
        y = PAD_T + plot_h * (1 - (v / vmax if vmax else 0))
        pts.append((x, y))
    path = "M" + " L".join(f"{x:.1f},{y:.1f}" for x, y in pts)
    parts.append(f'<path class="line" d="{path}"/>')
    label_every = max(1, n // 10)
    for i, ((x, y), lb, v) in enumerate(zip(pts, labels, values)):
        parts.append(
            f'<circle class="dot" cx="{x:.1f}" cy="{y:.1f}" r="3">'
            f"<title>{html.escape(str(lb))}: {_fmt(v)}</title></circle>"
        )
        if i % label_every == 0:
            parts.append(
                f'<text class="axis" x="{x:.1f}" y="{H - 8}" '
                f'text-anchor="middle">{html.escape(str(lb))}</text>'
            )
    return (
        f"<h2>{html.escape(title)}</h2>"
        f'<svg viewBox="0 0 {W} {H}" role="img" '
        f'aria-label="{html.escape(title)}">{"".join(parts)}</svg>'
        + _table(cols, rows)
    )


def build_report(spark, sf_dir: str) -> str:
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (
        all_queries,
    )

    qs = all_queries()

    def run(name):
        df = qs[name].fn(spark, sf_dir)
        return df.columns, [tuple(r) for r in df.collect()]

    sections = []

    # stat tiles
    _, hll = run("hll_distinct_users")
    mo_cols, mo = run("monthly_order_trend")
    mo.sort(key=lambda r: r[0])
    _, quality = run("corpus_quality_rollup")
    global_q = [r for r in quality if r[2] == 1 and r[3] == 1]  # grand total
    tiles = [
        ("distinct users (HLL est.)", _fmt(hll[0][2])),
        ("orders", _fmt(sum(r[1] for r in mo))),
        ("revenue", _fmt(round(sum(r[2] for r in mo), 2))),
        ("documents", _fmt(global_q[0][4]) if global_q else "–"),
    ]
    sections.append(
        '<div class="tiles">'
        + "".join(
            f'<div class="tile"><div class="v">{v}</div>'
            f'<div class="k">{html.escape(k)}</div></div>'
            for k, v in tiles
        )
        + "</div>"
    )

    # grade histogram (flagship domain: 4-point grade buckets)
    gh_cols, gh = run("grade_histogram")
    gh.sort(key=lambda r: r[0])
    sections.append(
        bar_chart(
            "Grade distribution (4-point buckets)",
            [_fmt(r[0]) for r in gh], [r[1] for r in gh], gh_cols, gh,
        )
    )

    # monthly revenue trend
    sections.append(
        line_chart(
            "Monthly revenue", [r[0] for r in mo], [r[2] for r in mo],
            mo_cols, mo,
        )
    )

    # corpus quality per language (grouping-sets rollup → per-lang rows)
    per_lang = sorted(
        (r for r in quality if r[2] == 0 and r[3] == 1), key=lambda r: r[0]
    )
    q_cols = ["lang", "n_docs", "avg_quality"]
    q_rows = [(r[0], r[4], r[6]) for r in per_lang]
    sections.append(
        bar_chart(
            "Corpus quality by language (mean score)",
            [r[0] for r in q_rows], [r[2] for r in q_rows], q_cols, q_rows,
        )
    )

    # pricing summary as a plain table (identity × many measures — not a
    # chart job)
    ps_cols, ps = run("pricing_summary")
    ps.sort(key=lambda r: (r[0], r[1]))
    sections.append(
        "<h2>Pricing summary (returnflag × linestatus)</h2>"
        + _table(ps_cols, ps).replace(
            "<details><summary>table view</summary>", "<div>"
        ).replace("</details>", "</div>")
    )

    body = "".join(sections)
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<meta name='viewport' content='width=device-width,initial-scale=1'>"
        f"<title>Analytics report</title><style>{CSS}</style></head>"
        f'<body><div class="viz-root"><h1>Analytics report</h1>'
        f'<p class="sub">Generated from registered engine queries at '
        f"{html.escape(sf_dir)}</p>{body}</div></body></html>"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "report.html"
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.session import (
        get_spark,
    )

    spark = get_spark("report", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    html_text = build_report(spark, sf_dir)
    with open(out, "w") as f:
        f.write(html_text)
    print(f"{out}: {len(html_text)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
