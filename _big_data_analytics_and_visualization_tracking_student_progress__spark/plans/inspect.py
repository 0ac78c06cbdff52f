"""Executed-plan inspection: per-scan SQL metrics off a collected frame.

The manifest table's data skipping has three tiers — fragment zone maps,
per-file zone maps, and (inside every surviving file) the parquet
reader's row-group pruning, which only engages when the predicate
actually reaches the scan (PushedFilters).  The first two tiers are
observable from `read_where`'s counters; this module makes the third
tier measurable: after executing a frame, `scan_rows_read` reports how
many rows the parquet scans MATERIALIZED (rows in surviving row groups,
post row-group/page pruning) — the number to compare against rows kept
by the predicate, and against the same scan on an unclustered layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["scan_metrics", "scan_rows_read"]


def _walk(node):
    yield node
    name = node.nodeName()
    if name.startswith("AdaptiveSparkPlan"):
        # the final (re-planned) physical plan lives behind the wrapper
        yield from _walk(node.executedPlan())
    elif "QueryStage" in name:
        # AQE stage wrappers (Shuffle/Broadcast/ResultQueryStage) hold
        # their materialized subtree in plan(), not children()
        yield from _walk(node.plan())
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def scan_metrics(df: DataFrame) -> list[dict[str, int]]:
    """Per-scan-node metric maps ({metric key -> value}) from ``df``'s
    EXECUTED plan — call after an action (collect/count) has run the
    frame, or the metrics are zero.  Keys are Spark's internal metric
    names (``numOutputRows``, ``numFiles``, ``filesSize``, ...)."""
    plan = df._jdf.queryExecution().executedPlan()
    out: list[dict[str, int]] = []
    for node in _walk(plan):
        if "Scan" not in node.nodeName():
            continue
        metrics: dict[str, int] = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[kv._1()] = int(kv._2().value())
        out.append(metrics)
    return out


def scan_rows_read(df: DataFrame) -> int:
    """Total rows materialized by ``df``'s file scans (sum of the scan
    nodes' ``numOutputRows`` after execution).  With parquet filter
    pushdown this counts rows in SURVIVING row groups only — on a
    range-clustered layout it should track the predicate's selectivity,
    not the file sizes."""
    return sum(m.get("numOutputRows", 0) for m in scan_metrics(df))
