"""e2e_drop_to_dashboard (VERDICT r11 item 5): the reference's full
loop as one composition — xlsx drop + modified-file re-upload → watcher
row-hash CDC → changed-rows log → streaming manifest MERGE with a
continuous aggregate → dashboard HTML from the view.  The registered
query's oracle already certifies the numbers; these tests pin the
composition's internals: the CDC actually suppressed the unchanged
half, the view refreshed incrementally, and the rendered HTML carries
exactly the view's numbers."""

import os

from pyspark.sql import functions as F

from _big_data_analytics_and_visualization_tracking_student_progress__spark.queries.streaming_q import (
    _e2e_dashboard_artifact,
)
from _big_data_analytics_and_visualization_tracking_student_progress__spark.sources.watcher import (
    SEQ_COL,
)

from .conftest import SF_SMALL


def test_modified_file_relogs_only_changed_rows(spark):
    art = _e2e_dashboard_artifact(spark, SF_SMALL)
    # the log carries each row exactly once: the full-file re-upload's
    # unchanged (even) half was suppressed by the row-hash diff, so
    # seq 1 holds the evens and seq 2 ONLY the odds
    log = spark.read.parquet(
        os.path.join(os.path.dirname(art["html"]), "state", "changed_rows")
    )
    per_seq = {
        int(r[SEQ_COL]): (r["n"], r["n_even"])
        for r in log.groupBy(SEQ_COL)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("event_id").cast("long") % 2 == 0).cast("int")
            ).alias("n_even"),
        )
        .collect()
    }
    assert set(per_seq) == {1, 2}
    assert per_seq[1][0] == per_seq[1][1]  # seq 1: evens only
    assert per_seq[2][1] == 0              # seq 2: no even re-logged
    assert log.count() == log.select("event_id").distinct().count()


def test_dashboard_html_matches_view_numbers(spark):
    art = _e2e_dashboard_artifact(spark, SF_SMALL)
    with open(art["html"]) as fh:
        html = fh.read()
    assert "<h1>Drop-folder analytics</h1>" in html
    for etype, n, sv in art["rows"]:
        assert etype in html
        assert f"<td>{n}</td>" in html, (etype, n)
    # the view is the single source: its totals equal the sink's
    view_rows = {
        r["event_type"]: int(r["n_events"])
        for r in art["view"].read().collect()
    }
    sink_rows = {
        r["event_type"]: r["n"]
        for r in art["sink"]
        .read()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert view_rows == sink_rows


def test_view_refreshed_per_commit(spark):
    art = _e2e_dashboard_artifact(spark, SF_SMALL)
    # the streaming sink refreshes the view after every micro-batch
    # commit; at least one refresh ran, and INCREMENTALLY (the
    # IncrementalAggView entry shape: recomputed fragments counted)
    logrows = art["view"].refresh_log
    assert logrows
    assert any(e["version"] >= 1 for e in logrows)
    assert all("recomputed" in e for e in logrows if e["version"] >= 0)
