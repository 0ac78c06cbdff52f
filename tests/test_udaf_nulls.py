"""Null-handling parity for the grouped-aggregate pandas UDF
(VERDICT r4 item 3a): Arrow delivers SQL NULLs to the UDAF as NaN; the
UDAF must drop them exactly like the oracle's
FILTER (WHERE value IS NOT NULL) — including the all-null group, which
must yield NULL on both engines.  The shipped fixtures happen to contain
zero null `value`s, so this test injects them explicitly; without the
symmetric dropna the fold would return NaN and diverge.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (
    all_queries,
)

from .oracle_harness import compare, oracle_frame

US = 1_704_067_201_500_000  # 2024-01-01T00:00:01.5Z


def _write_events_with_nulls(tmp_path) -> str:
    n = 12
    values = [
        1.5, None, 2.5,      # click: nulls interleaved
        None, None, None,    # view: ALL null → folded_mean NULL
        0.25, 4.0, None,     # purchase
        7.5, 2.0, 3.25,      # signup: no nulls
    ]
    cols = {
        "event_id": pa.array(list(range(1, n + 1)), type=pa.int64()),
        "user_id": pa.array([i % 3 for i in range(n)], type=pa.int64()),
        "event_type": pa.array(
            ["click"] * 3 + ["view"] * 3 + ["purchase"] * 3 + ["signup"] * 3
        ),
        "value": pa.array(values, type=pa.float64()),
        "props": pa.array(['{"a":1}'] * n),
        "ts": pa.array([US + i * 1_000_000 for i in range(n)],
                       type=pa.timestamp("us")),
    }
    sf_dir = str(tmp_path)
    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(pa.table(cols), os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def test_grouped_agg_udaf_null_parity(spark, tmp_path):
    sf_dir = _write_events_with_nulls(tmp_path / "nulls")
    qd = all_queries()["grouped_agg_udaf"]

    # duck_connection registers all ten fixture tables; only events
    # exists in this synthetic dir, so register the single view directly
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'events.parquet')}')"
    )
    expected = oracle_frame(con, qd.oracle)
    got = qd.fn(spark, sf_dir)
    compare(got, expected)

    rows = {r.event_type: r.folded_mean for r in got.collect()}
    assert rows["view"] is None          # all-null group → NULL, not NaN
    assert rows["click"] == 2.0          # mean of {1.5, 2.5}, nulls dropped
    assert rows["signup"] == 4.25
