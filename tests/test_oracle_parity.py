"""Driver-gate replica: every registered query with an oracle must match
DuckDB at sf0.01 (the driver's exact comparison scale).

The FULL 245-query sweep takes ~25-30 minutes and is redundant with the
external driver's own oracle gate, so by default only a deterministic
1-in-10 subset runs (sorted order, every 10th name — stable across
sessions, covers every query family file).  Set SPARK_GRAFT_FULL_TESTS=1
for the complete sweep (do this after touching anything query-shaped)."""

from __future__ import annotations

import pytest

from .conftest import FULL_TESTS, SF_ORACLE
from .oracle_harness import compare, duck_connection

_SUBSET_STRIDE = 10


def _query_names():
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (
        all_queries,
    )

    names = sorted(all_queries())
    if FULL_TESTS:
        return names
    return names[::_SUBSET_STRIDE]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (
        all_queries,
    )

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (
        resolve_oracle,
    )

    qd = all_queries()[name]
    result = qd.fn(spark, SF_ORACLE)
    sql = resolve_oracle(qd, SF_ORACLE)
    if sql is None:
        # rows-only check, mirroring the driver's weaker gate
        assert result.count() >= 0
        return
    from .oracle_harness import oracle_frame

    oracle_df = oracle_frame(duck, sql)
    compare(result, oracle_df)


def test_no_pandas_lossy_oracle_output_types(duck):
    """Registry-wide lint: no resolved oracle SQL may expose a HUGEINT /
    UHUGEINT output column.

    DuckDB types SUM(BIGINT) (and window SUM) as INT128; its pandas/Arrow
    conversion — which the external driver uses — renders INT128 as
    float64, so the driver hashes "161.0" against Spark's long "161" and
    the row fails even though values are equal. The fetchall()-based
    harness above is blind to this (Python ints), so this lint is the only
    in-repo guard. Caused the one red row of round 7
    (token_pack_assignments); fix pattern: CAST(... AS BIGINT) on every
    integer SUM / window-SUM exposed in an oracle's output.
    """
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (
        all_queries,
        resolve_oracle,
    )

    lossy = {"HUGEINT", "UHUGEINT"}
    offenders = []
    for name, qd in all_queries().items():
        sql = resolve_oracle(qd, SF_ORACLE)
        if sql is None:
            continue
        rel = duck.sql(sql)
        bad = [
            (col, str(t))
            for col, t in zip(rel.columns, rel.types)
            if str(t) in lossy
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, (
        "oracle SQL exposes pandas-lossy integer types (wrap in CAST(... AS "
        f"BIGINT)): {offenders}"
    )
