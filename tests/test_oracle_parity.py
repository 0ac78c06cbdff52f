"""Driver-gate replica: every registered query with an oracle must match
DuckDB at sf0.01 (the driver's exact comparison scale)."""

from __future__ import annotations

import pytest

from .conftest import SF_ORACLE
from .oracle_harness import compare, duck_connection


def _query_names():
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (
        all_queries,
    )

    return sorted(all_queries())


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
