"""PLAN_AUDIT.md freshness pin (VERDICT r4 item 4): the committed audit
table silently lagged the registry in round 4 (174 rows vs 175 queries).
This test fails whenever a query is registered without regenerating the
audit (`python tools/plan_audit.py`), so the repo-wide plan-evidence
table can never go stale again.
"""

from __future__ import annotations

import os
import re

from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (
    all_queries,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plan_audit_covers_every_registered_query():
    path = os.path.join(ROOT, "PLAN_AUDIT.md")
    assert os.path.exists(path), "PLAN_AUDIT.md missing — run tools/plan_audit.py"
    text = open(path).read()
    audited = set(re.findall(r"^\| `([^`]+)` \|", text, flags=re.M))
    registered = set(all_queries())
    missing = sorted(registered - audited)
    extra = sorted(audited - registered)
    assert not missing, f"queries missing from PLAN_AUDIT.md: {missing}"
    assert not extra, f"stale PLAN_AUDIT.md rows for unregistered queries: {extra}"
    # error rows mean a query failed to even plan — never acceptable
    assert "error:" not in text, "PLAN_AUDIT.md contains error rows"
