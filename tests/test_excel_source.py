"""Excel ingestion round-trip (VERDICT r2 item 8; reference pro.py:34-44).

The container does not ship an xlsx engine, so the round-trip is
skip-marked when openpyxl is absent; the NotImplementedError contract is
always asserted so the gated import cannot silently rot.
"""

from __future__ import annotations

import pytest

from _big_data_analytics_and_visualization_tracking_student_progress__spark.sources.readers import (
    read_excel,
)

try:
    import openpyxl  # noqa: F401

    HAVE_OPENPYXL = True
except ImportError:
    HAVE_OPENPYXL = False


@pytest.mark.skipif(not HAVE_OPENPYXL, reason="openpyxl not installed")
def test_excel_round_trip(spark, tmp_path):
    import pandas as pd

    path = str(tmp_path / "grades.xlsx")
    pd.DataFrame(
        {
            "F_MASV": ["B2012345", "B2012346", None],
            "F_DIEM2": [8.5, 4.0, None],
        }
    ).to_excel(path, index=False)

    df = read_excel(spark, path)
    rows = {r.F_MASV: r.F_DIEM2 for r in df.collect() if r.F_MASV}
    # all-empty row skipped (pro.py:41 `if any(row)` semantics)
    assert rows == {"B2012345": 8.5, "B2012346": 4.0}


@pytest.mark.skipif(HAVE_OPENPYXL, reason="openpyxl installed")
def test_excel_gated_import_contract(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="openpyxl"):
        read_excel(spark, str(tmp_path / "missing.xlsx"))
