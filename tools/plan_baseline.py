"""Accept the current PLAN_AUDIT.md shuffle counts as the ratchet baseline.

`tests/test_plans.py::test_audited_shuffles_within_baseline` fails any
query whose audited shuffle count exceeds its committed baseline value
+1 — a tripwire for accidentally introduced shuffles (VERDICT r5 item
8).  The baseline does NOT auto-update: a deliberate plan change (or a
new query) is accepted by explicitly running

    python tools/plan_audit.py     # regenerate the audit first
    python tools/plan_baseline.py  # then accept it

which rewrites PLAN_SHUFFLES_BASELINE.json from the committed audit.
"""

from __future__ import annotations

import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_audit_shuffles(path: str) -> dict[str, int]:
    text = open(path).read()
    rows = re.findall(r"^\| `([^`]+)` \| (\d+) \|", text, flags=re.M)
    return {name: int(n) for name, n in rows}


def main() -> None:
    shuffles = parse_audit_shuffles(os.path.join(ROOT, "PLAN_AUDIT.md"))
    dest = os.path.join(ROOT, "PLAN_SHUFFLES_BASELINE.json")
    with open(dest, "w") as fh:
        json.dump(
            {
                "note": (
                    "audited shuffle-exchange count per query, accepted by "
                    "tools/plan_baseline.py; the ratchet test allows "
                    "baseline+1 and fails above it"
                ),
                "shuffles": shuffles,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    print(f"{dest}: {len(shuffles)} entries")


if __name__ == "__main__":
    main()
