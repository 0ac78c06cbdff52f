"""Priority-window rotation planner.

The external driver's correctness gate samples only the FIRST 50 names
returned by ``all_queries()`` (i.e. ``registry._PRIORITY_WINDOW``), so
queries outside the window never earn an external driver row.  This tool
diffs every recorded ``CORRECTNESS_r*.json`` against the live registry
and proposes the next window so the rotation never goes stale by hand:

- per-query status: never-checked / stale-fail / last-green-round
- a proposed next window: the fixed family core, then stale-fail names
  (a FAIL row must be re-earned before new coverage), then as many
  never-checked names as fit — each pool ordered streaming-family-first

The three rows-only-by-design names (no DuckDB oracle — the driver
records them as non-green ``no_oracle`` rows) are excluded permanently.

Usage:  python tools/plan_audit.py   # regen plan audit after applying
        python tools/rotation.py [--window-size 50] [--apply-check]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Names with oracle=None by design: windowed, they post `no_oracle`
# driver rows that count as non-green — but that weaker row (rows>0, no
# crash) is still the only EXTERNAL execution evidence a rows-only query
# can earn, so each gets windowed exactly ONCE (VERDICT r8 item 3): a
# rows-only name with zero recorded driver rows enters the never-checked
# pool; after its first row (green or `no_oracle`) it is excluded
# permanently.  Their portable twins ARE hash-checked and rotate
# normally.
ROWS_ONLY = frozenset(
    {
        "approx_distinct_and_quantiles",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_fuzzy_clusters_fast",
    }
)

# One externally-green representative per family, kept in every window so
# a regression in a core family is always externally visible.
#
# Round-14 note: slimmed from 20 to 3 for one round (VERDICT r13 item
# 2) so the 36-query r6/r7 external-vintage tail retires in a single
# window alongside the TEN first-external-row round-14 queries — every
# dropped name is multi-round green and re-enters via pool_green's
# oldest-first backfill next round (restore toward ~15-20 as the tail
# stays fresh).
FIXED_CORE = (
    "flagship_progress",
    "transcript_lookup",
    "stream_tumbling_append",
)


def _is_green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def load_history(repo: str = REPO) -> dict[int, dict[str, dict]]:
    """round number -> {query name -> driver row}."""
    out: dict[int, dict[str, dict]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            out[int(m.group(1))] = json.load(f)
    return out


def query_status(repo: str = REPO) -> dict[str, dict]:
    """Per-registered-query external-driver status.

    Returns name -> {checked_rounds, last_green_round, last_fail_round,
    status} where status is one of ``never_checked`` / ``green`` /
    ``stale_fail`` (last driver row was non-green).
    """
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (  # noqa: E501
        all_queries,
    )

    history = load_history(repo)
    status: dict[str, dict] = {}
    for name in all_queries():
        checked: list[int] = []
        last_green = None
        last_fail = None
        for rnd in sorted(history):
            row = history[rnd].get(name)
            if row is None:
                continue
            checked.append(rnd)
            if _is_green(row):
                last_green = rnd
            else:
                last_fail = rnd
        if not checked:
            st = "never_checked"
        elif last_green == checked[-1] or (
            last_green is not None and (last_fail or 0) < last_green
        ):
            st = "green"
        else:
            st = "stale_fail"
        status[name] = {
            "checked_rounds": checked,
            "last_green_round": last_green,
            "last_fail_round": last_fail,
            "status": st,
        }
    return status


# Judge-requested names for the CURRENT round (edit per round from
# VERDICT.md's "Next round" item).  Ranked right after streaming names.
#
# Round-8 note: the never-checked backlog is clear (round 7's final
# rotation), so the proposal is freshness-driven — pool_green's
# oldest-external-green-first ordering does the work and PREFERRED is
# empty.  The r8 verdict's explicit asks (token_pack_assignments
# re-earn; the two manifest queries' first rows) fall out of the
# stale_fail / never_checked pools automatically.
PREFERRED: tuple[str, ...] = ()


def _rotation_priority(name: str) -> tuple:
    """Streaming names first (most environment-sensitive), then the
    judge-requested names, then the rest in registration order (stable:
    dict preserves insertion)."""
    if name.startswith("stream_"):
        tier = 0
    elif name in PREFERRED:
        tier = 1
    else:
        tier = 2
    return (tier,)


def propose_window(window_size: int = 50, repo: str = REPO) -> dict:
    status = query_status(repo)
    # Rows-only names are eligible only until they hold ANY driver row
    # (their `no_oracle` rows read as non-green, so leaving them in
    # would burn a window slot on a known-non-green row every round).
    eligible = [
        n
        for n in status
        if n not in ROWS_ONLY or not status[n]["checked_rounds"]
    ]

    core = [n for n in FIXED_CORE if n in eligible]
    # One round-robin CRASH-GATE slot for rows-only names (VERDICT r10
    # item 4): their `no_oracle` rows are the only external execution
    # evidence these queries can earn, and leaving them out forever
    # left dedup_minhash_lsh's crash gate 7 rounds stale.  Each round
    # the slot goes to the rows-only name with the OLDEST driver row.
    checked_rows_only = [n for n in ROWS_ONLY if status[n]["checked_rounds"]]
    if checked_rows_only:
        core.append(
            min(
                checked_rows_only,
                key=lambda n: (max(status[n]["checked_rounds"]), n),
            )
        )
    pool_never = [
        n for n in eligible if status[n]["status"] == "never_checked" and n not in core
    ]
    pool_fail = [
        n for n in eligible if status[n]["status"] == "stale_fail" and n not in core
    ]
    # Green-but-not-core names backfill only if slots remain.
    pool_green = [
        n for n in eligible if status[n]["status"] == "green" and n not in core
    ]
    pool_never.sort(key=_rotation_priority)
    pool_fail.sort(key=_rotation_priority)
    # Oldest external green first, so coverage stays fresh.
    pool_green.sort(key=lambda n: (status[n]["last_green_round"] or 0, n))

    window = list(core)
    for pool in (pool_fail, pool_never, pool_green):
        for n in pool:
            if len(window) >= window_size:
                break
            window.append(n)

    never_total = [n for n in status if status[n]["status"] == "never_checked"]
    return {
        "window": window,
        "first_time_in_window": [
            n for n in window if status[n]["status"] == "never_checked"
        ],
        "stale_fail_in_window": [
            n for n in window if status[n]["status"] == "stale_fail"
        ],
        "never_checked_total": sorted(never_total, key=_rotation_priority),
        "excluded_rows_only": sorted(
            n for n in ROWS_ONLY if status[n]["checked_rounds"]
        ),
        "status": status,
    }


# A query whose latest external row is older than this many rounds
# (relative to the newest recorded round) is VINTAGE-STALE: the pytest
# gate (tests/test_rotation_vintage.py) requires every such query to be
# scheduled in the live window, so the tail can never silently outgrow
# the rotation again (VERDICT r13 item 6).
MAX_VINTAGE_ROUNDS = 6


def coverage_report(repo: str = REPO) -> str:
    """Markdown external-coverage vintage histogram for QUERIES.md: at
    235+ registered queries and a 50-slot window, the refresh cycle is
    ~5 rounds even with perfect rotation — this section makes the tail
    visible to every round (and the judge) at a glance."""
    status = query_status(repo)
    history = load_history(repo)
    latest = max(history) if history else 0
    by_round: dict[int | None, int] = {}
    for row in status.values():
        last = max(row["checked_rounds"]) if row["checked_rounds"] else None
        by_round[last] = by_round.get(last, 0) + 1
    stale = sorted(
        n
        for n, row in status.items()
        if row["checked_rounds"]
        and max(row["checked_rounds"]) < latest - MAX_VINTAGE_ROUNDS
    )
    lines = [
        "## External-coverage vintage",
        "",
        f"Latest driver round: r{latest:02d}. Histogram of each "
        "registered query's NEWEST external driver row (never = not "
        "yet windowed):",
        "",
        "| latest external row | queries |",
        "|---|---|",
    ]
    for rnd in sorted(by_round, key=lambda r: (r is None, r)):
        label = "never" if rnd is None else f"r{rnd:02d}"
        lines.append(f"| {label} | {by_round[rnd]} |")
    lines += [
        "",
        f"Vintage gate: every query whose newest row is older than "
        f"{MAX_VINTAGE_ROUNDS} rounds must be scheduled in the live "
        "window (tests/test_rotation_vintage.py).",
        f"Currently older than r{latest - MAX_VINTAGE_ROUNDS:02d}: "
        + (", ".join(f"`{n}`" for n in stale) if stale else "none")
        + ".",
    ]
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--window-size", type=int, default=50)
    ap.add_argument(
        "--apply-check",
        action="store_true",
        help="exit non-zero if the live _PRIORITY_WINDOW differs from the proposal",
    )
    ap.add_argument(
        "--coverage-report",
        action="store_true",
        help="print the markdown vintage histogram (the QUERIES.md section)",
    )
    args = ap.parse_args()

    if args.coverage_report:
        print(coverage_report())
        return 0

    prop = propose_window(args.window_size)
    st = prop.pop("status")
    counts: dict[str, int] = {}
    for row in st.values():
        counts[row["status"]] = counts.get(row["status"], 0) + 1
    print(json.dumps({"counts": counts, **prop}, indent=2))

    if args.apply_check:
        from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (  # noqa: E501
            _PRIORITY_WINDOW,
        )

        if list(_PRIORITY_WINDOW) != prop["window"]:
            live = set(_PRIORITY_WINDOW)
            want = set(prop["window"])
            print("MISMATCH live vs proposal", file=sys.stderr)
            print(f"  only-live: {sorted(live - want)}", file=sys.stderr)
            print(f"  only-prop: {sorted(want - live)}", file=sys.stderr)
            return 1
        print("live _PRIORITY_WINDOW matches proposal", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
