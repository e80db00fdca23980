"""Driver-window coverage contract (round 5).

The external correctness driver checks only the FIRST 50 registered
queries. Round 4 silently rotated 11 green queries out of the window by
inserting new ones ahead of them; the fix is the pinned _DRIVER_ORDER in
__spark_entry__.py. This test pins the invariant those rules exist for:
every query beyond position 50 must already have a driver-green
CORRECTNESS row from a previous round — so the union of rounds always
covers the full registry. If this fails for a NEW query, move it into
the NEW-IN-R<k> block of _DRIVER_ORDER (inside the window); if it fails
for an old query, a reorder pushed a never-checked query out.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _row_is_green(row: dict) -> bool:
    # Full-check green only: rows + schema + hash all match, no error.
    # A hash-red row (e.g. warc_cdx_index r6, oracle dtype slip) counts
    # as never-green so its re-check stays urgent — VERDICT r6 #2.
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and row.get("err") is None
    )


def _historically_green() -> set[str]:
    green: set[str] = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(f)).items():
            if _row_is_green(row):
                green.add(name)
    return green


def test_queries_beyond_window_have_historical_driver_rows():
    import __spark_entry__ as E

    qs = list(E.queries().keys())
    green = _historically_green()
    missing = [q for q in qs[50:] if q not in green]
    # SATURATION allowance: when >50 queries have never been
    # driver-checked (more debuts in one round than window slots), it is
    # mathematically impossible for every never-green query to sit
    # inside the window. The invariant then weakens to: the window is
    # ENTIRELY never-green (no slot wasted on an already-green query)
    # and the overflow debuts are the newest-registered — they debut
    # next round with top priority (last-green = -1 sorts first).
    if missing:
        window_all_debuts = all(q not in green for q in qs[:50])
        assert window_all_debuts, (
            f"never-checked queries outside the window while the window "
            f"holds already-green queries: {missing}"
        )
    else:
        assert not missing


def test_every_query_has_oracle_or_is_known_rows_only():
    import __spark_entry__ as E

    qs = set(E.queries().keys())
    oracles = set(E.oracle_sql().keys())
    assert not oracles - qs, f"oracle without query: {oracles - qs}"
    # rows-only queries are allowed but must be a deliberate, short list
    rows_only = sorted(qs - oracles)
    assert rows_only == [], (
        f"queries without oracle_sql entries (expected none as of r5): "
        f"{rows_only}"
    )


def _last_green_round() -> dict[str, int]:
    last: dict[str, int] = {}
    import re

    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        for name, row in json.load(open(f)).items():
            if _row_is_green(row):
                last[name] = max(last.get(name, -1), rnd)
    return last


def test_hash_red_rows_count_as_never_green():
    """A row with rows_match=true but hash_match=false (or schema_match
    false, or err set) must NOT be treated as green by the rotation —
    otherwise a value-diverged query gets deferred instead of urgently
    re-checked (the warc_cdx_index r6 incident)."""
    assert not _row_is_green(
        {"rows_match": True, "schema_match": True, "hash_match": False,
         "err": None}
    )
    assert not _row_is_green(
        {"rows_match": True, "schema_match": False, "hash_match": True,
         "err": None}
    )
    assert not _row_is_green(
        {"rows_match": True, "schema_match": True, "hash_match": True,
         "err": "boom"}
    )
    assert _row_is_green(
        {"rows_match": True, "schema_match": True, "hash_match": True,
         "err": None}
    )
    # and the module's own rotation must agree: warc_cdx_index has a
    # red r6 row, so unless a LATER round has a full-green row for it,
    # it must sort in the never-green (most urgent) block.
    import __spark_entry__ as E

    last = _last_green_round()
    if "warc_cdx_index" not in last:
        order = list(E.queries().keys())
        never_green_prefix = [q for q in order if q not in last]
        assert "warc_cdx_index" in never_green_prefix[: max(50, 1)], (
            "hash-red warc_cdx_index deprioritized by the rotation"
        )


def test_rotation_emits_stalest_queries_first():
    """Round-6 rotation rule: the emitted order must be non-decreasing in
    last-green-round (never-green queries = -1, most urgent), so the
    50-query driver window always holds the queries whose CORRECTNESS
    rows are stalest — no row ever goes more than ceil(Q/50) rounds
    stale and debuts land inside the window on their first round."""
    import __spark_entry__ as E

    qs = list(E.queries().keys())
    last = _last_green_round()
    rounds = [last.get(q, -1) for q in qs]
    assert rounds == sorted(rounds), (
        "queries() not emitted stalest-first: "
        + str([(q, r) for q, r in zip(qs, rounds)])
    )
    # every never-green query (debut) must sit inside the check window —
    # unless debuts outnumber the 50 slots (saturation), in which case
    # the window must be ENTIRELY debuts and the overflow waits for the
    # next round (it sorts most-urgent then)
    debuts = [q for q in qs if q not in last]
    if len(debuts) <= 50:
        assert all(qs.index(q) < 50 for q in debuts), debuts
    else:
        assert all(q in debuts for q in qs[:50]), (
            "saturated window contains an already-green query"
        )
