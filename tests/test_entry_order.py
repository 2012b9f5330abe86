"""Guard the driver-visibility invariant for the oracle battery.

The driver's correctness harness checks only the FIRST 50 entries of
``queries()`` (insertion order).  Round 2 lost 21 entries to that
window: they were appended past position 50 and never earned a
CORRECTNESS row.  This test fails CI whenever an entry that has never
been driver-checked (no row in any committed CORRECTNESS_r*.json)
sits outside the checked window — i.e. it forces a rotation plan
every time the battery grows.
"""

from __future__ import annotations

import glob
import json
import os

DRIVER_WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_checked() -> set[str]:
    """Keys that appear in any committed driver ledger without a hard
    error (``no_oracle`` counts: the driver ran the rows-only check)."""
    seen: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            ledger = json.load(f)
        for key, row in ledger.items():
            if row.get("err") in (None, "no_oracle"):
                seen.add(key)
    return seen


def test_unchecked_entries_inside_driver_window():
    from search_engine_spark.entry_queries import QUERIES

    checked = _driver_checked()
    window = set(list(QUERIES)[:DRIVER_WINDOW])
    orphans = [
        k for k in QUERIES if k not in checked and k not in window
    ]
    assert orphans == [], (
        f"{len(orphans)} queries() entries have never been driver-checked "
        f"AND sit outside the first-{DRIVER_WINDOW} window the driver "
        f"inspects: {orphans}. Rotate driver-green veterans to the tail "
        f"of QUERIES (entry_queries.py) so these land inside the window."
    )


def test_every_query_has_oracle_or_documented_exception():
    from search_engine_spark.entry_queries import ORACLES, QUERIES

    documented_rows_only = {
        # Porter stemming / approximate-by-design entries; see the
        # comment block at the bottom of entry_queries.py.
        "bm25_stemmed_topk",
        "near_dup_lsh",
    }
    missing = [
        k for k in QUERIES
        if k not in ORACLES and k not in documented_rows_only
    ]
    assert missing == [], f"queries() entries without oracle_sql(): {missing}"
    stale = [k for k in ORACLES if k not in QUERIES]
    assert stale == [], f"oracle_sql() keys without queries() entry: {stale}"
