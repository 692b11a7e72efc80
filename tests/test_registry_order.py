"""The registry presentation order IS the driver's verification plan:
the round driver hashes a bounded prefix (~50 keys) of queries() against
DuckDB each round, so keys with no green CORRECTNESS row from any shipped
round must sort ahead of keys the scoreboard has already verified, and
round-3 additions must queue behind the pre-existing backlog (they
displace nothing). A refactor that silently breaks `_reorder` would cost
a full round of driver evidence — cheap insurance to pin it.
"""

from __future__ import annotations

from etl_cnpjs_spark.plans import QUERIES
from etl_cnpjs_spark.plans import _ADDED_R3, _ADDED_R5, _driver_evidence


def test_flagship_first():
    assert next(iter(QUERIES)) == "flagship"


def test_green_keys_sort_behind_unverified_oracle_keys():
    green, _seen = _driver_evidence()
    order = list(QUERIES)
    unverified_oracle = [
        k for k in order if k != "flagship" and k not in green and QUERIES[k].oracle is not None
    ]
    if not unverified_oracle:
        # Scoreboard fully green (the r4 goal state): there is no backlog
        # to order ahead of anything — the rule is moot, not violated.
        # (Asserting non-emptiness here would turn full driver coverage
        # into a red suite, the exact failure class of the r3 guard.)
        return
    last_unverified = max(order.index(k) for k in unverified_oracle)
    early_green = [k for k in green if k in QUERIES and order.index(k) < last_unverified]
    assert early_green == ["flagship"] or early_green == [], (
        f"driver-green keys occupy window slots ahead of unverified keys: {early_green[:5]}"
    )


def test_additions_queue_behind_older_backlog():
    """Each addition wave queues behind every OLDER unverified key:
    pre-freeze backlog < _ADDED_R3 < _ADDED_R5. (After r4 the only
    unverified R3 key is tpch_q2 — whose first driver row failed — so it
    must lead the window ahead of all R5 keys.)"""
    green, _seen = _driver_evidence()
    order = list(QUERIES)

    def tier(k: str) -> int:
        return 2 if k in _ADDED_R5 else 1 if k in _ADDED_R3 else 0

    unverified = [
        k
        for k in order
        if k != "flagship" and k not in green and QUERIES[k].oracle is not None
    ]
    for older_tier in (0, 1):
        older = [k for k in unverified if tier(k) == older_tier]
        newer = [k for k in unverified if tier(k) > older_tier]
        if not older or not newer:
            continue
        last_older = max(order.index(k) for k in older)
        early_new = [k for k in newer if order.index(k) < last_older]
        assert early_new == [], (
            f"newer additions displace tier-{older_tier} unverified keys: {early_new}"
        )


def test_window_prefix_is_all_oracle_bearing():
    # The driver's compare adds nothing for rows-only keys it has already
    # seen; the 50-key window should spend its slots on hash-checkable rows.
    prefix = list(QUERIES)[:50]
    rows_only = [k for k in prefix if QUERIES[k].oracle is None]
    _green, seen = _driver_evidence()
    wasted = [k for k in rows_only if k in seen]
    assert wasted == [], f"window slots wasted on already-seen rows-only keys: {wasted}"


def test_green_bucket_rotates_stalest_evidence_first():
    """Within driver-green keys, re-confirmation order is oldest latest-
    green round first, so evidence freshness doesn't decay as the
    surface grows (r4 verdict item #4)."""
    green, _seen = _driver_evidence()
    order = list(QUERIES)
    green_in_order = [green[k] for k in order if k in green and k != "flagship"]
    assert green_in_order == sorted(green_in_order), (
        "green keys are not ordered stalest-evidence-first"
    )
