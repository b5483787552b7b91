"""Contract pins for the driver-verification window and the bench
query lists — the round-4 lesson made mechanical: the driver walks the
registry in order and cuts at ~50, so a window that exceeds 50, names a
missing query, or re-burns slots on already-verified names silently
wastes the scarcest per-round resource (driver CORRECTNESS rows), and a
renamed query would break bench.py only at driver time.
"""

from __future__ import annotations

from ght2dm_spark.queries import ORACLE, QUERIES
from ght2dm_spark.queries.__init__ import _DRIVER_VERIFIED, _LEAD


def test_window_is_exactly_the_lead_block():
    assert list(QUERIES)[: len(_LEAD)] == _LEAD


def test_lead_is_budgeted_to_the_driver_cut():
    assert len(_LEAD) == 50
    assert len(set(_LEAD)) == len(_LEAD), "duplicate window entries"


def test_every_window_name_is_a_registered_query():
    missing = [n for n in _LEAD if n not in QUERIES]
    assert not missing, f"window names not in registry: {missing}"


def test_window_spends_no_slots_on_verified_names():
    # requeues are names deliberately REMOVED from _DRIVER_VERIFIED, so
    # the sets must be disjoint — overlap means a slot re-checks a name
    # that already has a green driver row
    burn = set(_LEAD) & _DRIVER_VERIFIED
    assert not burn, f"window re-burns verified names: {sorted(burn)}"


def test_verified_ledger_names_exist():
    gone = [n for n in _DRIVER_VERIFIED if n not in QUERIES]
    assert not gone, f"ledger names no longer registered: {gone}"


def test_oracle_iteration_order_tracks_queries():
    qorder = [n for n in QUERIES if n in ORACLE]
    assert qorder == list(ORACLE)


def test_bench_lists_name_registered_queries():
    import bench

    for name in bench.HEADLINE:
        assert name in QUERIES, f"HEADLINE names missing query: {name}"
    for name in bench.SCALE_HEADLINE:
        assert name in QUERIES, f"SCALE_HEADLINE missing query: {name}"
        assert name in ORACLE, f"scale point needs an oracle: {name}"
