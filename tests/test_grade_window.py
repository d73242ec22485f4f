"""Rotation-window discipline (VERDICT r6 "What's wrong" #2 made this a
standing rule): the driver grades the FIRST 50 registry entries, so
_PRIORITY must stay exactly 50, duplicate-free, anchored by the flagship,
and must absorb every never-graded query up to its capacity."""

from __future__ import annotations

import json

import pytest


def test_priority_window_shape():
    from qcardia_data_spark.queries import _PRIORITY, QUERIES

    assert len(_PRIORITY) == 50, "driver grades exactly the first 50"
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate window slots"
    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not registered: {missing}"
    assert _PRIORITY[0] == "q1_pricing_summary", "flagship anchor leads"
    # registry ordering actually honors the window
    assert list(QUERIES)[:50] == _PRIORITY


def test_flagship_slots_reserved():
    # Cadence policy (VERDICT r12 #5): the four non-anchor flagships get a
    # <=3-round refresh. Encode the due-date math from GRADE_WINDOW.json
    # instead of a hardcoded round: a flagship due NEXT round (vintage+3 ==
    # as_of_round+1) must sit in _PRIORITY; one due the round after must
    # already be queued in _PRIORITY or _NEXT_IN_LINE. (r14 graded all
    # four, so they are due r17 and the r15/r16 queues need no slots.)
    from qcardia_data_spark.queries import _NEXT_IN_LINE, _PRIORITY

    flagships = {
        "a4_quantile_summary",
        "j2_broadcast_star_join",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
    }
    d = json.load(open("GRADE_WINDOW.json"))
    current = d["as_of_round"]
    for name in sorted(flagships):
        due = d["latest_round"][name] + 3
        if due <= current + 1:
            assert name in _PRIORITY, f"{name} due r{due}: needs a window slot"
        elif due == current + 2:
            assert name in _PRIORITY or name in _NEXT_IN_LINE, (
                f"{name} due r{due}: must be queued for the next window"
            )


def test_registry_contract():
    import __spark_entry__ as E

    qs, sqls = E.queries(), E.oracle_sql()
    assert set(qs) == set(sqls), "every query needs an oracle (and vice versa)"
    assert len(qs) >= 145


def test_grade_window_json_consistent_with_registry():
    # GRADE_WINDOW.json is committed telemetry — it must describe the
    # CURRENT registry (regen with `python grade_window.py` after edits)
    from qcardia_data_spark.queries import QUERIES

    d = json.load(open("GRADE_WINDOW.json"))
    assert d["registry_size"] == len(QUERIES)
    assert d["upcoming_window"] == list(QUERIES)[:50]
    unknown = [n for n in d["never_graded"] if n not in QUERIES]
    assert not unknown


@pytest.mark.round_start
def test_grade_window_json_fresh():
    # VERDICT r7 "What's wrong" #3: the committed GRADE_WINDOW.json said
    # as_of_round 6 while CORRECTNESS_r07.json existed — stale telemetry
    # presented as current. Freshness is now a standing assertion: the
    # file must be regenerated after each round's CORRECTNESS lands.
    # VERDICT r10 #2: runs ONLY under `-m round_start` (make round-start /
    # window-check) — on an end-of-round tree it is red by construction
    # (CORRECTNESS_rN lands after the final commit), so it is deselected
    # from the default suite to keep "pytest green" unambiguous.
    import glob
    import re

    latest = max(
        int(re.search(r"_r(\d+)", p).group(1))
        for p in glob.glob("CORRECTNESS_r*.json")
    )
    d = json.load(open("GRADE_WINDOW.json"))
    assert d["as_of_round"] == latest, (
        f"GRADE_WINDOW.json as_of_round={d['as_of_round']} but newest "
        f"CORRECTNESS file is r{latest}: rerun `python grade_window.py`"
    )
