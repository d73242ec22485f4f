"""Grade-window telemetry (verdict r4 "Next round" #8).

Reads every CORRECTNESS_r*.json the driver has recorded, computes each
registry query's LATEST graded round and verdict, and writes
GRADE_WINDOW.json so the rotation debt ("which verdicts are N rounds
old") is machine-visible instead of living in judge memos.

Run at any time:  python grade_window.py
Output fields:
  latest_round    — per-query {name: round} of the newest grade
  latest_verdict  — per-query "green" / "red" / "rows-only" at that round
  never_graded    — registry entries with no driver verdict yet
  stale           — graded, but the newest grade is older than
                    (current_max_round - 1), i.e. >2 rounds old next round
  upcoming_window — the first 50 registry names (what the driver will
                    grade next round, from queries.py _PRIORITY order)
"""
from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")


def collect() -> dict:
    import __spark_entry__ as entry

    registry = list(entry.queries().keys())
    latest_round: dict[str, int] = {}
    latest_verdict: dict[str, str] = {}
    rounds = []
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            if not isinstance(res, dict):
                continue
            latest_round[name] = rnd
            if res.get("err"):
                verdict = "red"
            elif all(res.get(k) for k in ("rows_match", "schema_match", "hash_match")):
                verdict = "green"
            elif res.get("rows_match") and res.get("hash_match") is None:
                verdict = "rows-only"
            else:
                verdict = "red"
            latest_verdict[name] = verdict
    max_round = max(rounds) if rounds else 0
    never = [q for q in registry if q not in latest_round]
    stale = sorted(
        (q for q, r in latest_round.items() if q in registry and r < max_round - 1),
        key=lambda q: (latest_round[q], q),
    )
    return {
        "as_of_round": max_round,
        "registry_size": len(registry),
        "graded": len([q for q in registry if q in latest_round]),
        "never_graded": never,
        "stale": [
            {"query": q, "last_round": latest_round[q], "verdict": latest_verdict[q]}
            for q in stale
        ],
        "red_at_latest": sorted(
            q for q, v in latest_verdict.items() if v == "red" and q in registry
        ),
        "upcoming_window": registry[:50],
        "latest_round": latest_round,
        "latest_verdict": latest_verdict,
    }


if __name__ == "__main__":
    out = collect()
    with open("/root/repo/GRADE_WINDOW.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(
        f"round {out['as_of_round']}: {out['graded']}/{out['registry_size']} graded, "
        f"{len(out['stale'])} stale, {len(out['never_graded'])} never, "
        f"{len(out['red_at_latest'])} red"
    )
