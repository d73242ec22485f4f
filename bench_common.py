"""Shared harness pieces for bench.py / bench_ext.py: host-state snapshot
and the load guard (VERDICT r8 "What's wrong" #2) — one definition, so the
two benchmarks can never silently diverge on what counts as a valid series
point."""

from __future__ import annotations

import os
import time


def host_state() -> dict:
    """Loadavg + page-cache/memory snapshot; every confound the r7/r8
    bench-series adjudications needed after the fact, recorded up front."""
    st: dict = {}
    try:
        st["loadavg_1m"] = float(open("/proc/loadavg").read().split()[0])
    except Exception:
        pass
    try:
        for line in open("/proc/meminfo"):
            if line.startswith(("Cached:", "MemAvailable:")):
                k, v = line.split(":")
                st[k.strip().lower() + "_kb"] = int(v.split()[0])
    except Exception:
        pass
    return st


def wait_for_idle_host(host_before: dict) -> tuple[dict, dict]:
    """Spin-wait (bounded) while loadavg_1m exceeds the threshold, so a
    loaded-host artifact cannot silently become the round's series point
    (BENCH_r08 was recorded at loadavg 4.73). Returns the (possibly
    refreshed) host snapshot and the guard record for the output JSON;
    on a host that never settles the run proceeds — the driver still
    needs a JSON line — with ``gave_up`` stamped so series readers
    discard the row."""
    guard = {
        "threshold": float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "1.0")),
        "waited_sec": 0,
        "gave_up": False,
    }
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "600"))
    t0 = time.monotonic()
    while host_before.get("loadavg_1m", 0.0) > guard["threshold"]:
        if time.monotonic() - t0 > budget:
            guard["gave_up"] = True
            break
        time.sleep(15)
        host_before = host_state()
    guard["waited_sec"] = round(time.monotonic() - t0, 1)
    return host_before, guard
