#!/usr/bin/env python
"""Cache-materialization throughput benchmark — the direct analog of the
reference's ONLY published performance number (BASELINE.md: 1.43 s/subject,
0.70 subjects/s, 15.9 records/s: 4-D cine NIfTI → 2-D records + metadata
table, demo/demo.ipynb cell 6, num_workers=4).

Same work shape, same data scale per subject: real .nii.gz volumes (pure-
Python NIfTI-1 codec both ways), 256×256×25-frame cine per subject →
binary scan → decode → frame explode → mask volume + ED/ES selection +
border crop per record → parquet records + per-subject metadata — i.e. the
engine's reformat+cache pipeline (SURVEY §3.2), not a stripped-down scan.

Prints one JSON line:
  {"metric": "cache_subjects_per_s", "value": ..., "records_per_s": ...,
   "n_subjects": N, "reference_subjects_per_s": 0.70, ...}

Run: python bench_cache.py [N_SUBJECTS (default 40)]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

from qcardia_data_spark import get_spark
from qcardia_data_spark.reformat import reformat_volumes
from qcardia_data_spark.sources.nifti import encode_nifti1

HEIGHT, WIDTH, N_FRAMES = 256, 256, 25  # ≈ reference's 22.7 records/subject


def make_subject(path: str, i: int) -> None:
    """Smooth synthetic cine (compressible, like anatomy; NOT noise — gzip
    ratio affects decode time, so data realism matters here)."""
    y, x = np.mgrid[0:HEIGHT, 0:WIDTH].astype(np.float32)
    vol = np.empty((HEIGHT, WIDTH, N_FRAMES), dtype=np.float32)
    for t in range(N_FRAMES):
        phase = 2 * np.pi * t / N_FRAMES
        r = np.hypot(x - WIDTH / 2 - 10 * np.sin(phase + i), y - HEIGHT / 2)
        vol[:, :, t] = np.exp(-((r - 40 - 5 * np.cos(phase)) ** 2) / 200.0)
    with open(path, "wb") as f:
        f.write(encode_nifti1(vol, np.eye(4), compress=True))


def main() -> None:
    n_subjects = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    # load guard + host snapshot (r14 — bench.py/bench_ext.py got these in
    # r9; this bench could still record a loaded-host artifact silently:
    # a 0.47 subjects/s reading at loadavg ~20 looked like a regression)
    from bench_common import host_state, wait_for_idle_host

    host_before, guard = wait_for_idle_host(host_state())
    work = tempfile.mkdtemp(prefix="qds_cache_bench_")
    raw = os.path.join(work, "raw")
    out = os.path.join(work, "cache")
    os.makedirs(raw)
    try:
        for i in range(n_subjects):
            make_subject(os.path.join(raw, f"subj{i:03}.nii.gz"), i)

        spark = get_spark(app_name="qds-cache-bench")
        spark.range(10).count()  # session warm-up outside the timed span

        t0 = time.perf_counter()
        records, metadata = reformat_volumes(
            spark, raw, glob="*.nii.gz", dataset="bench", n_frames=N_FRAMES,
            codec="nii",
        )
        records.write.mode("overwrite").parquet(os.path.join(out, "records"))
        metadata.write.mode("overwrite").parquet(os.path.join(out, "metadata"))
        wall = time.perf_counter() - t0

        n_rec = spark.read.parquet(os.path.join(out, "records")).count()
        print(json.dumps({
            "metric": "cache_subjects_per_s",
            "value": round(n_subjects / wall, 3),
            "unit": "subjects/s",
            "records_per_s": round(n_rec / wall, 1),
            "n_subjects": n_subjects,
            "n_records": n_rec,
            "wall_s": round(wall, 2),
            "plane": [HEIGHT, WIDTH],
            "frames_per_subject": N_FRAMES,
            "reference_subjects_per_s": 0.70,
            "reference_records_per_s": 15.9,
            "host": {"before": host_before, "after": host_state()},
            "load_guard": guard,
        }))
        spark.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
