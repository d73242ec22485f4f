"""Sinks (S6-S11).

Order-sensitive materialization follows the engine rule (SURVEY §7.3):
canonical sort before write. Small results (summaries, split dicts) are
driver-side JSON; bulk records are parquet with Spark's atomic commit.
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _safe_component(value, who: str) -> str:
    """File-name component from a record id/subject — refuse loudly on
    path separators or traversal (r12 review: an id like "../x" written
    through the per-record sinks would land OUTSIDE the output dir)."""
    s = str(value)
    if not s or "/" in s or "\\" in s or s in (".", "..") or "\x00" in s:
        raise ValueError(
            f"{who}: record id {s!r} is not a safe file-name component "
            "(empty, path separator, or traversal) — sanitize ids upstream"
        )
    return s


def cluster_for_partitioned_write(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-cluster rows on the partition column(s) before a
    ``partitionBy`` parquet write (r16, guide §6 output file sizing).

    Without it a bucket-partitioned write creates up to
    (tasks × buckets-touched) files — every task opens a file in every
    bucket directory it holds rows for — and, when the frame arrives as
    ONE partition (a materialized batch), a single task creates every
    file serially (measured: a 16k-row append into 2,048 bucket dirs took
    29.4 s from one task at ~14 ms per file create/close; the same write
    hash-clustered over 32 tasks took 5.9 s). Clustering puts each bucket
    wholly in one task: exactly one file per touched directory, created
    with full parallelism, and probes later open the minimum file count.

    Explicit numPartitions (`spark.sql.shuffle.partitions`, the engine's
    scale-adaptive knob) so AQE byte-coalescing cannot fold the tiny
    batch back onto one task. ONLY for writes whose partition column has
    many values (bucket layouts); a low-cardinality partitioning (e.g.
    one `_batch` value per write) would serialize the write instead."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(n, *[F.col(c) for c in cols])


def write_records(
    df: DataFrame, path: str, order_by: Sequence[str],
    partition_by: Sequence[str] = (), mode: str = "overwrite",
) -> None:
    """S6 — bulk record sink: canonical sort, then parquet (atomic commit,
    ``_SUCCESS`` marker). ``partition_by`` maps to directory partitioning so
    downstream split/subject filters prune whole files."""
    writer = df.orderBy(*order_by).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_metadata_table(
    df: DataFrame, path: str, ordered_cols: Sequence[str],
    int32_cols: Sequence[str] = (), mode: str = "overwrite",
) -> None:
    """S7 — metadata table sink with explicit column order + int32 casts
    (reference dataset_cacher.py:379-391 reorders columns and downcasts
    slice/frame counters)."""
    out = df
    for c in int32_cols:
        out = out.withColumn(c, F.col(c).cast("int"))
    rest = [c for c in out.columns if c not in set(ordered_cols)]
    out.select(*ordered_cols, *rest).orderBy(*ordered_cols).write.mode(mode).parquet(path)


def write_small_json(obj: Mapping | Sequence, path: str) -> None:
    """S9 — driver-side JSON sink for collected small results (split dicts,
    summaries — reference ``data_to_file``, utils.py:105-119)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True, default=str)


def write_npy_records(
    df: DataFrame, out_dir: str, id_col: str, array_col: str, shape_cols: Sequence[str] = (),
) -> None:
    """S6/S10 — one binary file per record (the reference's .pt-per-record /
    npy prediction sink, dataset_cacher.py:327-367, data_predictor.py:
    316-335), written executor-side via foreachPartition: no data funnels
    through the driver, each task writes its partition's records.

    File name = ``{id}.npy``; array reshaped to ``shape_cols`` when given.
    Requires a filesystem visible to executors (local/NFS here; at scale an
    object-store client inside the partition function).
    """
    os.makedirs(out_dir, exist_ok=True)
    cols = [id_col, array_col, *shape_cols]
    shape_names = list(shape_cols)

    def write_partition(rows):
        import numpy as np  # import inside the task: runs on executors

        for r in rows:
            arr = np.asarray(r[array_col], dtype=np.float32)
            if shape_names:
                arr = arr.reshape(*[int(r[c]) for c in shape_names])
            name = _safe_component(r[id_col], "write_npy_records")
            np.save(os.path.join(out_dir, f"{name}.npy"), arr)

    df.select(*cols).foreachPartition(write_partition)


def write_nifti_records(
    df: DataFrame, out_dir: str, subject_col: str, suffix: str,
    array_col: str, shape_col: str, affine_col: str | None = None,
    compress: bool = True,
) -> None:
    """S6-for-volumes — one ``{subject}/{subject}_{suffix}.nii[.gz]`` per
    record, the reference reformat sink (``nib.save``, mm1.py:69-70 /
    mm2.py:72-73) via the pure-Python encoder (sources/nifti.py), written
    executor-side through foreachPartition: no volume bytes cross the
    driver. ``array_col`` is the C-order flattened volume, ``shape_col`` an
    array<int>, ``affine_col`` a row-major 16-float array (identity when
    absent)."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [subject_col, array_col, shape_col] + ([affine_col] if affine_col else [])

    def write_partition(rows):
        import numpy as np  # executor-side imports

        from qcardia_data_spark.sources.nifti import encode_nifti1

        for r in rows:
            shape = [int(s) for s in r[shape_col]]
            vol = np.asarray(r[array_col], dtype=np.float32).reshape(shape)
            aff = (
                np.asarray(r[affine_col], dtype=np.float64).reshape(4, 4)
                if affine_col
                else np.eye(4)
            )
            subj = _safe_component(r[subject_col], "write_nifti_records")
            folder = os.path.join(out_dir, subj)
            os.makedirs(folder, exist_ok=True)
            name = f"{subj}_{suffix}.nii" + (".gz" if compress else "")
            with open(os.path.join(folder, name), "wb") as f:
                f.write(encode_nifti1(vol, aff, compress=compress))

    df.select(*cols).foreachPartition(write_partition)


def write_png_slices(
    df: DataFrame, out_dir: str, folder_col: str, name_col: str,
    array_col: str, h_col: str, w_col: str, channels: int = 1,
) -> None:
    """S11 — PNG example-slice sink (reference data_predictor.py:337-414):
    one folder per subject/volume, ``{slice_id}_image.png``-style names,
    float arrays in [0,1] scaled ``*255`` and truncated to uint8 (the
    PIL-equivalent ``.astype(np.uint8)``). ``channels=3`` expects
    channel-first data and permutes to HWC (reference ``permute([1,2,0])``).

    Pure-stdlib PNG encoding (sources/png.py) inside foreachPartition —
    executors write their own partitions, nothing funnels through the
    driver; at scale swap the open() for an object-store client."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [folder_col, name_col, array_col, h_col, w_col]

    def write_partition(rows):
        import numpy as np  # executor-side imports

        from qcardia_data_spark.sources.png import encode_png

        for r in rows:
            h, w = int(r[h_col]), int(r[w_col])
            a = np.asarray(r[array_col], dtype=np.float64)
            img = a.reshape(h, w) if channels == 1 else a.reshape(channels, h, w).transpose(1, 2, 0)
            folder = os.path.join(
                out_dir, _safe_component(r[folder_col], "write_png_slices")
            )
            os.makedirs(folder, exist_ok=True)
            nm = _safe_component(r[name_col], "write_png_slices")
            with open(os.path.join(folder, f"{nm}.png"), "wb") as f:
                f.write(encode_png((img * 255.0).astype(np.uint8)))

    df.select(*cols).foreachPartition(write_partition)


def collect_split_dict(assignment: DataFrame, subject_col: str = "subject_id") -> dict:
    """Inverse of readers.split_table_from_dict: assignment frame →
    ``{split: {dataset: [subjects]}}`` with sorted subject lists (the
    reference sorts everywhere for determinism, O1)."""
    rows = assignment.collect()
    out: dict = {}
    for r in rows:
        dataset = r["dataset"] if "dataset" in assignment.columns else "default"
        out.setdefault(r["split"], {}).setdefault(dataset, []).append(str(r[subject_col]))
    for datasets in out.values():
        for k in datasets:
            datasets[k] = sorted(datasets[k])
    return out


def write_records_orc(
    df: DataFrame, path: str, order_by: Sequence[str],
    partition_by: Sequence[str] = (), mode: str = "overwrite",
) -> None:
    """[ext] ORC twin of :func:`write_records` — canonical sort + atomic
    commit in Spark's other native columnar format (zlib by default)."""
    writer = df.orderBy(*order_by).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_jsonl_shards(
    df: DataFrame, path: str, shard_col: str, n_shards: int = 16,
    mode: str = "overwrite",
) -> None:
    """[ext] Sharded JSONL corpus export — the interchange format every
    LLM-data pipeline emits. Shard assignment is md5(shard_col) mod
    n_shards (deterministic across engines/runs, the keyed_rand idiom),
    written as ``shard=<i>/`` partition directories so a downstream
    reader can open one shard without listing the rest; one file per
    shard via repartition on the shard key (shards stay balanced because
    the key is a hash). Reread with ``readers.jsonl_document_scan`` on
    ``path/shard=*/*.json``."""
    from pyspark.sql import functions as F

    if "shard" in df.columns:
        raise ValueError(
            "write_jsonl_shards: the frame already has a 'shard' column — "
            "the sink derives its own shard assignment and partitions on "
            "it; rename the input column (r12 review)"
        )
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(shard_col).cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(int(n_shards)),
    ).cast("int").alias("shard")
    (
        df.withColumn("shard", shard)
        .repartition(int(n_shards), "shard")
        .write.mode(mode)
        .partitionBy("shard")
        .json(path)
    )
