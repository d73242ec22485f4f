"""[ext] Data-layout management: Z-order clustering for multi-dimensional
file/row-group pruning — the lakehouse technique (Delta OPTIMIZE ZORDER BY,
Iceberg sort orders) Spark lacks natively.

Why it matters at 100 TB: parquet pruning is driven by per-file and
per-row-group min/max statistics. A table sorted by ONE column prunes
filters on that column only; a Z-order curve interleaves the bits of
several columns so records close in the multi-dimensional key space land in
the same files — point/range predicates on ANY of the Z columns then skip
most files. The whole implementation is plain column arithmetic + one
range repartition: Catalyst/Tungsten execute everything; nothing here is a
UDF.

``z_value`` is exact integer bit-interleaving, so its math is
cross-engine verifiable (the driver query ``ev_zorder_value`` restates it
in DuckDB with the same shifts and masks).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_positions(widths: Sequence[int]) -> list[tuple[int, int, int]]:
    """The MSB-first Morton bit map: (column j, source bit i, z position).

    Round r takes each column's bit (widths[j]-1-r) — its r-th MOST
    significant bit — and appends it below the previous round's bits, so
    every column contributes to the TOP of the Z value and a range
    partition on the Z prefix splits all columns, not just the widest.
    (An LSB-first interleave puts the widest column's high bits alone on
    top and collapses the curve to a single-column sort — measured exactly
    that on the 4-bit × 6-bit events layout.)

    Shared by the Spark expression and the DuckDB oracle generator so the
    two engines can never drift.
    """
    if sum(widths) > 63:
        raise ValueError(f"sum of bit widths {sum(widths)} exceeds a signed 64-bit Z value")
    out = []
    pos = sum(widths) - 1
    for r in range(max(widths)):
        for j, w in enumerate(widths):
            if r < w:
                out.append((j, w - 1 - r, pos))
                pos -= 1
    return out


def z_value(buckets: Sequence[Column], bits: int | Sequence[int] = 16) -> Column:
    """Interleave each bucket column's bits (MSB-first Morton) into one Z
    value.

    ``buckets`` must already be non-negative integers in [0, 2^bits_j) —
    produce them with ``ntile``, quantile bucketing, or plain modular
    arithmetic, whichever matches the column's distribution. ``bits`` may
    be one width for all columns or a per-column list: SIZE EACH WIDTH TO
    THE COLUMN'S REAL CARDINALITY — a column given more bits than it uses
    contributes constant-zero bits at the top of the curve.

    Pure integer expression — stays in whole-stage codegen, exactly
    reproducible in any engine with shift/mod arithmetic (the DuckDB
    oracle restates it from the same :func:`morton_positions` map).
    """
    n = len(buckets)
    if n == 0:
        raise ValueError("z_value needs at least one bucket column")
    widths = [bits] * n if isinstance(bits, int) else list(bits)
    if len(widths) != n:
        raise ValueError(f"{len(widths)} bit widths for {n} columns")
    z = F.lit(0).cast("long")
    for j, i, pos in morton_positions(widths):
        z = z + ((F.shiftright(buckets[j].cast("long"), i) % 2) * F.lit(1 << pos).cast("long"))
    return z


def zorder_write(
    df: DataFrame, path: str, buckets: dict[str, Column],
    bits: int | Sequence[int] = 16, n_files: int = 8,
) -> None:
    """Write ``df`` Z-ordered on the given bucket columns: range-partition
    by the Z PREFIX (top ``log2(n_files)`` bits) with the full Z value as
    tiebreaker, sort within each partition, so both FILE-level and
    row-group min/max stats become selective on every Z column. One
    range-exchange is the whole cost.

    Partitioning on the prefix — not the raw Z — matters: the range
    partitioner picks equal-FREQUENCY boundaries by sampling, which land
    mid-cell on a raw Z and let every file straddle two bit-cells; the
    prefix snaps boundaries to the Morton grid so each file covers whole
    cells and per-column min/max ranges stay tight."""
    import math

    widths = [bits] * len(buckets) if isinstance(bits, int) else list(bits)
    # clamp: more prefix bits than the curve has would shift by a
    # NEGATIVE count (Java masks it to 63 ⇒ _zb = 0 for every row),
    # silently degrading the grid-snapped boundaries to raw-_z ranges —
    # the exact failure the prefix exists to prevent (r11 review)
    prefix_bits = min(
        max(int(math.ceil(math.log2(max(n_files, 2)))), 1), sum(widths)
    )
    z = z_value(list(buckets.values()), bits)
    # fresh working names (r14 review): user "_z"/"_zb" columns were
    # silently overwritten and dropped from the written table
    from qcardia_data_spark.operators.joins import fresh_name

    z_c = fresh_name("_z", df.columns)
    zb_c = fresh_name("_zb", [*df.columns, z_c])
    (
        df.withColumn(z_c, z)
        .withColumn(zb_c, F.shiftright(F.col(z_c), sum(widths) - prefix_bits))
        .repartitionByRange(n_files, zb_c, z_c)
        .sortWithinPartitions(z_c)
        .drop(z_c, zb_c)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_files(
    spark, src: str, dst: str, target_mb: int = 256,
    order_by: Sequence[str] | None = None,
) -> int:
    """[ext] Small-file compaction — rewrite a parquet directory into
    files near ``target_mb`` each, the standing maintenance op every
    long-lived 100 TB table needs (streaming sinks and incremental
    appends accrete KB-scale files whose per-file open/footer/task
    overhead eventually dominates scans; `_batch=`-partitioned survivor
    sinks and index appends in this repo are exactly such producers).

    File count is sized from the source's actual COMPRESSED bytes
    (parquet→parquet rewrite preserves encoding, so source bytes are an
    honest estimate of output bytes), never from row counts or sampled
    row widths. Two layouts:

    - ``order_by=None``: ``coalesce`` — ZERO shuffle; each output file
      concatenates input partitions. Right when the source layout is
      already acceptable and only the file count is wrong.
    - ``order_by=[cols]``: one ``repartitionByRange`` exchange + in-file
      sort — equal-frequency files with tight per-file min/max on the
      order columns, so compaction doubles as a pruning-layout rebuild
      (the cheaper single-axis sibling of :func:`zorder_write`).

    Returns the output file count. Scale note: on a real cluster the
    listing comes from the same FileIndex the scan uses (`inputFiles`),
    so no driver directory walk of 100 TB — it is one metadata pass.
    """
    import math
    import os

    reader = spark.read.parquet(src)
    files = reader.inputFiles()
    if not files:
        raise ValueError(f"compact_files: no parquet files under {src!r}")

    def _size(uri: str) -> int:
        # local fast path; any other scheme (s3a/hdfs/abfs) goes through
        # the Hadoop FileSystem API — os.path.getsize on a scheme URI
        # raised FileNotFoundError and killed the op on a real cluster
        # (r11 review)
        if uri.startswith("file:"):
            return os.path.getsize(uri[len("file:"):])
        if "://" not in uri:
            return os.path.getsize(uri)
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(uri)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs.getFileStatus(p).getLen()

    total = sum(_size(f) for f in files)
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    if order_by:
        out = reader.repartitionByRange(n_files, *order_by).sortWithinPartitions(
            *order_by
        )
    else:
        out = reader.coalesce(n_files)
    out.write.mode("overwrite").parquet(dst)
    return n_files


def file_stats(spark, path: str, col: str) -> list[tuple[str, object, object]]:
    """Per-file (min, max) of ``col`` — the statistics the reader's pruning
    consults, surfaced for layout-quality audits and tests."""
    import os

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(path, name)
        row = spark.read.parquet(p).agg(
            F.min(col).alias("mn"), F.max(col).alias("mx")
        ).collect()[0]
        out.append((name, row["mn"], row["mx"]))
    return out
