"""Change-data-capture operators: SCD type-2 history build and a
partition-pruned merge-upsert over a persisted keyed table.

The reference engine has no CDC surface; these are [ext] operators for the
pipeline the engine targets at 100 TB: corpus metadata dimensions (document
registry, source catalog, per-user state) are maintained by exactly this
shape — "apply this batch of changed rows without rewriting the table".

Scale shape:

- ``scd2_from_changes`` is two window passes riding ONE per-key exchange:
  ``lag`` compresses consecutive no-change rows, and because the filter
  preserves the child's clustering and ordering, the follow-up
  ``lead``/``row_number`` pass reuses the same exchange — no second
  shuffle.
- ``upsert_write_partitioned`` lays the table out hash-bucketed on the
  merge key (md5-derived bucket: deterministic in any engine and under
  task retry, unlike ``rand()``-seeded layouts). ``merge_upsert_partitioned``
  reads ONLY the bucket partitions the batch touches (whole-FILE pruning,
  asserted via ``inputFiles`` in the test suite), resolves latest-wins
  inside those buckets, and dynamically overwrites just them. Untouched
  partitions are neither read nor rewritten: the merge cost is O(touched
  buckets + batch), not O(table) — a 64-key CDC batch against a 100 TB
  dimension touches at most 64 bucket directories.
- ``upsert_lookup`` is the serving-side point read: key → bucket → one
  partition directory scanned.

Storage contract (the ``_lsh_meta``/``_sig_meta`` pattern): build params
live in ``path/_merge_meta`` and every later merge/lookup derives its
bucketing from the table's own meta, so a caller can never bucket a batch
differently than the table it merges into (ADVICE r7: indexes whose probes
can silently drift from their build params are bugs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from qcardia_data_spark.sources.writers import cluster_for_partitioned_write

__all__ = [
    "scd2_from_changes",
    "upsert_write_partitioned",
    "merge_upsert_partitioned",
    "upsert_lookup",
    "read_upsert_table",
    "upsert_append_batch",
    "read_upsert_as_of",
    "compact_upsert_log",
    "table_diff",
]

_BUCKET = "up_bucket"


# ---------------------------------------------------------------------------
# SCD type-2 history from a change log
# ---------------------------------------------------------------------------


def scd2_from_changes(
    changes: DataFrame,
    key: str,
    ts: str,
    attrs: list[str] | tuple[str, ...],
    tiebreak: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change log.

    Input: one row per observed (key, ts, attrs...) state. Output: one row
    per *distinct consecutive state* (consecutive rows whose ``attrs`` all
    match are compressed into one validity interval) with::

        key, attrs..., valid_from, valid_to, version, is_current

    ``valid_from`` inclusive / ``valid_to`` exclusive (the next change's
    timestamp; NULL on the open current row), ``version`` a 1-based per-key
    ordinal, ``is_current`` true on the open row — the standard warehouse
    SCD2 columns.

    Determinism contract: rows within a key are ordered by (ts, tiebreak);
    pass ``tiebreak`` (e.g. an event id) whenever timestamps can tie, or
    the lag comparison is not reproducible. NULL attribute values compare
    null-safely (NULL -> NULL is "no change").

    Plan shape: one hash exchange on ``key``; the lag pass, the
    change-point filter, and the lead/row_number pass all ride it (the
    filter preserves child clustering+ordering, so Spark plans a single
    sort + three window operators with no second shuffle).
    """
    if not attrs:
        raise ValueError("scd2_from_changes: attrs must name >= 1 column")
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)

    differs: Column | None = None
    for a in attrs:
        d = ~F.col(a).eqNullSafe(F.lag(a).over(w))
        differs = d if differs is None else (differs | d)
    # first row per key: lag is NULL for every attr, but an attr that is
    # itself NULL would null-safe-match — mark the first row explicitly.
    # Fresh working name (r12 review): a user column literally named
    # _chg would be silently overwritten by the withColumn.
    from qcardia_data_spark.operators.joins import fresh_name

    is_first = F.row_number().over(w) == 1
    chg = fresh_name("_chg", changes.columns)
    pts = changes.withColumn(chg, is_first | differs).filter(F.col(chg))

    valid_to = F.lead(ts).over(w)
    return pts.select(
        key,
        *attrs,
        F.col(ts).alias("valid_from"),
        valid_to.alias("valid_to"),
        F.row_number().over(w).alias("version"),
        valid_to.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Partition-pruned merge-upsert over a persisted keyed table
# ---------------------------------------------------------------------------


def _bucket_of(key: Column, n_buckets: int) -> Column:
    """Deterministic hash bucket: first 8 md5 hex chars -> int, mod n.

    md5 (not Spark ``hash()``) so the layout is reproducible in any
    engine — the same idiom as ``keyed_rand`` / the DSIR buckets — and
    stable across Spark versions and task retries.

    NULL keys bucket like the empty string (coalesce before md5): an
    md5(NULL)=NULL bucket made every NULL-key stored row invisible to
    the merge's ``isin(touched)`` read while dynamic overwrite still
    replaced its partition — silent data loss for the NULL-key group
    (r10 review). The per-key window still separates NULL from '' keys;
    they merely share a bucket directory.
    """
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.coalesce(key.cast("string"), F.lit(""))), 1, 8
            ),
            16, 10,
        ).cast("long"),
        F.lit(int(n_buckets)),
    ).cast("int")


def _read_merge_meta(spark: SparkSession, path: str) -> dict | None:
    """None ONLY when the meta path is absent; other read errors re-raise
    (a swallowed permission/corrupt read would skip key/ts enforcement on
    a real table — the ADVICE-r9 CMS bug, same class)."""
    from qcardia_data_spark.sources.readers import read_meta_dict

    return read_meta_dict(spark, f"{path}/_merge_meta")


def _write_merge_meta(spark: SparkSession, path: str, meta: dict) -> None:
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("ts", T.StringType()),
            T.StructField("n_buckets", T.IntegerType()),
            T.StructField("key_type", T.StringType()),
        ]
    )
    row = tuple(meta[f.name] for f in schema.fields)
    spark.createDataFrame([row], schema).coalesce(1).write.mode(
        "overwrite"
    ).json(f"{path}/_merge_meta")


def upsert_write_partitioned(
    df: DataFrame,
    path: str,
    key: str,
    ts: str,
    n_buckets: int | str = 64,
) -> None:
    """Initialize a merge-upsert table: rows hash-bucketed on ``key`` into
    ``n_buckets`` partition directories, params frozen in ``_merge_meta``.

    ``n_buckets`` bounds later merges' driver-side bucket collection and
    sets the pruning grain: a batch touching k distinct keys reads at most
    min(k, n_buckets) directories. Size it so one bucket of the dimension
    fits an executor's working memory at the target scale — or pass
    ``"auto"`` (r14, the dedup-index writers' corpus-sized rule applied
    to the dimension): :func:`~qcardia_data_spark.functions.dedup.\
auto_index_buckets` sizes the count from the initial row count so
    per-bucket occupancy stays bounded; the resolved int is what the
    meta freezes (merges/lookups always derive from the meta, so the
    sizing choice is build-time only).

    COST NOTE (ADVICE r14): ``"auto"`` runs one extra ``df.count()``
    action before the write re-evaluates ``df`` — for an expensive or
    non-deterministic upstream plan, ``.persist()`` (or localCheckpoint)
    the frame first, or pass an explicit int. Sizing is approximate, so
    a count/write row drift on a non-deterministic plan affects only
    occupancy, never correctness. The same applies to the dedup-index
    writers' ``"auto"`` knobs (write_signature_index /
    write_winnow_index / write_hamming64_index).
    """
    for c in (key, ts):
        if c not in df.columns:
            raise ValueError(f"upsert_write_partitioned: no column {c!r}")
    if n_buckets == "auto":
        from qcardia_data_spark.functions.dedup import auto_index_buckets

        n_buckets = auto_index_buckets(df.count())
    # FULL reserved set, not just the bucket column (r13 review): a base
    # table carrying a `_batch`/`_src`/`_rn` data column would survive
    # this write, then read_upsert_as_of's withColumn("_batch", 0) /
    # the merge's withColumn("_src", ...) would silently OVERWRITE the
    # user's column and the terminal drop would delete it — the r10
    # carry-clash loss class, one layer earlier.
    _check_reserved(df, "upsert_write_partitioned")
    key_type = dict(df.dtypes)[key]
    (
        cluster_for_partitioned_write(
            df.withColumn(_BUCKET, _bucket_of(F.col(key), n_buckets)), _BUCKET
        )
        .write.mode("overwrite")
        .partitionBy(_BUCKET)
        .parquet(f"{path}/rows")
    )
    _write_merge_meta(
        df.sparkSession,
        path,
        {"key": key, "ts": ts, "n_buckets": int(n_buckets), "key_type": key_type},
    )


_RESERVED_COLS = frozenset({"_src", "_rn", "_batch", _BUCKET})


def _check_reserved(df: DataFrame, who: str) -> None:
    """Refuse frames whose data columns collide with the merge machinery's
    internal names — withColumn would silently OVERWRITE them and the
    final drop would delete the user's column from the rewritten
    partitions (r10 review; the carry-clash refusal rule)."""
    clash = _RESERVED_COLS & set(df.columns)
    if clash:
        raise ValueError(
            f"{who}: column(s) {sorted(clash)} collide with the upsert "
            f"machinery's reserved internal names {sorted(_RESERVED_COLS)} "
            "— rename them before writing"
        )


def _require_meta(spark: SparkSession, path: str, who: str) -> dict:
    meta = _read_merge_meta(spark, path)
    if meta is None:
        raise ValueError(
            f"{who}: no _merge_meta at {path!r} — not an upsert table "
            "(initialize with upsert_write_partitioned)"
        )
    return meta


def merge_upsert_partitioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    tiebreak: str | None = None,
) -> None:
    """Apply a CDC batch to a persisted upsert table, latest-wins.

    For every key present in ``updates``, the surviving row after the
    merge is the one with the greatest (ts, [tiebreak], source) among the
    stored row and the batch rows — source breaks exact ties in favor of
    the batch (an update that carries the same timestamp as the stored row
    is a correction and wins). Keys absent from the batch are untouched:
    their partitions are neither read nor rewritten.

    Replay-idempotent: merging the same batch twice is a no-op (latest-wins
    is associative/idempotent given a deterministic order — pass
    ``tiebreak`` whenever (key, ts) can repeat within a batch).

    Implementation: batch -> touched buckets (bounded driver collect,
    <= n_buckets rows) -> partition-pruned read of only those directories
    -> one per-key window inside the touched buckets -> ``localCheckpoint``
    materialization barrier -> dynamic partition overwrite of exactly the
    touched directories. The barrier is load-bearing: the merged frame is
    derived FROM the directories the write replaces, and a lazy plan would
    re-read them mid-overwrite (the dedup.py index-append lesson).
    """
    meta = _require_meta(spark, path, "merge_upsert_partitioned")
    _check_reserved(updates, "merge_upsert_partitioned")
    key, ts, n_buckets = meta["key"], meta["ts"], int(meta["n_buckets"])
    for c in (key, ts):
        if c not in updates.columns:
            raise ValueError(
                f"merge_upsert_partitioned: batch lacks column {c!r} "
                f"required by the table's _merge_meta at {path!r}"
            )
    if dict(updates.dtypes)[key] != meta["key_type"]:
        raise ValueError(
            "merge_upsert_partitioned: batch key type "
            f"{dict(updates.dtypes)[key]!r} != table key type "
            f"{meta['key_type']!r} (md5 bucketing casts to string — a "
            "mismatched type would bucket the same key differently)"
        )

    up = updates.withColumn(_BUCKET, _bucket_of(F.col(key), n_buckets))
    touched = [
        r[0] for r in up.select(_BUCKET).distinct().collect()
    ]  # bounded: <= n_buckets rows, by construction
    if not touched:
        return

    from qcardia_data_spark.sources.readers import read_pruned_partitions

    stored = read_pruned_partitions(spark, f"{path}/rows", _BUCKET, touched)
    order = [F.col(ts).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    order.append(F.col("_src").desc())
    w = Window.partitionBy(key).orderBy(*order)
    merged = (
        stored.withColumn("_src", F.lit(0))
        .unionByName(up.withColumn("_src", F.lit(1)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
        .localCheckpoint(eager=True)
    )

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        cluster_for_partitioned_write(merged, _BUCKET).write.mode(
            "overwrite"
        ).partitionBy(_BUCKET).parquet(f"{path}/rows")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_upsert_table(
    spark: SparkSession, path: str, include_bucket: bool = False
) -> DataFrame:
    """Read the current state of an upsert table (bucket column dropped
    unless requested — it is layout, not data)."""
    _require_meta(spark, path, "read_upsert_table")
    df = spark.read.parquet(f"{path}/rows")
    return df if include_bucket else df.drop(_BUCKET)


def upsert_lookup(
    spark: SparkSession, path: str, keys: list
) -> DataFrame:
    """Point lookup: current rows for the given keys, reading ONLY their
    bucket directories (the serving path — O(|keys|) partitions, not
    O(table); file pruning asserted in the test suite)."""
    meta = _require_meta(spark, path, "upsert_lookup")
    if not keys:
        raise ValueError("upsert_lookup: empty key list")
    key, n_buckets = meta["key"], int(meta["n_buckets"])
    # cast probe keys to the TABLE's key type (r12 review): an int probe
    # against a string-keyed table would md5-bucket consistently (the
    # bucket fn casts to string) but the semi join would go through
    # Spark's implicit numeric coercion — int 5 matching "05"/"5.0"-style
    # rows differently than the merge path did. ANSI cast fails loudly on
    # a genuinely unconvertible probe.
    kdf = spark.createDataFrame([(k,) for k in keys], [key]).select(
        F.col(key).cast(meta["key_type"]).alias(key)
    )
    buckets = sorted(
        {
            r[0]
            for r in kdf.select(
                _bucket_of(F.col(key), n_buckets).alias("b")
            ).collect()
        }
    )
    from qcardia_data_spark.sources.readers import read_pruned_partitions

    df = read_pruned_partitions(spark, f"{path}/rows", _BUCKET, buckets)
    vals = F.broadcast(kdf.distinct())
    return df.join(vals, key, "left_semi").drop(_BUCKET)


# ---------------------------------------------------------------------------
# Merge-on-read: append-log batches + as-of (time-travel) reads.
#
# merge_upsert_partitioned above is copy-on-write: each batch rewrites its
# touched bucket directories — cheapest READS (one file set, no merge at
# query time), O(touched buckets) write amplification per batch. The
# append-log form below is the merge-on-write-averse twin (the Hudi/
# Iceberg MOR tradeoff): a batch lands as an immutable `_batch=N`
# partition in O(batch) time regardless of how many buckets it touches,
# reads reconstruct latest-wins state on the fly (read amplification =
# #batches until compaction), and every historical state stays queryable
# — `read_upsert_as_of(batch=N)` is exact time travel. Compaction is just
# `merge_upsert_partitioned(read_upsert_as_of(...))` back into the base.
# ---------------------------------------------------------------------------


def _read_log(spark: SparkSession, log_dir: str):
    """The table's append log, or None when there is none — probed
    through the reader (portable to object stores). Two conditions mean
    "no log" BY DESIGN: path-not-found (no batch ever landed) and
    schema-inference failure on an existing-but-empty dir
    (compact_upsert_log deletes every _batch= partition but keeps the
    directory). Anything else re-raises (ADVICE r9 — a permission/
    corrupt-footer read must not silently read as 'empty log')."""
    from pyspark.errors import AnalysisException

    from qcardia_data_spark.sources.readers import (
        error_condition,
        is_path_not_found,
    )

    try:
        return spark.read.parquet(log_dir)
    except AnalysisException as e:
        if is_path_not_found(e) or error_condition(e) == "UNABLE_TO_INFER_SCHEMA":
            return None
        raise


def upsert_append_batch(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    batch_id: int | None = None,
) -> int:
    """Append a CDC batch to the table's log as the immutable partition
    ``_batch=<id>`` (bucketed on the merge key inside, so as-of point
    lookups still prune). Returns the batch id.

    ``batch_id=None`` auto-assigns max existing + 1. A caller-PINNED id
    that already exists is skipped (retry-idempotent, the exactly-once
    idiom of the streaming sinks); an auto-assigned id never collides
    because assignment lists the log first. Batch ids must be >= 1 —
    id 0 is the base table.
    """
    meta = _require_meta(spark, path, "upsert_append_batch")
    # r13 review: the append path had NO reserved-name check, so a batch
    # with its own `_batch` column was silently overwritten by the
    # partition-id withColumn below (the merge path refused the same
    # frame loudly — the two intake paths must agree)
    _check_reserved(updates, "upsert_append_batch")
    key, ts, n_buckets = meta["key"], meta["ts"], int(meta["n_buckets"])
    for c in (key, ts):
        if c not in updates.columns:
            raise ValueError(
                f"upsert_append_batch: batch lacks column {c!r} required "
                f"by the table's _merge_meta at {path!r}"
            )
    if dict(updates.dtypes)[key] != meta["key_type"]:
        raise ValueError(
            "upsert_append_batch: batch key type "
            f"{dict(updates.dtypes)[key]!r} != table key type "
            f"{meta['key_type']!r}"
        )
    log_dir = f"{path}/log"
    # list landed batch ids through the scan's partition discovery (NOT a
    # driver os.listdir — the table may live on an object store); the
    # distinct is over the partition column, bounded by #batches
    log = _read_log(spark, log_dir)
    existing = (
        {r["_batch"] for r in log.select("_batch").distinct().collect()}
        if log is not None
        else set()
    )
    if batch_id is None:
        batch_id = (max(existing) + 1) if existing else 1
    elif batch_id < 1:
        raise ValueError("upsert_append_batch: batch_id must be >= 1")
    elif batch_id in existing:
        return batch_id  # pinned replay: already landed, no-op
    (
        cluster_for_partitioned_write(
            updates.withColumn("_batch", F.lit(int(batch_id)))
            .withColumn(_BUCKET, _bucket_of(F.col(key), n_buckets)),
            _BUCKET,
        )
        .write.mode("append")
        .partitionBy("_batch", _BUCKET)
        .parquet(log_dir)
    )
    return batch_id


def read_upsert_as_of(
    spark: SparkSession,
    path: str,
    batch: int | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Current-state (latest-wins) read of base + log batches <= ``batch``
    (None = all): exact time travel — the state the table had after that
    batch landed. The ``_batch <= N`` predicate is a PARTITION filter, so
    later batches' files are never read.

    Order: greatest (ts, [tiebreak], batch) wins — a later batch beats an
    earlier one (and the base, batch 0) on exact ties, matching the
    copy-on-write merge's source rule.
    """
    meta = _require_meta(spark, path, "read_upsert_as_of")
    base = spark.read.parquet(f"{path}/rows").withColumn(
        "_batch", F.lit(0)
    )
    log = _read_log(spark, f"{path}/log")
    if log is not None:
        if batch is not None:
            log = log.filter(F.col("_batch") <= int(batch))
        combined = base.unionByName(log.select(*base.columns))
    else:
        combined = base
    order = [F.col(meta["ts"]).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    order.append(F.col("_batch").desc())
    w = Window.partitionBy(meta["key"]).orderBy(*order)
    return (
        combined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_batch", _BUCKET)
    )


def table_diff(
    before: DataFrame,
    after: DataFrame,
    key: str,
    compare: list[str] | tuple[str, ...] | None = None,
) -> DataFrame:
    """Snapshot diff: one row per key whose state differs between two
    table versions, tagged ``added`` / ``removed`` / ``changed`` — the
    audit companion of the upsert/as-of machinery (what DID that batch
    do?). ``compare`` limits change detection to those columns (default:
    every shared non-key column). NULLs compare null-safely.

    Output: (key, change, before/after struct columns) — ``b`` is NULL
    on added keys, ``a`` on removed ones.

    Plan: ONE full-outer equi-join on the key, change classification as
    map-side expressions — no window, no second shuffle. 100 TB: both
    sides shuffle once on the key; with bucketed/co-partitioned storage
    (layout.py) even that exchange drops out.
    """
    if compare is None:
        compare = [
            c for c in before.columns if c != key and c in set(after.columns)
        ]
    compare = list(compare)
    for side, df in (("before", before), ("after", after)):
        missing = [c for c in [key, *compare] if c not in df.columns]
        if missing:
            raise ValueError(f"table_diff: {side} lacks columns {missing}")
    b = before.select(
        F.col(key).alias("_kb"),
        F.struct(*[F.col(c) for c in compare]).alias("b"),
    )
    a = after.select(
        F.col(key).alias("_ka"),
        F.struct(*[F.col(c) for c in compare]).alias("a"),
    )
    j = b.join(a, b["_kb"] == a["_ka"], "full_outer")
    change = (
        F.when(F.col("_kb").isNull(), F.lit("added"))
        .when(F.col("_ka").isNull(), F.lit("removed"))
        .when(~F.col("b").eqNullSafe(F.col("a")), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            F.coalesce(F.col("_ka"), F.col("_kb")).alias(key),
            "change", "b", "a",
        )
    )


def compact_upsert_log(
    spark: SparkSession, path: str, up_to: int | None = None,
    tiebreak: str | None = None,
) -> int:
    """Fold log batches <= ``up_to`` (None = all) into the base table and
    DELETE the folded partitions — the MOR maintenance op that trades
    time travel below the horizon for read amplification 1. The fold is
    the existing copy-on-write merge over the as-of state, so post-
    compaction ``read_upsert_as_of(batch=None)`` is unchanged (test-
    asserted); batches ABOVE the horizon keep their exact as-of reads.

    Returns the number of log batches folded. The merged state is
    materialized (localCheckpoint inside the merge) BEFORE partitions
    are removed, so a crash between merge and delete leaves duplicate-
    but-idempotent data (latest-wins re-fold is a no-op), never loss.
    """
    _require_meta(spark, path, "compact_upsert_log")
    log = _read_log(spark, f"{path}/log")
    if log is None:
        return 0
    batches = [
        r["_batch"] for r in log.select("_batch").distinct().collect()
        if up_to is None or r["_batch"] <= int(up_to)
    ]
    if not batches:
        return 0
    state = read_upsert_as_of(spark, path, batch=max(batches),
                              tiebreak=tiebreak)
    merge_upsert_partitioned(spark, path, state, tiebreak=tiebreak)
    # FS-agnostic delete through the Hadoop FileSystem API: a local
    # shutil.rmtree was a silent no-op on scheme-qualified/object-store
    # paths (the folded batches stayed visible forever) and swallowed
    # local errors (r10 review)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for b in batches:
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/log/_batch={b}")
        fs = p.getFileSystem(hconf)
        if fs.exists(p) and not fs.delete(p, True):
            raise IOError(
                f"compact_upsert_log: failed to delete folded log "
                f"partition {path}/log/_batch={b}"
            )
    return len(batches)
