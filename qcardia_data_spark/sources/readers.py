"""Readers (S1-S5).

- S1 CSV metadata scan: subject CSVs with string-typed ids (the reference
  forces ``SubjectID`` to str, ``utils.py:132-133`` — numeric-looking ids
  like "001" must not collapse to 1).
- S2/S3 binary scans: ``binaryFile`` datasource — (path, length, content)
  rows; decoding is a separate lazy stage (sources.multimodal).
- S4 cached-record scan: plain parquet (plans.cache.read_cache).
- S5 YAML/JSON spec scan: driver-side, tiny, feeds the spec compiler.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def csv_metadata_scan(
    spark: SparkSession, path: str, string_cols: Sequence[str] = ("SubjectID",),
) -> DataFrame:
    """S1 — header CSV with schema inference EXCEPT ``string_cols``, which
    are read as string FROM THE SOURCE (reference reads with
    ``dtype={'SubjectID': str}``). Casting after inference would destroy
    leading zeros ("001" → 1 → "1"); instead the inferred schema is patched
    and the file re-read, so "001" survives intact."""
    from pyspark.sql.types import StringType, StructField, StructType

    inferred = spark.read.option("header", True).option("inferSchema", True).csv(path).schema
    patched = StructType([
        StructField(f.name, StringType() if f.name in set(string_cols) else f.dataType,
                    f.nullable)
        for f in inferred
    ])
    return spark.read.option("header", True).schema(patched).csv(path)


def binary_file_scan(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """S2/S3 — binary payload scan: one row per file with (path,
    modificationTime, length, content). ``pathGlobFilter`` prunes at listing
    time — files that don't match are never opened."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def spec_scan(path: str) -> dict:
    """S5 — driver-side spec file load (YAML if available, else JSON).
    Mirrors ``load_yaml_config`` (reference utils.py:122-129)."""
    text = open(path).read()
    try:
        import yaml  # optional dep

        return yaml.safe_load(text)
    except ImportError:
        return json.loads(text)


def split_table_from_dict(spark: SparkSession, split_dict: dict) -> DataFrame:
    """S5 — split dict ``{split: {dataset: [subject,...]}}`` (the reference's
    persisted split YAML shape, data_split.py:80-86) → DataFrame
    (split, dataset, subject_id)."""
    rows = [
        (split, dataset, str(subject))
        for split, datasets in split_dict.items()
        for dataset, subjects in datasets.items()
        for subject in subjects
    ]
    return spark.createDataFrame(rows, ["split", "dataset", "subject_id"])


def jsonl_document_scan(
    spark: SparkSession,
    path: str,
    schema: "str | None" = "doc_id BIGINT, text STRING, lang STRING, source STRING",
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """[ext] JSONL corpus ingestion — the interchange format most public
    text corpora ship as (one JSON object per line).

    With an explicit ``schema`` (default: the engine's documents shape)
    the scan is single-pass, column-pruned, and malformed lines land in
    ``corrupt_col`` instead of killing the job (PERMISSIVE mode) — the
    caller audits ``WHERE _corrupt IS NOT NULL`` and decides; silently
    dropping bad lines would violate the refuse-loudly policy. Pass
    ``schema=None`` to infer (costs an extra pass — avoid at scale).

    NB (Spark restriction): Spark disallows raw-JSON queries whose pruned
    schema is only the corrupt column — materialize first
    (``df.localCheckpoint()`` / write to parquet), then audit
    ``WHERE _corrupt IS NOT NULL``. The parquet-ingest step a pipeline
    does anyway is exactly that materialization.
    """
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", corrupt_col
    )
    if schema is not None:
        reader = reader.schema(f"{schema}, {corrupt_col} STRING")
    return reader.json(path)


def read_meta_json(spark: SparkSession, path: str):
    """Read a one-row index/store meta file (``_sig_meta``, ``_cms_meta``,
    ``_lsh_meta``, ...) written by the JSON sink; ``None`` ONLY when the
    path does not exist (a pre-metadata or not-yet-created store).

    Every other failure re-raises: a bare ``except Exception`` here made a
    transient/permission/corrupt read on a REAL store indistinguishable
    from "store absent", so an append would overwrite the meta with the
    caller's geometry and silently bypass the geometry-drift guard
    (ADVICE r9). An empty meta directory (interrupted write) raises
    UNABLE_TO_INFER_SCHEMA — also NOT treated as absent, for the same
    reason; likewise a readable-but-ZERO-ROW meta (torn write leaving
    blank/empty JSON) raises instead of impersonating absence (r10
    self-review: the `rows[0] if rows else None` fallback re-opened the
    geometry-guard bypass this function exists to close)."""
    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.json(f"{path}").collect()
    except AnalysisException as e:
        if is_path_not_found(e):
            return None
        raise
    if not rows:
        raise ValueError(
            f"read_meta_json: meta at {path!r} exists but holds no rows — "
            "a torn/partial write; refusing to treat it as 'store absent' "
            "(delete or repair the meta file explicitly)"
        )
    return rows[0]


def read_meta_dict(spark: SparkSession, path: str) -> dict | None:
    """:func:`read_meta_json`, returned as a plain dict (None iff the
    path is absent) — the shape the `_read_*_meta` wrappers share."""
    row = read_meta_json(spark, path)
    if row is None:
        return None
    return {k: row[k] for k in row.asDict()}


def error_condition(e: Exception) -> str | None:
    """The AnalysisException error class/condition name (PySpark 4 names
    it getCondition, older getErrorClass), or None when unavailable."""
    get = getattr(e, "getCondition", None) or getattr(e, "getErrorClass", None)
    if get is None:
        return None
    try:
        return get()
    except Exception:
        return None


def is_path_not_found(e: Exception) -> bool:
    """True iff an AnalysisException means the read PATH does not exist
    (vs permission / corrupt-file / schema errors, which callers must
    surface, not swallow)."""
    cond = error_condition(e)
    return cond == "PATH_NOT_FOUND" or (
        cond is None and "Path does not exist" in str(e)
    )


def read_pruned_partitions(
    spark: SparkSession, root: str, part_col: str, values,
) -> DataFrame:
    """Read a ``part_col``-partitioned parquet table restricted to the
    partitions in ``values``, listing ONLY those partition directories.

    Equivalent to ``spark.read.parquet(root).filter(col(part_col)
    .isin(values))`` — same rows, same schema — but the plain form makes
    the driver list EVERY partition directory under ``root`` before
    pruning, an O(index) term that r14's append-scaling panel measured
    dominating standing-index probe wall time (winnow probe 9.3→27.3 s
    across a 4× index while post-pruning read VOLUME stayed flat ±1.7%).
    Here the probed directories — known driver-side, bounded by the
    probe's own bucket set — are passed to the reader directly with
    ``basePath`` set to the table root, so Spark's file index never
    touches unprobed directories (guide §6: manifest-style metadata
    beats directory listing at scale; the probe's bucket set IS the
    manifest for bucket-partitioned indexes).

    Existence is checked per directory against the live filesystem
    (never a side manifest file), so a concurrent/crashed append can
    never make this read MISS files the plain read would see. Falls back
    to the plain read — bit-identical semantics, including the error
    raised for a missing ``root`` — whenever ``values`` is empty, no
    probed directory exists, a value is not a plain int (partition-path
    escaping is only trivially correct for ints, which every engine
    bucket column uses), or schema inference over the probed subset
    fails (e.g. committed-but-empty directories).

    Partition-TYPE inference caveat (VERDICT r15 hardening): the probed
    listing infers ``part_col``'s type from the probed directories only,
    so an EXTERNAL table mixing small and ≥2³¹ partition values could
    infer int here where the full listing infers long. Unreachable for
    engine indexes — every writer's bucket values are int-typed and
    capped at 2**20 (pinned by
    ``test_engine_bucket_values_stay_int32_safe``) — and probes that
    touch a huge value agree with the plain read by construction
    (``test_mixed_magnitude_partition_values_schema_equality``).
    """
    from pyspark.errors import AnalysisException

    # materialize FIRST (ADVICE r15): if ``values`` is a one-shot iterator
    # and sorted(set(...)) raises on an unsortable mix, re-reading the
    # exhausted iterator in the except branch would silently yield an
    # empty filter instead of the intended values
    values = list(values)
    try:
        vals = sorted(set(values))
    except TypeError:  # unsortable mix — let the plain read adjudicate it
        vals = values

    def _fallback() -> DataFrame:
        return spark.read.parquet(root).filter(F.col(part_col).isin(vals))

    if not vals or not all(
        isinstance(v, int) and not isinstance(v, bool) for v in vals
    ):
        return _fallback()
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path
    jroot = jpath(root)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    qroot = fs.makeQualified(jroot)
    dirs = [
        str(p)
        for p in (jpath(qroot, f"{part_col}={v}") for v in vals)
        if fs.exists(p)
    ]
    if not dirs:
        return _fallback()
    try:
        pruned = spark.read.option("basePath", str(qroot)).parquet(*dirs)
    except AnalysisException:
        return _fallback()
    # the filter is semantic-parity insurance (and keeps the plan's
    # partition predicate visible); with the pruned listing it prunes
    # nothing further
    return pruned.filter(F.col(part_col).isin(vals))


def orc_scan(spark: SparkSession, path: str) -> DataFrame:
    """[ext] ORC source — Spark's other native columnar format (built-in
    reader, no extra jar): predicate pushdown + column pruning work the
    same as parquet, so an ORC-resident corpus plugs into every operator
    unchanged. Exists so a user migrating an ORC warehouse needs no
    conversion pass."""
    return spark.read.orc(path)
