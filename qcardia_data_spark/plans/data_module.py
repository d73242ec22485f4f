"""Config-driven pipeline facade — the reference's ``DataModule`` lifecycle
re-expressed on Spark (SURVEY §3.1 stages 1-8).

Reference flow (``src/qcardia_data/pipeline/data_module.py``):
``DataModule(config)`` → ``setup()`` (resolve split, fingerprint, cache,
build transforms, route files, compute weights) → ``train_dataloader()``.

Engine flow: ``DataModule(spark, config)`` → ``setup()`` (compile source
pipeline, materialize to a fingerprint-keyed parquet cache, resolve the
subject-level split, route records) → ``frame("train")`` (filtered, weighted
lazy DataFrame — the serving surface; iterate with ``toLocalIterator`` or
feed ``foreachBatch``).

Config keys::

    sf_dir: str                  # catalog root for table sources
    cache_root: str              # where materialized caches live
    pipeline: [ ...spec ops... ] # the heavy build (plans.spec grammar)
    subject_col: str             # group-level split key
    split: {valid_fraction: float, seed: any}  # or {assignments: {subject: split}}
    weight_cols: [str]           # inverse-frequency weighting strata
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcardia_data_spark.operators.aggregates import group_weights_window
from qcardia_data_spark.operators.windows import seeded_split
from qcardia_data_spark.plans.cache import materialize, read_cache, route_splits
from qcardia_data_spark.plans.spec import compile_pipeline


class DataModule:
    def __init__(self, spark: SparkSession, config: dict):
        self.spark = spark
        self.config = config
        self._routed: DataFrame | None = None
        self.cache_path: str | None = None
        self.was_built: bool | None = None

    # -- lifecycle ---------------------------------------------------------
    def setup(self) -> "DataModule":
        cfg = self.config
        self.cache_path, self.was_built = materialize(
            self.spark,
            build=lambda: compile_pipeline(self.spark, cfg["pipeline"], cfg.get("sf_dir")),
            cache_root=cfg["cache_root"],
            # cache identity = pipeline AND the data directory it compiles
            # against — without sf_dir the same pipeline at two scales
            # collided on one cache path and silently served the other's
            # data (the spec-level "cache" op fixed this in r10; r11
            # review found the DataModule twin)
            spec={"pipeline": cfg["pipeline"], "sf_dir": cfg.get("sf_dir")},
        )
        records = read_cache(self.spark, self.cache_path)
        assignment = self._resolve_split(records)
        self._routed = route_splits(records, assignment, on=[cfg["subject_col"]])
        return self

    def _resolve_split(self, records: DataFrame) -> DataFrame:
        """Subject-level split: explicit assignment table when provided
        (reference data_split.py:43-49 honors split files), else the seeded
        shuffle split over *distinct subjects* (data_split.py:73-84)."""
        cfg = self.config
        subject = cfg["subject_col"]
        split_cfg = cfg.get("split", {})
        if "assignments" in split_cfg:
            rows = [(k, v) for k, v in split_cfg["assignments"].items()]
            return self.spark.createDataFrame(rows, [subject, "split"])
        subjects = records.select(subject).distinct()
        return seeded_split(
            subjects, subject,
            float(split_cfg.get("valid_fraction", 0.2)),
            split_cfg.get("seed", 0),
        )

    # -- serving -----------------------------------------------------------
    def frame(self, split: str) -> DataFrame:
        """Lazy, filtered, weighted record frame for one split (the
        dataloader analog; weights = inverse group frequency over
        ``weight_cols``, reference pipeline/utils.py:88-135)."""
        if self._routed is None:
            raise RuntimeError("call setup() first")
        out = self._routed.filter(F.col("split") == split)
        weight_cols = self.config.get("weight_cols")
        if weight_cols:
            out = group_weights_window(out, weight_cols)
        return out

    def iter_pandas_batches(
        self, split: str, batch_size: int = 128, shuffle_seed=None, epoch: int = 0,
        mode: str = "per_batch",
    ):
        """Serving iterator — the ``DataLoader`` analog (reference
        data_module.py:101-166): yields pandas batches of the split's
        records, optionally shuffled by a seeded, epoch-dependent key
        (same (seed, epoch) ⇒ same order; new epoch ⇒ new permutation —
        what the reference's per-epoch DataLoader shuffle provides).

        Batch numbers come from a *distributed* global numbering: the frame
        is range-partitioned on the (seeded) order key, each partition
        numbers its own rows, and partition offsets (a per-partition count —
        ``n_partitions`` rows, driver-small) are broadcast-joined back. The
        result is bit-identical to ``row_number() OVER (ORDER BY ...)`` —
        range partitions hold contiguous key ranges, so local rank +
        preceding-partition offset = global rank — but with no
        single-partition sort stage (the round-1 scale hazard). Each batch is
        then a pruned filter + toPandas over the persisted frame. At cluster
        scale the same frame feeds ``foreachBatch`` / a Volcano-style reader
        instead; the batch assignment logic is identical.

        ``mode`` picks the driver-side fetch strategy (identical batches
        either way):

        - ``"per_batch"`` (default): one pruned filter+``toPandas`` job per
          batch over the persisted frame — random access, cheap restarts,
          right for interactive stepping.
        - ``"stream"``: ONE pass via ``toLocalIterator`` over the frame in
          global ``_rn`` order. The ordering costs one distributed
          range-exchange + per-partition sort (NOT a single-task funnel —
          Spark's orderBy plans rangepartitioning; needed because the
          numbering window's ``partitionBy(_pid)`` hash-shuffled the range
          layout away). Partitions then stream to the driver with prefetch,
          one Spark job per partition instead of one per batch — right for
          long epochs (the r4 verdict's ask).
        """
        import pandas as pd

        if mode not in ("per_batch", "stream"):
            raise ValueError(f"mode must be 'per_batch' or 'stream', got {mode!r}")
        part, numbered = self._numbered_frame(split, batch_size, shuffle_seed, epoch)
        try:
            if mode == "stream":
                out_cols = [c for c in numbered.columns if c not in ("_rn", "_batch")]
                cur: int | None = None
                buf: list[dict] = []
                for row in (
                    numbered.orderBy("_rn")
                    .toLocalIterator(prefetchPartitions=True)
                ):
                    d = row.asDict()
                    b = d.pop("_batch")
                    d.pop("_rn")
                    if cur is not None and b != cur:
                        yield pd.DataFrame(buf, columns=out_cols)
                        buf = []
                    cur = b
                    buf.append(d)
                if buf:
                    yield pd.DataFrame(buf, columns=out_cols)
                return
            n_batches = numbered.agg(F.max("_batch")).collect()[0][0]
            part.unpersist()  # numbered is materialized; drop the staging cache
            if n_batches is None:
                return
            for b in range(n_batches + 1):
                yield (
                    numbered.filter(F.col("_batch") == b)
                    .orderBy("_rn")
                    .drop("_rn", "_batch")
                    .toPandas()
                )
        finally:
            part.unpersist()
            numbered.unpersist()

    def _numbered_frame(self, split, batch_size, shuffle_seed, epoch):
        """Build the batch-numbered frame (exposed for plan-property tests).

        Returns ``(staging, numbered)`` — both persisted; caller unpersists.
        """
        from pyspark.sql.window import Window

        from qcardia_data_spark.operators.windows import keyed_rand

        df = self.frame(split)
        subject = self.config["subject_col"]
        if shuffle_seed is not None:
            # hash key = subject + EVERY simple-typed column: the old
            # (subject, first-column) pair tied whenever several records
            # shared it, and tie order fell back to partition-internal
            # arrival order — breaking the (seed, epoch) ⇒ same-order
            # contract (r11 review). Complex payloads (array/struct/map/
            # binary) enter the key through a cheap JVM xxhash64 digest
            # rather than the md5 string path (ADVICE r11: rows identical
            # in every scalar can still differ in a payload column, and
            # their placement across a batch boundary must not depend on
            # arrival order). Map-bearing types go through to_json first
            # — Spark's hash family refuses MapType directly.
            complex_prefixes = ("array", "struct", "map", "binary")
            key_cols = [F.col(subject)]
            for c, t in df.dtypes:
                if c in (subject, "split"):
                    continue
                if not t.startswith(complex_prefixes):
                    key_cols.append(F.col(c))
                elif "map<" in t:
                    key_cols.append(F.xxhash64(F.to_json(F.col(c))))
                else:
                    key_cols.append(F.xxhash64(F.col(c)))
            order = [keyed_rand(f"{shuffle_seed}|{epoch}", *key_cols)] + key_cols
        else:
            order = [F.col(subject)]

        n_parts = int(self.spark.conf.get("spark.sql.shuffle.partitions", "200"))
        part = (
            df.repartitionByRange(n_parts, *order)
            .sortWithinPartitions(*order)
            .withColumn("_pid", F.spark_partition_id())
            .persist()
        )
        # offsets: n_partitions rows — the unpartitioned window runs over
        # this tiny frame, never over the records themselves
        w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        offsets = (
            part.groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .withColumn("_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)))
            .select("_pid", "_off")
        )
        w_local = Window.partitionBy("_pid").orderBy(*order)
        numbered = (
            part.withColumn("_lrn", F.row_number().over(w_local))
            .join(F.broadcast(offsets), "_pid")
            .withColumn("_rn", (F.col("_off") + F.col("_lrn")).cast("int"))
            .withColumn("_batch", ((F.col("_rn") - 1) / batch_size).cast("int"))
            .drop("_pid", "_lrn", "_off")
            .persist()
        )
        return part, numbered

    def summary(self) -> DataFrame:
        """Files & subjects per split (reference ``print_dataset_summary``,
        pipeline/utils.py:74-83)."""
        if self._routed is None:
            raise RuntimeError("call setup() first")
        return self._routed.groupBy("split").agg(
            F.count(F.lit(1)).alias("n_records"),
            F.countDistinct(self.config["subject_col"]).alias("n_subjects"),
        )
