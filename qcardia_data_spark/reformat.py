"""Raw → reformatted ETL — the ``setup_cine`` lifecycle (SURVEY §3.2) as a
distributed Spark pipeline.

Reference flow (``src/qcardia_data/setup/reformat/mm1.py:29-80`` — a SERIAL
per-subject tqdm loop; SURVEY §3.2 calls this "the motivating gap"):
per subject: load volume → orientation fix → border crop → ED/ES detection
→ write normalized volume + metadata row.

Engine flow: ``binaryFile`` scan (embarrassingly parallel, one task per
file-partition) → mapInPandas decode → frame explode → mask volumes →
ED/ES (relational argmax) → border crop → file-id → parquet records +
metadata table. Idempotence comes from the cache layer (C1/C2): the whole
reformat is ``materialize()``-wrapped, so a completed run is a no-op and a
crashed run is repaired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcardia_data_spark.functions.arrays import file_id
from qcardia_data_spark.functions.volumes import border_crop_udf, ed_es_selection, mask_volume
from qcardia_data_spark.sources.multimodal import decode_image, frame_sample
from qcardia_data_spark.sources.readers import binary_file_scan


def reformat_volumes(
    spark: SparkSession,
    raw_dir: str,
    glob: str = "*.bin",
    dataset: str = "ds",
    height: int = 8,
    width: int = 8,
    n_frames: int = 4,
    codec: str = "fake",
) -> tuple[DataFrame, DataFrame]:
    """Returns (records, subject_metadata).

    records: one row per (subject, frame) — cropped plane + provenance.
    subject_metadata: one row per subject — ED/ES frames + frame count
    (the reformatted-CSV analog, reference mm1.py:72-75).

    ``codec="nii"`` decodes REAL NIfTI-1 bytes via the pure-Python codec
    (sources/nifti.py) — last axis treated as the frame axis, exactly the
    reference's (x, y, t) cine layout (mm1.py:47-48); ``height``/``width``
    are then read from the decoded shape, not the arguments.
    """
    blobs = binary_file_scan(spark, raw_dir, glob=glob)
    if codec == "nii":
        from qcardia_data_spark.sources.multimodal import decode_nifti

        decoded = decode_nifti(blobs).select(
            "path",
            F.element_at("shape", 1).alias("height"),
            F.element_at("shape", 2).alias("width"),
            F.element_at("shape", 3).alias("n_frames"),
            "pixels",
            "payload_bytes",
        )
    else:
        decoded = decode_image(codec, height, width, n_frames)(blobs)
    subject = F.regexp_extract(F.element_at(F.split("path", "/"), -1), r"([^.]+)", 1)
    decoded = decoded.withColumn("subject", subject)

    frames = frame_sample(decoded, keep_frames=list(range(n_frames)))
    frames = frames.withColumn(
        "subject", F.regexp_extract(F.element_at(F.split("path", "/"), -1), r"([^.]+)", 1)
    )

    # label analog: threshold the plane — gives nonempty masks whose volume
    # varies per frame (stands in for the segmentation channel)
    with_mask = frames.withColumn(
        "volume", mask_volume(F.transform("pixels", lambda e: F.when(e > 0.6, e).otherwise(F.lit(0.0))))
    )
    ed_es = ed_es_selection(with_mask, "subject", "frame_nr")

    crop = border_crop_udf()
    cropped = with_mask.withColumn("c", crop("pixels", "height", "width")).select(
        "subject", "frame_nr", "volume",
        F.col("c.pixels").alias("pixels"),
        F.col("c.height").alias("height"),
        F.col("c.width").alias("width"),
        F.col("c.y0").alias("y0"),
        F.col("c.x0").alias("x0"),
    )

    records = (
        cropped.join(F.broadcast(ed_es), "subject", "left")
        .withColumn("is_ed", F.col("frame_nr") == F.col("ed_frame"))
        .withColumn("is_es", F.col("frame_nr") == F.col("es_frame"))
        .withColumn(
            "file_id",
            file_id(F.lit(dataset), F.col("subject"), F.lit(None).cast("int"), F.col("frame_nr")),
        )
    )

    metadata = (
        records.groupBy("subject")
        .agg(
            F.count(F.lit(1)).alias("total_nr_frames"),
            F.max("ed_frame").alias("ED"),
            F.max("es_frame").alias("ES"),
            F.sum("volume").alias("total_mask_volume"),
        )
        .withColumn("dataset", F.lit(dataset))
    )
    return records, metadata
