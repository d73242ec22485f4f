#!/usr/bin/env python
"""Medical-imaging ETL demo on REAL bytes — the reference's ``setup_cine``
lifecycle (mm1.py:29-80) end-to-end with the pure-Python codecs:

1. fabricate a raw study: NIfTI cine volumes + a DICOM series (no
   nibabel/pydicom/PIL anywhere — ``sources/nifti.py`` / ``dicom.py``)
2. NIfTI path: binaryFile scan → decode → reformat (frames, ED/ES, border
   crop) → NIfTI record sink → PNG example-slice sink
3. DICOM path: scan → tag-validated decode → per-series slice regroup →
   series affine → voxel spacing

Usage: python examples/medical_etl.py [work_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from qcardia_data_spark import get_spark  # noqa: E402
from qcardia_data_spark.reformat import reformat_volumes  # noqa: E402
from qcardia_data_spark.sources.dicom import encode_dicom  # noqa: E402
from qcardia_data_spark.sources.multimodal import (  # noqa: E402
    decode_dicom,
    dicom_series_affine,
    group_slices_by_position,
)
from qcardia_data_spark.sources.nifti import encode_nifti1  # noqa: E402
from qcardia_data_spark.sources.writers import (  # noqa: E402
    write_nifti_records,
    write_png_slices,
)
from qcardia_data_spark.functions.volumes import spacing_from_affine  # noqa: E402


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="qds-med-")
    raw_nii = os.path.join(work, "raw_nii")
    raw_dcm = os.path.join(work, "raw_dcm")
    os.makedirs(raw_nii, exist_ok=True)
    os.makedirs(raw_dcm, exist_ok=True)

    rng = np.random.RandomState(0)
    for i in range(4):  # 4 subjects, 10×8×3 cine with zero borders
        vol = np.zeros((10, 8, 3), dtype=np.float32)
        vol[2:8, 1:7, :] = rng.rand(6, 6, 3).astype(np.float32) + 0.1
        aff = np.diag([1.25, 1.25, 8.0, 1.0])
        with open(os.path.join(raw_nii, f"subj{i}.nii.gz"), "wb") as f:
            f.write(encode_nifti1(vol, aff, compress=True))
    n = 0
    for z in (30.0, 20.0, 10.0):  # one DICOM series, 3 slices × 2 phases
        for t in (1, 2):
            n += 1
            data = encode_dicom(
                (rng.rand(6, 5) * 1000).astype("<u2"), series_uid="1.2.3",
                instance_number=n, position=(0.0, 0.0, z),
                orientation=(1, 0, 0, 0, 1, 0), n_temporal=2, temporal_id=t,
                pixel_spacing=(1.4, 1.4), slice_thickness=10.0,
            )
            with open(os.path.join(raw_dcm, f"im{n:03}.dcm"), "wb") as f:
                f.write(data)

    spark = get_spark(app_name="qds-medical-etl", shuffle_partitions=8)

    # ---- NIfTI path -------------------------------------------------------
    records, metadata = reformat_volumes(
        spark, raw_nii, glob="*.nii*", dataset="demo", n_frames=3, codec="nii"
    )
    records = records.cache()
    print("reformatted records:", records.count())
    metadata.orderBy("subject").show(truncate=False)

    recs = records.select(
        "file_id", "pixels", F.array("height", "width").alias("shape")
    )
    write_nifti_records(
        recs, os.path.join(work, "records_nii"), "file_id", "crop", "pixels", "shape"
    )
    write_png_slices(
        records.select(
            F.col("subject").alias("folder"),
            F.concat_ws("_", "file_id", F.lit("image")).alias("name"),
            F.col("pixels"), F.col("height").alias("h"), F.col("width").alias("w"),
        ),
        os.path.join(work, "example_slices"), "folder", "name", "pixels", "h", "w",
    )
    print("NIfTI + PNG sinks written under", work)

    # ---- DICOM path -------------------------------------------------------
    decoded = decode_dicom(spark.read.format("binaryFile").load(raw_dcm))
    grouped = group_slices_by_position(
        decoded, ["pos_x", "pos_y", "pos_z"], [0.0, 0.0, 1.0], series_col="series_uid"
    )
    grouped.select("path", "series_uid", "slice_nr", "temporal_pos").orderBy(
        "slice_nr", "temporal_pos"
    ).show(truncate=False)
    affines = dicom_series_affine(grouped)
    affines.select(
        "series_uid", "n_slices", spacing_from_affine(F.col("affine")).alias("spacing")
    ).show(truncate=False)

    print("demo complete; artifacts under", work)
    spark.stop()


if __name__ == "__main__":
    main()
