"""Pure-Python DICOM reader: tag parse (explicit + implicit VR LE), the
reference's required-tag validation (reformat/utils.py:157-168), temporal
ordering fallback, and the Spark series-regroup pipeline on real bytes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.sources.dicom import (
    TAG_INSTANCE_NUMBER,
    TAG_MANUFACTURER,
    TAG_ORIENTATION,
    TAG_POSITION,
    TAG_SERIES_UID,
    encode_dicom,
    parse_dicom,
    pixel_array,
    temporal_position,
    validate_dicom_tags,
)
from qcardia_data_spark.sources.multimodal import decode_dicom, group_slices_by_position


def _mk(instance=1, pos=(0.0, 0.0, 10.0), n_temporal=1, temporal_id=None, **kw):
    rng = np.random.RandomState(instance)
    px = rng.randint(0, 4096, size=(6, 5)).astype("<u2")
    return px, encode_dicom(
        px, series_uid="1.2.3.4", instance_number=instance,
        position=pos, orientation=(1, 0, 0, 0, 1, 0),
        n_temporal=n_temporal, temporal_id=temporal_id, **kw,
    )


def test_parse_explicit_vr_roundtrip():
    px, data = _mk(instance=7, pos=(1.5, -2.0, 30.0))
    tags = parse_dicom(data)
    assert tags[TAG_SERIES_UID] == "1.2.3.4"
    assert tags[TAG_INSTANCE_NUMBER] == [7]
    assert tags[TAG_POSITION] == [1.5, -2.0, 30.0]
    assert tags[TAG_ORIENTATION] == [1, 0, 0, 0, 1, 0]
    assert tags[TAG_MANUFACTURER] == "TESTVENDOR"
    assert np.array_equal(pixel_array(tags), px)


def test_parse_implicit_vr_roundtrip():
    px, data = _mk(instance=3, implicit=True)
    tags = parse_dicom(data)
    assert tags[TAG_INSTANCE_NUMBER] == [3]
    assert np.array_equal(pixel_array(tags), px)


def test_validation_names_missing_tag_and_file():
    _, data = _mk(omit_tags=(TAG_ORIENTATION,))
    tags = parse_dicom(data)
    with pytest.raises(ValueError, match="ImageOrientationPatient not found in /x/f1.dcm"):
        validate_dicom_tags(tags, source="/x/f1.dcm")


def test_not_a_dicom():
    with pytest.raises(ValueError, match="DICM"):
        parse_dicom(b"\x00" * 200)


def test_temporal_position_fallback_chain():
    # single temporal position → InstanceNumber orders the stack
    _, single = _mk(instance=9, n_temporal=1)
    assert temporal_position(parse_dicom(single)) == 9
    # multi-phase → TemporalPositionIdentifier wins
    _, multi = _mk(instance=9, n_temporal=4, temporal_id=2)
    assert temporal_position(parse_dicom(multi)) == 2


def test_spark_dicom_series_regroup(spark, tmp_path):
    """3 slice positions × 4 phases, written shuffled: decode in Spark,
    bucket by projected position, order phases per slice — the relational
    form of load_dicom_data (reference reformat/utils.py:185-215)."""
    positions = [(0.0, 0.0, z) for z in (30.0, 10.0, 20.0)]
    n = 0
    for si, pos in enumerate(positions):
        for t in range(1, 5):
            n += 1
            _, data = _mk(instance=n, pos=pos, n_temporal=4, temporal_id=t)
            (tmp_path / f"im{n:03}.dcm").write_bytes(data)

    decoded = decode_dicom(spark.read.format("binaryFile").load(str(tmp_path)))
    grouped = group_slices_by_position(
        decoded, pos_cols=["pos_x", "pos_y", "pos_z"], normal=[0.0, 0.0, 1.0]
    )
    rows = grouped.select("path", "slice_nr", "temporal_pos", "pos_z").collect()
    assert len(rows) == 12
    # slice_nr descends with projected position: z=30→0, 20→1, 10→2
    z_to_slice = {30.0: 0, 20.0: 1, 10.0: 2}
    for r in rows:
        assert r["slice_nr"] == z_to_slice[r["pos_z"]]
    # each slice holds exactly phases 1..4
    by_slice: dict = {}
    for r in rows:
        by_slice.setdefault(r["slice_nr"], []).append(r["temporal_pos"])
    assert all(sorted(v) == [1, 2, 3, 4] for v in by_slice.values())


def test_spark_dicom_invalid_file_fails_loudly(spark, tmp_path):
    _, good = _mk(instance=1)
    _, bad = _mk(instance=2, omit_tags=(TAG_POSITION,))
    (tmp_path / "ok.dcm").write_bytes(good)
    (tmp_path / "bad.dcm").write_bytes(bad)
    df = decode_dicom(spark.read.format("binaryFile").load(str(tmp_path)))
    with pytest.raises(Exception, match="ImagePositionPatient"):
        df.collect()
