"""Pure-Python DICOM reader: tag parse (explicit + implicit VR LE), the
reference's required-tag validation (reformat/utils.py:157-168), temporal
ordering fallback, and the Spark series-regroup pipeline on real bytes."""

from __future__ import annotations

import struct

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


def test_dicom_series_affine_matches_reference_formula(spark, tmp_path):
    """F14b: relational affine build equals the reference get_affine_from_dicom
    numpy formula (reformat/utils.py:244-303) for multi- and single-slice
    series, and spacing_from_affine recovers the pixel spacing."""
    from qcardia_data_spark.functions.volumes import spacing_from_affine
    from qcardia_data_spark.sources.multimodal import dicom_series_affine

    ori = (0.0, 1.0, 0.0, -1.0, 0.0, 0.0)  # row dir +y, col dir -x
    ps = (1.2, 0.8)
    zs = [30.0, 20.0, 10.0]  # slice_nr 0 at max projected z
    n = 0
    d_multi = tmp_path / "multi"
    d_multi.mkdir()
    for z in zs:
        n += 1
        _, data = _mk(instance=n, pos=(5.0, -3.0, z), pixel_spacing=ps)
        data = encode_dicom(
            np.zeros((4, 4), dtype=np.uint8), series_uid="9.9.9", instance_number=n,
            position=(5.0, -3.0, z), orientation=ori, pixel_spacing=ps,
            slice_thickness=2.5,
        )
        (d_multi / f"m{n}.dcm").write_bytes(data)

    decoded = decode_dicom(spark.read.format("binaryFile").load(str(d_multi)))
    grouped = group_slices_by_position(
        decoded, pos_cols=["pos_x", "pos_y", "pos_z"], normal=[0.0, 0.0, 1.0]
    )
    out = dicom_series_affine(grouped).collect()
    assert len(out) == 1 and out[0]["n_slices"] == 3
    got = np.array(out[0]["affine"]).reshape(4, 4)

    # reference formula in numpy: first slice = highest projected position
    image_position = np.array([5.0, -3.0, 30.0])
    last_position = np.array([5.0, -3.0, 10.0])
    orientation = np.array(ori)
    spacing = np.array(ps)
    step = (last_position - image_position) / 2
    exp = np.array([
        [-orientation[3] * spacing[1], -orientation[0] * spacing[0], -step[0], -image_position[0]],
        [-orientation[4] * spacing[1], -orientation[1] * spacing[0], -step[1], -image_position[1]],
        [orientation[5] * spacing[1], orientation[2] * spacing[0], step[2], image_position[2]],
        [0, 0, 0, 1],
    ])
    assert np.allclose(got, exp)

    # F14 chained: spacing from the built affine
    sp_row = (
        dicom_series_affine(grouped)
        .select(spacing_from_affine(F.col("affine")).alias("sp"))
        .collect()[0]["sp"]
    )
    assert np.allclose(sorted(sp_row), sorted([0.8, 1.2, 10.0]))


def test_dicom_single_slice_affine_uses_thickness_normal(spark, tmp_path):
    from qcardia_data_spark.sources.multimodal import dicom_series_affine

    data = encode_dicom(
        np.zeros((4, 4), dtype=np.uint8), series_uid="1.1", instance_number=1,
        position=(0.0, 0.0, 5.0), orientation=(1, 0, 0, 0, 1, 0),
        pixel_spacing=(2.0, 2.0), slice_thickness=3.0,
    )
    (tmp_path / "one.dcm").write_bytes(data)
    decoded = decode_dicom(spark.read.format("binaryFile").load(str(tmp_path)))
    grouped = group_slices_by_position(
        decoded, pos_cols=["pos_x", "pos_y", "pos_z"], normal=[0.0, 0.0, 1.0]
    )
    got = np.array(dicom_series_affine(grouped).collect()[0]["affine"]).reshape(4, 4)
    # cross((1,0,0),(0,1,0)) = (0,0,1); step = (0,0,3); LPS→RAS flips x/y rows
    exp = np.array([
        [0.0, -2.0, 0.0, 0.0],
        [-2.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 3.0, 5.0],
        [0, 0, 0, 1],
    ])
    assert np.allclose(got, exp)


def test_multi_series_grouping_is_per_series_and_partitioned(spark, tmp_path):
    """Two interleaved series: slice numbering restarts per series and the
    rank window partitions by series_uid (no single-task global sort)."""
    n = 0
    for uid, zs in [("1.1.1", [40.0, 20.0]), ("2.2.2", [35.0, 15.0, 25.0])]:
        for z in zs:
            n += 1
            data = encode_dicom(
                np.zeros((2, 2), dtype=np.uint8), series_uid=uid, instance_number=n,
                position=(0.0, 0.0, z), orientation=(1, 0, 0, 0, 1, 0),
            )
            (tmp_path / f"f{n}.dcm").write_bytes(data)
    decoded = decode_dicom(spark.read.format("binaryFile").load(str(tmp_path)))
    grouped = group_slices_by_position(
        decoded, pos_cols=["pos_x", "pos_y", "pos_z"], normal=[0.0, 0.0, 1.0],
        series_col="series_uid",
    )
    rows = grouped.select("series_uid", "pos_z", "slice_nr").collect()
    got = {(r["series_uid"], r["pos_z"]): r["slice_nr"] for r in rows}
    assert got == {
        ("1.1.1", 40.0): 0, ("1.1.1", 20.0): 1,
        ("2.2.2", 35.0): 0, ("2.2.2", 25.0): 1, ("2.2.2", 15.0): 2,
    }
    # the rank window must carry the series partition spec — a global
    # (unpartitioned) window would funnel every file through one task
    plan = grouped._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(series_uid" in plan.lower().replace(" ", "")


# ---------------------------------------------------------------------------
# RLE Lossless (PS3.5 Annex G)
# ---------------------------------------------------------------------------
def test_packbits_roundtrip_property():
    from qcardia_data_spark.sources.dicom import _packbits_decode, _packbits_encode

    rng = np.random.default_rng(17)
    cases = [
        b"", b"\x00", b"ab", b"a" * 300, bytes(rng.integers(0, 256, 500, dtype=np.uint8)),
        b"aaabbbcdefggggg" * 9,
        bytes(rng.integers(0, 3, 1000, dtype=np.uint8)),  # run-heavy
    ]
    for plane in cases:
        enc = _packbits_encode(plane)
        assert _packbits_decode(enc, len(plane)) == plane


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_rle_dicom_roundtrip(dtype):
    from qcardia_data_spark.sources.dicom import (
        TAG_TRANSFER_SYNTAX,
        TS_RLE,
        encode_dicom,
        parse_dicom,
        pixel_array,
    )

    rng = np.random.default_rng(29)
    hi = 250 if dtype == np.uint8 else 4000
    px = rng.integers(0, hi, size=(9, 7)).astype(dtype)
    # add runs so the RLE actually compresses something
    px[2:5, :] = 7
    blob = encode_dicom(
        px, series_uid="1.2.3.4", instance_number=5,
        position=(1.0, 2.0, 3.0), orientation=(1, 0, 0, 0, 1, 0), rle=True,
    )
    tags = parse_dicom(blob)
    assert tags[TAG_TRANSFER_SYNTAX] == TS_RLE
    got = pixel_array(tags)
    assert got.dtype.itemsize == px.dtype.itemsize
    assert np.array_equal(got.astype(np.int64), px.astype(np.int64))


def test_rle_dicom_through_spark_decode_stage(spark, tmp_path):
    """E2E: RLE files on disk → binary scan → decode_dicom mapInPandas —
    the compressed transfer syntax rides the same Spark plumbing."""
    from qcardia_data_spark.sources.dicom import encode_dicom
    from qcardia_data_spark.sources.multimodal import decode_dicom
    from qcardia_data_spark.sources.readers import binary_file_scan

    rng = np.random.default_rng(31)
    d = tmp_path / "rle_series"
    d.mkdir()
    want = {}
    for i in range(3):
        px = rng.integers(0, 3000, size=(6, 8)).astype(np.uint16)
        want[f"sl_{i}.dcm"] = px
        (d / f"sl_{i}.dcm").write_bytes(encode_dicom(
            px, series_uid="9.8.7", instance_number=i + 1,
            position=(0.0, 0.0, float(i)), orientation=(1, 0, 0, 0, 1, 0),
            rle=True,
        ))
    rows = decode_dicom(binary_file_scan(spark, str(d), glob="*.dcm")).collect()
    assert len(rows) == 3
    for r in rows:
        name = r["path"].rsplit("/", 1)[-1]
        got = np.array(r["pixels"]).reshape(r["rows"], r["cols"])
        assert np.array_equal(got, want[name].astype(np.float32))


def test_jpeg_transfer_syntax_still_fails_loudly():
    from qcardia_data_spark.sources.dicom import TAG_TRANSFER_SYNTAX, encode_dicom, parse_dicom

    blob = encode_dicom(
        np.zeros((2, 2), dtype=np.uint8), series_uid="1", instance_number=1,
        position=(0, 0, 0), orientation=(1, 0, 0, 0, 1, 0),
    )
    # splice a JPEG baseline UID into the meta group
    jpeg = blob.replace(b"1.2.840.10008.1.2.1\x00", b"1.2.840.10008.1.2.4.50")
    with pytest.raises(NotImplementedError, match="JPEG"):
        parse_dicom(jpeg)
    assert TAG_TRANSFER_SYNTAX is not None


def test_multiframe_rle_refused_loudly():
    """Multi-fragment (multi-frame cine) encapsulated data must raise, not
    silently decode frame 1 only."""
    from qcardia_data_spark.sources.dicom import (
        _TAG_ITEM,
        _TAG_SEQ_DELIM,
        TAG_PIXEL_DATA,
        encode_dicom,
        parse_dicom,
        pixel_array,
        rle_encode_frame,
    )

    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    blob = encode_dicom(
        px, series_uid="1.2", instance_number=1,
        position=(0, 0, 0), orientation=(1, 0, 0, 0, 1, 0), rle=True,
    )
    # splice a second fragment into the encapsulated stream
    frame = rle_encode_frame(px)
    one = struct.pack("<HHI", *_TAG_ITEM, len(frame)) + frame
    delim = struct.pack("<HHI", *_TAG_SEQ_DELIM, 0)
    blob2 = blob.replace(one + delim, one + one + delim)
    tags = parse_dicom(blob2)
    assert isinstance(tags[TAG_PIXEL_DATA], tuple) and len(tags[TAG_PIXEL_DATA]) == 2
    with pytest.raises(NotImplementedError, match="multi-frame"):
        pixel_array(tags)


# ---------------------------------------------------------------------------
# JPEG Baseline (Process 1) transfer syntax — round 4
# ---------------------------------------------------------------------------


def test_jpeg_codec_constant_roundtrip_exact():
    import numpy as np

    from qcardia_data_spark.sources.jpeg import decode_jpeg, encode_jpeg_gray

    img = np.full((16, 24), 97, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_gray(img, 100)), img)


def test_jpeg_codec_gradient_and_odd_sizes():
    import numpy as np

    from qcardia_data_spark.sources.jpeg import decode_jpeg, encode_jpeg_gray

    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_gray(img, 100))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1

    odd = np.clip(
        np.add.outer(np.linspace(0, 200, 19), np.linspace(0, 200, 13)), 0, 255
    ).astype(np.uint8)
    out2 = decode_jpeg(encode_jpeg_gray(odd, 100))
    assert out2.shape == odd.shape
    assert int(np.abs(out2.astype(int) - odd.astype(int)).max()) <= 1


def test_jpeg_codec_lossy_bounded_and_errors():
    import numpy as np
    import pytest

    from qcardia_data_spark.sources.jpeg import decode_jpeg, encode_jpeg_gray

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_gray(img, 90))
    err = np.abs(out.astype(int) - img.astype(int))
    assert float(err.mean()) < 8.0  # quality-90 on noise: bounded distortion
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_dicom_jpeg_baseline_pixel_array():
    import numpy as np

    from qcardia_data_spark.sources import dicom as D

    x = np.linspace(0, 255, 32)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    blob = D.encode_dicom(
        img, series_uid="1.2.3.4", instance_number=1,
        position=(0.0, 0.0, 0.0), orientation=(1, 0, 0, 0, 1, 0),
        jpeg=True, jpeg_quality=100,
    )
    tags = D.parse_dicom(blob)
    assert tags[D.TAG_TRANSFER_SYNTAX] == D.TS_JPEG_BASELINE
    D.validate_dicom_tags(tags, "fixture.dcm")
    arr = D.pixel_array(tags)
    assert arr.shape == img.shape and arr.dtype == np.uint8
    assert int(np.abs(arr.astype(int) - img.astype(int)).max()) <= 1


def test_dicom_jpeg_rejects_12bit_and_multiframe():
    import numpy as np
    import pytest

    from qcardia_data_spark.sources import dicom as D

    img16 = np.arange(64, dtype="<u2").reshape(8, 8)
    with pytest.raises(ValueError, match="8-bit"):
        D.encode_dicom(
            img16, series_uid="1.2", instance_number=1,
            position=(0, 0, 0), orientation=(1, 0, 0, 0, 1, 0), jpeg=True,
        )


def test_dicom_jpeg_spark_decode_path(spark):
    """JPEG-baseline DICOM flows through the Spark mapInPandas decode
    (multimodal.decode_dicom) like any other transfer syntax."""
    import numpy as np

    from qcardia_data_spark.sources import dicom as D
    from qcardia_data_spark.sources.multimodal import decode_dicom

    x = np.linspace(0, 255, 16)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    blobs = [
        ("mem://a.dcm", D.encode_dicom(
            img, series_uid="9.8.7", instance_number=i + 1,
            position=(0.0, 0.0, float(i)), orientation=(1, 0, 0, 0, 1, 0),
            jpeg=True, jpeg_quality=100,
        ))
        for i in range(2)
    ]
    df = spark.createDataFrame(blobs, ["path", "content"])
    out = decode_dicom(df).orderBy("instance_number").collect()
    assert [r["instance_number"] for r in out] == [1, 2]
    got = np.array(out[0]["pixels"], dtype=np.float32).reshape(16, 16)
    assert int(np.abs(got - img.astype(np.float32)).max()) <= 1


def test_jpeg_color_444_and_420_roundtrip():
    import numpy as np

    from qcardia_data_spark.sources.jpeg import decode_jpeg, encode_jpeg_color

    x = np.linspace(0, 255, 40)
    base = np.add.outer(x, np.linspace(0, 100, 56)) / 1.5
    img = np.stack(
        [np.clip(base, 0, 255), np.clip(base * 0.7 + 30, 0, 255), np.clip(255 - base, 0, 255)],
        axis=-1,
    ).astype(np.uint8)
    out444 = decode_jpeg(encode_jpeg_color(img, 100, "444"))
    assert out444.shape == img.shape
    assert int(np.abs(out444.astype(int) - img.astype(int)).max()) <= 3

    # 4:2:0 exercises the MCU interleave (2x2 Y blocks) + chroma upsample;
    # constant-chroma content round-trips tight
    solid = np.full((24, 24, 3), (90, 140, 200), dtype=np.uint8)
    out420 = decode_jpeg(encode_jpeg_color(solid, 100, "420"))
    assert int(np.abs(out420.astype(int) - solid.astype(int)).max()) <= 1


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn path: bit realignment + DC predictor reset every N MCUs."""
    import numpy as np

    from qcardia_data_spark.sources.jpeg import decode_jpeg, encode_jpeg_gray

    x = np.linspace(0, 255, 48)
    img = np.clip(np.add.outer(x, np.linspace(0, 180, 64)) / 1.7, 0, 255).astype(np.uint8)
    blob = encode_jpeg_gray(img, 100, restart_interval=3)
    assert b"\xff\xdd" in blob  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))  # RSTn emitted
    out = decode_jpeg(blob)
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1
    # and identical content to the no-restart encoding
    base = decode_jpeg(encode_jpeg_gray(img, 100))
    assert np.array_equal(out, base)


def test_jpeg_color_422_roundtrip():
    """4:2:2 exercises the ASYMMETRIC upsample (horizontal-only chroma)."""
    import numpy as np

    from qcardia_data_spark.sources.jpeg import decode_jpeg, encode_jpeg_color

    solid = np.full((24, 40, 3), (200, 90, 60), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_color(solid, 100, "422"))
    assert out.shape == solid.shape
    assert int(np.abs(out.astype(int) - solid.astype(int)).max()) <= 1


def test_jpeg_truncated_scan_raises_value_error():
    import numpy as np
    import pytest

    from qcardia_data_spark.sources.jpeg import decode_jpeg, encode_jpeg_gray

    img = np.clip(np.add.outer(np.linspace(0, 200, 32), np.linspace(0, 200, 32)), 0, 255).astype(np.uint8)
    blob = encode_jpeg_gray(img, 90)
    # chop INSIDE the entropy data (after SOS + a sliver), re-append EOI
    sos = blob.index(b"\xff\xda")
    cut = blob[: sos + 20] + b"\xff\xd9"
    with pytest.raises(ValueError, match="truncated|ends inside"):
        decode_jpeg(cut)
    # and a cut inside the DHT header fails as a malformed table, not an
    # IndexError
    dht = blob.index(b"\xff\xc4")
    with pytest.raises(ValueError):
        decode_jpeg(blob[: dht + 12] + b"\xff\xd9")


def test_dicom_jpeg_multifragment_soi_guard():
    """A non-conforming multi-frame cine (multiple complete JPEG streams in
    the fragment list, NumberOfFrames tag absent) must refuse loudly, not
    silently decode frame 1 — mirrors the RLE fragment-count guard."""
    import numpy as np
    import pytest

    from qcardia_data_spark.sources import dicom as D

    x = np.linspace(0, 255, 16)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    blob = D.encode_dicom(
        img, series_uid="1.2.3", instance_number=1,
        position=(0.0, 0.0, 0.0), orientation=(1, 0, 0, 0, 1, 0),
        jpeg=True, jpeg_quality=100,
    )
    tags = D.parse_dicom(blob)
    frags = tags[D.TAG_PIXEL_DATA]
    assert isinstance(frags, tuple) and len(frags) == 1
    # a second fragment that is its own JPEG stream = hidden second frame
    tags[D.TAG_PIXEL_DATA] = (frags[0], frags[0])
    with pytest.raises(NotImplementedError, match="SOI"):
        D.pixel_array(tags)
    # but a frame genuinely SPLIT across fragments (PS3.5 A.4) still decodes
    half = len(frags[0]) // 2
    tags[D.TAG_PIXEL_DATA] = (frags[0][:half], frags[0][half:])
    arr = D.pixel_array(tags)
    assert int(np.abs(arr.astype(int) - img.astype(int)).max()) <= 1


def test_jpeg_progressive_roundtrip_matches_baseline():
    """Both progressive scripts decode bit-identically to the baseline
    pipeline across smooth, sparse, noisy and flat content — the SA script
    exercises DC/AC first+refinement scans, EOBn runs and correction bits."""
    import numpy as np

    from qcardia_data_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:77, 0:61]
    smooth = (
        (np.sin(xx / 9.0) + np.cos(yy / 7.0)) * 60 + 128 + rng.normal(0, 3, (77, 61))
    ).clip(0, 255).astype(np.uint8)
    sparse = np.full((64, 64), 128, np.uint8)
    sparse[10:20, 10:30] = 200
    sparse[40:48, 5:60] = 60
    noise = rng.integers(0, 256, (56, 72), dtype=np.uint8)
    flat = np.full((40, 40), 77, np.uint8)
    for img, q in ((smooth, 100), (sparse, 85), (noise, 50), (flat, 90)):
        base = decode_jpeg(encode_jpeg_gray(img, quality=q))
        for script in ("spectral", "sa"):
            prog = decode_jpeg(
                encode_jpeg_gray_progressive(img, quality=q, script=script)
            )
            assert (prog == base).all(), (img.shape, q, script)


def test_jpeg_progressive_errors():
    import numpy as np
    import pytest

    from qcardia_data_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg_gray_progressive,
    )

    img = np.full((24, 24), 99, np.uint8)
    data = encode_jpeg_gray_progressive(img, quality=90)
    # truncating inside the last scan must fail loudly, not return pixels
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])
    with pytest.raises(ValueError, match="script"):
        encode_jpeg_gray_progressive(img, script="nope")


def test_dicom_jpeg_progressive_pixel_array():
    """TS 1.2.840.10008.1.2.4.55 flows through pixel_array like baseline."""
    import numpy as np

    from qcardia_data_spark.sources import dicom as D

    x = np.linspace(0, 255, 32)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    blob = D.encode_dicom(
        img, series_uid="1.2.3.5", instance_number=1,
        position=(0.0, 0.0, 0.0), orientation=(1, 0, 0, 0, 1, 0),
        jpeg=True, jpeg_quality=100, jpeg_progressive=True,
    )
    tags = D.parse_dicom(blob)
    assert tags[D.TAG_TRANSFER_SYNTAX] == D.TS_JPEG_PROGRESSIVE
    arr = D.pixel_array(tags)
    assert arr.shape == img.shape and arr.dtype == np.uint8
    assert int(np.abs(arr.astype(int) - img.astype(int)).max()) <= 1


def test_jpeg_12bit_extended_roundtrip():
    """SOF1 12-bit Extended (Pq=1 quant tables, wide Huffman categories):
    smooth content within ±1 at q100, flat exact, full-range safe."""
    import numpy as np
    import pytest

    from qcardia_data_spark.sources.jpeg import decode_jpeg, encode_jpeg_gray12

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:70, 0:53]
    smooth = (
        (np.sin(xx / 8.0) + np.cos(yy / 6.0)) * 900 + 2048
        + rng.normal(0, 20, (70, 53))
    ).clip(0, 4095).astype(np.uint16)
    out = decode_jpeg(encode_jpeg_gray12(smooth, quality=100))
    assert out.dtype == np.uint16 and out.shape == smooth.shape
    assert int(np.abs(out.astype(int) - smooth.astype(int)).max()) <= 1
    flat = np.full((24, 24), 3000, np.uint16)
    assert (decode_jpeg(encode_jpeg_gray12(flat, quality=90)) == flat).all()
    extremes = np.zeros((16, 16), np.uint16)
    extremes[:8, :] = 4095
    assert (
        decode_jpeg(encode_jpeg_gray12(extremes, quality=100)) == extremes
    ).all()
    with pytest.raises(ValueError, match="4095"):
        encode_jpeg_gray12(np.full((8, 8), 5000, np.uint16))
    with pytest.raises(ValueError, match="uint16"):
        encode_jpeg_gray12(np.zeros((8, 8), np.uint8))


def test_dicom_jpeg_extended_pixel_array():
    """TS 1.2.840.10008.1.2.4.51 (12-bit Extended) end-to-end."""
    import numpy as np

    from qcardia_data_spark.sources import dicom as D

    x = np.linspace(0, 4095, 32)
    img = np.clip(np.add.outer(x, x) / 2, 0, 4095).astype(np.uint16)
    blob = D.encode_dicom(
        img, series_uid="1.2.3.6", instance_number=1,
        position=(0.0, 0.0, 0.0), orientation=(1, 0, 0, 0, 1, 0),
        jpeg=True, jpeg_quality=100, jpeg_extended=True,
    )
    tags = D.parse_dicom(blob)
    assert tags[D.TAG_TRANSFER_SYNTAX] == D.TS_JPEG_EXTENDED
    arr = D.pixel_array(tags)
    assert arr.shape == img.shape and arr.dtype == np.dtype("<u2")
    assert int(np.abs(arr.astype(int) - img.astype(int)).max()) <= 1


def test_jpeg_decoder_robust_to_corruption():
    """Fuzz: flipping/truncating bytes anywhere in a valid stream
    (baseline, progressive, 12-bit) must either decode to SOME array or
    raise ValueError/NotImplementedError — never crash, hang, or index
    out of bounds."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from qcardia_data_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_gray12,
        encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(3)
    img8 = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    streams = [
        encode_jpeg_gray(img8, quality=85),
        encode_jpeg_gray_progressive(img8, quality=85, script="sa"),
        encode_jpeg_gray12((img8.astype(np.uint16) * 16), quality=85),
    ]

    @settings(max_examples=120, deadline=None)
    @given(
        si=st.integers(0, len(streams) - 1),
        mode=st.sampled_from(["flip", "truncate", "insert"]),
        pos=st.integers(2, 4000),
        val=st.integers(0, 255),
    )
    def fuzz(si, mode, pos, val):
        data = streams[si]
        pos = pos % (len(data) - 2) + 1
        if mode == "flip":
            mutated = data[:pos] + bytes([data[pos] ^ (val or 1)]) + data[pos + 1 :]
        elif mode == "truncate":
            mutated = data[:pos]
        else:
            mutated = data[:pos] + bytes([val]) + data[pos:]
        try:
            out = decode_jpeg(mutated)
            assert out.ndim in (2, 3)
        except (ValueError, NotImplementedError):
            pass

    fuzz()


def test_jpeg_12bit_progressive_matches_sequential():
    """12-bit SOF2 (both scripts) decodes bit-identically to the 12-bit
    sequential pipeline — the four progressive scan kinds at 12-bit
    magnitude categories (DC size <= 15, AC size <= 14)."""
    import numpy as np

    from qcardia_data_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg_gray12,
        encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:70, 0:53]
    img = (
        (np.sin(xx / 8.0) + np.cos(yy / 6.0)) * 900 + 2048
        + rng.normal(0, 20, (70, 53))
    ).clip(0, 4095).astype(np.uint16)
    seq = decode_jpeg(encode_jpeg_gray12(img, quality=100))
    for script in ("spectral", "sa"):
        prog = decode_jpeg(
            encode_jpeg_gray_progressive(img, quality=100, script=script, precision=12)
        )
        assert prog.dtype == np.uint16
        assert (prog == seq).all(), script
