"""S11 PNG sink: pure-stdlib codec round-trip + executor-side folder layout
(reference data_predictor.py:337-414 semantics, no PIL)."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.sources.png import decode_png, encode_png
from qcardia_data_spark.sources.writers import write_png_slices


def test_png_roundtrip_grayscale():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(17, 23), dtype=np.uint8)
    data = encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = decode_png(data)
    assert out.shape == (17, 23)
    assert np.array_equal(out, img)


def test_png_roundtrip_rgb():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(9, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_ihdr_fields():
    data = encode_png(np.zeros((5, 7), dtype=np.uint8))
    # first chunk after signature must be IHDR with (w=7, h=5, depth=8, ct=0)
    (length,) = struct.unpack(">I", data[8:12])
    assert data[12:16] == b"IHDR" and length == 13
    w, h, depth, ct, comp, filt, inter = struct.unpack(">IIBBBBB", data[16:29])
    assert (w, h, depth, ct, comp, filt, inter) == (7, 5, 8, 0, 0, 0, 0)


def test_png_crc_validated():
    data = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
    data[40] ^= 0xFF  # corrupt a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_png_rejects_bad_dtype_and_shape():
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((4, 4), dtype=np.float32))
    with pytest.raises(ValueError, match="shape|expects"):
        encode_png(np.zeros((4, 4, 2), dtype=np.uint8))


def test_write_png_slices_subject_folders(spark, tmp_path):
    """Executor-side write: per-subject folders, *255→uint8 scaling, and the
    files decode back to the expected pixels."""
    rows = []
    expected = {}
    rng = np.random.RandomState(2)
    for subj in ["mm1_A00", "mm1_B01"]:
        for sl in range(2):
            img = np.round(rng.uniform(0, 1, size=(6, 8)), 4)
            name = f"{subj}-{sl:02}-00_image"
            rows.append((subj, name, img.flatten().tolist(), 6, 8))
            expected[(subj, name)] = (img * 255.0).astype(np.uint8)
    df = spark.createDataFrame(
        rows, "folder string, name string, pixels array<double>, h int, w int"
    ).repartition(3)
    out = str(tmp_path / "example_slices")
    write_png_slices(df, out, "folder", "name", "pixels", "h", "w")

    for (subj, name), exp in expected.items():
        path = os.path.join(out, subj, f"{name}.png")
        assert os.path.exists(path), path
        with open(path, "rb") as f:
            got = decode_png(f.read())
        assert np.array_equal(got, exp)


def test_write_png_slices_rgb_channel_first(spark, tmp_path):
    """channels=3 takes channel-first data and permutes to HWC like the
    reference's permute([1,2,0])."""
    chw = np.round(np.random.RandomState(3).uniform(0, 1, size=(3, 4, 5)), 4)
    df = spark.createDataFrame(
        [("s1", "p_probs", chw.flatten().tolist(), 4, 5)],
        "folder string, name string, pixels array<double>, h int, w int",
    )
    out = str(tmp_path / "probs")
    write_png_slices(df, out, "folder", "name", "pixels", "h", "w", channels=3)
    with open(os.path.join(out, "s1", "p_probs.png"), "rb") as f:
        got = decode_png(f.read())
    exp = (chw.transpose(1, 2, 0) * 255.0).astype(np.uint8)
    assert got.shape == (4, 5, 3)
    assert np.array_equal(got, exp)
