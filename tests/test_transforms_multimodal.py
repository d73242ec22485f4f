"""Tests for the UDF transform runtime (F6-F9), invertible resample
round-trip (F8), multimodal decode plumbing (S2/S3), and sinks."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from qcardia_data_spark.functions import transforms as TR
from qcardia_data_spark.sources import multimodal as MM
from qcardia_data_spark.sources import readers as R
from qcardia_data_spark.sources import writers as Wr


# ---------------------------------------------------------------------------
# keyed randomness
# ---------------------------------------------------------------------------
def test_keyed_uniform_deterministic_and_uniform(spark):
    df = spark.range(2000).withColumn("u", TR.keyed_uniform(42, "op", F.col("id")))
    a = [r["u"] for r in df.collect()]
    b = [r["u"] for r in df.collect()]  # recompute = same draws (retry safety)
    assert a == b
    assert all(0.0 <= u < 1.0 for u in a)
    assert abs(sum(a) / len(a) - 0.5) < 0.02  # uniform-ish mean
    # different op_id → independent stream
    df2 = spark.range(2000).withColumn("u", TR.keyed_uniform(42, "other", F.col("id")))
    assert [r["u"] for r in df2.collect()] != a


def test_rand_solarize_branches(spark):
    df = spark.createDataFrame(
        [(i, [0.1, 0.4, 0.9]) for i in range(40)], ["k", "arr"]
    ).withColumn("out", TR.rand_solarize(F.col("arr"), F.col("k"), threshold=0.5, prob=0.5))
    rows = df.collect()
    solarized = [r for r in rows if abs(r["out"][2] - 0.0) < 1e-9]  # 0.9→max-0.9=0.0
    untouched = [r for r in rows if abs(r["out"][2] - 0.9) < 1e-9]
    assert len(solarized) + len(untouched) == 40
    assert solarized and untouched  # both branches taken across keys


def test_rand_gaussian_noise_reproducible(spark):
    df = spark.createDataFrame([(1, [0.5] * 16)], ["k", "arr"]).withColumn(
        "out", TR.rand_gaussian_noise(F.col("arr"), F.col("k"), std=0.1)
    )
    a = df.collect()[0]["out"]
    b = df.collect()[0]["out"]
    assert a == b
    assert np.std(np.array(a) - 0.5) > 0.01  # noise actually applied


# ---------------------------------------------------------------------------
# invertible resample (F7/F8)
# ---------------------------------------------------------------------------
def _smooth_image(h, w):
    ys, xs = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    return (xs + 2 * ys).astype(np.float64)


def test_resample_roundtrip_identity_interior(spark):
    h = w = 32
    img = _smooth_image(h, w)
    df = spark.createDataFrame(
        [(1, img.ravel().tolist(), h, w)], ["k", "pixels", "h", "w"]
    ).withColumns({
        "rot": F.lit(0.3), "scale": F.lit(1.2), "tx": F.lit(0.05),
        "ty": F.lit(-0.05), "flip": F.lit(False),
    })
    fwd = TR.resample_2d_udf(h, w)
    res = df.withColumn("r", fwd("pixels", "h", "w", "rot", "scale", "tx", "ty", "flip"))
    res = res.select(
        "k",
        F.col("r.pixels").alias("pixels"),
        F.lit(h).alias("h"), F.lit(w).alias("w"),
        F.col("r.trace").alias("trace"),
    )
    inv = TR.inverse_resample_2d_udf()
    back = res.withColumn("orig", inv("pixels", "h", "w", "trace")).collect()[0]
    got = np.array(back["orig"]).reshape(h, w)
    # interior pixels round-trip (borders lose data to zero padding)
    c = slice(8, 24)
    assert np.abs(got[c, c] - img[c, c]).max() < 0.08


def test_resample_scale_up_is_crop_like(spark):
    h = w = 16
    img = _smooth_image(h, w)
    df = spark.createDataFrame([(1, img.ravel().tolist(), h, w)], ["k", "pixels", "h", "w"])
    fwd = TR.resample_2d_udf(h, w)
    out = df.withColumn(
        "r",
        fwd("pixels", "h", "w", F.lit(0.0), F.lit(2.0), F.lit(0.0), F.lit(0.0), F.lit(False)),
    ).collect()[0]["r"]
    got = np.array(out["pixels"]).reshape(h, w)
    # 2× zoom at center: center pixel value preserved, dynamic range shrinks
    assert abs(got[8, 8] - img[8, 8]) < 0.15
    assert got.max() - got.min() < (img.max() - img.min())


# ---------------------------------------------------------------------------
# multimodal plumbing (S2/S3)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def binary_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("blobs")
    for i in range(6):
        (d / f"scan_{i}.bin").write_bytes(os.urandom(64) if i else b"fixed")
    return str(d)


def test_binary_scan_and_fake_decode(spark, binary_dir):
    blobs = R.binary_file_scan(spark, binary_dir, glob="*.bin")
    assert blobs.count() == 6
    decoded = MM.decode_image("fake", height=4, width=5, n_frames=3)(blobs)
    rows = decoded.collect()
    assert len(rows) == 6
    for r in rows:
        assert (r["height"], r["width"], r["n_frames"]) == (4, 5, 3)
        assert len(r["pixels"]) == 4 * 5 * 3
    # determinism: same payload → same pixels
    again = decoded.collect()
    assert {r["path"]: r["pixels"] for r in rows} == {r["path"]: r["pixels"] for r in again}


def test_decode_image_dispatches_to_real_codecs(spark, binary_dir):
    # absent codec → loud NotImplementedError at STAGE-BUILD time
    with pytest.raises(NotImplementedError, match="webp"):
        MM.decode_image("webp")
    # "nii" routes to the real NIfTI codec — garbage bytes fail its parser
    blobs = R.binary_file_scan(spark, binary_dir, glob="*.bin")
    with pytest.raises(Exception, match="NIfTI|nifti|magic"):
        MM.decode_image("nii")(blobs).collect()


def test_decode_image_png_roundtrip(spark, tmp_path):
    """decode_image('png') must decode what encode_png wrote — the unified
    entry point runs the real stdlib codec, not the fake."""
    from qcardia_data_spark.sources.png import encode_png

    rng = np.random.default_rng(3)
    imgs = {}
    d = tmp_path / "pngs"
    d.mkdir()
    for i in range(3):
        arr = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
        imgs[f"img_{i}.png"] = arr
        (d / f"img_{i}.png").write_bytes(encode_png(arr))
    blobs = R.binary_file_scan(spark, str(d), glob="*.png")
    rows = MM.decode_image("png")(blobs).collect()
    assert len(rows) == 3
    for r in rows:
        name = r["path"].rsplit("/", 1)[-1]
        assert (r["height"], r["width"], r["n_frames"]) == (5, 7, 1)
        got = np.array(r["pixels"]).reshape(5, 7)
        assert np.array_equal(got, imgs[name].astype(np.float32))


def test_frame_sample_slices_correct_plane(spark, binary_dir):
    blobs = R.binary_file_scan(spark, binary_dir, glob="*.bin")
    decoded = MM.decode_image("fake", height=4, width=5, n_frames=3)(blobs)
    full = {r["path"]: np.array(r["pixels"]).reshape(4, 5, 3) for r in decoded.collect()}
    sampled = MM.frame_sample(decoded, keep_frames=[0, 2]).collect()
    assert len(sampled) == 12  # 6 files × 2 frames
    for r in sampled:
        want = full[r["path"]][:, :, r["frame_nr"]].ravel()
        assert np.allclose(np.array(r["pixels"]), want, atol=1e-6)


def test_group_slices_by_position(spark):
    # 3 slices at positions 0, 2.5, 5 along z, two files per slice
    rows = [(f"f{i}", 0.0, 0.0, z) for i, z in enumerate([5.0, 5.0004, 2.5, 2.4996, 0.0, 0.0003])]
    files = spark.createDataFrame(rows, ["path", "px", "py", "pz"])
    out = MM.group_slices_by_position(files, ["px", "py", "pz"], [0.0, 0.0, 1.0], tol=1e-2)
    got = {r["path"]: r["slice_nr"] for r in out.collect()}
    assert got == {"f0": 0, "f1": 0, "f2": 1, "f3": 1, "f4": 2, "f5": 2}


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------
def test_write_metadata_table_order_and_casts(spark, tmp_path):
    df = spark.createDataFrame([(2, 5, "b"), (1, 3, "a")], ["frame_nr", "x", "subject"])
    path = str(tmp_path / "meta")
    Wr.write_metadata_table(df, path, ordered_cols=["subject"], int32_cols=["frame_nr"])
    back = spark.read.parquet(path)
    assert back.columns[0] == "subject"
    assert dict(back.dtypes)["frame_nr"] == "int"


def test_write_npy_records(spark, tmp_path):
    d = str(tmp_path / "npy")
    df = spark.createDataFrame(
        [("rec-a", [1.0, 2.0, 3.0, 4.0, 5.0, 6.0], 2, 3), ("rec-b", [9.0] * 6, 3, 2)],
        ["file_id", "pixels", "h", "w"],
    )
    Wr.write_npy_records(df, d, "file_id", "pixels", shape_cols=["h", "w"])
    a = np.load(os.path.join(d, "rec-a.npy"))
    assert a.shape == (2, 3) and a[1, 2] == 6.0
    b = np.load(os.path.join(d, "rec-b.npy"))
    assert b.shape == (3, 2) and (b == 9.0).all()


def test_standardize_with_saved_stats(spark):
    # F3's "stats from saved meta" path (reference intensity.py:8-42: use
    # the meta dict's mean/std when present instead of recomputing)
    from qcardia_data_spark.functions.arrays import standardize

    df = spark.createDataFrame([([10.0, 20.0, 30.0], 20.0, 10.0)], ["arr", "mu", "sigma"])
    out = df.select(
        standardize(F.col("arr"), mean=F.col("mu"), std=F.col("sigma")).alias("z")
    ).collect()[0]["z"]
    assert out == [-1.0, 0.0, 1.0]
    # recompute path: population std of [10,20,30] = sqrt(200/3)
    auto = df.select(standardize(F.col("arr")).alias("z")).collect()[0]["z"]
    assert auto[1] == pytest.approx(0.0)
    assert auto[2] == pytest.approx(10.0 / np.sqrt(200.0 / 3.0))


def test_minmax_roundtrip_property(spark):
    # F4 inverse property: denormalize(normalize(x)) == x (SURVEY §5.4)
    from qcardia_data_spark.functions.arrays import minmax_normalize

    rng = np.random.RandomState(3)
    rows = [(i, (rng.rand(12) * 50 - 25).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, ["k", "arr"])
    lo, hi = F.array_min(F.col("arr").cast("array<double>")), F.array_max(
        F.col("arr").cast("array<double>")
    )
    norm = minmax_normalize(F.col("arr"))
    denorm = F.transform(norm, lambda e: e * (hi - lo) + lo)
    out = df.select("k", "arr", denorm.alias("back")).collect()
    for r in out:
        assert np.allclose(r["back"], r["arr"], atol=1e-9)


def test_split_dict_roundtrip(spark, tmp_path):
    split = {"train": {"ds1": ["s1", "s2"], "ds2": ["s9"]}, "test": {"ds1": ["s3"]}}
    table = R.split_table_from_dict(spark, split)
    assert table.count() == 4
    back = Wr.collect_split_dict(table.withColumnRenamed("subject_id", "subject_id"), "subject_id")
    assert back == split
    p = str(tmp_path / "split.json")
    Wr.write_small_json(back, p)
    import json

    assert json.load(open(p)) == split


# ---------------------------------------------------------------------------
# Audio (real WAV codec) + video (stub codec, real plumbing) — round 4
# ---------------------------------------------------------------------------


def test_wav_codec_roundtrip_and_chunk_walk():
    import numpy as np

    from qcardia_data_spark.sources.audio import decode_wav, encode_wav

    t = np.linspace(0, 1, 8000, endpoint=False)
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    samples, rate = decode_wav(encode_wav(sig, 8000))
    assert rate == 8000 and samples.shape == (8000, 1)
    assert float(np.abs(samples[:, 0] - sig).max()) < 1e-3  # 16-bit quantization

    # stereo + an extra chunk between fmt and data (real-world layout)
    stereo = np.stack([sig, -sig], axis=1)
    blob = bytearray(encode_wav(stereo, 8000))
    import struct as _s

    extra = b"LIST" + _s.pack("<I", 4) + b"INFO"
    fmt_end = 12 + 8 + 16
    blob2 = bytes(blob[:fmt_end]) + extra + bytes(blob[fmt_end:])
    blob2 = blob2[:4] + _s.pack("<I", len(blob2) - 8) + blob2[8:]
    s2, r2 = decode_wav(blob2)
    assert s2.shape == (8000, 2) and r2 == 8000


def test_spark_audio_decode_and_features(spark):
    import numpy as np

    from qcardia_data_spark.sources.audio import encode_wav
    from qcardia_data_spark.sources.multimodal import audio_features, decode_audio

    t = np.linspace(0, 1, 4000, endpoint=False)
    rows = [
        ("mem://tone.wav", encode_wav(0.9 * np.sin(2 * np.pi * 200 * t), 4000)),
        ("mem://silence.wav", encode_wav(np.zeros(4000), 4000)),
    ]
    df = spark.createDataFrame(rows, ["path", "content"])
    decoded = decode_audio(df)
    got = {r["path"]: r for r in decoded.collect()}
    assert got["mem://tone.wav"]["sample_rate"] == 4000
    assert got["mem://tone.wav"]["n_samples"] == 4000
    assert abs(got["mem://tone.wav"]["duration_s"] - 1.0) < 1e-9

    feats = audio_features(decoded, frame_len=512, hop=512).collect()
    by_path = {}
    for r in feats:
        by_path.setdefault(r["path"], []).append(r)
    tone_rms = np.mean([r["rms"] for r in by_path["mem://tone.wav"]])
    sil_rms = np.mean([r["rms"] for r in by_path["mem://silence.wav"]])
    assert tone_rms > 0.5 and sil_rms < 1e-6  # energy separates tone/silence
    cents = [r["spectral_centroid_hz"] for r in by_path["mem://tone.wav"]]
    assert all(100 < c < 600 for c in cents)  # centroid near the 200 Hz tone


def test_spark_audio_resample_on_decode(spark):
    import numpy as np

    from qcardia_data_spark.sources.audio import encode_wav
    from qcardia_data_spark.sources.multimodal import decode_audio

    sig = np.sin(2 * np.pi * 5 * np.linspace(0, 1, 8000, endpoint=False))
    df = spark.createDataFrame([("mem://a.wav", encode_wav(sig, 8000))], ["path", "content"])
    out = decode_audio(df, target_rate=4000).collect()[0]
    assert out["sample_rate"] == 4000
    assert abs(out["n_samples"] - 4000) <= 1


def test_spark_video_frame_sample_stub(spark):
    from qcardia_data_spark.sources.multimodal import decode_video_frames

    df = spark.createDataFrame(
        [("mem://a.mp4", b"fake-video-bytes-a"), ("mem://b.mp4", b"fake-video-bytes-b")],
        ["path", "content"],
    )
    out = decode_video_frames(df, keep_frames=[0, 3, 7], n_frames=8).collect()
    assert len(out) == 6  # 2 files x 3 kept frames
    assert sorted({r["frame_nr"] for r in out}) == [0, 3, 7]
    # deterministic stub: same bytes -> same pixels on re-run
    again = decode_video_frames(df, keep_frames=[0, 3, 7], n_frames=8).collect()
    key = lambda r: (r["path"], r["frame_nr"])  # noqa: E731
    assert sorted(out, key=key)[0]["pixels"] == sorted(again, key=key)[0]["pixels"]

    import pytest

    # r12: the stub n_frames bound is enforced PER FILE at execution (a
    # real AVI validates against its own header instead — build-time
    # enforcement rejected keep_frames real files could serve)
    with pytest.raises(Exception, match="out of range"):
        decode_video_frames(df, keep_frames=[9], n_frames=8).collect()


# ---------------------------------------------------------------------------
# MJPEG/AVI: the real video codec (sources/avi.py + sources/jpeg.py)
# ---------------------------------------------------------------------------


def _smooth_frames(n=6, h=32, w=24):
    """Deterministic smooth grayscale frames (gradients survive quality-100
    JPEG within ±1 grey level — jpeg.py module docstring)."""
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return [
        np.clip((yy * 3 + xx * 2 + k * 11) % 256, 0, 255).astype(np.uint8)
        for k in range(n)
    ]


def test_avi_mjpeg_roundtrip():
    import numpy as np

    from qcardia_data_spark.sources.avi import (
        decode_avi_frame, encode_avi_mjpeg, parse_avi,
    )

    frames = _smooth_frames()
    blob = encode_avi_mjpeg(frames, fps=12.5, quality=100)
    meta = parse_avi(blob)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (24, 32, 6)
    assert abs(meta["fps"] - 12.5) < 1e-9
    for k in (0, 3, 5):
        got = decode_avi_frame(meta["frames"], k)
        assert got.shape == (32, 24)
        assert int(np.abs(got.astype(int) - frames[k].astype(int)).max()) <= 1


def test_avi_parse_is_lazy_and_refuses_loudly():
    import struct

    import pytest

    from qcardia_data_spark.sources.avi import encode_avi_mjpeg, parse_avi

    blob = encode_avi_mjpeg(_smooth_frames(n=3), fps=25.0)
    meta = parse_avi(blob)
    # laziness: the parse returns zero-copy JPEG slices, no pixel arrays —
    # DCT work happens only in decode_avi_frame for KEPT frames
    assert all(isinstance(f, memoryview) for f in meta["frames"])

    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"\x00" * 32)
    # non-MJPEG codec fourcc → honest boundary
    bad = bytearray(blob)
    i = bad.find(b"MJPG")          # strh handler
    j = bad.find(b"MJPG", i + 4)   # strf biCompression
    bad[i : i + 4] = b"H264"
    bad[j : j + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="only MJPEG"):
        parse_avi(bytes(bad))
    # truncated chunk → structural refusal
    hdr = blob[:12] + b"LIST" + struct.pack("<I", 10 ** 6) + b"movi"
    with pytest.raises(ValueError, match="overruns"):
        parse_avi(hdr + b"\x00" * 64)


def test_spark_video_frame_sample_real_avi(spark):
    import numpy as np

    from qcardia_data_spark.sources.avi import encode_avi_mjpeg
    from qcardia_data_spark.sources.multimodal import decode_video_frames

    frames = _smooth_frames(n=8, h=16, w=16)
    blob = encode_avi_mjpeg(frames, fps=30.0, quality=100)
    df = spark.createDataFrame(
        [("mem://real.avi", blob), ("mem://stub.mp4", b"fake-video-bytes")],
        ["path", "content"],
    )
    out = decode_video_frames(df, keep_frames=[1, 6], n_frames=8).collect()
    by = {(r["path"], r["frame_nr"]): r for r in out}
    assert len(by) == 4  # 2 files x 2 kept frames
    real = by[("mem://real.avi", 6)]
    # container metadata came from the stream headers, not the defaults
    assert (real["height"], real["width"], real["n_frames"]) == (16, 16, 8)
    assert abs(real["fps"] - 30.0) < 1e-9
    got = np.array(real["pixels"]).reshape(16, 16)
    assert np.abs(got - frames[6].astype(float)).max() <= 1.0

    import pytest

    # a kept index past the REAL file's frame count refuses loudly
    short = encode_avi_mjpeg(_smooth_frames(n=2, h=16, w=16), fps=30.0)
    df2 = spark.createDataFrame([("mem://short.avi", short)], ["path", "content"])
    with pytest.raises(Exception, match="out of range"):
        decode_video_frames(df2, keep_frames=[5], n_frames=8).collect()


def test_wav_malformed_fmt_refuses():
    import struct

    import numpy as np
    import pytest

    from qcardia_data_spark.sources.audio import decode_wav, encode_wav

    blob = bytearray(encode_wav(np.zeros(16), 8000))
    i = blob.find(b"fmt ")
    # zero out nChannels (offset +10 into the chunk: id(4)+len(4)+tag(2))
    struct.pack_into("<H", blob, i + 10, 0)
    with pytest.raises(ValueError, match="channels=0"):
        decode_wav(bytes(blob))
    blob = bytearray(encode_wav(np.zeros(16), 8000))
    struct.pack_into("<I", blob, blob.find(b"fmt ") + 12, 0)  # nSamplesPerSec
    with pytest.raises(ValueError, match="rate=0"):
        decode_wav(bytes(blob))


def test_codec_decoders_robust_to_corruption():
    """Cross-codec fuzz: flip/truncate/insert bytes in valid NIfTI / WAV /
    AVI / PNG / DICOM streams — every decoder must return a result or
    raise ValueError/NotImplementedError, never crash with a raw
    IndexError/KeyError/struct.error/ZeroDivisionError."""
    import gzip

    import numpy as np
    from hypothesis import example, given, settings
    from hypothesis import strategies as st

    from qcardia_data_spark.sources import dicom as D
    from qcardia_data_spark.sources.audio import decode_wav, encode_wav
    from qcardia_data_spark.sources.avi import encode_avi_mjpeg, parse_avi
    from qcardia_data_spark.sources.nifti import decode_nifti1, encode_nifti1
    from qcardia_data_spark.sources.png import decode_png, encode_png

    rng = np.random.default_rng(5)
    vol = rng.normal(0, 1, (6, 6, 3, 2)).astype(np.float32)
    nii = encode_nifti1(vol, np.eye(4))
    wav = encode_wav(rng.normal(0, 0.2, 800).astype(np.float64), 8000)
    frames = [rng.integers(0, 256, (16, 16), dtype=np.uint8) for _ in range(3)]
    avi = encode_avi_mjpeg(frames, fps=5)
    png = encode_png(rng.integers(0, 256, (12, 12), dtype=np.uint8))
    dcm = D.encode_dicom(
        rng.integers(0, 4096, (16, 16)).astype("<u2"), series_uid="1.2.9",
        instance_number=1, position=(0, 0, 0), orientation=(1, 0, 0, 0, 1, 0),
    )
    targets = [
        (nii, lambda b: decode_nifti1(b)),
        (wav, lambda b: decode_wav(b)),
        (avi, lambda b: parse_avi(b)),
        (png, lambda b: decode_png(b)),
        (dcm, lambda b: D.pixel_array(D.parse_dicom(b))),
    ]

    @settings(max_examples=150, deadline=None)
    # r14 falsifying example, pinned deterministically: flips byte 111 (the
    # high byte of the NIfTI vox_offset float), driving a huge offset into
    # np.frombuffer — escaped as a raw OverflowError before the r15 bounds
    # guard in decode_nifti1
    @example(ti=0, mode="flip", pos=2538, val=32)
    @given(
        ti=st.integers(0, len(targets) - 1),
        mode=st.sampled_from(["flip", "truncate", "insert"]),
        pos=st.integers(1, 5000),
        val=st.integers(0, 255),
    )
    def fuzz(ti, mode, pos, val):
        data, dec = targets[ti]
        pos = pos % (len(data) - 2) + 1
        if mode == "flip":
            mutated = data[:pos] + bytes([data[pos] ^ (val or 1)]) + data[pos + 1 :]
        elif mode == "truncate":
            mutated = data[:pos]
        else:
            mutated = data[:pos] + bytes([val]) + data[pos:]
        try:
            dec(mutated)
        except (ValueError, NotImplementedError, gzip.BadGzipFile, EOFError):
            pass

    fuzz()


# ---------------------------------------------------------------------------
# r8 late addition: perceptual-hash image near-dup over the real PNG codec
# ---------------------------------------------------------------------------

def _png_rows(tmp_path):
    import numpy as np

    from qcardia_data_spark.sources.png import encode_png

    rng = np.random.RandomState(5)
    # textured image: coarse random field mean-pooled up — non-degenerate
    # DCT spectrum (a pure ramp puts ~all coefficients at analytic zero)
    coarse = rng.randint(0, 200, size=(8, 6)).astype(np.float64)
    base = np.kron(coarse, np.ones((8, 8)))[:64, :48].astype(np.uint8)
    brighter = (base + 20).astype(np.uint8)                 # exposure shift only
    tweaked = base.copy()
    tweaked[10:14, 10:14] += 30                             # small local edit
    noise = rng.randint(0, 255, size=(64, 48)).astype(np.uint8)
    return [
        ("img/base.png", bytearray(encode_png(base))),
        ("img/brighter.png", bytearray(encode_png(brighter))),
        ("img/tweaked.png", bytearray(encode_png(tweaked))),
        ("img/noise.png", bytearray(encode_png(noise))),
    ]


def test_phash_exposure_invariant_and_discriminative(spark, tmp_path):
    from qcardia_data_spark.sources.multimodal import phash_images

    df = spark.createDataFrame(_png_rows(tmp_path), ["path", "content"])
    sig = {r["path"]: (r["lo"], r["hi"]) for r in phash_images(df).collect()}

    def ham(a, b):
        return bin(sig[a][0] ^ sig[b][0]).count("1") + bin(
            sig[a][1] ^ sig[b][1]
        ).count("1")

    # uniform brightness lands only in the DC coefficient -> identical hash
    assert ham("img/base.png", "img/brighter.png") == 0
    # a small local edit moves few bits; an unrelated image moves many
    assert ham("img/base.png", "img/tweaked.png") <= 3
    assert ham("img/base.png", "img/noise.png") > 10


def test_image_near_dup_pairs_blocked_equals_naive(spark, tmp_path):
    import itertools

    from qcardia_data_spark.sources.multimodal import (
        image_near_dup_pairs,
        phash_images,
    )

    df = spark.createDataFrame(_png_rows(tmp_path), ["path", "content"])
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in image_near_dup_pairs(df, max_hamming=3).collect()
    }
    sig = {r["path"]: (r["lo"], r["hi"]) for r in phash_images(df).collect()}
    naive = {}
    for a, b in itertools.combinations(sorted(sig), 2):
        h = bin(sig[a][0] ^ sig[b][0]).count("1") + bin(
            sig[a][1] ^ sig[b][1]
        ).count("1")
        if h <= 3:
            naive[(a, b)] = h
    assert got == naive
    # the exposure pair and the local-edit pair are in; noise is not
    assert ("img/base.png", "img/brighter.png") in got
    assert not any("noise" in a or "noise" in b for a, b in got)


def test_phash_refuses_unknown_format(spark):
    import pytest

    from qcardia_data_spark.sources.multimodal import phash_images

    df = spark.createDataFrame([("x", bytearray(b"zz"))], ["path", "content"])
    with pytest.raises(Exception, match="unsupported fmt"):
        phash_images(df, fmt="jpeg2000").collect()


# ---------------------------------------------------------------------------
# r8 late addition: Haitsma-Kalker audio fingerprints over the real WAV codec
# ---------------------------------------------------------------------------

def _wav_rows():
    import numpy as np

    from qcardia_data_spark.sources.audio import encode_wav

    rate, dur = 8000, 4.0
    t = np.arange(int(rate * dur)) / rate

    def clip(seed):
        # broadband "recording": 8 random partials with drifting
        # amplitudes + noise floor — the signal class the band-energy
        # scheme is built for (a lone chirp is spectrally degenerate:
        # near-empty fingerprints match everything)
        rng = np.random.RandomState(seed)
        sig = 0.02 * rng.randn(len(t))
        for _ in range(8):
            f0 = rng.uniform(100, 3500)
            am = 0.3 + 0.7 * np.sin(2 * np.pi * rng.uniform(0.2, 1.0) * t + rng.uniform(0, 6))
            sig += 0.1 * am * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6))
        return 0.6 * sig / np.abs(sig).max()

    base = clip(1)
    quiet = 0.4 * base                                 # pure gain change
    shifted = np.concatenate([base[1024:], base[:1024]])  # rotate by one hop
    other = clip(2)                                    # different recording
    return [
        ("au/base.wav", bytearray(encode_wav(base, rate))),
        ("au/quiet.wav", bytearray(encode_wav(quiet, rate))),
        ("au/shifted.wav", bytearray(encode_wav(shifted, rate))),
        ("au/other.wav", bytearray(encode_wav(other, rate))),
    ]


def test_audio_fingerprints_gain_invariant_shift_robust(spark):
    from qcardia_data_spark.sources.multimodal import (
        audio_fingerprints,
        decode_audio,
    )

    decoded = decode_audio(spark.createDataFrame(_wav_rows(), ["path", "content"]))
    fps = {}
    for r in audio_fingerprints(decoded).collect():
        fps.setdefault(r["path"], []).append((r["frame_idx"], r["lo"], r["hi"]))

    def share(a, b, k=3):
        # fraction of a's frames with a Hamming<=k counterpart in b —
        # the paper's BER criterion at frame granularity
        hits = 0
        for _, lo, hi in fps[a]:
            best = min(
                bin(lo ^ l2).count("1") + bin(hi ^ h2).count("1")
                for _, l2, h2 in fps[b]
            )
            hits += best <= k
        return hits / len(fps[a])

    # gain change: per-frame normalization makes the match near-total
    assert share("au/base.wav", "au/quiet.wav") > 0.8
    # a one-hop rotation realigns most windows
    assert share("au/base.wav", "au/shifted.wav") > 0.6
    # a different recording matches almost nowhere
    assert share("au/base.wav", "au/other.wav") < 0.15


def test_audio_near_dup_pairs_finds_gain_and_shift_copies(spark):
    from qcardia_data_spark.sources.multimodal import (
        audio_near_dup_pairs,
        decode_audio,
    )

    decoded = decode_audio(spark.createDataFrame(_wav_rows(), ["path", "content"]))
    got = {
        (r["a"], r["b"]): r["share"]
        for r in audio_near_dup_pairs(decoded, min_share=0.35).collect()
    }
    assert ("au/base.wav", "au/quiet.wav") in got
    assert ("au/base.wav", "au/shifted.wav") in got
    assert not any("other" in a or "other" in b for a, b in got)


def test_frame_share_pairs_asymmetric_lengths_bounded(spark):
    """ADVICE r8 regression: share counted matched frames on the
    LEX-SMALLER path but divided by the SMALLER frame count, so a longer
    lex-smaller file could report share > 1.0. The count must come from
    the side with fewer frames: here the lex-smaller file 'a' has 4
    frames (two of them matching), the shorter file 'z' has 2 frames
    (one matching) -> share = 1/2, not 2/2."""
    from qcardia_data_spark.sources.multimodal import (
        frame_signature_share_pairs,
    )

    s1, s2, s3, s4 = (0, 0), (0xFFFFFFFF, 0), (0, 0xFFFFFFFF), (0xFFFF, 0xFF0000)
    rows = [
        ("a", 0, *s1), ("a", 1, *s1), ("a", 2, *s2), ("a", 3, *s3),
        ("z", 0, *s1), ("z", 1, *s4),
    ]
    sig = spark.createDataFrame(rows, ["path", "frame_idx", "lo", "hi"])
    got = {
        (r["a"], r["b"]): r["share"]
        for r in frame_signature_share_pairs(sig, min_share=0.1).collect()
    }
    assert got == {("a", "z"): 0.5}
    # and an identical-signature pair caps at exactly 1.0 even when one
    # side is 4x longer
    rows2 = [("a", i, *s1) for i in range(4)] + [("z", 0, *s1)]
    sig2 = spark.createDataFrame(rows2, ["path", "frame_idx", "lo", "hi"])
    got2 = {
        (r["a"], r["b"]): r["share"]
        for r in frame_signature_share_pairs(sig2, min_share=0.1).collect()
    }
    assert got2 == {("a", "z"): 1.0}


def test_video_near_dup_pairs_real_mjpeg(spark):
    """Video near-dup through the REAL MJPEG/AVI pipeline: an
    exposure-shifted re-encode matches frame-for-frame; an unrelated clip
    does not. Completes the per-modality dedup family on the shared
    Manku engine."""
    import numpy as np

    from qcardia_data_spark.sources.avi import encode_avi_mjpeg
    from qcardia_data_spark.sources.multimodal import video_near_dup_pairs

    rng = np.random.RandomState(9)
    frames = []
    for _ in range(4):
        coarse = rng.randint(0, 200, size=(8, 8)).astype(np.float64)
        frames.append(np.kron(coarse, np.ones((8, 8))).astype(np.uint8))  # 64x64
    brighter = [(f + 15).astype(np.uint8) for f in frames]
    other = [
        np.kron(rng.randint(0, 200, size=(8, 8)), np.ones((8, 8))).astype(np.uint8)
        for _ in range(4)
    ]
    rows = [
        ("vid/a.avi", bytearray(encode_avi_mjpeg(frames))),
        ("vid/bright.avi", bytearray(encode_avi_mjpeg(brighter))),
        ("vid/other.avi", bytearray(encode_avi_mjpeg(other))),
    ]
    df = spark.createDataFrame(rows, ["path", "content"])
    got = {
        (r["a"], r["b"]): r["share"]
        for r in video_near_dup_pairs(df, keep_frames=[0, 1, 2, 3]).collect()
    }
    assert ("vid/a.avi", "vid/bright.avi") in got
    assert got[("vid/a.avi", "vid/bright.avi")] >= 0.75
    assert not any("other" in a or "other" in b for a, b in got)


def test_media_near_dup_spec_op_image(spark, tmp_path):
    """The declarative dialect reaches the multimodal dedup family: a
    binaryFile source + media_near_dup(image) equals the library call."""
    from qcardia_data_spark.plans.spec import compile_pipeline
    from qcardia_data_spark.sources.multimodal import image_near_dup_pairs

    d = tmp_path / "imgs"
    d.mkdir()
    for name, content in _png_rows(tmp_path):
        (d / name.split("/")[-1]).write_bytes(bytes(content))

    got = compile_pipeline(
        spark,
        [
            {"op": "source", "path": str(d), "format": "binaryFile",
             "glob": "*.png"},
            {"op": "media_near_dup", "modality": "image", "max_hamming": 3},
        ],
        None,
    )
    binary = spark.read.format("binaryFile").load(str(d))
    want = image_near_dup_pairs(binary, max_hamming=3)
    key = lambda r: (r["a"].rsplit("/", 1)[-1], r["b"].rsplit("/", 1)[-1], r["hamming"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    assert got.count() > 0


def test_video_keep_frames_bound_is_per_codec(spark):
    """r12 review: the stub codec's n_frames bound used to be enforced at
    BUILD time, rejecting keep_frames a real AVI could serve. Now: real
    AVI validates against its own header; only the fake path enforces the
    stub's n_frames (per file, loudly); negative indices still refuse at
    build."""
    import numpy as np
    import pytest

    from qcardia_data_spark.sources.avi import encode_avi_mjpeg
    from qcardia_data_spark.sources.multimodal import decode_video_frames

    rng = np.random.RandomState(3)
    frames = [
        np.kron(rng.randint(0, 200, size=(8, 8)), np.ones((8, 8))).astype(np.uint8)
        for _ in range(12)
    ]
    avi = spark.createDataFrame(
        [("v.avi", bytearray(encode_avi_mjpeg(frames)))], ["path", "content"]
    )
    # frame 9 exceeds the stub default n_frames=8 but the real AVI has 12
    got = decode_video_frames(avi, [0, 9]).collect()
    assert sorted(r["frame_nr"] for r in got) == [0, 9]

    with pytest.raises(ValueError, match=">= 0"):
        decode_video_frames(avi, [-1])

    # the fake path still refuses per file, naming the stub bound
    fake = spark.createDataFrame(
        [("blob.bin", bytearray(b"not-a-riff"))], ["path", "content"]
    )
    with pytest.raises(Exception, match="stub codec"):
        decode_video_frames(fake, [9]).collect()


def test_phash_unsupported_fmt_fails_at_build(spark):
    """r12 review: a bad fmt must fail the plan, not the first task."""
    import pytest

    from qcardia_data_spark.sources.multimodal import phash_images

    df = spark.createDataFrame([("p", bytearray(b"x"))], ["path", "content"])
    with pytest.raises(NotImplementedError, match="unsupported fmt"):
        phash_images(df, fmt="jpeg2000")
