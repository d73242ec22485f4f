"""Real-bytes NIfTI-1 path: pure-Python codec round-trips, orientation math
(F13), and the Spark E2E decode → frame-select → border-crop → spacing chain
(F12/F13/F14 on genuinely decoded volumes, reference reformat/utils.py:18-75
semantics — no nibabel)."""

from __future__ import annotations

import gzip
import os
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.functions.volumes import border_crop_udf, spacing_from_affine
from qcardia_data_spark.sources.multimodal import decode_nifti, frame_sample
from qcardia_data_spark.sources.nifti import (
    apply_orientation,
    decode_nifti1,
    encode_nifti1,
    inv_ornt_aff,
    io_orientation,
    to_closest_canonical,
)


def test_roundtrip_float32_3d():
    vol = np.arange(4 * 5 * 6, dtype=np.float32).reshape(4, 5, 6)
    aff = np.diag([1.5, 1.5, 8.0, 1.0])
    out, aff2, hdr = decode_nifti1(encode_nifti1(vol, aff))
    assert out.shape == (4, 5, 6)
    assert np.array_equal(out, vol)
    assert np.allclose(aff2, aff)
    assert hdr["sform_code"] == 1 and hdr["datatype"] == 16


def test_roundtrip_int16_scaled_and_gzip():
    rng = np.random.RandomState(0)
    vol = rng.randint(-500, 500, size=(7, 3, 2), dtype=np.int16)
    data = encode_nifti1(vol, np.eye(4), compress=True, scl_slope=0.5, scl_inter=10.0)
    assert data[:2] == b"\x1f\x8b"  # actually gzipped on disk
    out, _, hdr = decode_nifti1(data)
    assert np.allclose(out, vol.astype(np.float64) * 0.5 + 10.0)
    assert hdr["scl_slope"] == 0.5


def test_roundtrip_4d_cine():
    rng = np.random.RandomState(1)
    vol = rng.rand(6, 5, 3, 4).astype(np.float32)  # (x, y, z, t) cine
    out, _, hdr = decode_nifti1(encode_nifti1(vol))
    assert out.shape == (6, 5, 3, 4)
    assert np.array_equal(out.astype(np.float32), vol)
    assert hdr["dim"][0] == 4


def test_pixdim_fallback_when_no_sform():
    vol = np.zeros((2, 2, 2), dtype=np.uint8)
    data = bytearray(encode_nifti1(vol, np.eye(4), pixdim=(2.0, 3.0, 4.0)))
    struct.pack_into("<2h", data, 252, 0, 0)  # clear qform+sform codes
    _, aff, _ = decode_nifti1(bytes(data))
    assert np.allclose(aff, np.diag([2.0, 3.0, 4.0, 1.0]))


def test_rejects_garbage():
    with pytest.raises(ValueError, match="sizeof_hdr|shorter"):
        decode_nifti1(b"definitely not a nifti file" * 20)
    with pytest.raises(ValueError, match="magic"):
        bad = bytearray(encode_nifti1(np.zeros((2, 2), dtype=np.uint8)))
        bad[344:348] = b"XXXX"
        decode_nifti1(bytes(bad))


def test_rejects_out_of_bounds_header_geometry():
    """r15 bounds guard: corrupt header sizes/offsets must raise ValueError,
    never escape as a raw OverflowError from np.frombuffer's ssize_t
    conversion (the r14 fuzz-found bug, byte 111 = vox_offset high byte)."""
    base = encode_nifti1(np.zeros((4, 4, 2), dtype=np.float32), np.eye(4))

    # vox_offset inflated to a huge float (the fuzz falsifying class)
    bad = bytearray(base)
    struct.pack_into("<f", bad, 108, 1e30)
    with pytest.raises(ValueError, match="vox_offset"):
        decode_nifti1(bytes(bad))

    # vox_offset NaN / negative
    for v in (float("nan"), float("inf"), -4.0):
        bad = bytearray(base)
        struct.pack_into("<f", bad, 108, v)
        with pytest.raises(ValueError, match="vox_offset"):
            decode_nifti1(bytes(bad))

    # dim product past ssize_t: 7 x int16 32767 => n ~ 4.7e31
    bad = bytearray(base)
    struct.pack_into("<8h", bad, 40, 7, *([32767] * 7))
    with pytest.raises(ValueError, match="out of bounds"):
        decode_nifti1(bytes(bad))

    # plain short buffer: one dim doubled so the voxel block overruns
    bad = bytearray(base)
    struct.pack_into("<h", bad, 42, 8)  # dim[1]: 4 -> 8
    with pytest.raises(ValueError, match="out of bounds"):
        decode_nifti1(bytes(bad))


def test_orientation_identity_is_noop():
    ornt = io_orientation(np.eye(4))
    assert np.array_equal(ornt, np.array([[0, 1.0], [1, 1.0], [2, 1.0]]))


def test_orientation_swap_and_flip():
    # x stored descending (flip), y/z swapped
    aff = np.array([
        [-2.0, 0, 0, 10.0],
        [0, 0, 1.5, 0.0],
        [0, 3.0, 0, 5.0],
        [0, 0, 0, 1.0],
    ])
    ornt = io_orientation(aff)
    assert np.array_equal(ornt, np.array([[0, -1.0], [2, 1.0], [1, 1.0]]))


def test_reorient_preserves_world_coordinates():
    """The invariant behind as_reoriented (reference reformat/utils.py:72-75):
    every voxel keeps its world position after reorientation."""
    rng = np.random.RandomState(2)
    vol = rng.rand(4, 3, 5)
    aff = np.array([
        [0, 0, -1.25, 7.0],
        [-2.0, 0, 0, 1.0],
        [0, 1.5, 0, -3.0],
        [0, 0, 0, 1.0],
    ])
    vol2, aff2 = to_closest_canonical(vol, aff)
    # canonical: rotation part has positive values on the diagonal only
    assert np.allclose(np.sign(np.diag(aff2[:3, :3])), 1.0)
    for _ in range(20):
        i, j, k = (rng.randint(0, s) for s in vol.shape)
        world = aff @ [i, j, k, 1.0]
        # locate the same value in the reoriented array
        idx2 = np.argwhere(np.isclose(vol2, vol[i, j, k]))[0]
        world2 = aff2 @ [*idx2, 1.0]
        assert np.allclose(world, world2), (world, world2)


def test_reorient_4d_keeps_time_axis():
    vol = np.arange(2 * 3 * 4 * 5, dtype=np.float64).reshape(2, 3, 4, 5)
    aff = np.diag([-1.0, 1.0, 1.0, 1.0])
    vol2, _ = to_closest_canonical(vol, aff)
    assert vol2.shape == (2, 3, 4, 5)
    assert np.array_equal(vol2, np.flip(vol, axis=0))


def test_inv_ornt_aff_roundtrip():
    ornt = np.array([[2, -1.0], [0, 1.0], [1, -1.0]])
    shape = (4, 5, 6)
    m = inv_ornt_aff(ornt, shape)
    vol = np.random.RandomState(3).rand(*shape)
    out = apply_orientation(vol, ornt)
    # m maps reoriented indices → original indices
    for idx in [(0, 0, 0), (1, 2, 3), (3, 1, 2)]:
        j = (m @ [*_pad(idx, out.shape), 1.0])[:3]
        assert np.isclose(out[_pad(idx, out.shape)], vol[tuple(int(round(x)) for x in j)])


def _pad(idx, shape):
    return tuple(min(i, s - 1) for i, s in zip(idx, shape))


# ---------------------------------------------------------------------------
# Spark end-to-end on real bytes
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def nifti_dir(tmp_path_factory):
    """Five real .nii/.nii.gz cine volumes with zero borders + known affines."""
    d = tmp_path_factory.mktemp("nii")
    rng = np.random.RandomState(42)
    truth = {}
    for i in range(5):
        nx, ny, nz = 10, 8, 3
        vol = np.zeros((nx, ny, nz), dtype=np.float32)
        # interior content leaves a 2/1-voxel zero border (crop target)
        vol[2 : nx - 2, 1 : ny - 1, :] = rng.rand(nx - 4, ny - 2, nz).astype(np.float32) + 0.1
        aff = np.diag([1.25, 1.25, 8.0, 1.0])
        aff[:3, 3] = [i, -i, 2 * i]
        name = f"subj{i}.nii" + (".gz" if i % 2 else "")
        (d / name).write_bytes(encode_nifti1(vol, aff, compress=bool(i % 2)))
        truth[name] = (vol, aff)
    return str(d), truth


def test_spark_decode_nifti_end_to_end(spark, nifti_dir):
    path, truth = nifti_dir
    decoded = decode_nifti(spark.read.format("binaryFile").load(path)).cache()
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in decoded.collect()}
    assert set(rows) == set(truth)
    for name, (vol, aff) in truth.items():
        r = rows[name]
        assert r["shape"] == list(vol.shape)
        assert np.allclose(r["affine"], aff.ravel())
        got = np.array(r["pixels"], dtype=np.float32).reshape(vol.shape)
        assert np.array_equal(got, vol)

    # F14 spacing on decoded affines
    sp = decoded.select(
        "path", spacing_from_affine(F.col("affine")).alias("spacing")
    ).collect()
    for r in sp:
        assert np.allclose(r["spacing"], [1.25, 1.25, 8.0])
    decoded.unpersist()


def test_spark_nifti_frame_crop_chain(spark, nifti_dir):
    """scan → decode → z-plane select (no re-decode) → F12 border crop,
    verified against numpy on the source volumes."""
    path, truth = nifti_dir
    decoded = decode_nifti(spark.read.format("binaryFile").load(path))
    planes_in = decoded.select(
        "path",
        F.element_at("shape", 1).alias("height"),
        F.element_at("shape", 2).alias("width"),
        F.element_at("shape", 3).alias("n_frames"),
        "pixels",
    )
    planes = frame_sample(planes_in, keep_frames=[1])  # z index 1
    crop = border_crop_udf()
    out = planes.select(
        "path", crop(F.col("pixels"), F.col("height"), F.col("width")).alias("c")
    ).collect()
    assert len(out) == 5
    for r in out:
        name = r["path"].rsplit("/", 1)[-1]
        vol, _ = truth[name]
        plane = vol[:, :, 1]
        ys = np.flatnonzero(plane.any(axis=1))
        xs = np.flatnonzero(plane.any(axis=0))
        exp = plane[ys[0] : ys[-1] + 1, xs[0] : xs[-1] + 1]
        c = r["c"]
        assert (c["height"], c["width"]) == exp.shape
        assert (c["y0"], c["x0"]) == (int(ys[0]), int(xs[0]))
        got = np.array(c["pixels"], dtype=np.float32).reshape(exp.shape)
        assert np.array_equal(got, exp)


def test_decode_nifti_rejects_corrupt_gzip(spark, tmp_path):
    (tmp_path / "bad.nii.gz").write_bytes(gzip.compress(b"nope"))
    df = decode_nifti(spark.read.format("binaryFile").load(str(tmp_path)))
    with pytest.raises(Exception, match="NIfTI|shorter"):
        df.collect()


def test_reformat_volumes_on_real_nifti(spark, nifti_dir):
    """The full reformat lifecycle (scan → decode → frame explode → ED/ES →
    crop → file-id) driven by REAL NIfTI bytes instead of _fake_decode."""
    from qcardia_data_spark.reformat import reformat_volumes

    path, truth = nifti_dir
    records, metadata = reformat_volumes(
        spark, path, glob="*.nii*", dataset="mm9", n_frames=3, codec="nii"
    )
    recs = records.collect()
    assert len(recs) == 15  # 5 subjects × 3 frames
    for r in recs:
        name_match = [n for n in truth if n.startswith(r["subject"])]
        assert name_match, r["subject"]
        vol, _ = truth[name_match[0]]
        # crop tightened the known zero borders: 10x8 → 6x6
        assert (r["height"], r["width"]) == (vol.shape[0] - 4, vol.shape[1] - 2)
        assert (r["y0"], r["x0"]) == (2, 1)
        assert r["file_id"] == f"mm9-{r['subject']}-__-{r['frame_nr']:02d}"
    meta = {m["subject"]: m for m in metadata.collect()}
    assert set(meta) == {f"subj{i}" for i in range(5)}
    assert all(m["total_nr_frames"] == 3 for m in meta.values())
    assert all(m["ED"] is not None and m["ES"] is not None for m in meta.values())


def test_spec_source_decodes_nifti(spark, nifti_dir):
    """The declarative spec compiler can scan+decode real NIfTI bytes as a
    single source op and keep operating relationally downstream."""
    from qcardia_data_spark.plans.spec import compile_pipeline

    path, truth = nifti_dir
    df = compile_pipeline(
        spark,
        [
            {"op": "source", "path": path, "format": "binaryFile", "decode": "nifti"},
            {"op": "with_columns", "cols": {"n_vox": "shape[0] * shape[1] * shape[2]"}},
            {"op": "filter", "expr": "n_vox > 0"},
            {"op": "select", "cols": ["path", "ndim", "n_vox"]},
        ],
    )
    rows = df.collect()
    assert len(rows) == len(truth)
    assert all(r["n_vox"] == 10 * 8 * 3 and r["ndim"] == 3 for r in rows)


def test_write_nifti_records_roundtrip(spark, tmp_path):
    """Reference reformat sink shape ({subject}/{subject}_{suffix}.nii.gz,
    mm1.py:69-70) written executor-side, read back through the codec."""
    from qcardia_data_spark.sources.writers import write_nifti_records

    rng = np.random.RandomState(5)
    rows = []
    truth = {}
    for i in range(3):
        vol = rng.rand(4, 3, 2).astype(np.float32)
        aff = np.diag([1.0, 1.0, float(i + 1), 1.0])
        rows.append((f"subj{i}", vol.ravel().tolist(), [4, 3, 2], aff.ravel().tolist()))
        truth[f"subj{i}"] = (vol, aff)
    df = spark.createDataFrame(
        rows, "subject string, pixels array<float>, shape array<int>, affine array<double>"
    ).repartition(2)
    out = str(tmp_path / "reformatted")
    write_nifti_records(df, out, "subject", "sa_cine", "pixels", "shape", "affine")

    for subj, (vol, aff) in truth.items():
        p = os.path.join(out, subj, f"{subj}_sa_cine.nii.gz")
        assert os.path.exists(p), p
        with open(p, "rb") as f:
            got, gaff, _ = decode_nifti1(f.read())
        assert np.array_equal(got.astype(np.float32), vol)
        assert np.allclose(gaff, aff)


def test_nifti_codec_property_roundtrip():
    """Property test: arbitrary dtype/shape/affine volumes survive
    encode→decode bit-exactly (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    dtypes = st.sampled_from([np.uint8, np.int16, np.int32, np.float32, np.float64])
    dims = st.lists(st.integers(1, 6), min_size=2, max_size=4)

    @settings(max_examples=25, deadline=None)
    @given(dtype=dtypes, shape=dims, seed=st.integers(0, 2**16), gz=st.booleans())
    def check(dtype, shape, seed, gz):
        rng = np.random.RandomState(seed)
        vol = (rng.rand(*shape) * 100 - 50).astype(dtype)
        aff = np.eye(4)
        aff[:3, :3] = np.diag(rng.rand(3) + 0.5)
        aff[:3, 3] = rng.rand(3) * 10 - 5
        out, aff2, _ = decode_nifti1(encode_nifti1(vol, aff, compress=gz))
        assert out.shape == vol.shape
        assert np.array_equal(out.astype(dtype), vol)
        assert np.allclose(aff2, aff, atol=1e-6)

    check()


def test_compressed_dicom_is_honest_stub():
    """Encapsulated transfer syntaxes fail loudly at the codec boundary —
    never silently mis-decoded."""
    from qcardia_data_spark.sources.dicom import parse_dicom

    data = bytearray(
        __import__("qcardia_data_spark.sources.dicom", fromlist=["encode_dicom"]).encode_dicom(
            np.zeros((2, 2), dtype=np.uint8), series_uid="1", instance_number=1,
            position=(0, 0, 0), orientation=(1, 0, 0, 0, 1, 0),
        )
    )
    # rewrite the transfer syntax UID to JPEG 2000 (1.2.840.10008.1.2.4.90)
    # — baseline Process 1 (.4.50) became a REAL codec in round 4, so the
    # honest-stub boundary moved to the still-unsupported family members
    old = b"1.2.840.10008.1.2.1\x00"
    new = b"1.2.840.10008.1.2.4.90"
    idx = bytes(data).find(old)
    assert idx > 0
    data[idx - 2 : idx] = (len(new)).to_bytes(2, "little")  # fix element length
    patched = bytes(data[: idx]) + new + bytes(data[idx + len(old):])
    with pytest.raises(NotImplementedError, match="transfer syntax"):
        parse_dicom(patched)


def test_full_loop_reformat_write_rescan(spark, nifti_dir, tmp_path):
    """Close the lifecycle: raw .nii scan → reformat → NIfTI sink → fresh
    scan of the written records → pixel parity with the in-memory records.
    This is the reference's whole setup_cine loop (mm1.py:29-80) running
    distributed on real bytes in BOTH directions."""
    from pyspark.sql import functions as F  # noqa: F811

    from qcardia_data_spark.reformat import reformat_volumes
    from qcardia_data_spark.sources.multimodal import decode_nifti
    from qcardia_data_spark.sources.writers import write_nifti_records

    path, _ = nifti_dir
    records, _meta = reformat_volumes(
        spark, path, glob="*.nii*", dataset="mm9", n_frames=3, codec="nii"
    )
    recs = records.select(
        "file_id", "pixels",
        F.array("height", "width").alias("shape"),
    ).cache()
    expected = {r["file_id"]: list(r["pixels"]) for r in recs.collect()}

    out = str(tmp_path / "records_nii")
    write_nifti_records(
        recs, out, "file_id", "crop", "pixels", "shape", affine_col=None, compress=True
    )

    rescanned = decode_nifti(
        spark.read.format("binaryFile").option("pathGlobFilter", "*.nii.gz")
        .option("recursiveFileLookup", "true").load(out)
    )
    got = {
        r["path"].rsplit("/", 1)[-1].replace("_crop.nii.gz", ""): r["pixels"]
        for r in rescanned.collect()
    }
    assert set(got) == set(expected)
    for fid, px in expected.items():
        assert np.allclose(got[fid], px, atol=1e-6), fid
    recs.unpersist()


def test_big_endian_nifti_decodes():
    """Byte-swapped (big-endian) NIfTI-1 files decode via the endianness
    fallback: same header layout packed with '>' and big-endian voxels."""
    vol = np.arange(2 * 3 * 4, dtype=">i2").reshape(2, 3, 4)
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 2, 3, 4, 1, 1, 1, 1)
    struct.pack_into(">2h", hdr, 70, 4, 16)  # int16
    struct.pack_into(">8f", hdr, 76, 1.0, 2.0, 3.0, 4.0, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into(">f", hdr, 108, 352.0)
    hdr[344:348] = b"n+1\x00"
    data = bytes(hdr) + b"\x00" * 4 + vol.tobytes(order="F")
    out, aff, hdrd = decode_nifti1(data)
    assert np.array_equal(out, vol.astype(np.float64))
    # no sform/qform → pixdim diagonal affine
    assert np.allclose(aff, np.diag([2.0, 3.0, 4.0, 1.0]))
    assert hdrd["datatype"] == 4


def test_qform_quaternion_affine():
    """qform path (sform absent): identity quaternion → affine = diag(zooms)
    with qoffset translation; qfac=-1 flips the z zoom."""
    vol = np.zeros((2, 2, 2), dtype=np.uint8)
    data = bytearray(encode_nifti1(vol, np.eye(4), pixdim=(1.5, 2.0, 2.5)))
    struct.pack_into("<2h", data, 252, 1, 0)  # qform=1, sform=0
    struct.pack_into("<3f", data, 256, 0.0, 0.0, 0.0)  # identity quaternion
    struct.pack_into("<3f", data, 268, 7.0, -8.0, 9.0)  # qoffset
    _, aff, _ = decode_nifti1(bytes(data))
    exp = np.diag([1.5, 2.0, 2.5, 1.0])
    exp[:3, 3] = [7.0, -8.0, 9.0]
    assert np.allclose(aff, exp)

    struct.pack_into("<f", data, 76, -1.0)  # pixdim[0] = qfac = -1
    _, aff2, _ = decode_nifti1(bytes(data))
    exp2 = np.diag([1.5, 2.0, -2.5, 1.0])
    exp2[:3, 3] = [7.0, -8.0, 9.0]
    assert np.allclose(aff2, exp2)
