"""Pure-Python NIfTI-1 codec — replaces the nibabel boundary for
self-contained volumes (reference loads NIfTI via ``nib.load``,
``setup/reformat/mm1.py:47-48``).

The NIfTI-1 format is a public 348-byte C struct (nifti1.h) followed by a
little- or big-endian voxel block in Fortran order, optionally gzipped
(``.nii.gz``) — all parseable with ``struct``/``gzip``/``numpy``. This
module implements the subset the reference pipeline touches: dims 2-4,
common datatypes, scl_slope/inter rescaling, and the sform/qform/pixdim
affine precedence (sform first, like nibabel's ``get_best_affine``).

``encode_nifti1`` exists so tests can fabricate REAL on-disk bytes and
prove the Spark decode path end-to-end without any imaging library.
"""

from __future__ import annotations

import gzip
import math
import struct

import numpy as np

_HDR_SIZE = 348
# single-file magic only: 'ni1\0' marks a DETACHED .hdr/.img pair whose
# voxels live in a separate file this byte-level decoder never sees —
# accepting it would read garbage from the header buffer, so reject loudly
_MAGIC_SINGLE = b"n+1\x00"
_MAGIC_DETACHED = b"ni1\x00"

# nifti1.h datatype codes → numpy dtypes (the subset medical data uses)
_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
    1024: np.int64,
}
_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


def _quaternion_to_rotation(b: float, c: float, d: float) -> np.ndarray:
    a = max(0.0, 1.0 - b * b - c * c - d * d) ** 0.5
    return np.array([
        [a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)],
        [2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)],
        [2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c],
    ])


def decode_nifti1(data: bytes) -> tuple[np.ndarray, np.ndarray, dict]:
    """NIfTI-1 bytes (.nii or .nii.gz) → (volume, affine 4×4, header dict).

    Volume axes follow on-disk order (x, y, z[, t]) like nibabel's
    ``get_fdata``; scl_slope/scl_inter applied when meaningful; affine
    precedence sform > qform > pixdim-diagonal (nibabel ``get_best_affine``).
    """
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    if len(data) < _HDR_SIZE:
        raise ValueError("not a NIfTI-1 file: shorter than the 348-byte header")

    end = "<"
    (sizeof_hdr,) = struct.unpack_from("<i", data, 0)
    if sizeof_hdr != _HDR_SIZE:
        end = ">"
        (sizeof_hdr,) = struct.unpack_from(">i", data, 0)
        if sizeof_hdr != _HDR_SIZE:
            raise ValueError(f"bad sizeof_hdr {sizeof_hdr}: not NIfTI-1")
    magic = data[344:348]
    if magic == _MAGIC_DETACHED:
        raise ValueError(
            "detached .hdr/.img NIfTI pairs are not supported: voxel data "
            "lives in a separate .img file; supply a single-file .nii"
        )
    if magic != _MAGIC_SINGLE:
        raise ValueError(f"bad NIfTI magic {magic!r}")

    dim = struct.unpack_from(f"{end}8h", data, 40)
    ndim = dim[0]
    if not 1 <= ndim <= 7:
        raise ValueError(f"bad ndim {ndim}")
    shape = tuple(max(1, d) for d in dim[1 : 1 + ndim])
    datatype, bitpix = struct.unpack_from(f"{end}2h", data, 70)
    if datatype not in _DTYPES:
        raise ValueError(f"unsupported NIfTI datatype code {datatype}")
    pixdim = struct.unpack_from(f"{end}8f", data, 76)
    (vox_offset,) = struct.unpack_from(f"{end}f", data, 108)
    scl_slope, scl_inter = struct.unpack_from(f"{end}2f", data, 112)
    qform_code, sform_code = struct.unpack_from(f"{end}2h", data, 252)
    quatern = struct.unpack_from(f"{end}3f", data, 256)
    qoffset = struct.unpack_from(f"{end}3f", data, 268)
    srow = np.array(struct.unpack_from(f"{end}12f", data, 280)).reshape(3, 4)

    dt = np.dtype(_DTYPES[datatype]).newbyteorder(end)
    # Bounds-check every header-derived size/offset BEFORE it reaches numpy:
    # a corrupt vox_offset float (NaN/inf/huge) or the 7x int16 dim product
    # (up to ~4.7e31) would otherwise escape as a raw OverflowError from
    # np.frombuffer's C ssize_t conversion. Python ints are unbounded, so the
    # product and comparisons below are exact.
    n = 1
    for d in shape:
        n *= int(d)
    if not math.isfinite(vox_offset) or vox_offset < 0:
        raise ValueError(f"bad vox_offset {vox_offset!r}")
    off = int(vox_offset) if vox_offset else _HDR_SIZE + 4
    if off < _HDR_SIZE or off > len(data):
        raise ValueError(f"vox_offset {off} outside file of {len(data)} bytes")
    if n * dt.itemsize > len(data) - off:
        raise ValueError(
            f"voxel block out of bounds: dim {shape} x {dt.itemsize}B needs "
            f"{n * dt.itemsize} bytes at offset {off}, file has {len(data)}"
        )
    vol = np.frombuffer(data, dt, n, off).reshape(shape, order="F").astype(np.float64)
    if scl_slope not in (0.0, 1.0) or (scl_slope == 1.0 and scl_inter != 0.0):
        vol = vol * scl_slope + scl_inter

    if sform_code > 0:
        affine = np.vstack([srow, [0.0, 0.0, 0.0, 1.0]])
    elif qform_code > 0:
        rot = _quaternion_to_rotation(*quatern)
        qfac = -1.0 if pixdim[0] == -1.0 else 1.0
        zooms = np.array([pixdim[1], pixdim[2], pixdim[3] * qfac])
        affine = np.eye(4)
        affine[:3, :3] = rot * zooms
        affine[:3, 3] = qoffset
    else:
        affine = np.diag([pixdim[1], pixdim[2], pixdim[3], 1.0])

    header = {
        "dim": list(dim),
        "pixdim": list(pixdim),
        "datatype": datatype,
        "bitpix": bitpix,
        "scl_slope": scl_slope,
        "scl_inter": scl_inter,
        "qform_code": qform_code,
        "sform_code": sform_code,
    }
    return vol, affine, header


def io_orientation(affine: np.ndarray) -> np.ndarray:
    """F13 — orientation of an affine's voxel axes: row i = (output world
    axis that input axis i is closest to, +1/-1 direction). Same contract
    as the standard neuroimaging ``io_orientation`` (reference uses it in
    reformat/utils.py:58-70 to force axis order); greedy max-|component|
    assignment, sufficient for the axis-aligned affines scanners emit."""
    rot = np.asarray(affine, dtype=np.float64)[:3, :3]
    zooms = np.sqrt((rot**2).sum(axis=0))
    zooms[zooms == 0] = 1.0
    rn = rot / zooms
    ornt = np.zeros((3, 2))
    used: set[int] = set()
    # assign strongest pairs first so near-oblique affines resolve stably
    order = sorted(
        ((abs(rn[ax, j]), j, ax) for j in range(3) for ax in range(3)), reverse=True
    )
    done: set[int] = set()
    for _mag, j, ax in order:
        if j in done or ax in used:
            continue
        done.add(j)
        used.add(ax)
        ornt[j] = [ax, 1.0 if rn[ax, j] >= 0 else -1.0]
    return ornt


def inv_ornt_aff(ornt: np.ndarray, shape: tuple) -> np.ndarray:
    """Affine that maps coordinates in the REORIENTED array back to the
    original array (compose with the old affine to get the new one):
    ``new_affine = affine @ inv_ornt_aff(ornt, old_shape)``."""
    p = ornt.shape[0]
    shp = np.array(shape)[:p]
    undo_reorder = np.eye(p + 1)[[int(v) for v in ornt[:, 0]] + [p], :]
    undo_flip = np.diag(list(ornt[:, 1]) + [1.0])
    center = -(shp - 1) / 2.0
    undo_flip[:p, p] = (ornt[:, 1] * center) - center
    return undo_flip @ undo_reorder


def apply_orientation(vol: np.ndarray, ornt: np.ndarray) -> np.ndarray:
    """Flip/transpose the first 3 axes of ``vol`` per ``ornt`` (trailing
    axes, e.g. time, ride along untouched)."""
    out = vol
    for ax, flip in enumerate(ornt[:, 1]):
        if flip == -1:
            out = np.flip(out, axis=ax)
    perm = list(np.argsort(ornt[:, 0]).astype(int)) + list(range(3, vol.ndim))
    return out.transpose(perm)


def to_closest_canonical(
    vol: np.ndarray, affine: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Reorient a volume so its axes align with the world axes, positive
    direction (the ``as_reoriented``/``set_nifti_zooms`` step of the
    reference reformat, reformat/utils.py:58-75). World position of every
    voxel is preserved — asserted in tests."""
    ornt = io_orientation(affine)
    new_vol = apply_orientation(vol, ornt)
    new_affine = np.asarray(affine) @ inv_ornt_aff(ornt, vol.shape)
    return np.ascontiguousarray(new_vol), new_affine


def encode_nifti1(
    vol: np.ndarray, affine: np.ndarray | None = None,
    pixdim: tuple | None = None, compress: bool = False,
    scl_slope: float = 0.0, scl_inter: float = 0.0,
) -> bytes:
    """(volume, affine) → standard single-file NIfTI-1 bytes (sform_code=1,
    vox_offset=352, Fortran voxel order, little-endian). Test fixture
    generator AND a real S2-compatible sink payload."""
    vol = np.asarray(vol)
    if vol.dtype not in _CODES:
        raise ValueError(f"unsupported dtype {vol.dtype}")
    ndim = vol.ndim
    if not 1 <= ndim <= 7:
        raise ValueError(f"unsupported ndim {ndim}")
    if affine is None:
        affine = np.eye(4)
    affine = np.asarray(affine, dtype=np.float64)
    if pixdim is None:
        pixdim = tuple(float(np.linalg.norm(affine[:3, j])) for j in range(3))

    hdr = bytearray(_HDR_SIZE)
    struct.pack_into("<i", hdr, 0, _HDR_SIZE)
    hdr[38] = ord("r")  # 'regular' byte, conventional
    dims = [ndim, *vol.shape] + [1] * (7 - ndim)
    struct.pack_into("<8h", hdr, 40, *dims)
    struct.pack_into("<2h", hdr, 70, _CODES[vol.dtype], vol.dtype.itemsize * 8)
    pd8 = ([1.0, *map(float, pixdim)] + [1.0] * 8)[:8]
    struct.pack_into("<8f", hdr, 76, *pd8)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<2f", hdr, 112, scl_slope, scl_inter)
    struct.pack_into("<2h", hdr, 252, 0, 1)  # qform=0, sform=1
    struct.pack_into("<12f", hdr, 280, *affine[:3, :].ravel().tolist())
    hdr[344:348] = b"n+1\x00"

    body = bytes(hdr) + b"\x00" * 4 + np.asfortranarray(vol).tobytes(order="F")
    return gzip.compress(body, 6) if compress else body
