"""Minimal pure-Python DICOM (Part-10) reader — the tag subset the
reference pipeline touches (``setup/reformat/utils.py:132-215``), with the
same validation semantics, and no pydicom dependency.

Scope: explicit- and implicit-VR little-endian transfer syntaxes with
uncompressed pixel data — what cardiac MR exports overwhelmingly are.
Compressed transfer syntaxes (JPEG/RLE) raise ``NotImplementedError`` at
the codec boundary, mirroring the honest-stub policy.

Tags are ``(group, element)`` ints; helpers expose the named ones the
reference asserts on (SeriesInstanceUID, InstanceNumber,
ImageOrientationPatient, ImagePositionPatient, …).
"""

from __future__ import annotations

import struct

import numpy as np

# named tags the reference reads (reformat/utils.py:158-183)
TAG_SERIES_UID = (0x0020, 0x000E)
TAG_INSTANCE_NUMBER = (0x0020, 0x0013)
TAG_ORIENTATION = (0x0020, 0x0037)  # ImageOrientationPatient, 6×DS
TAG_POSITION = (0x0020, 0x0032)  # ImagePositionPatient, 3×DS
TAG_TEMPORAL_POSITIONS = (0x0020, 0x0105)  # NumberOfTemporalPositions
TAG_TEMPORAL_ID = (0x0020, 0x0100)  # TemporalPositionIdentifier
TAG_MANUFACTURER = (0x0008, 0x0070)
TAG_PIXEL_SPACING = (0x0028, 0x0030)  # 2×DS (row, col spacing mm)
TAG_SLICE_THICKNESS = (0x0018, 0x0050)  # DS
TAG_ROWS = (0x0028, 0x0010)
TAG_COLS = (0x0028, 0x0011)
TAG_BITS_ALLOCATED = (0x0028, 0x0100)
TAG_PIXEL_REPRESENTATION = (0x0028, 0x0103)
TAG_PIXEL_DATA = (0x7FE0, 0x0010)
TAG_TRANSFER_SYNTAX = (0x0002, 0x0010)

TS_IMPLICIT_LE = "1.2.840.10008.1.2"
TS_EXPLICIT_LE = "1.2.840.10008.1.2.1"

# the reference's required-tag assertions, verbatim set
REQUIRED_TAGS = {
    TAG_SERIES_UID: "SeriesInstanceUID",
    TAG_INSTANCE_NUMBER: "InstanceNumber",
    TAG_ORIENTATION: "ImageOrientationPatient",
    TAG_POSITION: "ImagePositionPatient",
}

_LONG_VRS = {b"OB", b"OW", b"OF", b"OL", b"OD", b"SQ", b"UC", b"UR", b"UT", b"UN"}
_STRING_VRS = {b"AE", b"AS", b"CS", b"DA", b"DT", b"LO", b"LT", b"PN", b"SH",
               b"ST", b"TM", b"UI", b"UC", b"UR", b"UT"}


def _decode_value(vr: bytes, body: bytes):
    if vr in (b"US",):
        return list(struct.unpack(f"<{len(body) // 2}H", body)) if body else []
    if vr in (b"SS",):
        return list(struct.unpack(f"<{len(body) // 2}h", body))
    if vr in (b"UL",):
        return list(struct.unpack(f"<{len(body) // 4}I", body))
    if vr in (b"SL",):
        return list(struct.unpack(f"<{len(body) // 4}i", body))
    if vr in (b"FL",):
        return list(struct.unpack(f"<{len(body) // 4}f", body))
    if vr in (b"FD",):
        return list(struct.unpack(f"<{len(body) // 8}d", body))
    if vr in (b"IS",):
        s = body.decode("ascii", "replace").strip("\x00 ")
        return [int(x) for x in s.split("\\") if x.strip()]
    if vr in (b"DS",):
        s = body.decode("ascii", "replace").strip("\x00 ")
        return [float(x) for x in s.split("\\") if x.strip()]
    if vr in _STRING_VRS:
        return body.decode("ascii", "replace").strip("\x00 ")
    return body  # raw (pixel data, unknowns)


def parse_dicom(data: bytes) -> dict:
    """DICOM Part-10 bytes → ``{(group, element): value}``.

    Walks the File Meta group (always explicit LE), reads the transfer
    syntax, then the dataset in that syntax. Multi-valued numerics come
    back as lists; single strings as str; pixel data as raw bytes under
    ``TAG_PIXEL_DATA``."""
    if len(data) < 132 + 8 or data[128:132] != b"DICM":
        raise ValueError("not a DICOM Part-10 file (missing DICM marker)")
    tags: dict = {}
    pos = 132

    def read_element(pos: int, explicit: bool) -> tuple[int, tuple, bytes, bytes]:
        group, elem = struct.unpack_from("<HH", data, pos)
        pos += 4
        if explicit:
            vr = data[pos : pos + 2]
            if vr in _LONG_VRS:
                (length,) = struct.unpack_from("<I", data, pos + 4)
                pos += 8
            else:
                (length,) = struct.unpack_from("<H", data, pos + 2)
                pos += 4
        else:
            vr = b"UN"
            (length,) = struct.unpack_from("<I", data, pos)
            pos += 4
        if length == 0xFFFFFFFF:
            raise NotImplementedError(
                "undefined-length (encapsulated/compressed) elements not supported"
            )
        body = data[pos : pos + length]
        return pos + length, (group, elem), vr, body

    # file meta group (0002,xxxx): explicit LE by the standard
    while pos < len(data):
        group = struct.unpack_from("<H", data, pos)[0]
        if group != 0x0002:
            break
        pos, tag, vr, body = read_element(pos, explicit=True)
        tags[tag] = _decode_value(vr, body)

    ts = tags.get(TAG_TRANSFER_SYNTAX, TS_EXPLICIT_LE)
    if ts not in (TS_EXPLICIT_LE, TS_IMPLICIT_LE):
        raise NotImplementedError(f"transfer syntax {ts} needs external codecs")
    explicit = ts == TS_EXPLICIT_LE

    # implicit VR: recover types for the tags we know
    _known_vr = {
        TAG_SERIES_UID: b"UI", TAG_INSTANCE_NUMBER: b"IS", TAG_ORIENTATION: b"DS",
        TAG_POSITION: b"DS", TAG_TEMPORAL_POSITIONS: b"IS", TAG_TEMPORAL_ID: b"IS",
        TAG_MANUFACTURER: b"LO", TAG_ROWS: b"US", TAG_COLS: b"US",
        TAG_PIXEL_SPACING: b"DS", TAG_SLICE_THICKNESS: b"DS",
        TAG_BITS_ALLOCATED: b"US", TAG_PIXEL_REPRESENTATION: b"US",
    }
    while pos + 8 <= len(data):
        pos, tag, vr, body = read_element(pos, explicit)
        if not explicit:
            vr = _known_vr.get(tag, b"UN")
        tags[tag] = _decode_value(vr, body)
    return tags


def validate_dicom_tags(tags: dict, source: str = "?") -> None:
    """The reference's per-file tag assertions (reformat/utils.py:157-168):
    every required tag must be present, else fail loudly naming the file —
    a data-quality gate, not a warning."""
    missing = [name for tag, name in REQUIRED_TAGS.items() if tag not in tags]
    if missing:
        raise ValueError(f"Invalid Dicom file: {', '.join(missing)} not found in {source}")


def temporal_position(tags: dict) -> int:
    """Reference fallback chain (reformat/utils.py:175-183): files with one
    temporal position order by InstanceNumber, multi-phase series by
    TemporalPositionIdentifier; absent NumberOfTemporalPositions ⇒ 1."""
    n_temporal = tags.get(TAG_TEMPORAL_POSITIONS, [1])
    n = int(n_temporal[0]) if isinstance(n_temporal, list) else int(n_temporal)
    if n == 1:
        return int(tags[TAG_INSTANCE_NUMBER][0])
    return int(tags[TAG_TEMPORAL_ID][0])


def pixel_array(tags: dict) -> np.ndarray:
    """Uncompressed pixel data → (rows, cols) numpy array (pydicom
    ``pixel_array`` equivalent for native transfer syntaxes)."""
    rows = int(tags[TAG_ROWS][0])
    cols = int(tags[TAG_COLS][0])
    bits = int(tags.get(TAG_BITS_ALLOCATED, [16])[0])
    signed = int(tags.get(TAG_PIXEL_REPRESENTATION, [0])[0])
    raw = tags[TAG_PIXEL_DATA]
    dt = {(8, 0): np.uint8, (8, 1): np.int8, (16, 0): "<u2", (16, 1): "<i2"}[(bits, signed)]
    return np.frombuffer(raw, dtype=np.dtype(dt), count=rows * cols).reshape(rows, cols)


def encode_dicom(
    pixels: np.ndarray, series_uid: str, instance_number: int,
    position: tuple, orientation: tuple, n_temporal: int = 1,
    temporal_id: int | None = None, manufacturer: str = "TESTVENDOR",
    pixel_spacing: tuple = (1.0, 1.0), slice_thickness: float = 1.0,
    implicit: bool = False, omit_tags: tuple = (),
) -> bytes:
    """Fabricate a REAL Part-10 DICOM file (test fixture generator): 128-byte
    preamble, DICM, meta group, dataset in explicit or implicit VR LE."""
    pixels = np.ascontiguousarray(pixels)
    if pixels.dtype not in (np.dtype(np.uint8), np.dtype("<u2"), np.dtype(np.uint16)):
        raise ValueError("test encoder supports uint8/uint16 pixels")
    bits = pixels.dtype.itemsize * 8

    def elem_explicit(tag, vr: bytes, body: bytes) -> bytes:
        head = struct.pack("<HH", *tag)
        if vr in _LONG_VRS:
            return head + vr + b"\x00\x00" + struct.pack("<I", len(body)) + body
        return head + vr + struct.pack("<H", len(body)) + body

    def elem_implicit(tag, _vr: bytes, body: bytes) -> bytes:
        return struct.pack("<HH", *tag) + struct.pack("<I", len(body)) + body

    def pad(s: str) -> bytes:
        b = s.encode("ascii")
        return b + (b"\x00" if len(b) % 2 else b"")

    ts = TS_IMPLICIT_LE if implicit else TS_EXPLICIT_LE
    meta = elem_explicit(TAG_TRANSFER_SYNTAX, b"UI", pad(ts))
    meta = elem_explicit((0x0002, 0x0000), b"UL", struct.pack("<I", len(meta))) + meta

    emit = elem_implicit if implicit else elem_explicit
    ds = []
    items = [
        (TAG_MANUFACTURER, b"LO", pad(manufacturer)),
        (TAG_SLICE_THICKNESS, b"DS", pad(f"{slice_thickness:g}")),
        (TAG_PIXEL_SPACING, b"DS", pad("\\".join(f"{v:g}" for v in pixel_spacing))),
        (TAG_SERIES_UID, b"UI", pad(series_uid)),
        (TAG_TEMPORAL_ID, b"IS", pad(str(temporal_id)) if temporal_id is not None else None),
        (TAG_INSTANCE_NUMBER, b"IS", pad(str(instance_number))),
        (TAG_POSITION, b"DS", pad("\\".join(f"{v:g}" for v in position))),
        (TAG_ORIENTATION, b"DS", pad("\\".join(f"{v:g}" for v in orientation))),
        (TAG_TEMPORAL_POSITIONS, b"IS", pad(str(n_temporal))),
        (TAG_ROWS, b"US", struct.pack("<H", pixels.shape[0])),
        (TAG_COLS, b"US", struct.pack("<H", pixels.shape[1])),
        (TAG_BITS_ALLOCATED, b"US", struct.pack("<H", bits)),
        (TAG_PIXEL_REPRESENTATION, b"US", struct.pack("<H", 0)),
        (TAG_PIXEL_DATA, b"OW", pixels.tobytes()),
    ]
    for tag, vr, body in sorted(items, key=lambda t: t[0]):
        if body is None or tag in omit_tags:
            continue
        ds.append(emit(tag, vr, body))
    return b"\x00" * 128 + b"DICM" + meta + b"".join(ds)
