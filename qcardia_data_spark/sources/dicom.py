"""Minimal pure-Python DICOM (Part-10) reader — the tag subset the
reference pipeline touches (``setup/reformat/utils.py:132-215``), with the
same validation semantics, and no pydicom dependency.

Scope: explicit- and implicit-VR little-endian transfer syntaxes with
uncompressed pixel data — what cardiac MR exports overwhelmingly are —
plus RLE Lossless (1.2.840.10008.1.2.5, PS3.5 Annex G: encapsulated
fragments, 64-byte segment-offset header, PackBits segments recombined as
byte planes), JPEG Baseline Process 1 (1.2.840.10008.1.2.4.50) and JPEG
Progressive Process 10 (1.2.840.10008.1.2.4.55, 8-bit Huffman successive
approximation / spectral selection) and JPEG Extended Process 2
(1.2.840.10008.1.2.4.51, 12-bit sequential), all via the pure-Python T.81
codec in ``sources/jpeg.py`` — no external libs. The remaining JPEG family
(2000, LS, arithmetic) raises ``NotImplementedError`` at the codec
boundary — honest stubs, named.

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

TAG_NUMBER_OF_FRAMES = (0x0028, 0x0008)

TS_IMPLICIT_LE = "1.2.840.10008.1.2"
TS_EXPLICIT_LE = "1.2.840.10008.1.2.1"
TS_RLE = "1.2.840.10008.1.2.5"  # RLE Lossless, PS3.5 Annex G
TS_JPEG_BASELINE = "1.2.840.10008.1.2.4.50"  # JPEG Baseline (Process 1), 8-bit
TS_JPEG_PROGRESSIVE = "1.2.840.10008.1.2.4.55"  # JPEG Progressive (Process 10), 8-bit
TS_JPEG_EXTENDED = "1.2.840.10008.1.2.4.51"  # JPEG Extended (Process 2/4), 12-bit

_TAG_ITEM = (0xFFFE, 0xE000)
_TAG_SEQ_DELIM = (0xFFFE, 0xE0DD)

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
    try:
        return _parse_dicom_inner(data)
    except (IndexError, struct.error) as exc:
        # a truncated/corrupt dataset can run any element read off the end
        raise ValueError(f"truncated or corrupt DICOM: {exc}") from None


def _parse_dicom_inner(data: bytes) -> dict:
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
            if (group, elem) != TAG_PIXEL_DATA:
                raise NotImplementedError(
                    "undefined-length elements supported only for encapsulated "
                    "PixelData"
                )
            # encapsulated pixel data (PS3.5 A.4): Basic Offset Table item,
            # then one-or-more fragment items, closed by a sequence
            # delimiter. Fragments are returned as a tuple (frame
            # reassembly is the decoder's job).
            frags: list[bytes] = []
            first = True
            while True:
                ig, ie, ilen = struct.unpack_from("<HHI", data, pos)
                pos += 8
                if (ig, ie) == _TAG_SEQ_DELIM:
                    break
                if (ig, ie) != _TAG_ITEM:
                    raise ValueError(
                        f"bad encapsulated-pixel-data item tag ({ig:04x},{ie:04x})"
                    )
                if not first:  # first item is the offset table — skip it
                    frags.append(data[pos : pos + ilen])
                first = False
                pos += ilen
            return pos, (group, elem), vr, tuple(frags)
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
    if ts not in (
        TS_EXPLICIT_LE, TS_IMPLICIT_LE, TS_RLE, TS_JPEG_BASELINE,
        TS_JPEG_PROGRESSIVE, TS_JPEG_EXTENDED,
    ):
        raise NotImplementedError(
            f"transfer syntax {ts} needs external codecs "
            "(JPEG 2000/LS/arithmetic, MPEG — baseline Process 1, "
            "Extended 12-bit Process 2 and progressive Process 10 ARE "
            "supported)"
        )
    explicit = ts != TS_IMPLICIT_LE  # RLE/JPEG datasets are explicit VR LE

    # implicit VR: recover types for the tags we know
    _known_vr = {
        TAG_SERIES_UID: b"UI", TAG_INSTANCE_NUMBER: b"IS", TAG_ORIENTATION: b"DS",
        TAG_POSITION: b"DS", TAG_TEMPORAL_POSITIONS: b"IS", TAG_TEMPORAL_ID: b"IS",
        TAG_MANUFACTURER: b"LO", TAG_ROWS: b"US", TAG_COLS: b"US",
        TAG_PIXEL_SPACING: b"DS", TAG_SLICE_THICKNESS: b"DS",
        TAG_BITS_ALLOCATED: b"US", TAG_PIXEL_REPRESENTATION: b"US",
        TAG_NUMBER_OF_FRAMES: b"IS",
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


def _packbits_decode(seg: bytes, expected: int) -> bytes:
    """PS3.5 G.3.1 byte-segment decoder (PackBits): control n in [0,127] →
    copy n+1 literal bytes; n in [129,255] → repeat next byte 257−n times;
    n == 128 → no-op. Stops once ``expected`` bytes are produced (segments
    are even-padded on disk)."""
    out = bytearray()
    i = 0
    while i < len(seg) and len(out) < expected:
        n = seg[i]
        i += 1
        if n <= 127:
            out += seg[i : i + n + 1]
            i += n + 1
        elif n >= 129:
            out += seg[i : i + 1] * (257 - n)
            i += 1
        # n == 128: reserved no-op
    if len(out) < expected:
        raise ValueError(f"RLE segment underflow: {len(out)} < {expected} bytes")
    return bytes(out[:expected])


def _packbits_encode(plane: bytes) -> bytes:
    """PackBits encoder (test-fixture / sink use): literal runs chunked to
    ≤128, repeat runs of ≥2 emitted as 257−count controls."""
    out = bytearray()
    i, n = 0, len(plane)
    while i < n:
        # find run length of identical bytes
        j = i
        while j + 1 < n and plane[j + 1] == plane[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out += bytes([257 - run, plane[i]])
            i = j + 1
        else:
            # literal stretch until the next ≥2-run (or 128 bytes)
            k = i
            while (
                k + 1 < n and not (k + 2 < n and plane[k + 1] == plane[k + 2])
                and k - i < 127
            ):
                k += 1
            lit = plane[i : k + 1]
            out += bytes([len(lit) - 1]) + lit
            i = k + 1
    return bytes(out)


def rle_decode_frame(frame: bytes, rows: int, cols: int, bytes_per_sample: int) -> bytes:
    """One RLE frame (PS3.5 Annex G) → native little-endian sample bytes.

    Frame layout: 64-byte header of 16 uint32 LE (segment count + up to 15
    segment offsets), then PackBits segments. Segment k holds byte k of
    each composite pixel code, MOST significant first — so a 16-bit sample
    is rebuilt as ``(seg0 << 8) | seg1``."""
    if len(frame) < 64:
        raise ValueError("RLE frame shorter than its 64-byte header")
    header = struct.unpack_from("<16I", frame, 0)
    n_segs = header[0]
    if n_segs != bytes_per_sample:
        raise ValueError(
            f"RLE segment count {n_segs} != bytes per sample {bytes_per_sample} "
            "(multi-sample photometric interpretations not supported)"
        )
    n_px = rows * cols
    offsets = list(header[1 : 1 + n_segs]) + [len(frame)]
    planes = [
        _packbits_decode(frame[offsets[k] : offsets[k + 1]], n_px)
        for k in range(n_segs)
    ]
    if bytes_per_sample == 1:
        return planes[0]
    # interleave MSB-first planes back into little-endian samples
    arr = np.zeros(n_px, dtype="<u2")
    arr |= np.frombuffer(planes[0], dtype=np.uint8).astype("<u2") << 8
    arr |= np.frombuffer(planes[1], dtype=np.uint8).astype("<u2")
    return arr.tobytes()


def rle_encode_frame(pixels: np.ndarray) -> bytes:
    """(rows, cols) uint8/uint16 → one RLE frame (header + PackBits
    segments, MSB plane first, segments even-padded) — the inverse of
    :func:`rle_decode_frame`, used by the test fixtures and the record
    sink's compressed form."""
    flat = np.ascontiguousarray(pixels).ravel()
    if pixels.dtype.itemsize == 1:
        planes = [flat.astype(np.uint8).tobytes()]
    else:
        v = flat.astype("<u2")
        planes = [(v >> 8).astype(np.uint8).tobytes(), (v & 0xFF).astype(np.uint8).tobytes()]
    segs = []
    for p in planes:
        s = _packbits_encode(p)
        if len(s) % 2:
            s += b"\x00"
        segs.append(s)
    header = [len(segs)]
    off = 64
    for s in segs:
        header.append(off)
        off += len(s)
    header += [0] * (16 - len(header))
    return struct.pack("<16I", *header) + b"".join(segs)


def pixel_array(tags: dict) -> np.ndarray:
    """Pixel data → (rows, cols) numpy array (pydicom ``pixel_array``
    equivalent): native little-endian for the uncompressed syntaxes,
    pure-Python Annex-G decode for RLE Lossless (fragments → frame →
    PackBits planes → samples)."""
    for req, name in ((TAG_ROWS, "Rows"), (TAG_COLS, "Columns"), (TAG_PIXEL_DATA, "PixelData")):
        if req not in tags or (isinstance(tags[req], list) and not tags[req]):
            raise ValueError(f"DICOM dataset missing {name} — corrupt or non-image file")
    rows = int(tags[TAG_ROWS][0])
    cols = int(tags[TAG_COLS][0])
    bits = int(tags.get(TAG_BITS_ALLOCATED, [16])[0])
    signed = int(tags.get(TAG_PIXEL_REPRESENTATION, [0])[0])
    raw = tags[TAG_PIXEL_DATA]
    try:
        dt = {(8, 0): np.uint8, (8, 1): np.int8, (16, 0): "<u2", (16, 1): "<i2"}[(bits, signed)]
    except KeyError:
        raise ValueError(
            f"unsupported BitsAllocated/PixelRepresentation ({bits}, {signed})"
        ) from None
    if isinstance(raw, tuple):  # encapsulated (RLE / JPEG baseline)
        nf = tags.get(TAG_NUMBER_OF_FRAMES, [1])
        n_frames = int(nf[0]) if isinstance(nf, list) and nf else 1
        if n_frames != 1:
            # decoding only frame 1 of a cine would be SILENT data loss
            raise NotImplementedError(
                f"multi-frame encapsulated PixelData ({n_frames} frames) "
                "not supported: split frames upstream or use a native syntax"
            )
        ts = tags.get(TAG_TRANSFER_SYNTAX, TS_EXPLICIT_LE)
        if ts in (TS_JPEG_BASELINE, TS_JPEG_PROGRESSIVE, TS_JPEG_EXTENDED):
            from qcardia_data_spark.sources.jpeg import decode_jpeg

            # a single frame may be split across fragments (PS3.5 A.4) —
            # concatenate before handing to the codec. A later fragment that
            # *starts its own* JPEG stream (SOI marker) means a multi-frame
            # cine whose NumberOfFrames tag is missing — decoding frame 1
            # only would be silent data loss, so refuse loudly instead.
            if any(frag[:2] == b"\xff\xd8" for frag in raw[1:]):
                raise NotImplementedError(
                    f"encapsulated JPEG PixelData with {len(raw)} fragments "
                    "where a later fragment begins with SOI: multi-frame "
                    "cine without NumberOfFrames — split frames upstream"
                )
            img = decode_jpeg(b"".join(raw))
            if img.ndim != 2:
                raise NotImplementedError(
                    "color JPEG DICOM (3-component) — MR exports are MONOCHROME"
                )
            if img.shape != (rows, cols):
                raise ValueError(
                    f"JPEG frame {img.shape} != Rows/Columns ({rows}, {cols})"
                )
            return img.astype(np.dtype(dt)) if bits == 8 else img.astype("<u2")
        if len(raw) != 1:
            # one fragment per frame is mandatory for RLE (PS3.5 Annex G),
            # so extra fragments mean a multi-frame cine even without a
            # NumberOfFrames tag — decoding frame 1 only would be silent loss
            raise NotImplementedError(
                f"multi-frame RLE PixelData ({len(raw)} fragments) not "
                "supported: split frames upstream or use a native syntax"
            )
        raw = rle_decode_frame(raw[0], rows, cols, bits // 8)
    return np.frombuffer(raw, dtype=np.dtype(dt), count=rows * cols).reshape(rows, cols)


def encode_dicom(
    pixels: np.ndarray, series_uid: str, instance_number: int,
    position: tuple, orientation: tuple, n_temporal: int = 1,
    temporal_id: int | None = None, manufacturer: str = "TESTVENDOR",
    pixel_spacing: tuple = (1.0, 1.0), slice_thickness: float = 1.0,
    implicit: bool = False, omit_tags: tuple = (), rle: bool = False,
    jpeg: bool = False, jpeg_quality: int = 100, jpeg_progressive: bool = False,
    jpeg_extended: bool = False,
) -> bytes:
    """Fabricate a REAL Part-10 DICOM file (test fixture generator): 128-byte
    preamble, DICM, meta group, dataset in explicit or implicit VR LE —
    or RLE Lossless (``rle=True``: encapsulated undefined-length PixelData
    with offset-table item + one PackBits frame + sequence delimiter) — or
    JPEG Baseline Process 1 (``jpeg=True``: encapsulated, 8-bit grayscale,
    encoded by the pure-Python ``sources/jpeg.py`` codec;
    ``jpeg_progressive=True`` writes Progressive Process 10, TS .55,
    successive-approximation scan script; ``jpeg_extended=True`` writes
    12-bit Extended Process 2, TS .51, uint16 pixels in [0, 4095])."""
    if (rle or jpeg) and implicit:
        raise ValueError("encapsulated syntaxes are explicit-VR")
    if rle and jpeg:
        raise ValueError("pick one encapsulated syntax")
    pixels = np.ascontiguousarray(pixels)
    if jpeg and jpeg_extended and jpeg_progressive:
        raise ValueError("pick one JPEG process")
    if jpeg and jpeg_extended:
        if pixels.dtype not in (np.dtype("<u2"), np.dtype(np.uint16)):
            raise ValueError("JPEG Extended (Process 2) needs uint16 pixels")
    elif jpeg and pixels.dtype != np.dtype(np.uint8):
        raise ValueError("JPEG Baseline (Process 1) is 8-bit only")
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

    ts = (
        TS_JPEG_PROGRESSIVE if jpeg and jpeg_progressive
        else TS_JPEG_EXTENDED if jpeg and jpeg_extended
        else TS_JPEG_BASELINE if jpeg
        else TS_RLE if rle
        else TS_IMPLICIT_LE if implicit
        else TS_EXPLICIT_LE
    )
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
    ]
    if not rle and not jpeg:
        items.append((TAG_PIXEL_DATA, b"OW", pixels.tobytes()))
    for tag, vr, body in sorted(items, key=lambda t: t[0]):
        if body is None or tag in omit_tags:
            continue
        ds.append(emit(tag, vr, body))
    if (rle or jpeg) and TAG_PIXEL_DATA not in omit_tags:
        if jpeg:
            from qcardia_data_spark.sources.jpeg import (
                encode_jpeg_gray,
                encode_jpeg_gray12,
                encode_jpeg_gray_progressive,
            )

            frame = (
                encode_jpeg_gray_progressive(pixels, jpeg_quality)
                if jpeg_progressive
                else encode_jpeg_gray12(np.ascontiguousarray(pixels, np.uint16), jpeg_quality)
                if jpeg_extended
                else encode_jpeg_gray(pixels, jpeg_quality)
            )
            if len(frame) % 2:
                frame += b"\x00"  # fragments are even-length (PS3.5 A.4)
        else:
            frame = rle_encode_frame(pixels)
        encap = (
            struct.pack("<HH", *TAG_PIXEL_DATA) + b"OB\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
            + struct.pack("<HHI", *_TAG_ITEM, 0)           # empty offset table
            + struct.pack("<HHI", *_TAG_ITEM, len(frame)) + frame
            + struct.pack("<HHI", *_TAG_SEQ_DELIM, 0)
        )
        ds.append(encap)
    return b"\x00" * 128 + b"DICM" + meta + b"".join(ds)
