"""Pure-Python PNG codec (S11) — no PIL dependency.

The reference exports example slices as PNGs via PIL
(``data_predictor.py:337-414``: grayscale ``image*255 → uint8`` plus
3-channel label/probability maps, one folder per subject). PNG itself is
just zlib-compressed filtered scanlines wrapped in CRC'd chunks, so the
container lives in the stdlib: ``encode_png`` writes standard 8-bit
grayscale / RGB PNGs any viewer opens, and ``decode_png`` reads back what
we wrote (filter-0 scanlines) for round-trip verification.

Executor-side usage: these run inside ``foreachPartition`` tasks — pure
CPU, no shared state, no driver funnel.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr) -> bytes:
    """uint8 array → PNG bytes. ``(h, w)`` → grayscale (color type 0);
    ``(h, w, 3)`` → RGB (color type 2). 8-bit depth, filter 0 per scanline
    (zlib level 6 — the compression sweet spot for medical masks)."""
    import numpy as np

    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_png expects uint8, got {a.dtype}")
    if a.ndim == 2:
        color_type = 0
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type = 2
        h, w = a.shape[:2]
    else:
        raise ValueError(f"encode_png expects (h,w) or (h,w,3), got {a.shape}")

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes):
    """PNG bytes → uint8 numpy array. Handles what ``encode_png`` emits
    (8-bit gray/RGB, filter 0) plus filters 1-2 for robustness; validates
    signature and every chunk CRC."""
    import numpy as np

    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    try:
        return _decode_png_inner(data)
    except (IndexError, struct.error, zlib.error, EOFError) as exc:
        # truncated/corrupt streams can run any chunk read off the end or
        # hand zlib garbage — surface all of it as a decode error
        raise ValueError(f"truncated or corrupt PNG: {exc}") from None


def _decode_png_inner(data: bytes):
    import numpy as np

    pos, ihdr, idat = 8, None, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in (0, 2):
        raise ValueError(f"unsupported PNG variant: depth={depth} ct={color_type}")
    nch = 1 if color_type == 0 else 3
    stride = w * nch
    raw = zlib.decompress(idat)
    # w/h are CRC-protected, but a stream that decompresses short of the
    # header's geometry must not reach the per-row indexing (raw IndexError)
    # or allocate h*stride from a lying header — check BEFORE np.empty
    if len(raw) < h * (stride + 1):
        raise ValueError(
            f"IDAT decompresses to {len(raw)} bytes, header needs {h * (stride + 1)}"
        )
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1).copy()
        if ftype == 1:  # Sub
            for x in range(nch, stride):
                line[x] = (int(line[x]) + int(line[x - nch])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype != 0:
            raise ValueError(f"unsupported filter {ftype}")
        out[y] = line
        prev = line
    return out if nch == 1 else out.reshape(h, w, 3)
