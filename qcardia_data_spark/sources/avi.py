"""Pure-Python RIFF/AVI MJPEG container codec — makes video a REAL
multimodal column (like WAV audio) instead of the deterministic stub.

Scope: the classic AVI 1.0 container (Microsoft AVIRIFF / OpenDML public
spec) with an MJPEG video stream — each frame is an independent baseline
JPEG, decoded by the in-tree T.81 codec (``sources/jpeg.py``). This is the
one mainstream video format whose full decode path needs nothing beyond
what the repo already implements; MP4/H.264 and friends remain an honest
``NotImplementedError`` boundary (inter-frame codecs are ffmpeg territory).

Scale design: ``parse_avi`` does NOT decode pixels. It walks the chunk tree
and returns zero-copy ``memoryview`` slices of the per-frame JPEG payloads,
so the frame-sampling predicate can select WHICH frames to decode before
any DCT work happens — the decode-after-predicate rule applied to the time
axis, now with a real codec behind it.

No counterpart code exists in the reference (it reads no video at all);
this extends its S2/S3 lazy-decode pattern
(reference setup/reformat/utils.py:132-215) to a new modality.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

_AVIF_HASINDEX = 0x00000010


def _iter_chunks(data, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_start, body_len) over a sibling chunk run.
    RIFF chunks are word-aligned (odd lengths padded with one byte)."""
    while pos + 8 <= end:
        cid = bytes(data[pos : pos + 4])
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + clen > end:
            raise ValueError(f"AVI chunk {cid!r} overruns its parent list")
        yield cid, body, clen
        pos = body + clen + (clen & 1)


def parse_avi(data: bytes) -> dict:
    """RIFF/AVI → stream metadata + LAZY per-frame JPEG payloads.

    Returns ``{"width", "height", "fps", "n_frames", "frames"}`` where
    ``frames`` is a list of ``memoryview`` slices (one compressed JPEG per
    video frame, in stream order) — no pixel decode happens here. Refuses
    loudly (``NotImplementedError``) for non-MJPEG video streams and
    (``ValueError``) for structurally broken files.
    """
    data = memoryview(data)
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    (riff_len,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_len, len(data))

    width = height = None
    fps = None
    handler = None
    frames: list = []
    saw_video_stream = False

    for cid, body, clen in _iter_chunks(data, 12, end):
        if cid != b"LIST":
            continue
        ltype = bytes(data[body : body + 4])
        if ltype == b"hdrl":
            for scid, sbody, sclen in _iter_chunks(data, body + 4, body + clen):
                if scid == b"LIST" and bytes(data[sbody : sbody + 4]) == b"strl":
                    ftype = fcc = None
                    scale = rate = 0
                    for tcid, tbody, tclen in _iter_chunks(
                        data, sbody + 4, sbody + sclen
                    ):
                        if tcid == b"strh":
                            ftype = bytes(data[tbody : tbody + 4])
                            fcc = bytes(data[tbody + 4 : tbody + 8])
                            scale, rate = struct.unpack_from("<II", data, tbody + 20)
                        elif tcid == b"strf" and ftype == b"vids":
                            # BITMAPINFOHEADER: biWidth/biHeight at +4/+8,
                            # biCompression fourcc at +16
                            width, height = struct.unpack_from("<ii", data, tbody + 4)
                            height = abs(height)
                            handler = bytes(data[tbody + 16 : tbody + 20]) or fcc
                    if ftype == b"vids":
                        saw_video_stream = True
                        if scale:
                            fps = rate / scale
        elif ltype == b"movi":
            for scid, sbody, sclen in _iter_chunks(data, body + 4, body + clen):
                # ##dc = compressed video frame for stream ##; ignore audio
                # (##wb) and any other interleaved chunks
                if scid[2:4] == b"dc":
                    frames.append(data[sbody : sbody + sclen])
                elif scid[2:4] == b"db":
                    raise NotImplementedError(
                        "uncompressed DIB frames (##db) in AVI: only MJPEG "
                        "(##dc JPEG payloads) is supported"
                    )

    if not saw_video_stream or width is None:
        raise ValueError("AVI has no video stream (strh 'vids' + strf)")
    norm = (handler or b"").upper()
    if norm not in (b"MJPG", b"MJPEG"[:4], b"JPEG"):
        raise NotImplementedError(
            f"AVI video codec {handler!r}: only MJPEG is supported "
            "(inter-frame codecs need external decoders)"
        )
    for i, fr in enumerate(frames):
        if bytes(fr[:2]) != b"\xff\xd8":
            raise ValueError(f"MJPEG frame {i} does not start with JPEG SOI")
    return {
        "width": int(width),
        "height": int(height),
        "fps": float(fps) if fps else 25.0,
        "n_frames": len(frames),
        "frames": frames,
    }


def decode_avi_frame(frames: list, frame_nr: int) -> np.ndarray:
    """Decode ONE sampled frame's JPEG payload → (h, w) or (h, w, 3) uint8.
    Kept separate from :func:`parse_avi` so callers pay DCT cost only for
    the frames the sampling predicate keeps."""
    from qcardia_data_spark.sources.jpeg import decode_jpeg

    return decode_jpeg(bytes(frames[frame_nr]))


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: float = 25.0, quality: int = 100
) -> bytes:
    """Grayscale (h, w) uint8 frames → MJPEG AVI bytes (test fixtures +
    the video sink twin of ``encode_wav``). Frames are JPEG-encoded with
    the in-tree T.81 encoder; quality=100 round-trips smooth content
    within ±1 grey level."""
    from qcardia_data_spark.sources.jpeg import encode_jpeg_gray

    if not frames:
        raise ValueError("cannot encode an empty frame list")
    h, w = frames[0].shape[:2]
    payloads = []
    for i, fr in enumerate(frames):
        if fr.shape[:2] != (h, w):
            raise ValueError(f"frame {i} shape {fr.shape} != frame 0 ({h}, {w})")
        payloads.append(encode_jpeg_gray(np.asarray(fr, dtype=np.uint8), quality))

    rate = int(round(fps * 1000))
    scale = 1000
    max_size = max(len(p) for p in payloads)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(round(1_000_000 / fps)),  # dwMicroSecPerFrame
        max_size * int(round(fps)),  # dwMaxBytesPerSec (advisory)
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,
        len(payloads),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_size,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"MJPG",
        0, 0, 0, 0,  # flags, priority, language, initial frames
        scale, rate,
        0, len(payloads),  # start, length (in frames)
        max_size,  # suggested buffer
        0xFFFFFFFF,  # quality (default)
        0,  # sample size (0 = varies)
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def list_chunk(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = b""
    offsets = []  # offset of each ckid relative to start of 'movi' fourcc
    for p in payloads:
        offsets.append(4 + len(movi_body))
        movi_body += chunk(b"00dc", p)
    movi = list_chunk(b"movi", movi_body)

    idx1 = b"".join(
        struct.pack("<4sIII", b"00dc", 0x10, off, len(p))  # AVIIF_KEYFRAME
        for off, p in zip(offsets, payloads)
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body
