"""Pure-Python baseline JPEG codec (ITU-T T.81 Process 1) — closes the last
codec boundary in the DICOM reader (transfer syntax 1.2.840.10008.1.2.4.50,
JPEG Baseline, the only JPEG family member that is 8-bit sequential DCT).

Decoder scope: baseline sequential, 8-bit, 1-3 components, interleaved
single-scan, restart markers, 4:4:4 / 4:2:2 / 4:2:0 subsampling (nearest
upsample), JFIF YCbCr→RGB for 3-component images. Progressive (SOF2),
arithmetic coding, and 12-bit (Extended, .51) raise ``NotImplementedError``
— honest boundaries, named.

Encoder scope (test fixtures + sink): grayscale 8-bit (``encode_jpeg_gray``)
and 3-component color at 4:4:4 or 4:2:0 (``encode_jpeg_color``), Annex
K.1/K.3 standard tables, quality-scaled. A quality-100 table of mostly 1s
round-trips smooth images within ±1; constant blocks round-trip exactly.
The color/420 encoder exists to exercise the decoder's MCU-interleave and
upsample paths with real bitstreams.

Everything here implements the public ITU-T T.81 / ISO 10918-1 spec; no
counterpart code exists in the reference (it delegates to pydicom/pillow,
reference setup/reformat/utils.py:157-168).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants (T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 luminance quantization table (zigzag order NOT applied here —
# this is natural row-major order)
K1_LUMA_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
K3_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K3_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8×8 DCT-II basis matrix: A[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _build_huffman(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman (T.81 Annex C): {(length, code) -> symbol}."""
    if len(bits) != 16 or sum(bits) > len(values):
        raise ValueError("malformed JPEG Huffman table (BITS/HUFFVAL mismatch)")
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huffman_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Inverse mapping for the encoder: {symbol -> (length, code)}."""
    return {sym: (ln, code) for (ln, code), sym in _build_huffman(bits, values).items()}


class _BitReader:
    """MSB-first entropy-coded-segment reader with FF00 byte-unstuffing and
    restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _next_byte(self) -> int:
        d = self.data
        while True:
            if self.pos >= len(d):
                raise ValueError("JPEG entropy stream truncated")
            b = d[self.pos]
            self.pos += 1
            if b != 0xFF:
                return b
            if self.pos >= len(d):
                raise ValueError("JPEG entropy stream ends inside a marker")
            m = d[self.pos]
            if m == 0x00:  # stuffed FF
                self.pos += 1
                return 0xFF
            # a real marker: the caller should have consumed it (RST) or the
            # scan is over (EOI/next marker) — signal cleanly
            raise _MarkerReached(m)

    def read_bit(self) -> int:
        if self.n == 0:
            self.acc = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self, expected: int) -> None:
        """Discard bits to the byte boundary and consume the RSTn marker."""
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                if d[self.pos + 1] != 0xD0 + (expected & 7):
                    raise ValueError("JPEG restart marker out of sequence")
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker not found")


class _MarkerReached(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 array (rows, cols) or (rows, cols, 3).

    Implements T.81 Process 1 end to end: marker parse, canonical Huffman,
    interleaved MCU entropy decode with restart intervals, dequantize,
    un-zigzag, float IDCT, component upsample, JFIF YCbCr→RGB.
    """
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (precision, h, w, comps) ; comps = [(cid, hi, vi, tq)]

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seg_len,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables (Pq=1)")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[i : i + 64], dtype=np.uint8)
                quant[tq] = tbl.reshape(8, 8)
                i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                values = list(seg[i + 17 : i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, values)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline/ext sequential
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG (only 8-bit baseline)")
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (precision, h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (progressive/arithmetic/lossless) — "
                "only baseline sequential (SOF0/1) is supported"
            )
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_sel = []  # (comp_idx, dc_table, ac_table)
            for s in range(ns):
                cs, tt = seg[1 + 2 * s : 3 + 2 * s]
                idx = next(i for i, c in enumerate(frame[3]) if c[0] == cs)
                scan_sel.append((idx, tt >> 4, tt & 0xF))
            pos += seg_len
            return _decode_scan(
                data, pos, frame, scan_sel, quant, huff_dc, huff_ac, restart_interval
            )
        # APPn / COM / others: skip
        pos += seg_len
    raise ValueError("JPEG ended without a scan")


def _decode_scan(data, pos, frame, scan_sel, quant, huff_dc, huff_ac, restart_interval):
    _, h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component pixel planes at component resolution
    planes = [
        np.zeros((mcus_y * c[2] * 8, mcus_x * c[1] * 8), dtype=np.float64) for c in comps
    ]
    r = _BitReader(data, pos)
    preds = [0] * len(comps)
    n_mcu = mcus_x * mcus_y
    rst_count = 0
    try:
        for m in range(n_mcu):
            if restart_interval and m and m % restart_interval == 0:
                r.align_to_restart(rst_count)
                rst_count = (rst_count + 1) & 7
                preds = [0] * len(comps)
            my, mx = divmod(m, mcus_x)
            for ci, dc_t, ac_t in scan_sel:
                _, hi, vi, tq = comps[ci]
                for by in range(vi):
                    for bx in range(hi):
                        block = _decode_block(
                            r, huff_dc[dc_t], huff_ac[ac_t], quant[tq], preds, ci
                        )
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = _idct2(block)
    except _MarkerReached as e:
        # a marker (EOI / next segment) inside the entropy data before all
        # MCUs decoded = truncated scan — surface as a normal decode error,
        # not the internal control-flow exception
        raise ValueError(
            f"JPEG scan truncated at MCU {m}/{n_mcu} (marker 0x{e.marker:02X})"
        ) from None
    # level shift, clamp, upsample to full resolution, crop
    out = []
    for ci, (_, hi, vi, _tq) in enumerate(comps):
        p = planes[ci] + 128.0
        p = np.clip(np.round(p), 0, 255).astype(np.uint8)
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return out[0]
    if len(out) == 3:  # JFIF YCbCr → RGB (BT.601 full range)
        y, cb, cr = (o.astype(np.float64) for o in out)
        r_ = y + 1.402 * (cr - 128.0)
        g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b_ = y + 1.772 * (cb - 128.0)
        return np.stack(
            [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r_, g_, b_)], axis=-1
        )
    raise NotImplementedError(f"{len(out)}-component JPEG")


def _decode_block(r, dc_table, ac_table, qtbl, preds, ci) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int32)
    size = _decode_symbol(r, dc_table)
    diff = _extend(r.read_bits(size), size)
    preds[ci] += diff
    zz[0] = preds[ci]
    k = 1
    while k < 64:
        rs = _decode_symbol(r, ac_table)
        run, ssss = rs >> 4, rs & 0xF
        if ssss == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC coefficient index overflow")
        zz[k] = _extend(r.read_bits(ssss), ssss)
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[ZIGZAG] = zz  # un-zigzag
    return block.reshape(8, 8) * qtbl


# ---------------------------------------------------------------------------
# minimal grayscale encoder (fixtures + sink)
# ---------------------------------------------------------------------------


def _quality_table(quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (K1_LUMA_QUANT * scale + 50) // 100
    return np.clip(t, 1, 255).reshape(8, 8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s (T.81 F.1.2.3)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _csize(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode_jpeg_gray(
    pixels: np.ndarray, quality: int = 95, restart_interval: int = 0,
) -> bytes:
    """8-bit grayscale → baseline JPEG (single component, Annex K tables).

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (bit-stream realigned, DC predictor reset) — the
    error-resilience feature real encoders use for large images; also the
    test vector for the decoder's ``align_to_restart`` path."""
    if pixels.dtype != np.uint8 or pixels.ndim != 2:
        raise ValueError("encoder takes a 2-D uint8 array")
    h, w = pixels.shape
    qtbl = _quality_table(quality)
    dc_codes = _huffman_codes(*K3_DC_LUMA)
    ac_codes = _huffman_codes(*K3_AC_LUMA)

    bw = _BitWriter()
    pred = 0
    mcu_idx = 0
    rst = 0
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = 0  # RST resets the DC predictor (T.81 F.2.1.3.1)
            mcu_idx += 1
            blk = np.full((8, 8), 0.0)
            tile = pixels[y0 : y0 + 8, x0 : x0 + 8].astype(np.float64) - 128.0
            # edge blocks: replicate-pad (keeps gradients flat at borders)
            blk[: tile.shape[0], : tile.shape[1]] = tile
            if tile.shape[0] < 8:
                blk[tile.shape[0] :, :] = blk[tile.shape[0] - 1, :]
            if tile.shape[1] < 8:
                blk[:, tile.shape[1] :] = blk[:, tile.shape[1] - 1 : tile.shape[1]]
            coef = np.round(_dct2(blk) / qtbl).astype(np.int32)
            zz = coef.reshape(64)[ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            size = _csize(diff)
            ln, code = dc_codes[size]
            bw.write(code, ln)
            if size:
                bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
            # AC run-length
            run = 0
            last_nz = max([i for i in range(1, 64) if zz[i]], default=0)
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_codes[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                s = _csize(v)
                ln, code = ac_codes[(run << 4) | s]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                ln, code = ac_codes[0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    zz_q = qtbl.reshape(64)[ZIGZAG].astype(np.uint8)
    dqt = seg(0xDB, b"\x00" + zz_q.tobytes())
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xC4,
        b"\x00" + bytes(K3_DC_LUMA[0]) + bytes(K3_DC_LUMA[1])
        + b"\x10" + bytes(K3_AC_LUMA[0]) + bytes(K3_AC_LUMA[1]),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + dri + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"
    )


def encode_jpeg_color(pixels_rgb: np.ndarray, quality: int = 95, subsample: str = "444") -> bytes:
    """RGB uint8 (h, w, 3) → baseline JPEG, 3 components interleaved in one
    scan. ``subsample='444'`` keeps chroma at full resolution (Y,Cb,Cr all
    1×1 sampling); ``'420'`` encodes Y at 2×2 per MCU with box-averaged
    quarter-resolution chroma — exercising the decoder's MCU interleave and
    upsample paths. All components share the Annex K luma tables (legal,
    simpler; fixture-quality, not optimal-compression)."""
    if pixels_rgb.dtype != np.uint8 or pixels_rgb.ndim != 3 or pixels_rgb.shape[2] != 3:
        raise ValueError("encoder takes (h, w, 3) uint8 RGB")
    if subsample not in ("444", "422", "420"):
        raise ValueError("subsample must be '444', '422' or '420'")
    h, w, _ = pixels_rgb.shape
    r = pixels_rgb[..., 0].astype(np.float64)
    g = pixels_rgb[..., 1].astype(np.float64)
    b = pixels_rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qtbl = _quality_table(quality)
    dc_codes = _huffman_codes(*K3_DC_LUMA)
    ac_codes = _huffman_codes(*K3_AC_LUMA)
    sampling = {
        "444": [(1, 1)] * 3,
        "422": [(2, 1), (1, 1), (1, 1)],  # chroma halved horizontally only
        "420": [(2, 2), (1, 1), (1, 1)],
    }[subsample]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)

    def comp_plane(plane: np.ndarray, hi: int, vi: int) -> np.ndarray:
        """Pad to MCU grid at full res, then box-average down to the
        component's resolution."""
        mh = -(-h // (8 * vmax)) * 8 * vmax
        mw = -(-w // (8 * hmax)) * 8 * hmax
        p = np.empty((mh, mw))
        p[:h, :w] = plane
        p[h:, :w] = plane[-1:, :]
        p[:h, w:] = p[:h, w - 1 : w]
        p[h:, w:] = p[h - 1, w - 1]
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:
            p = p.reshape(mh // fy, fy, mw // fx, fx).mean(axis=(1, 3))
        return p - 128.0

    planes = [comp_plane(pl, hi, vi) for pl, (hi, vi) in zip((y, cb, cr), sampling)]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    bw = _BitWriter()
    preds = [0, 0, 0]
    for m in range(mcus_x * mcus_y):
        my, mx = divmod(m, mcus_x)
        for ci, (hi, vi) in enumerate(sampling):
            for by in range(vi):
                for bx in range(hi):
                    y0 = (my * vi + by) * 8
                    x0 = (mx * hi + bx) * 8
                    blk = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                    coef = np.round(_dct2(blk) / qtbl).astype(np.int32)
                    zz = coef.reshape(64)[ZIGZAG]
                    diff = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                    size = _csize(diff)
                    ln, code = dc_codes[size]
                    bw.write(code, ln)
                    if size:
                        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
                    run = 0
                    last_nz = max([i for i in range(1, 64) if zz[i]], default=0)
                    for k in range(1, last_nz + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = ac_codes[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        s = _csize(v)
                        ln, code = ac_codes[(run << 4) | s]
                        bw.write(code, ln)
                        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                        run = 0
                    if last_nz < 63:
                        ln, code = ac_codes[0x00]
                        bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    zz_q = qtbl.reshape(64)[ZIGZAG].astype(np.uint8)
    dqt = seg(0xDB, b"\x00" + zz_q.tobytes())
    sof_comps = b"".join(
        bytes([cid + 1, (hi << 4) | vi, 0]) for cid, (hi, vi) in enumerate(sampling)
    )
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + sof_comps)
    dht = seg(
        0xC4,
        b"\x00" + bytes(K3_DC_LUMA[0]) + bytes(K3_DC_LUMA[1])
        + b"\x10" + bytes(K3_AC_LUMA[0]) + bytes(K3_AC_LUMA[1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"
