"""Pure-Python JPEG codec (ITU-T T.81 Processes 1, 2 and 10) — closes the
DICOM reader's JPEG boundaries: Baseline .50, Extended 12-bit .51 and
Progressive .55 transfer syntaxes, decode + fixture encoders.

Decoder scope: baseline sequential, 8-bit, 1-3 components, interleaved
single-scan, restart markers, 4:4:4 / 4:2:2 / 4:2:0 subsampling (nearest
upsample), JFIF YCbCr→RGB for 3-component images; plus progressive (SOF2,
Annex G Huffman: spectral selection + successive approximation, DC/AC
first and refinement scans, EOBn run codes, restart intervals) closing
the DICOM Progressive (.55) boundary, and 12-bit Extended sequential
(SOF1, Pq=1 16-bit quantization tables, uint16 output) closing the DICOM
Extended (.51) boundary. Arithmetic coding raises ``NotImplementedError``
— honest boundary, named.

Encoder scope (test fixtures + sink): grayscale 8-bit (``encode_jpeg_gray``,
progressive twin ``encode_jpeg_gray_progressive`` with spectral-selection
and successive-approximation scan scripts)
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


def _req(tables: dict, key, what: str):
    """Table lookup that fails as a decode error, not a KeyError — a
    corrupted stream can reference a table id that was never defined."""
    try:
        return tables[key]
    except KeyError:
        raise ValueError(f"JPEG references undefined {what} table {key}") from None


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
    try:
        return _decode_jpeg_inner(data)
    except (IndexError, struct.error) as exc:
        # a truncated/corrupt stream can run any header read off the end —
        # surface every such case as a decode error, never a raw
        # IndexError/struct.error
        raise ValueError(f"truncated or corrupt JPEG: {exc}") from None


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (precision, h, w, comps) ; comps = [(cid, hi, vi, tq)]
    progressive = False
    coefs = None  # progressive: per-component (blocks_y, blocks_x, 64) zigzag

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
                tbl = np.zeros(64, dtype=np.int32)
                if pq == 0:
                    tbl[ZIGZAG] = np.frombuffer(seg[i : i + 64], dtype=np.uint8)
                    i += 64
                elif pq == 1:  # 16-bit entries (required for 12-bit frames)
                    tbl[ZIGZAG] = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(
                        np.int32
                    )
                    i += 128
                else:
                    raise ValueError(f"invalid DQT element precision Pq={pq}")
                quant[tq] = tbl.reshape(8, 8)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision = seg[0]
            if precision == 12 and marker == 0xC0:
                raise ValueError("12-bit sample precision is illegal in SOF0")
            if precision not in (8, 12):
                raise NotImplementedError(
                    f"{precision}-bit JPEG (8-bit baseline/progressive and "
                    "12-bit Extended are supported)"
                )
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            if h == 0 or w == 0 or not 1 <= nc <= 4:
                raise ValueError("JPEG SOF with zero dimensions or bad Nf")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hi, vi = hv >> 4, hv & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"JPEG SOF sampling factors {hi}x{vi} invalid")
                comps.append((cid, hi, vi, tq))
            frame = (precision, h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (arithmetic/lossless/hierarchical) — "
                "only sequential (SOF0/1) and progressive (SOF2) are supported"
            )
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_sel = []  # (comp_idx, dc_table, ac_table)
            for s in range(ns):
                cs, tt = seg[1 + 2 * s : 3 + 2 * s]
                matches = [i for i, c in enumerate(frame[3]) if c[0] == cs]
                if not matches:
                    raise ValueError(f"JPEG SOS references unknown component {cs}")
                scan_sel.append((matches[0], tt >> 4, tt & 0xF))
            if not progressive:
                pos += seg_len
                return _decode_scan(
                    data, pos, frame, scan_sel, quant, huff_dc, huff_ac, restart_interval
                )
            ss_, se_ = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coefs is None:
                coefs = _prog_coef_store(frame)
            pos = _decode_prog_scan(
                data, pos + seg_len, frame, scan_sel, coefs, huff_dc, huff_ac,
                restart_interval, ss_, se_, ahal >> 4, ahal & 0xF,
            )
            continue
        # APPn / COM / others: skip
        pos += seg_len
    if progressive and coefs is not None:
        return _reconstruct_progressive(frame, coefs, quant)
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
                            r,
                            _req(huff_dc, dc_t, "DC Huffman"),
                            _req(huff_ac, ac_t, "AC Huffman"),
                            _req(quant, tq, "quantization"),
                            preds, ci,
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
    return _assemble(planes, h, w, comps, hmax, vmax, frame[0])


def _assemble(planes, h, w, comps, hmax, vmax, precision=8) -> np.ndarray:
    """Level shift, clamp, upsample to full resolution, crop, color
    convert — shared by the sequential and progressive reconstruction.
    12-bit frames level-shift by 2048, clamp to [0, 4095] and come back
    as uint16 (T.81 Extended, DICOM .51 grayscale)."""
    shift = float(1 << (precision - 1))
    top = (1 << precision) - 1
    dt = np.uint8 if precision == 8 else np.uint16
    out = []
    for ci, (_, hi, vi, _tq) in enumerate(comps):
        p = planes[ci] + shift
        p = np.clip(np.round(p), 0, top).astype(dt)
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return out[0]
    if precision != 8:
        raise NotImplementedError("12-bit JPEG is grayscale-only here")
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
    if not -(1 << 31) <= preds[ci] < (1 << 31):  # only a corrupt stream can
        raise ValueError("JPEG DC predictor out of range (corrupt stream)")
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
# progressive (SOF2) decoding — T.81 Annex G, Huffman successive
# approximation + spectral selection
# ---------------------------------------------------------------------------


def _mcu_geometry(frame):
    _, h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    return hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax))


def _comp_block_grid(frame, ci):
    """Non-interleaved block grid for one component (T.81 A.2.2: based on
    the component's own sample dimensions, NOT the padded MCU grid)."""
    _, h, w, comps = frame
    hmax, vmax, _, _ = _mcu_geometry(frame)
    _, hi, vi, _ = comps[ci]
    cw = -(-w * hi // hmax)
    ch = -(-h * vi // vmax)
    return -(-ch // 8), -(-cw // 8)  # (blocks_y, blocks_x)


def _prog_coef_store(frame):
    """Per-component zigzag coefficient arrays, padded to the MCU grid so
    interleaved DC scans can write every (possibly padding) block."""
    _, _, _, comps = frame
    _, _, mcus_x, mcus_y = _mcu_geometry(frame)
    return [
        np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32)
        for (_, hi, vi, _) in comps
    ]


def _next_marker_pos(data: bytes, pos: int) -> int:
    """Position of the next real marker (skips stuffed FF00, fill FFs and
    stray RSTn) after a scan's entropy data."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF:
            m = data[pos + 1]
            if m == 0x00:
                pos += 2
                continue
            if m == 0xFF:  # fill byte
                pos += 1
                continue
            if 0xD0 <= m <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise ValueError("JPEG progressive scan ran past end of data")


def _decode_prog_scan(
    data, pos, frame, scan_sel, coefs, huff_dc, huff_ac,
    restart_interval, ss, se, ah, al,
):
    """Decode one progressive scan into ``coefs``; returns the offset of
    the marker that follows the scan's entropy data."""
    _, _, _, comps = frame
    r = _BitReader(data, pos)
    rst_count = 0
    try:
        if ss == 0:  # DC scan (the only kind that may be interleaved)
            if se != 0:
                raise ValueError("progressive DC scan with Se != 0")
            preds = [0] * len(comps)
            if len(scan_sel) > 1:
                hmax, vmax, mcus_x, mcus_y = _mcu_geometry(frame)
                n_mcu = mcus_x * mcus_y
                for m in range(n_mcu):
                    if restart_interval and m and m % restart_interval == 0:
                        r.align_to_restart(rst_count)
                        rst_count = (rst_count + 1) & 7
                        preds = [0] * len(comps)
                    my, mx = divmod(m, mcus_x)
                    for ci, dc_t, _ac_t in scan_sel:
                        _, hi, vi, _ = comps[ci]
                        for by in range(vi):
                            for bx in range(hi):
                                _decode_prog_dc(
                                    r, huff_dc.get(dc_t), coefs[ci],
                                    my * vi + by, mx * hi + bx, preds, ci, ah, al,
                                )
            else:
                ci, dc_t, _ac_t = scan_sel[0]
                nbh, nbw = _comp_block_grid(frame, ci)
                for m in range(nbh * nbw):
                    if restart_interval and m and m % restart_interval == 0:
                        r.align_to_restart(rst_count)
                        rst_count = (rst_count + 1) & 7
                        preds = [0] * len(comps)
                    by, bx = divmod(m, nbw)
                    _decode_prog_dc(
                        r, huff_dc.get(dc_t), coefs[ci], by, bx, preds, ci, ah, al
                    )
        else:  # AC scan — always non-interleaved (T.81 G.1.1.1)
            if len(scan_sel) != 1:
                raise ValueError("progressive AC scan must be single-component")
            ci, _dc_t, ac_t = scan_sel[0]
            nbh, nbw = _comp_block_grid(frame, ci)
            eobrun = 0
            for m in range(nbh * nbw):
                if restart_interval and m and m % restart_interval == 0:
                    r.align_to_restart(rst_count)
                    rst_count = (rst_count + 1) & 7
                    eobrun = 0
                by, bx = divmod(m, nbw)
                zzb = coefs[ci][by, bx]
                if ah == 0:
                    eobrun = _decode_prog_ac_first(
                        r, _req(huff_ac, ac_t, "AC Huffman"), zzb, ss, se, al, eobrun
                    )
                else:
                    eobrun = _decode_prog_ac_refine(
                        r, _req(huff_ac, ac_t, "AC Huffman"), zzb, ss, se, al, eobrun
                    )
    except _MarkerReached as e:
        raise ValueError(
            f"JPEG progressive scan truncated (marker 0x{e.marker:02X})"
        ) from None
    return _next_marker_pos(data, r.pos)


def _decode_prog_dc(r, dc_table, carr, by, bx, preds, ci, ah, al):
    if ah == 0:  # first DC scan: Huffman diff, scaled by 2^Al
        if dc_table is None:
            raise ValueError("JPEG progressive DC scan without a DC Huffman table")
        size = _decode_symbol(r, dc_table)
        preds[ci] += _extend(r.read_bits(size), size)
        if not -(1 << 30) <= preds[ci] < (1 << 30):
            raise ValueError("JPEG DC predictor out of range (corrupt stream)")
        carr[by, bx, 0] = preds[ci] << al
    else:  # refinement: one raw bit per block (T.81 G.1.2.1)
        if r.read_bit():
            carr[by, bx, 0] |= 1 << al


def _decode_prog_ac_first(r, ac_table, zzb, ss, se, al, eobrun):
    """First AC scan for a band (Ah=0): baseline-style RLE plus EOBn run
    codes (T.81 G.1.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(r, ac_table)
        run, s = rs >> 4, rs & 0xF
        if s == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1
            if run:
                eobrun += r.read_bits(run)
            break
        k += run
        if k > se:
            raise ValueError("JPEG progressive AC index past band end")
        zzb[k] = _extend(r.read_bits(s), s) << al
        k += 1
    return eobrun


def _decode_prog_ac_refine(r, ac_table, zzb, ss, se, al, eobrun):
    """AC refinement scan (Ah>0): newly-significant coefficients arrive as
    ±1<<Al; every already-nonzero coefficient crossed emits a correction
    bit that moves its magnitude toward the true value (T.81 G.1.2.3)."""
    p1 = 1 << al

    def correct(idx):
        if r.read_bit() and (int(zzb[idx]) & p1) == 0:
            zzb[idx] += p1 if zzb[idx] >= 0 else -p1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(r, ac_table)
            run, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if run < 15:  # EOBn: finish block (correcting the rest below)
                    eobrun = 1 << run
                    if run:
                        eobrun += r.read_bits(run)
                    break
                # run == 15 (ZRL): skip 16 zero-history coefficients
            elif s == 1:
                val = p1 if r.read_bit() else -p1
            else:
                raise ValueError("invalid JPEG AC refinement symbol")
            while k <= se:
                if zzb[k] != 0:
                    correct(k)
                else:
                    if run == 0:
                        if val:
                            zzb[k] = val
                        k += 1
                        break
                    run -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if zzb[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, coefs, quant):
    """Dequantize + IDCT every block of every component, then the shared
    upsample/color tail."""
    _, h, w, comps = frame
    hmax, vmax, _, _ = _mcu_geometry(frame)
    planes = []
    for ci, (_, _hi, _vi, tq) in enumerate(comps):
        carr = coefs[ci]
        bh, bw_, _ = carr.shape
        plane = np.zeros((bh * 8, bw_ * 8), dtype=np.float64)
        qtbl = _req(quant, tq, "quantization")
        for by in range(bh):
            for bx in range(bw_):
                block = np.zeros(64, dtype=np.float64)
                block[ZIGZAG] = carr[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct2(
                    block.reshape(8, 8) * qtbl
                )
        planes.append(plane)
    return _assemble(planes, h, w, comps, hmax, vmax, frame[0])


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


def encode_jpeg_gray12(pixels: np.ndarray, quality: int = 95) -> bytes:
    """12-bit grayscale → Extended sequential JPEG (SOF1, T.81 Process 2;
    DICOM transfer syntax 1.2.840.10008.1.2.4.51). Fixture + sink twin of
    :func:`encode_jpeg_gray` for uint16 pixels in [0, 4095].

    Emits Pq=1 (16-bit) quantization tables — the encoding a 12-bit
    process uses — and flat custom Huffman tables: the Annex K.3 tables
    only cover 8-bit magnitude categories (DC size ≤ 11, AC size ≤ 10),
    while 12-bit coefficients need DC ≤ 15 / AC ≤ 14."""
    if pixels.dtype != np.uint16 or pixels.ndim != 2:
        raise ValueError("12-bit encoder takes a 2-D uint16 array")
    if int(pixels.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be in [0, 4095]")
    h, w = pixels.shape
    qtbl = _quality_table(quality)
    dc12 = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(16)))
    ac12_vals = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 15)
    ]
    ac12 = ([0, 0, 0, 0, 0, 0, 0, len(ac12_vals), 0, 0, 0, 0, 0, 0, 0, 0], ac12_vals)
    dc_codes = _huffman_codes(*dc12)
    ac_codes = _huffman_codes(*ac12)

    bw = _BitWriter()
    pred = 0
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            blk = np.full((8, 8), 0.0)
            tile = pixels[y0 : y0 + 8, x0 : x0 + 8].astype(np.float64) - 2048.0
            blk[: tile.shape[0], : tile.shape[1]] = tile
            if tile.shape[0] < 8:
                blk[tile.shape[0] :, :] = blk[tile.shape[0] - 1, :]
            if tile.shape[1] < 8:
                blk[:, tile.shape[1] :] = blk[:, tile.shape[1] - 1 : tile.shape[1]]
            zz = np.round(_dct2(blk) / qtbl).astype(np.int32).reshape(64)[ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
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

    zz_q = qtbl.reshape(64)[ZIGZAG].astype(">u2")
    dqt = seg(0xDB, b"\x10" + zz_q.tobytes())  # Pq=1: 16-bit entries
    sof = seg(0xC1, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xC4,
        b"\x00" + bytes(dc12[0]) + bytes(dc12[1])
        + b"\x10" + bytes(ac12[0]) + bytes(ac12[1]),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"


def _zz_blocks(
    pixels: np.ndarray, qtbl: np.ndarray, shift: float = 128.0
) -> list[np.ndarray]:
    """Row-major list of quantized zigzag coefficient vectors (one per 8×8
    block, replicate-padded at the edges — same tiling as the baseline
    encoder)."""
    h, w = pixels.shape
    out = []
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            blk = np.full((8, 8), 0.0)
            tile = pixels[y0 : y0 + 8, x0 : x0 + 8].astype(np.float64) - shift
            blk[: tile.shape[0], : tile.shape[1]] = tile
            if tile.shape[0] < 8:
                blk[tile.shape[0] :, :] = blk[tile.shape[0] - 1, :]
            if tile.shape[1] < 8:
                blk[:, tile.shape[1] :] = blk[:, tile.shape[1] - 1 : tile.shape[1]]
            coef = np.round(_dct2(blk) / qtbl).astype(np.int32)
            out.append(coef.reshape(64)[ZIGZAG])
    return out


class _ProgScanWriter:
    """Per-scan entropy writer with EOB-run + buffered-correction-bit
    state (T.81 G.1.2.2/G.1.2.3)."""

    def __init__(self, ac_codes):
        self.bw = _BitWriter()
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.be: list[int] = []  # correction bits pending with the EOB run

    def sym(self, s: int) -> None:
        ln, code = self.ac_codes[s]
        self.bw.write(code, ln)

    def flush_eob(self) -> None:
        if self.eobrun:
            rbits = self.eobrun.bit_length() - 1
            self.sym(rbits << 4)
            if rbits:
                self.bw.write(self.eobrun - (1 << rbits), rbits)
            for b in self.be:
                self.bw.write(b, 1)
            self.eobrun = 0
            self.be = []


def encode_jpeg_gray_progressive(
    pixels: np.ndarray, quality: int = 95, script: str = "sa",
    precision: int = 8,
) -> bytes:
    """8-bit grayscale → progressive JPEG (SOF2), fixture + sink twin of
    :func:`encode_jpeg_gray`.

    ``script='spectral'``: pure spectral selection — DC scan, then AC bands
    1-5 and 6-63, no successive approximation (every scan Ah=Al=0).
    ``script='sa'``: the full successive-approximation script the decoder's
    four scan kinds need — DC first at Al=1, AC 1-63 first at Al=1, DC
    refinement, AC refinement — exercising EOBn run codes, newly-significant
    insertion and correction bits end to end.
    """
    if precision == 8:
        if pixels.dtype != np.uint8 or pixels.ndim != 2:
            raise ValueError("8-bit encoder takes a 2-D uint8 array")
        dc_tbl = K3_DC_LUMA
    elif precision == 12:
        if pixels.dtype != np.uint16 or pixels.ndim != 2:
            raise ValueError("12-bit encoder takes a 2-D uint16 array")
        if int(pixels.max(initial=0)) > 4095:
            raise ValueError("12-bit samples must be in [0, 4095]")
        dc_tbl = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(16)))
    else:
        raise ValueError("precision must be 8 or 12")
    if script not in ("sa", "spectral"):
        raise ValueError("script must be 'sa' or 'spectral'")
    h, w = pixels.shape
    qtbl = _quality_table(quality)
    dc_codes = _huffman_codes(*dc_tbl)
    # The Annex K.3 AC table is a SEQUENTIAL table: it has no EOBn symbols
    # (0x10..0xE0), which progressive EOB-run coding requires. Use a flat
    # custom table instead: every (run<<4)|size symbol for size 0..10 at
    # code length 8 (176 codes < 255, so the all-ones code stays unused as
    # T.81 requires). Fixture-quality, not optimal-compression — same
    # stance as the color encoder's shared luma tables.
    max_s = 10 if precision == 8 else 14
    ac_vals = [(r << 4) | s for r in range(16) for s in range(max_s + 1)]
    ac_prog = (
        [0, 0, 0, 0, 0, 0, 0, len(ac_vals), 0, 0, 0, 0, 0, 0, 0, 0],
        ac_vals,
    )
    ac_codes = _huffman_codes(*ac_prog)
    blocks = _zz_blocks(pixels, qtbl, shift=float(1 << (precision - 1)))

    def dc_first_scan(al: int) -> bytes:
        bw = _BitWriter()
        pred = 0
        for zz in blocks:
            v = int(zz[0]) >> al  # arithmetic shift (T.81 G.1.2.1)
            diff = v - pred
            pred = v
            size = _csize(diff)
            ln, code = dc_codes[size]
            bw.write(code, ln)
            if size:
                bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        bw.flush()
        return bytes(bw.out)

    def dc_refine_scan(al: int) -> bytes:
        bw = _BitWriter()
        for zz in blocks:
            bw.write((int(zz[0]) >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def ac_first_scan(ss: int, se: int, al: int) -> bytes:
        sw = _ProgScanWriter(ac_codes)
        for zz in blocks:
            # magnitudes shifted toward zero (T.81 G.1.2.2)
            vals = {
                k: (abs(int(zz[k])) >> al) * (1 if zz[k] > 0 else -1)
                for k in range(ss, se + 1)
            }
            nz = [k for k in range(ss, se + 1) if vals[k] != 0]
            if not nz:
                sw.eobrun += 1
                if sw.eobrun == 0x7FFF:
                    sw.flush_eob()
                continue
            sw.flush_eob()
            run = 0
            for k in range(ss, nz[-1] + 1):
                v = vals[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    sw.sym(0xF0)  # ZRL
                    run -= 16
                s = _csize(v)
                sw.sym((run << 4) | s)
                sw.bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if nz[-1] < se:
                sw.eobrun += 1
                if sw.eobrun == 0x7FFF:
                    sw.flush_eob()
        sw.flush_eob()
        sw.bw.flush()
        return bytes(sw.bw.out)

    def ac_refine_scan(ss: int, se: int, al: int) -> bytes:
        sw = _ProgScanWriter(ac_codes)
        p_shift = al
        for zz in blocks:
            absv = {k: abs(int(zz[k])) >> p_shift for k in range(ss, se + 1)}
            eob_pos = max((k for k in range(ss, se + 1) if absv[k] == 1), default=ss - 1)
            run = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob_pos:
                    sw.flush_eob()
                    sw.sym(0xF0)
                    run -= 16
                    for b in br:
                        sw.bw.write(b, 1)
                    br = []
                if t > 1:  # already significant: correction bit
                    br.append(t & 1)
                    continue
                # newly significant (magnitude exactly 1 at this precision)
                sw.flush_eob()
                sw.sym((run << 4) | 1)
                sw.bw.write(1 if zz[k] > 0 else 0, 1)
                for b in br:
                    sw.bw.write(b, 1)
                br = []
                run = 0
            if run > 0 or br:
                sw.eobrun += 1
                sw.be += br
                if sw.eobrun == 0x7FFF:
                    sw.flush_eob()
        sw.flush_eob()
        sw.bw.flush()
        return bytes(sw.bw.out)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos(ss: int, se: int, ah: int, al: int, body: bytes) -> bytes:
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al])) + body

    if precision == 8:
        zz_q = qtbl.reshape(64)[ZIGZAG].astype(np.uint8)
        dqt = seg(0xDB, b"\x00" + zz_q.tobytes())
    else:  # 12-bit processes use Pq=1 (16-bit) table entries
        zz_q = qtbl.reshape(64)[ZIGZAG].astype(">u2")
        dqt = seg(0xDB, b"\x10" + zz_q.tobytes())
    sof = seg(0xC2, struct.pack(">BHHB", precision, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xC4,
        b"\x00" + bytes(dc_tbl[0]) + bytes(dc_tbl[1])
        + b"\x10" + bytes(ac_prog[0]) + bytes(ac_prog[1]),
    )
    if script == "spectral":
        scans = (
            sos(0, 0, 0, 0, dc_first_scan(0))
            + sos(1, 5, 0, 0, ac_first_scan(1, 5, 0))
            + sos(6, 63, 0, 0, ac_first_scan(6, 63, 0))
        )
    else:
        scans = (
            sos(0, 0, 0, 1, dc_first_scan(1))
            + sos(1, 63, 0, 1, ac_first_scan(1, 63, 1))
            + sos(0, 0, 1, 0, dc_refine_scan(0))
            + sos(1, 63, 1, 0, ac_refine_scan(1, 63, 0))
        )
    return b"\xff\xd8" + dqt + sof + dht + scans + b"\xff\xd9"


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
