"""Pure-stdlib WAV (RIFF PCM) codec — the audio half of the multimodal
column story (SURVEY §2.14). PCM WAV needs no external library: a RIFF
chunk walk plus a dtype cast. 8/16/32-bit integer and 32-bit float PCM,
any channel count.

Compressed audio (MP3/AAC/OGG/FLAC) genuinely needs external codecs and
raises ``NotImplementedError`` at the boundary, mirroring the image-side
honest-stub policy.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples float32 in [-1, 1] shaped (n, channels), rate).

    Walks RIFF chunks explicitly (fmt may be followed by fact/LIST chunks
    before data — naive offset math breaks on real exports).
    """
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:  # truncated fmt chunk (fuzz-found)
                raise ValueError(f"malformed WAV fmt chunk: {len(body)} bytes")
            tag, n_ch, rate, _brate, _balign, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag not in (1, 3, 0xFFFE):  # PCM, IEEE float, extensible
                raise NotImplementedError(
                    f"WAV format tag {tag} (compressed audio) needs external codecs"
                )
            fmt = (tag, n_ch, rate, bits)
        elif cid == b"data":
            samples = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, n_ch, rate, bits = fmt
    if n_ch == 0 or rate == 0:
        raise ValueError(f"malformed WAV fmt chunk: channels={n_ch} rate={rate}")
    if tag == 3 or (tag == 0xFFFE and bits == 32):
        arr = np.frombuffer(samples, dtype="<f4").astype(np.float32)
    elif bits == 16:
        arr = np.frombuffer(samples, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:  # unsigned by convention
        arr = (np.frombuffer(samples, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif bits == 32:
        arr = np.frombuffer(samples, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    n = len(arr) // n_ch
    return arr[: n * n_ch].reshape(n, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float samples in [-1, 1] (n,) or (n, channels) → 16-bit PCM WAV."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, n_ch = arr.shape
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def frame_features(mono: np.ndarray, rate: int, frame_len: int, hop: int) -> list[dict]:
    """Per-frame audio features over a mono signal: RMS energy, zero-crossing
    rate, spectral centroid (numpy rFFT — no external DSP lib). The standard
    cheap feature set for corpus-level audio quality/VAD gates."""
    out = []
    for start in range(0, max(len(mono) - frame_len + 1, 1), hop):
        w = mono[start : start + frame_len]
        if len(w) < 2:
            break
        rms = float(np.sqrt(np.mean(w**2)))
        zcr = float(np.mean(np.abs(np.diff(np.signbit(w).astype(np.int8)))))
        spec = np.abs(np.fft.rfft(w))
        freqs = np.fft.rfftfreq(len(w), d=1.0 / rate)
        denom = float(spec.sum())
        centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
        out.append({
            "frame_start": start,
            "rms": rms,
            "zcr": zcr,
            "spectral_centroid_hz": centroid,
        })
    return out


def resample_linear(mono: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Linear-interpolation resample (fixture-grade; production swaps in a
    polyphase filter — the Spark plumbing is identical)."""
    if rate_in == rate_out:
        return mono.astype(np.float32)
    n_out = int(round(len(mono) * rate_out / rate_in))
    x_old = np.arange(len(mono), dtype=np.float64)
    x_new = np.linspace(0, len(mono) - 1, n_out)
    return np.interp(x_new, x_old, mono).astype(np.float32)
