"""Pure-stdlib media codecs for the multimodal stages.

The container has no PIL/opencv/librosa, but two real formats ARE
decodable with nothing beyond the standard library:

* **PNG** — the format is zlib (stdlib) over per-scanline filters; this
  module implements a minimal, spec-faithful encoder/decoder for 8-bit
  greyscale/RGB/RGBA non-interlaced images (the common case). Public
  spec: https://www.w3.org/TR/png/ (filter types 0-4).
* **WAV/PCM** — stdlib ``wave`` handles container parsing; samples are
  reinterpreted with numpy.

These are the REAL decode path for the multimodal stages; exotic
formats still fall back to the clearly-marked deterministic stub in
stages/multimodal.py.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> channel count (spec §6.1); 8-bit depth only here
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(b: bytes) -> bool:
    return b[:8] == _PNG_SIG


def _chunks(b: bytes):
    pos = 8
    while pos + 8 <= len(b):
        (length,), ctype = struct.unpack(">I", b[pos:pos + 4]), b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc


def png_info(b: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the IHDR chunk only — no pixel
    decompression; the metadata-grade decode for catalog scans."""
    if not is_png(b):
        raise ValueError("not a PNG (bad signature)")
    for ctype, data in _chunks(b):
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13])
            if depth != 8 or color not in _COLOR_CHANNELS:
                raise ValueError(f"unsupported PNG: depth={depth} color={color}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            return w, h, _COLOR_CHANNELS[color]
    raise ValueError("PNG missing IHDR")


def decode_png(b: bytes) -> np.ndarray:
    """Full pixel decode -> uint8 array of shape (h, w, channels).
    Implements all five spec filters (None/Sub/Up/Average/Paeth)."""
    w, h, ch = png_info(b)
    idat = b"".join(d for t, d in _chunks(b) if t == b"IDAT")
    raw = zlib.decompress(idat)
    stride = w * ch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a left scan
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else np.uint8(0)
                bb = prev[x]
                if ftype == 1:
                    cur[x] = line[x] + a
                elif ftype == 3:
                    cur[x] = line[x] + np.uint8((int(a) + int(bb)) // 2)
                else:  # Paeth predictor (spec §9.4)
                    c = prev[x - ch] if x >= ch else np.uint8(0)
                    p = int(a) + int(bb) - int(c)
                    pa_, pb_, pc_ = abs(p - int(a)), abs(p - int(bb)), abs(p - int(c))
                    pred = a if pa_ <= pb_ and pa_ <= pc_ else (bb if pb_ <= pc_ else c)
                    cur[x] = line[x] + pred
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, {1,3,4}) -> PNG bytes (filter 0, one IDAT).
    Deterministic — fixture generation and frame write-back."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def is_wav(b: bytes) -> bool:
    return b[:4] == b"RIFF" and b[8:12] == b"WAVE"


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """WAV/PCM bytes -> (samples float32 in [-1, 1] of shape
    (n_frames, n_channels), sample_rate). 8/16/32-bit PCM."""
    with wave.open(io.BytesIO(b), "rb") as wf:
        n_ch = wf.getnchannels()
        rate = wf.getframerate()
        width = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM width {width}")
    return x.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float32 [-1,1] (n_frames,) or (n_frames, n_ch) -> 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()
