"""Real multimodal decode bytes (round-2 verdict #9): PNG and WAV/PCM
decode on actual file bytes via the pure-stdlib codecs, wired through the
actor-pool stages; exotic formats keep the deterministic stub."""

import numpy as np
import pyarrow as pa
import pytest

from database_delta_plugins_ray.functions import media as m


def _img(h, w, ch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip(ch):
    arr = _img(13, 7, ch, seed=ch)
    b = m.encode_png(arr)
    assert m.is_png(b)
    assert m.png_info(b) == (7, 13, ch)
    out = m.decode_png(b)
    np.testing.assert_array_equal(out, arr)


def test_png_all_filter_types_decode():
    """Hand-filter scanlines with each spec filter (Sub/Up/Average/Paeth)
    and verify the decoder unfilters them back to the original pixels."""
    import struct
    import zlib

    arr = _img(5, 6, 3, seed=9)
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
        return a if pa_ <= pb_ and pa_ <= pc_ else (b if pb_ <= pc_ else c)

    raw = bytearray()
    for y, ftype in zip(range(h), [0, 1, 2, 3, 4]):
        raw.append(ftype)
        for x in range(stride):
            cur = int(flat[y, x])
            left = int(flat[y, x - ch]) if x >= ch else 0
            up = int(flat[y - 1, x]) if y > 0 else 0
            ul = int(flat[y - 1, x - ch]) if (y > 0 and x >= ch) else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2,
                    4: paeth(left, up, ul)}[ftype]
            raw.append((cur - pred) % 256)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    np.testing.assert_array_equal(m.decode_png(png), arr)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        m.png_info(b"notapng")
    arr = _img(2, 2, 3)
    b = bytearray(m.encode_png(arr))
    b[24] = 16  # bit depth 16: unsupported by this minimal decoder
    with pytest.raises(ValueError):
        m.png_info(bytes(b))


def test_wav_roundtrip_mono_and_stereo():
    t = np.arange(800) / 8000.0
    mono = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    b = m.encode_wav(mono, 8000)
    assert m.is_wav(b)
    x, rate = m.decode_wav(b)
    assert rate == 8000 and x.shape == (800, 1)
    np.testing.assert_allclose(x[:, 0], mono, atol=1.5 / 32768)

    stereo = np.stack([mono, -mono], axis=1)
    x2, _ = m.decode_wav(m.encode_wav(stereo, 16000))
    assert x2.shape == (800, 2)
    np.testing.assert_allclose(x2, stereo, atol=1.5 / 32768)


def test_decode_stages_on_real_bytes(ray_session):
    """The actor-pool stages decode REAL PNG / WAV payloads: true
    dimensions, true sample stats — not stub values."""
    import ray.data

    from database_delta_plugins_ray.stages.multimodal import (
        DecodeAudio,
        DecodeImageStub,
        ImagePixelStats,
    )

    imgs = [_img(4 + i, 9 - i, 3, seed=i) for i in range(3)]
    rows = [
        {"media_id": i, "media": m.encode_png(a), "mime": "image/png",
         "meta": "{}"}
        for i, a in enumerate(imgs)
    ]
    ds = ray.data.from_items(rows).map_batches(
        DecodeImageStub, batch_format="pyarrow", concurrency=1)
    got = sorted(ds.take_all(), key=lambda r: r["media_id"])
    for i, (r, a) in enumerate(zip(got, imgs)):
        assert (r["width"], r["height"], r["channels"]) == (9 - i, 4 + i, 3)

    stats = ray.data.from_items(rows).map_batches(
        ImagePixelStats, batch_format="pyarrow", concurrency=1).take_all()
    for r in sorted(stats, key=lambda x: x["media_id"]):
        a = imgs[r["media_id"]].astype(np.float32)
        assert abs(r["px_mean"] - a.mean()) < 1e-3
        assert abs(r["px_std"] - a.std()) < 1e-3

    t = np.arange(1600) / 16000.0
    wav_rows = [
        {"media_id": 0,
         "media": m.encode_wav(0.25 * np.sin(2 * np.pi * 220 * t)
                               .astype(np.float32), 16000),
         "mime": "audio/wav", "meta": "{}"},
        {"media_id": 1, "media": b"not-audio-at-all", "mime": "application/x",
         "meta": "{}"},
    ]
    out = {r["media_id"]: r for r in ray.data.from_items(wav_rows).map_batches(
        DecodeAudio, batch_format="pyarrow", concurrency=1).take_all()}
    real = out[0]
    assert real["sample_rate"] == 16000
    assert real["duration_ms"] == 100
    assert abs(real["rms"] - 0.25 / np.sqrt(2)) < 1e-3
    # non-WAV rows take the deterministic stub path, same schema
    assert out[1]["sample_rate"] == 8000
