"""Multimodal columns: images/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

Decode paths, in preference order:

1. PIL/opencv when importable (not in this container);
2. REAL pure-stdlib decoders for PNG and WAV/PCM payloads
   (functions/media.py — actual pixel/sample decode, no fakes);
3. a clearly-marked deterministic STUB for every other format: stable
   feature values derived from the bytes themselves, so the Ray-side
   plumbing — schema, batch sizing for large payloads, actor signature,
   output layout — stays real, tested, and oracle-gated.

Scale notes: binary payloads are large -> use small ``batch_size`` and keep
``batch_format="pyarrow"`` (pandas would copy the buffers into object
cells); feature extraction state (model weights in real life) loads once
per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import media as mediacodec

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media", pa.large_binary()),
        pa.field("mime", pa.string()),
        pa.field("meta", pa.string()),  # JSON: source, capture info, ...
    ]
)


def _fake_u64(b: bytes, salt: bytes) -> int:
    """Deterministic stub value: first 8 hex chars of md5(payload || salt).
    md5 (not blake2b) so the SAME value is expressible in the DuckDB oracle
    (``('0x' || substr(md5(x || salt), 1, 8))::BIGINT``) — the stub decode
    is fully correctness-gated, not just rows-only."""
    return int(hashlib.md5(b + salt).hexdigest()[:8], 16)


class DecodeImageStub:
    """Actor-pool image decode stage.

    PNG payloads get a REAL header decode (width/height/channels straight
    from IHDR — functions/media.py, pure stdlib); PIL handles other
    formats when importable; everything else falls back to deterministic
    fake dimensions derived from the payload bytes (STUB — see module
    docstring). Output schema is identical on every path, so downstream
    stages are real."""

    def __init__(self) -> None:
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        medias = batch["media"].to_pylist()
        widths, heights, channels = [], [], []
        for b in medias:
            if mediacodec.is_png(b):
                w, h, c = mediacodec.png_info(b)  # REAL decode
            elif self._pil is not None:  # pragma: no cover
                import io

                with self._pil.open(io.BytesIO(b)) as im:
                    w, h = im.size
                    c = len(im.getbands())
            else:
                # deterministic fake decode (STUB): stable pseudo-dimensions
                w = _fake_u64(b, b"w") % 1920 + 1
                h = _fake_u64(b, b"h") % 1080 + 1
                c = 3
            widths.append(w)
            heights.append(h)
            channels.append(c)
        return (
            batch.append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("channels", pa.array(channels, pa.int32()))
        )


class DecodeAudio:
    """Actor-pool audio decode: WAV/PCM payloads are decoded for REAL
    (stdlib wave + numpy) into (channels, sample_rate, duration_ms, rms);
    non-WAV payloads fall back to the deterministic stub so mixed batches
    keep one output schema."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        chans, rates, durs, rms = [], [], [], []
        for b in batch["media"].to_pylist():
            if mediacodec.is_wav(b):
                x, rate = mediacodec.decode_wav(b)
                chans.append(x.shape[1])
                rates.append(rate)
                durs.append(int(len(x) * 1000 / rate))
                rms.append(float(np.sqrt(np.mean(np.square(x)))))
            else:  # STUB fallback (deterministic, bytes-derived)
                chans.append(1 + _fake_u64(b, b"c") % 2)
                rates.append(8000)
                durs.append(_fake_u64(b, b"d") % 60_000)
                rms.append((_fake_u64(b, b"r") % 10_000) / 10_000.0)
        return (
            batch.append_column("channels", pa.array(chans, pa.int32()))
            .append_column("sample_rate", pa.array(rates, pa.int32()))
            .append_column("duration_ms", pa.array(durs, pa.int64()))
            .append_column("rms", pa.array(rms, pa.float32()))
        )


class ImagePixelStats:
    """Actor-pool FULL-pixel feature stage for PNG payloads: mean/std of
    the real decoded pixels per channel-mean. Exercises the complete
    decode (unfiltering incl. Paeth), not just the header."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds = [], []
        for b in batch["media"].to_pylist():
            px = mediacodec.decode_png(b).astype(np.float32)
            means.append(float(px.mean()))
            stds.append(float(px.std()))
        return (
            batch.append_column("px_mean", pa.array(means, pa.float32()))
            .append_column("px_std", pa.array(stds, pa.float32()))
        )


class ImageFeatureStub:
    """Actor-pool feature extraction: in real life an embedding model loaded
    once per actor; here an 8-dim deterministic byte-hash feature (STUB)."""

    DIM = 8

    def __init__(self) -> None:
        # model-load analog: per-actor state built once
        self._salts = [str(i).encode() for i in range(self.DIM)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        medias = batch["media"].to_pylist()
        feats = np.empty((len(medias), self.DIM), dtype=np.float32)
        for i, b in enumerate(medias):
            for j, s in enumerate(self._salts):
                feats[i, j] = (_fake_u64(b, s) % 10_000) / 10_000.0
        return batch.drop_columns(["media"]).append_column(
            "features", pa.array(list(feats), type=pa.list_(pa.float32()))
        )


class FrameSampleStub:
    """Video frame sampling: emits ``n_frames`` pseudo-frames per media row
    (flat_map-shaped: output rows > input rows). Real decoder would use
    pyav/opencv; frame bytes are deterministic slices (STUB)."""

    def __init__(self, n_frames: int = 4) -> None:
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_no, frames = [], [], []
        for mid, b in zip(batch["media_id"].to_pylist(), batch["media"].to_pylist()):
            step = max(1, len(b) // self.n_frames)
            for f in range(self.n_frames):
                ids.append(mid)
                frame_no.append(f)
                frames.append(b[f * step:(f + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frame_no, pa.int32()),
                "frame": pa.array(frames, pa.large_binary()),
            }
        )


def media_from_documents(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Adapter: wrap a text table as fake media rows (bytes payload) so the
    multimodal plumbing is exercised on the synthetic corpus."""

    def to_media(batch: pa.Table) -> pa.Table:
        enc = pc.cast(batch[text_col], pa.large_binary())
        n = batch.num_rows
        return pa.table(
            {
                "media_id": pc.cast(batch[id_col], pa.int64()),
                "media": enc,
                "mime": pa.array(["image/fake"] * n),
                "meta": pa.array(["{}"] * n),
            },
            schema=MEDIA_SCHEMA,
        )

    return ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


def decode_pipeline(media_ds, *, batch_size: int = 256, concurrency: int = 2):
    """media -> decode (actor pool, small batches for large payloads) ->
    features (actor pool). Returns dataset with width/height/channels +
    8-dim features, media bytes dropped."""
    decoded = media_ds.map_batches(
        DecodeImageStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return decoded.map_batches(
        ImageFeatureStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
