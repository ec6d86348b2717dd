"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

The Ray-side plumbing is REAL — schemas, actor-pool decode stages, bounded
batch sizes for large binary payloads, feature output layout. The actual
codec calls are STUBBED behind an import-try: the sandbox ships no
PIL/cv2/librosa, so when the real library is absent each decoder falls
back to a clearly-marked deterministic fake that parses this module's own
synthetic payload header. Swap ``_decode_*_real`` in when the codec
libraries exist; nothing else changes.

Batch-size guidance (SURVEY.md §4.2 memory note): media batches are sized
by BYTES, not rows — callers should pass ``batch_size`` small enough that
``batch_size × avg_payload × concurrency`` fits the worker heap.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

#: synthetic payload header: magic, height, width, channels  (the
#: deterministic fake "codec" format used when real codecs are absent)
_MAGIC = b"FAKEIMG1"
_HEADER = struct.Struct("<8sHHB")

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64(), nullable=False),
        pa.field("media_type", pa.string()),  # image | audio | video
        pa.field("payload", pa.large_binary()),
        pa.field("mime", pa.string()),
    ]
)


def synth_media_batch(n: int, seed: int = 0) -> pa.Table:
    """Deterministic synthetic media table (tests/bench only)."""
    rng = np.random.default_rng(seed)
    payloads = []
    for i in range(n):
        h, w, c = int(rng.integers(16, 64)), int(rng.integers(16, 64)), 3
        body = rng.integers(0, 256, h * w * c, dtype=np.uint8).tobytes()
        payloads.append(_HEADER.pack(_MAGIC, h, w, c) + body)
    return pa.Table.from_arrays(
        [
            pa.array(range(n), pa.int64()),
            pa.array(["image"] * n, pa.string()),
            pa.array(payloads, pa.large_binary()),
            pa.array(["image/fake"] * n, pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


class ImageDecoder:
    """Actor-pool decode/feature stage for image columns.

    ``__init__`` (once per actor) resolves the codec backend; ``__call__``
    (per batch) decodes each payload and emits typed features:
    ``height, width, channels, mean_intensity``. With a real codec library
    the decode body is the only thing that changes.
    """

    def __init__(self):
        self._pil = _try_import_pil()

    def _decode_fake(self, buf: bytes) -> tuple[int, int, int, float]:
        if len(buf) < _HEADER.size or buf[:8] != _MAGIC:
            raise ValueError("not a FAKEIMG1 payload (real codec library unavailable)")
        _, h, w, c = _HEADER.unpack_from(buf)
        body = np.frombuffer(buf, np.uint8, count=h * w * c, offset=_HEADER.size)
        return h, w, c, float(body.mean())

    def _decode_real(self, buf: bytes) -> tuple[int, int, int, float]:
        # STUB: real implementation would be
        #   img = self._pil.open(io.BytesIO(buf)); arr = np.asarray(img)
        raise NotImplementedError("real image codecs are not available in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.zeros((batch.num_rows, 3), dtype=np.int32)
        mean = np.zeros(batch.num_rows, dtype=np.float64)
        payloads = batch.column("payload")
        for i in range(batch.num_rows):  # payload decode is inherently per-item
            buf = payloads[i].as_py()
            h, w, c, m = self._decode_fake(buf) if self._pil is None else self._decode_real(buf)
            feats[i] = (h, w, c)
            mean[i] = m
        out = batch.drop_columns(["payload"])  # features replace heavy bytes
        out = out.append_column("height", pa.array(feats[:, 0], pa.int32()))
        out = out.append_column("width", pa.array(feats[:, 1], pa.int32()))
        out = out.append_column("channels", pa.array(feats[:, 2], pa.int32()))
        return out.append_column("mean_intensity", pa.array(mean, pa.float64()))


def decode_images(ds: "object", batch_size: int = 64, concurrency=(1, 4)):
    """Wire the decoder as an actor pool with small, byte-bounded batches.

    ``concurrency`` defaults to an autoscaling range so the pool never
    deadlocks a session with fewer CPUs than the pool maximum."""
    return ds.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


class ResizeImage:
    """Actor-pool image resize. On the synthetic FAKEIMG1 format the resize
    is REAL (nearest-neighbor over the decoded array, re-encoded to the
    same payload format); with a real codec library only the decode/encode
    calls change. Output payloads stay in the media schema so further
    stages (decode, feature-extract) compose."""

    def __init__(self, height: int = 32, width: int = 32):
        self.h = height
        self.w = width
        self._pil = _try_import_pil()

    def _resize_fake(self, buf: bytes) -> bytes:
        if len(buf) < _HEADER.size or buf[:8] != _MAGIC:
            raise ValueError("not a FAKEIMG1 payload (real codec library unavailable)")
        _, h, w, c = _HEADER.unpack_from(buf)
        arr = np.frombuffer(buf, np.uint8, count=h * w * c, offset=_HEADER.size).reshape(h, w, c)
        ys = (np.arange(self.h) * h // self.h).clip(0, h - 1)
        xs = (np.arange(self.w) * w // self.w).clip(0, w - 1)
        out = arr[ys][:, xs]  # nearest-neighbor
        return _HEADER.pack(_MAGIC, self.h, self.w, c) + out.tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._pil is not None:
            raise NotImplementedError("real image codecs are not available in this environment")
        payloads = batch.column("payload")
        resized = [self._resize_fake(payloads[i].as_py()) for i in range(batch.num_rows)]
        i = batch.schema.get_field_index("payload")
        return batch.set_column(i, "payload", pa.array(resized, pa.large_binary()))


_AMAGIC = b"FAKEAUD1"
_AHEADER = struct.Struct("<8sII")  # magic, sample_rate, n_samples


def synth_audio_batch(n: int, seed: int = 0) -> pa.Table:
    """Deterministic synthetic audio table (int16 PCM behind a fake header)."""
    rng = np.random.default_rng(seed)
    payloads = []
    for _ in range(n):
        sr = int(rng.choice([8000, 16000]))
        ns = int(rng.integers(sr // 4, sr))  # 0.25–1 s
        pcm = (rng.standard_normal(ns) * 3000).astype(np.int16)
        payloads.append(_AHEADER.pack(_AMAGIC, sr, ns) + pcm.tobytes())
    return pa.Table.from_arrays(
        [
            pa.array(range(n), pa.int64()),
            pa.array(["audio"] * n, pa.string()),
            pa.array(payloads, pa.large_binary()),
            pa.array(["audio/fake"] * n, pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


class AudioFeatures:
    """Actor-pool audio decode/feature stage (codec STUBBED like
    ``ImageDecoder``): emits ``sample_rate, duration_s, rms`` per clip.
    Swap ``_decode_fake`` for librosa/soundfile when available."""

    def __init__(self):
        try:
            import librosa  # noqa: F401

            self._real = True
        except ImportError:
            self._real = False

    def _decode_fake(self, buf: bytes) -> tuple[int, float, float]:
        if len(buf) < _AHEADER.size or buf[:8] != _AMAGIC:
            raise ValueError("not a FAKEAUD1 payload (real audio codecs unavailable)")
        _, sr, ns = _AHEADER.unpack_from(buf)
        pcm = np.frombuffer(buf, np.int16, count=ns, offset=_AHEADER.size).astype(np.float64)
        return sr, ns / sr, float(np.sqrt(np.mean(pcm**2)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._real:
            raise NotImplementedError("real audio codecs are not available in this environment")
        sr = np.zeros(batch.num_rows, np.int32)
        dur = np.zeros(batch.num_rows, np.float64)
        rms = np.zeros(batch.num_rows, np.float64)
        payloads = batch.column("payload")
        for i in range(batch.num_rows):  # payload decode is inherently per-item
            sr[i], dur[i], rms[i] = self._decode_fake(payloads[i].as_py())
        out = batch.drop_columns(["payload"])
        out = out.append_column("sample_rate", pa.array(sr, pa.int32()))
        out = out.append_column("duration_s", pa.array(dur, pa.float64()))
        return out.append_column("rms", pa.array(rms, pa.float64()))


class FrameSampler:
    """Video frame-sampling stage (STUB): the sampling plumbing (per-item
    fan-out via flat rows) is real; decode raises until a codec exists."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError("video codecs are not available in this environment")
