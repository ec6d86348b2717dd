"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

The Ray-side plumbing is REAL — schemas, actor-pool decode stages, bounded
batch sizes for large binary payloads, feature output layout — and so are
the codec code paths: each stage carries the actual PIL / librosa / cv2
decode body behind an import-try. The sandbox ships none of those
libraries, so tests exercise the deterministic FAKE payload formats
(``FAKEIMG1`` / ``FAKEAUD1`` / ``FAKEVID1``) defined here; the backend is
chosen PER PAYLOAD by magic-byte sniffing, so installing a codec library
enables real payloads without breaking fake-payload pipelines (and vice
versa).

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
    ``height, width, channels, mean_intensity``. Backend is sniffed per
    payload: FAKEIMG1 payloads always take the deterministic fake path,
    anything else goes to PIL when importable (real decode body below),
    else raises with a clear message.
    """

    def __init__(self):
        self._pil = _try_import_pil()

    def _decode_fake(self, buf: bytes) -> tuple[int, int, int, float]:
        _, h, w, c = _HEADER.unpack_from(buf)
        body = np.frombuffer(buf, np.uint8, count=h * w * c, offset=_HEADER.size)
        return h, w, c, float(body.mean())

    def _decode_real(self, buf: bytes) -> tuple[int, int, int, float]:
        import io

        img = self._pil.open(io.BytesIO(buf))
        arr = np.asarray(img)
        if arr.ndim == 2:  # grayscale → single channel
            arr = arr[:, :, None]
        h, w, c = arr.shape
        return int(h), int(w), int(c), float(arr.mean())

    def _decode(self, buf: bytes) -> tuple[int, int, int, float]:
        if len(buf) >= _HEADER.size and buf[:8] == _MAGIC:
            return self._decode_fake(buf)
        if self._pil is not None:
            return self._decode_real(buf)
        raise ValueError(
            "unrecognized image payload and no codec library (PIL) available"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.zeros((batch.num_rows, 3), dtype=np.int32)
        mean = np.zeros(batch.num_rows, dtype=np.float64)
        payloads = batch.column("payload")
        for i in range(batch.num_rows):  # payload decode is inherently per-item
            h, w, c, m = self._decode(payloads[i].as_py())
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
    """Actor-pool image resize. Backend sniffed per payload: FAKEIMG1
    resizes nearest-neighbor over the decoded array and re-encodes to the
    same payload format; other payloads go through PIL's resize when the
    library exists. Output payloads stay in the media schema so further
    stages (decode, feature-extract) compose."""

    def __init__(self, height: int = 32, width: int = 32):
        self.h = height
        self.w = width
        self._pil = _try_import_pil()

    def _resize_fake(self, buf: bytes) -> bytes:
        _, h, w, c = _HEADER.unpack_from(buf)
        arr = np.frombuffer(buf, np.uint8, count=h * w * c, offset=_HEADER.size).reshape(h, w, c)
        ys = (np.arange(self.h) * h // self.h).clip(0, h - 1)
        xs = (np.arange(self.w) * w // self.w).clip(0, w - 1)
        out = arr[ys][:, xs]  # nearest-neighbor
        return _HEADER.pack(_MAGIC, self.h, self.w, c) + out.tobytes()

    def _resize_real(self, buf: bytes) -> bytes:
        import io

        img = self._pil.open(io.BytesIO(buf))
        fmt = img.format or "PNG"
        resized = img.resize((self.w, self.h))
        out = io.BytesIO()
        resized.save(out, format=fmt)
        return out.getvalue()

    def _resize(self, buf: bytes) -> bytes:
        if len(buf) >= _HEADER.size and buf[:8] == _MAGIC:
            return self._resize_fake(buf)
        if self._pil is not None:
            return self._resize_real(buf)
        raise ValueError(
            "unrecognized image payload and no codec library (PIL) available"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        resized = [self._resize(payloads[i].as_py()) for i in range(batch.num_rows)]
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
    """Actor-pool audio decode/feature stage: emits
    ``sample_rate, duration_s, rms`` per clip. Backend sniffed per
    payload: FAKEAUD1 → header parse (rms in int16 units); anything else →
    librosa when importable (rms in normalized float units — the real
    decoder's native scale)."""

    def __init__(self):
        try:
            import librosa

            self._librosa = librosa
        except ImportError:
            self._librosa = None

    def _decode_fake(self, buf: bytes) -> tuple[int, float, float]:
        _, sr, ns = _AHEADER.unpack_from(buf)
        pcm = np.frombuffer(buf, np.int16, count=ns, offset=_AHEADER.size).astype(np.float64)
        return sr, ns / sr, float(np.sqrt(np.mean(pcm**2)))

    def _decode_real(self, buf: bytes) -> tuple[int, float, float]:
        import io

        y, sr = self._librosa.load(io.BytesIO(buf), sr=None, mono=True)
        dur = len(y) / sr if sr else 0.0
        return int(sr), float(dur), float(np.sqrt(np.mean(y**2))) if len(y) else 0.0

    def _decode(self, buf: bytes) -> tuple[int, float, float]:
        if len(buf) >= _AHEADER.size and buf[:8] == _AMAGIC:
            return self._decode_fake(buf)
        if self._librosa is not None:
            return self._decode_real(buf)
        raise ValueError(
            "unrecognized audio payload and no codec library (librosa) available"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        sr = np.zeros(batch.num_rows, np.int32)
        dur = np.zeros(batch.num_rows, np.float64)
        rms = np.zeros(batch.num_rows, np.float64)
        payloads = batch.column("payload")
        for i in range(batch.num_rows):  # payload decode is inherently per-item
            sr[i], dur[i], rms[i] = self._decode(payloads[i].as_py())
        out = batch.drop_columns(["payload"])
        out = out.append_column("sample_rate", pa.array(sr, pa.int32()))
        out = out.append_column("duration_s", pa.array(dur, pa.float64()))
        return out.append_column("rms", pa.array(rms, pa.float64()))


_VMAGIC = b"FAKEVID1"
_VHEADER = struct.Struct("<8sHHHB")  # magic, n_frames, height, width, channels


def synth_video_batch(n: int, seed: int = 0) -> pa.Table:
    """Deterministic synthetic video table: raw frame stack behind a fake
    header (frames × h × w × c uint8)."""
    rng = np.random.default_rng(seed)
    payloads = []
    for _ in range(n):
        nf = int(rng.integers(6, 25))
        h, w, c = int(rng.integers(8, 24)), int(rng.integers(8, 24)), 3
        body = rng.integers(0, 256, nf * h * w * c, dtype=np.uint8).tobytes()
        payloads.append(_VHEADER.pack(_VMAGIC, nf, h, w, c) + body)
    return pa.Table.from_arrays(
        [
            pa.array(range(n), pa.int64()),
            pa.array(["video"] * n, pa.string()),
            pa.array(payloads, pa.large_binary()),
            pa.array(["video/fake"] * n, pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


class FrameSampler:
    """Actor-pool video frame sampler: every k-th frame of each clip
    becomes ONE OUTPUT ROW whose payload is an image in the media schema —
    so ``ImageDecoder`` / ``ResizeImage`` compose directly downstream
    (video → frames → image features, the standard curation fan-out).

    Backend sniffed per payload: FAKEVID1 slices the raw frame stack;
    other payloads decode through cv2.VideoCapture when OpenCV is
    importable (real body below — VideoCapture requires a file path, so
    the payload round-trips through a worker-local temp file)."""

    def __init__(self, every_k: int = 4):
        if every_k < 1:
            raise ValueError("every_k must be >= 1")
        self.k = every_k
        try:
            import cv2

            self._cv2 = cv2
        except ImportError:
            self._cv2 = None

    def _frames_fake(self, buf: bytes):
        _, nf, h, w, c = _VHEADER.unpack_from(buf)
        stack = np.frombuffer(
            buf, np.uint8, count=nf * h * w * c, offset=_VHEADER.size
        ).reshape(nf, h, w, c)
        for idx in range(0, nf, self.k):
            yield idx, stack[idx]

    def _frames_real(self, buf: bytes):
        import os
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
            f.write(buf)
            path = f.name
        try:
            cap = self._cv2.VideoCapture(path)
            idx = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if idx % self.k == 0:
                    yield idx, np.asarray(frame)
                idx += 1
            cap.release()
        finally:
            os.unlink(path)

    def _frames(self, buf: bytes):
        if len(buf) >= _VHEADER.size and buf[:8] == _VMAGIC:
            return self._frames_fake(buf)
        if self._cv2 is not None:
            return self._frames_real(buf)
        raise ValueError(
            "unrecognized video payload and no codec library (cv2) available"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, payloads = [], [], []
        src = batch.column("payload")
        mids = batch.column("media_id").to_pylist()
        for i in range(batch.num_rows):
            for idx, frame in self._frames(src[i].as_py()):
                h, w, c = frame.shape
                ids.append(mids[i])
                fidx.append(idx)
                payloads.append(_HEADER.pack(_MAGIC, h, w, c) + frame.tobytes())
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "media_type": pa.array(["image"] * n, pa.string()),
                "payload": pa.array(payloads, pa.large_binary()),
                "mime": pa.array(["image/fake"] * n, pa.string()),
            }
        )


def sample_frames(ds: "object", every_k: int = 4, batch_size: int = 16, concurrency=(1, 4)):
    """Wire the frame sampler as an actor pool; small batches — video
    payloads are the heaviest media rows."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_args=(every_k,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
